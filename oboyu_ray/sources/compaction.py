"""Small-file compaction — merge a directory of many small parquet shards
into few target-sized files, content-preserving and resumable.

A 100 TB pipeline's incremental stages (per-partition checkpointed writes,
streaming appends, failed-run leftovers) accumulate thousands of KB-sized
parquet files; every downstream read then pays per-file open/footer/schema
cost and the scheduler pays per-file task overhead.  Compaction is the
standing maintenance op that fixes this.

Plan shape:

1. driver lists (file, bytes) — metadata only, no data read — and
   FIRST-FIT bin-packs files in name order into groups ≤ ``target_bytes``
   (name order keeps any upstream range-ordering intact within and across
   groups: outputs are named by group index, so reading outputs in order
   visits rows in the same file order as the inputs);
2. one Ray task per group streams its files into one output via
   tmp+rename.  A group is committed only by its final rename —
   re-running after a crash redoes only uncommitted groups (outputs are
   keyed by a content signature of their input list, so a changed input
   set never reuses a stale output);
3. the caller swaps the directory (or reads the manifest) — this module
   never deletes inputs; retiring them is the caller's transactional step.

Content preservation is asserted in tests with the order-insensitive
``stages/validate.table_checksum`` — the operator this utility pairs with
in a migration.
"""

from __future__ import annotations

import os
import zlib
from typing import Dict, Iterator, List

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_compaction(
    files: List[str], target_bytes: int = DEFAULT_TARGET_BYTES
) -> List[Dict]:
    """First-fit bin packing in name order → [{files, bytes, sig}]."""
    groups: List[Dict] = []
    cur: List[str] = []
    cur_bytes = 0
    for f in sorted(files):
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target_bytes:
            groups.append({"files": cur, "bytes": cur_bytes})
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append({"files": cur, "bytes": cur_bytes})
    for g in groups:
        sig = 0
        for f in g["files"]:
            st = os.stat(f)
            sig = zlib.crc32(
                f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode(),
                sig,
            )
        g["sig"] = sig
    return groups


def compact_parquet(
    files: List[str],
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> List[str]:
    """Merge small parquet files into ≤ target_bytes outputs.

    Returns the output paths in group order; already-committed groups
    (same input signature) are skipped — crash-safe resume."""
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_compaction(files, target_bytes)
    out_paths = []
    todo = []
    for i, g in enumerate(groups):
        out = os.path.join(out_dir, f"compact-{i:05d}-{g['sig']:08x}.parquet")
        out_paths.append(out)
        if not os.path.exists(out):
            todo.append({"files": g["files"], "dst": out})

    if todo:

        def merge(batch: pa.Table) -> Iterator[pa.Table]:
            for row in batch.to_pylist():
                tmp = row["dst"] + ".tmp"
                writer = None
                n = 0
                try:
                    for f in row["files"]:
                        t = pq.read_table(f)
                        if writer is None:
                            writer = pq.ParquetWriter(tmp, t.schema)
                        writer.write_table(t)
                        n += t.num_rows
                finally:
                    if writer is not None:
                        writer.close()
                os.replace(tmp, row["dst"])
                yield pa.table({"dst": [row["dst"]], "rows": [n]})

        ray.data.from_items(todo).map_batches(
            merge, batch_format="pyarrow", batch_size=1
        ).take_all()

    # Retire outputs of PREVIOUS runs whose (index, sig) is not in the
    # current plan — a changed input set would otherwise leave stale
    # compact-* files that a directory-swapping caller would read as
    # duplicated/obsolete rows (ADVICE r3).  The manifest (tmp+rename)
    # records the current run's valid outputs for callers that prefer an
    # explicit list over a directory glob.
    import json

    valid = {os.path.basename(p) for p in out_paths}
    for name in os.listdir(out_dir):
        if (
            name.startswith("compact-")
            and name.endswith(".parquet")
            and name not in valid
        ):
            os.remove(os.path.join(out_dir, name))
    manifest = os.path.join(out_dir, "compaction_manifest.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"outputs": [os.path.basename(p) for p in out_paths]}, f, indent=1)
    os.replace(tmp, manifest)
    return out_paths
