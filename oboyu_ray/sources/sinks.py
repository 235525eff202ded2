"""Result sinks — resumable partitioned Parquet output.

`write_result` lands any driver-contract query result (Dataset / pandas /
Arrow) as Parquet with a small manifest (row count, schema, timing) written
LAST, so a consumer can treat `_MANIFEST.json` as the commit marker: a
killed write leaves no manifest and the re-run overwrites cleanly (the
write-then-commit idempotency pattern the index build uses per partition).
Datasets stream straight to multiple files via `ds.write_parquet` — never
one giant file; small driver-side frames land as a single part file.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from oboyu_ray.state.checkpoint import atomic_write_json

MANIFEST = "_MANIFEST.json"


def write_result(
    result: Any,
    out_dir: str,
    partition_cols: Optional[list] = None,
) -> Dict[str, Any]:
    """Write a query result to ``out_dir`` as parquet + commit manifest."""
    t0 = time.time()
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    if isinstance(result, ray.data.Dataset):
        if partition_cols:
            result.write_parquet(out_dir, partition_cols=partition_cols)
        else:
            result.write_parquet(out_dir)
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        )
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        schema = pq.ParquetFile(files[0]).schema_arrow if files else pa.schema([])
    else:
        table = (
            result
            if isinstance(result, pa.Table)
            else pa.Table.from_pandas(pd.DataFrame(result), preserve_index=False)
        )
        path = os.path.join(out_dir, "part-00000.parquet")
        pq.write_table(table, path)
        files = [path]
        n_rows = table.num_rows
        schema = table.schema

    manifest = {
        "n_rows": int(n_rows),
        "n_files": len(files),
        "columns": schema.names,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at": time.time(),
    }
    atomic_write_json(os.path.join(out_dir, MANIFEST), manifest)
    return manifest


def is_committed(out_dir: str) -> bool:
    return os.path.exists(os.path.join(out_dir, MANIFEST))


# ------------------------------------------------------- sharded export

SHARD_COMMIT = "_COMMIT.json"
EXPORT_SHARDS = 64


def _shard_of(keys) -> "np.ndarray":
    """Deterministic shard id per key: md5 of the key string (the
    ``sample_by_hash`` convention — stable across runs, machines, and Ray
    versions, unlike ``hash()``)."""
    import hashlib

    import numpy as np

    return np.fromiter(
        (int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8], 16)
         for k in keys),
        dtype=np.int64,
        count=len(keys),
    )


def export_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str = "doc_id",
    n_shards: int = EXPORT_SHARDS,
) -> Dict[str, Any]:
    """RESUMABLE deterministic sharded export — the corpus-export twin of
    the index build's per-partition checkpointing.

    Rows land under ``shard=NNN/`` with shard = md5(key) % n_shards (pure
    function of the row key, so membership is stable across runs); each
    shard directory gets a ``_COMMIT.json`` (row count + order-independent
    key-set hash) and the top-level ``_MANIFEST.json`` commits LAST.  A
    re-run SKIPS committed shards entirely: uncommitted shard dirs (crash
    leftovers) are removed and only the missing shards' rows are filtered
    (one vectorized pass) and rewritten.  Never one giant file; a failed
    100 TB export resumes from the last committed shard boundary.
    """
    import numpy as np
    import pyarrow.compute as pc_

    from oboyu_ray.stages.sketch import _hash64

    os.makedirs(out_dir, exist_ok=True)
    committed: Dict[int, Dict[str, Any]] = {}
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        cpath = os.path.join(out_dir, name, SHARD_COMMIT)
        sid = int(name.split("=", 1)[1])
        if os.path.exists(cpath):
            with open(cpath) as f:
                committed[sid] = json.load(f)
        else:
            shutil.rmtree(os.path.join(out_dir, name))  # crash leftover

    missing = sorted(set(range(n_shards)) - set(committed))
    if missing:
        miss_set = pa.array(missing, type=pa.int64())

        def tag(t: pa.Table) -> pa.Table:
            shard = _shard_of(t.column(key_col).to_pylist()) % n_shards
            out = t.append_column("shard", pa.array(shard, type=pa.int64()))
            return out.filter(pc_.is_in(out.column("shard"), value_set=miss_set))

        filtered = ds.map_batches(tag, batch_format="pyarrow")
        filtered.write_parquet(out_dir, partition_cols=["shard"])

        # per-shard commit stats: one cheap keys-only pass (count + xor of
        # key hashes — order-independent, mergeable across batches)
        def stat_partial(t: pa.Table) -> pa.Table:
            shard = _shard_of(t.column(key_col).to_pylist()) % n_shards
            kh = _hash64(t.column(key_col).cast(pa.string()))
            rows = {"shard": [], "n": [], "x": []}
            for s in np.unique(shard):
                m = shard == s
                rows["shard"].append(int(s))
                rows["n"].append(int(m.sum()))
                rows["x"].append(
                    int(np.bitwise_xor.reduce(kh[m].astype(np.int64)))
                )
            return pa.table(
                {k: pa.array(v, type=pa.int64()) for k, v in rows.items()}
            )

        stats: Dict[int, list] = {s: [0, 0] for s in missing}
        for b in (
            ds.map_batches(tag, batch_format="pyarrow")
            .map_batches(stat_partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            for s, n, x in zip(
                b.column("shard").to_pylist(),
                b.column("n").to_pylist(),
                b.column("x").to_pylist(),
            ):
                stats[int(s)][0] += int(n)
                stats[int(s)][1] ^= int(x)

        for s in missing:
            sdir = os.path.join(out_dir, f"shard={s}")
            os.makedirs(sdir, exist_ok=True)  # empty shards commit too
            commit = {"n_rows": stats[s][0], "key_xor": stats[s][1]}
            atomic_write_json(os.path.join(sdir, SHARD_COMMIT), commit)
            committed[s] = commit

    manifest = {
        "n_shards": n_shards,
        "n_rows": sum(c["n_rows"] for c in committed.values()),
        "rewritten_shards": missing,
        "committed_at": time.time(),
    }
    atomic_write_json(os.path.join(out_dir, MANIFEST), manifest)
    return manifest
