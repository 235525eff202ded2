"""JSONL transcript source — line-delimited JSON, the dominant interchange
format for scraped / annotated training-data corpora.

The engine's canonical input is the parquet transcript shard
(``BASELINE.json`` input_hint: conv_id, turn_idx, role, text, tool, ts);
JSONL is what scrapers and annotation tools emit.  The idiomatic Ray-Data
shape is normalize-at-the-edge: a distributed, RESUMABLE conversion pass
(one task per shard, atomic tmp+rename, skip-if-committed — the same
commit discipline as `sources/sinks.py`) into canonical parquet shards
that the existing `pipelines/build_index` path consumes unchanged.
Conversion cost is paid once; every downstream rebuild reads columnar
with column pruning — indexing straight off JSON would re-parse every
byte of text on every rebuild.

Parsing is pyarrow's native JSON reader with an EXPLICIT schema (ISO-8601
timestamps land directly in timestamp[us]; no Python-dict row path), so a
shard converts as one vectorized C++ pass.

Reference parity: the reference's crawler discovers and extracts file
corpora (crawler/services — text/markdown/PDF, see sources/files.py);
JSONL transcript shards are this engine's transcript-shaped equivalent of
"a new input format arrives at the edge".
"""

from __future__ import annotations

import os
from typing import Iterator, List

import pyarrow as pa
import pyarrow.json as pj
import pyarrow.parquet as pq

from oboyu_ray.sources.transcripts import TRANSCRIPT_SCHEMA

# ISO-8601 with microseconds — what json.dumps(datetime.isoformat()) emits
# and what pyarrow's explicit-schema timestamp parser accepts.
_TS_FORMAT = "%Y-%m-%dT%H:%M:%S.%f"


def write_transcripts_jsonl(table: pa.Table, path: str) -> str:
    """Write a transcript table as one JSONL shard (test/export helper;
    atomic).  Timestamps serialize as ISO-8601 with microseconds so the
    round-trip through `read_jsonl_shard` is exact."""
    import json

    cols = table.to_pydict()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for i in range(table.num_rows):
            row = {
                "conv_id": cols["conv_id"][i],
                "turn_idx": cols["turn_idx"][i],
                "role": cols["role"][i],
                "text": cols["text"][i],
                "tool": cols["tool"][i],
                "ts": cols["ts"][i].strftime(_TS_FORMAT),
            }
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    os.replace(tmp, path)
    return path


def read_jsonl_shard(path: str) -> pa.Table:
    """One JSONL shard → canonical transcript Arrow table (vectorized
    pyarrow JSON reader, explicit schema — ISO timestamps parse straight
    into timestamp[us], ints into int32; no per-row Python)."""
    t = pj.read_json(
        path, parse_options=pj.ParseOptions(explicit_schema=TRANSCRIPT_SCHEMA)
    )
    return t.select([f.name for f in TRANSCRIPT_SCHEMA])


def read_transcripts_jsonl(paths: List[str]) -> "ray.data.Dataset":
    """JSONL shards as a streaming transcript Dataset (schema-coerced).

    One read task per shard; downstream stages see the exact canonical
    schema, so every transcript operator works on JSONL input unchanged."""
    import ray.data

    def load(batch: pa.Table) -> Iterator[pa.Table]:
        for p in batch.column("path").to_pylist():
            yield read_jsonl_shard(p)

    return ray.data.from_items([{"path": p} for p in sorted(paths)]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def jsonl_to_parquet_shards(
    jsonl_paths: List[str], out_dir: str
) -> List[str]:
    """Distributed, resumable JSONL→parquet shard conversion.

    One Ray task per input shard writes `<stem>.parquet` via tmp+rename;
    already-converted shards are skipped (crash-safe resume — a partial
    tmp file is never visible under the committed name).  Returns the
    parquet paths in input order, ready for `build_index`."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    out_paths = []
    todo = []
    for p in jsonl_paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(out_dir, stem + ".parquet")
        out_paths.append(out)
        if not os.path.exists(out):
            todo.append({"src": p, "dst": out})

    if todo:

        def convert(batch: pa.Table) -> Iterator[pa.Table]:
            for row in batch.to_pylist():
                tbl = read_jsonl_shard(row["src"])
                tmp = row["dst"] + ".tmp"
                pq.write_table(tbl, tmp)
                os.replace(tmp, row["dst"])
                yield pa.table(
                    {"dst": [row["dst"]], "rows": [tbl.num_rows]}
                )

        ray.data.from_items(todo).map_batches(
            convert, batch_format="pyarrow", batch_size=1
        ).take_all()
    return out_paths
