"""Schema-drift-tolerant parquet reading — unify shard GENERATIONS.

Long-lived corpora accumulate schema drift: an early crawl generation
lacks a column added later, a tool stamps an extra debug field, an int32
narrows to int64.  `ray.data.read_parquet` over such a mix either fails
to unify or silently drops columns, and a 10^12-turn ingest cannot demand
a backfill-rewrite of every old shard first.

`read_parquet_evolved` reads every file through ONE explicit target
schema: per file (one task each), present columns cast to the target
type, missing columns filled with typed nulls, extra columns dropped —
so downstream operators always see the canonical schema regardless of
which generation a block came from.  Casting is pyarrow-safe (raises on
lossy casts rather than corrupting silently; a generation that cannot
cast is a data bug to surface, not to paper over).
"""

from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def coerce_table(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """One table → the target schema: cast present / null-fill missing /
    drop extra, preserving row order."""
    cols = []
    for field in schema:
        if field.name in t.column_names:
            cols.append(t.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(t.num_rows, type=field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def read_parquet_evolved(
    paths: List[str], schema: pa.Schema
) -> "ray.data.Dataset":
    """Streaming Dataset over mixed-generation parquet shards, every block
    coerced to ``schema`` (one read task per shard)."""

    def load(batch: pa.Table) -> Iterator[pa.Table]:
        for p in batch.column("path").to_pylist():
            yield coerce_table(pq.read_table(p), schema)

    return ray.data.from_items([{"path": p} for p in sorted(paths)]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
