"""Range-partitioned global sort export — the distributed-sort shape
(sample → range-partition → local sort → partitioned write) that a
100 TB engine uses instead of a monolithic ``ds.sort``.

``ds.sort`` at 10^12 rows is one giant all-to-all with opaque boundary
sampling; this operator makes the boundaries EXPLICIT and DETERMINISTIC:

1. partition boundaries = exact discrete quantiles of the key
   (``stages/quantiles.exact_quantiles`` — a few streaming histogram
   passes, no sort, no sampling nondeterminism; ``quantile_disc``
   semantics so the SQL oracle reproduces them bit-for-bit);
2. one map pass stamps each row's partition id =
   #(boundaries strictly below the key) — a ``searchsorted`` against the
   broadcast boundary array, ties always route to the same partition;
3. one all-to-all (`groupby(part_id)`) co-locates each range, and each
   reduce task LOCALLY sorts its range and writes one parquet file via
   tmp+rename (atomic, resumable output layout: re-running overwrites
   file-at-a-time, never leaves a torn file).

Reading ``part-00000 … part-P`` in order yields a globally sorted
dataset.  Partition count sizes the unit of parallelism and memory:
pick P ≈ total_bytes / target_partition_bytes (each reduce task holds
one range in memory to sort it).  Equal-width key ranges would skew on
non-uniform keys; quantile boundaries give near-equal ROW counts per
partition regardless of the key distribution (heavy duplicate keys can
still skew a partition — the classic remedy, salting the duplicate run
across adjacent partitions, would break strict range order, so dup-heavy
partitions are accepted and surfaced in the summary).

NaN keys sort after every boundary (numpy comparison semantics) and land
in the last partition.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from oboyu_ray.stages.quantiles import exact_quantiles


def range_boundaries(ds: "ray.data.Dataset", key_col: str, n_parts: int) -> np.ndarray:
    """The n_parts−1 exact quantile_disc boundaries of ``key_col`` at
    i/n_parts — actual elements of the column, deterministic."""
    qs = [i / n_parts for i in range(1, n_parts)]
    bdf = exact_quantiles(ds.select_columns([key_col]), key_col, qs)
    return bdf["value"].to_numpy(dtype=np.float64)


def range_sort_export(
    ds: "ray.data.Dataset",
    key_col: str,
    out_dir: str,
    n_parts: int = 8,
    columns: Optional[List[str]] = None,
) -> pd.DataFrame:
    """Globally sort ``ds`` by ``key_col`` into ``n_parts`` range files.

    Returns the per-partition summary (part_id, n_rows, key_min, key_max,
    key_sum_cents) — min/max are actual column elements and the sum is
    integer cents, so the summary compares value-exact against a SQL
    oracle over the same parquet."""
    os.makedirs(out_dir, exist_ok=True)
    if columns is not None:
        ds = ds.select_columns(columns)
    bnds = range_boundaries(ds, key_col, n_parts)
    bref = ray.put(bnds)

    def assign(t: pa.Table) -> pa.Table:
        v = t.column(key_col).to_numpy().astype(np.float64)
        # part_id = #(boundaries strictly below v); NaN → len(bnds) (last)
        pid = np.searchsorted(ray.get(bref), v, side="left").astype(np.int64)
        pid[np.isnan(v)] = len(ray.get(bref))
        return t.append_column("part_id", pa.array(pid))

    def sort_write(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["part_id"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort").drop(columns=["part_id"])
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        v = g[key_col].to_numpy(dtype=np.float64)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "part_id": pd.Series([pid], dtype=np.int64),
                "n_rows": pd.Series([len(g)], dtype=np.int64),
                "key_min": pd.Series([float(v[0])], dtype=np.float64),
                "key_max": pd.Series([float(v[-1])], dtype=np.float64),
                "key_sum_cents": pd.Series([int(cents.sum())], dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(sort_write, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("part_id").reset_index(drop=True)

    # Remove part files from previous runs beyond the current plan (fewer
    # n_parts, shrunk dataset, empty ranges) — "read parts in order =
    # globally sorted" must never include stale data (ADVICE r3).
    written = {f"part-{int(p):05d}.parquet" for p in out["part_id"]}
    for name in os.listdir(out_dir):
        if (
            name.startswith("part-")
            and name.endswith(".parquet")
            and name not in written
        ):
            os.remove(os.path.join(out_dir, name))
    return out
