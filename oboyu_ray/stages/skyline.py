"""2-D Pareto frontier (skyline) — "best trade-off" rows under two
minimized dimensions, e.g. (price, ship date): a row is on the frontier
iff no other row is ≤ in both dimensions and < in at least one.

The distributed shape exploits skyline's closure property: every global
frontier point survives its own batch's LOCAL frontier (dominance inside
a batch implies dominance globally), so

1. ``map_batches`` computes each batch's frontier with one vectorized
   lexsort + running-min pass — O(b log b), emitting O(log b) expected
   rows per batch on independent dims (random data's skyline is
   harmonically small);
2. the surviving candidate set (batches × expected-log-size, tiny) folds
   on the driver with the SAME kernel for the exact global frontier.

Anti-sorted adversarial data (x strictly increasing while y strictly
decreasing) degenerates to an O(n) frontier — no algorithm can shrink
that output; the fold then holds the full frontier, which IS the result.

Output is the DISTINCT frontier points (duplicates of a frontier point
don't dominate each other — both would stay under NOT-EXISTS semantics —
so distinctness is part of the operator contract, matching the SQL
oracle's ``SELECT DISTINCT``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _skyline_min2(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact 2-D minimize-minimize skyline of (x, y) pairs, vectorized:
    keep one (x, min y) per distinct x, then a strictly-decreasing-y
    filter over x-ascending order."""
    if not len(x):
        return x, y
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    first = np.ones(len(xs), dtype=bool)
    first[1:] = xs[1:] != xs[:-1]
    xu, yu = xs[first], ys[first]  # distinct x, min y each (lexsort order)
    keep = np.ones(len(xu), dtype=bool)
    if len(xu) > 1:
        cm = np.minimum.accumulate(yu)
        keep[1:] = yu[1:] < cm[:-1]
    return xu[keep], yu[keep]


def pareto_frontier_min2(
    ds: "ray.data.Dataset", x_col: str, y_col: str
) -> pd.DataFrame:
    """Distributed exact Pareto frontier minimizing (x_col, y_col).

    y may be numeric or timestamp (compared as int64 microseconds and
    returned in its original dtype)."""
    schema = ds.schema()
    y_type = dict(zip(schema.names, schema.types))[y_col]
    y_is_ts = (
        pa.types.is_timestamp(y_type)
        if isinstance(y_type, pa.DataType)
        else np.issubdtype(np.dtype(y_type), np.datetime64)
    )

    def local(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy().astype(np.float64)
        yv = t.column(y_col).to_numpy()
        y = yv.astype("datetime64[us]").astype(np.int64) if y_is_ts else yv.astype(np.float64)
        xs, ys = _skyline_min2(x, y)
        return pa.table({"x": pa.array(xs), "y": pa.array(ys)})

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    xs, ys = _skyline_min2(
        cand["x"].to_numpy(dtype=np.float64), cand["y"].to_numpy(dtype=np.int64 if y_is_ts else np.float64)
    )
    out = pd.DataFrame({x_col: xs})
    out[y_col] = ys.astype("datetime64[us]") if y_is_ts else ys
    return out
