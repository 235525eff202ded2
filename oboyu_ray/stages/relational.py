"""Relational-style operators: windowed aggregation + broadcast join.

The two wide-operation patterns the 100 TB brief calls out, demonstrated
over the driver's ``events`` / ``orders`` / ``customer`` tables:

* tumbling-window aggregation — per-batch PARTIAL aggregation (pyarrow C++
  group_by over (window, key) inside map_batches) before the global
  groupby, so the shuffle moves (windows × keys) partial rows per block
  instead of raw events.  Float measures are fixed-pointed to integer
  micros PER ROW before summation, making the sum exactly associative —
  bit-identical across any partitioning and to the SQL oracle.
* broadcast join — the small side (customer) is ``ray.put`` ONCE as sorted
  numpy key/value arrays; every orders task does a vectorized searchsorted
  lookup (no shuffle of the big side, no per-batch re-ship).  Same
  partial-then-global aggregation for the grouped result.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


from oboyu_ray.fixedpoint import micros


def _micros_col(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return micros(arr.to_numpy(zero_copy_only=False))


def events_window_agg(
    events: "ray.data.Dataset", unit: str = "hour"
) -> "ray.data.Dataset":
    """Tumbling-window (window_ts, event_type) → count + exact integer-micros
    value sum.  Returns (window_ts, event_type, n_events, sum_value_micros)."""

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=unit)
        vm = _micros_col(batch.column("value"))
        t = pa.table(
            {
                "window_ts": win,
                "event_type": batch.column("event_type"),
                "vm": pa.array(vm, type=pa.int64()),
            }
        )
        g = t.group_by(["window_ts", "event_type"]).aggregate(
            [("vm", "count"), ("vm", "sum")]
        )
        return pa.table(
            {
                "window_ts": g.column("window_ts"),
                "event_type": g.column("event_type"),
                "n_partial": g.column("vm_count").cast(pa.int64()),
                "sum_partial": g.column("vm_sum").cast(pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_ts", "event_type"])
        .aggregate(
            Sum("n_partial", alias_name="n_events"),
            Sum("sum_partial", alias_name="sum_value_micros"),
        )
    )


def load_broadcast_map(
    ds: "ray.data.Dataset", key_col: str, val_col: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Small-side (sorted keys, values) arrays for ray.put broadcast."""
    t = ds.select_columns([key_col, val_col]).to_pandas()
    keys = t[key_col].to_numpy(dtype=np.int64)
    vals = t[val_col].to_numpy(dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def orders_by_nation_broadcast(
    orders: "ray.data.Dataset", customer: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """orders ⋈ customer (broadcast) → revenue per nation.

    Returns (c_nationkey, n_orders, revenue_cents); revenue fixed-pointed to
    integer cents per order before summation (exactly associative)."""
    keys, nations = load_broadcast_map(customer, "c_custkey", "c_nationkey")
    ref = ray.put((keys, nations))

    def partial(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        cust = batch.column("o_custkey").to_numpy().astype(np.int64)
        ix = np.searchsorted(k, cust)
        ok = (ix < len(k)) & (k[np.minimum(ix, len(k) - 1)] == cust)
        if not ok.all():
            raise ValueError("order references unknown customer")
        nat = v[ix]
        price = batch.column("o_totalprice").to_numpy().astype(np.float64)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "c_nationkey": pa.array(nat, type=pa.int64()),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )
        g = t.group_by("c_nationkey").aggregate([("cents", "count"), ("cents", "sum")])
        return pa.table(
            {
                "c_nationkey": g.column("c_nationkey"),
                "n_partial": g.column("cents_count").cast(pa.int64()),
                "sum_partial": g.column("cents_sum").cast(pa.int64()),
            }
        )

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_partial", alias_name="n_orders"),
            Sum("sum_partial", alias_name="revenue_cents"),
        )
    )
