"""Ordered per-key window kernels: running totals, fixed ROWS moving sums,
and latest-row-per-key selection.

These are the training-pipeline window shapes the reference's event/session
analytics imply (reference sessionization/service layers consume per-user
ordered streams; see `src/oboyu` events handling) re-expressed Ray-Data-first:

* the only wide operation is ONE hash-bucketed cogroup on the key — no
  global sort.  Each bucket sorts locally (a lexsort over its own rows),
  which is exactly the partitioning a 256-node cluster wants: per-user
  windows never need cross-user order.
* measures are fixed-pointed to integer micros per row BEFORE any
  summation, so every cumulative / windowed sum is exactly associative and
  bit-identical to the SQL oracle regardless of partitioning.
* ``last_row_per_key`` does map-side PARTIAL argmax per batch before the
  shuffle (a key's global latest row is the latest of its per-batch
  latest rows), so the cogroup moves ≤ one row per (key, batch) — never
  the raw stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from oboyu_ray.fixedpoint import micros

WINDOW_BUCKETS = 64


def _ts_int64(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp (or integer) column → int64 numpy, order-preserving."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def keyed_window_scan(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    window: int = 3,
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key running total + ``window``-row moving sum of ``val_col``
    (fixed-pointed to integer micros), ordered by (ts, id) within key.

    Returns one row per input row: ``(id, key, cum_micros, mv_micros)``
    where ``cum_micros`` is SUM OVER (PARTITION BY key ORDER BY ts, id
    ROWS UNBOUNDED PRECEDING) and ``mv_micros`` the same with ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW.
    """

    def route(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vm = micros(t.column(val_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array(
                    (key.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
                "key": pa.array(key, type=pa.int64()),
                "ts_i": pa.array(_ts_int64(t.column(ts_col)), type=pa.int64()),
                "id": pa.array(
                    t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "vm": pa.array(vm, type=pa.int64()),
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        ts = g["ts_i"].to_numpy(dtype=np.int64)
        rid = g["id"].to_numpy(dtype=np.int64)
        vm = g["vm"].to_numpy(dtype=np.int64)
        order = np.lexsort((rid, ts, key))
        key_s, rid_s, vm_s = key[order], rid[order], vm[order]
        cum = np.cumsum(vm_s)
        new = np.r_[True, key_s[1:] != key_s[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(key_s)])
        base = np.where(starts > 0, cum[starts - 1], 0)
        running = cum - np.repeat(base, counts)
        # moving window: position-within-group mask keeps the subtraction
        # inside the group (p >= window ⇒ row i-window is the same key)
        pos = np.arange(len(key_s)) - np.repeat(starts, counts)
        shifted = np.zeros_like(running)
        if len(running) > window:
            shifted[window:] = running[:-window]
        mv = running - np.where(pos >= window, shifted, 0)
        return pd.DataFrame(
            {
                "id": rid_s,
                "key": key_s,
                "cum_micros": running,
                "mv_micros": mv,
            }
        )

    return (
        ds.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )


def last_row_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    payload_cols: list,
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Latest row per key by (ts DESC, id DESC) — the "current state per
    user" selection.  Map-side partial argmax per batch, then a
    group-bucketed reduce re-applies the same vectorized selection; the
    shuffle moves ≤ one row per (key, batch).

    Returns (key, id, ts_i, *payload_cols) with ``ts_i`` the int64
    microsecond timestamp (cast back by the caller if needed).
    """

    def _argmax_mask(key: np.ndarray, ts: np.ndarray, rid: np.ndarray) -> np.ndarray:
        if len(key) == 0:
            return np.zeros(0, dtype=bool)
        order = np.lexsort((-rid, -ts, key))
        k_s = key[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]]
        mask = np.zeros(len(key), dtype=bool)
        mask[order[first]] = True
        return mask

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_int64(t.column(ts_col))
        rid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mask = _argmax_mask(key, ts, rid)
        sel = pa.array(np.flatnonzero(mask))
        cols = {
            "bucket": pa.array(
                (key[mask].astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
            ),
            "key": pa.array(key[mask], type=pa.int64()),
            "ts_i": pa.array(ts[mask], type=pa.int64()),
            "id": pa.array(rid[mask], type=pa.int64()),
        }
        for c in payload_cols:
            cols[c] = t.column(c).take(sel)
        return pa.table(cols)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        ts = g["ts_i"].to_numpy(dtype=np.int64)
        rid = g["id"].to_numpy(dtype=np.int64)
        mask = _argmax_mask(key, ts, rid)
        out = g.loc[mask, ["key", "id", "ts_i"] + list(payload_cols)]
        return out

    return (
        ds.select_columns([key_col, ts_col, id_col] + list(payload_cols))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )
