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
    """Timestamp (or integer) column → int64 MICROSECONDS, order-preserving
    (normalizes the Arrow timestamp unit: parquet testdata is `us`, but
    pandas-origin blocks arrive as `ns`)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
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

    def scan(g: pa.Table) -> pa.Table:
        # Arrow in, Arrow out — the kernel is pure numpy over zero-copy
        # int64 columns; skipping the per-bucket pandas round-trip saves a
        # copy of every column in both directions
        key = g.column("key").to_numpy(zero_copy_only=False)
        ts = g.column("ts_i").to_numpy(zero_copy_only=False)
        rid = g.column("id").to_numpy(zero_copy_only=False)
        vm = g.column("vm").to_numpy(zero_copy_only=False)
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
        return pa.table(
            {
                "id": pa.array(rid_s, type=pa.int64()),
                "key": pa.array(key_s, type=pa.int64()),
                "cum_micros": pa.array(running, type=pa.int64()),
                "mv_micros": pa.array(mv, type=pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def keyed_rolling_median(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    window: int = 5,
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key EXACT rolling median of ``val_col`` over the trailing
    ``window`` rows (inclusive; ragged head uses the rows available),
    ordered by (ts, id) within key — the order-statistic sliding window.
    One hash-bucketed cogroup on key (same shape as keyed_window_scan);
    per bucket the kernel gathers each row's window into an (n, window)
    matrix (NaN-padded across group starts), sorts rows once, and picks
    the two middle order statistics with DuckDB's quantile_cont lerp
    ``lo*(1-f)+hi*f`` (pinned bit-exact in quantiles.py — don't
    "simplify").  Returns (id, key, med_micros)."""

    def route(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
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
                "v": pa.array(
                    t.column(val_col).to_numpy(zero_copy_only=False)
                    .astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False)
        ts = g.column("ts_i").to_numpy(zero_copy_only=False)
        rid = g.column("id").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, ts, key))
        key_s, rid_s, v_s = key[order], rid[order], v[order]
        n = len(key_s)
        new = np.r_[True, key_s[1:] != key_s[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, counts)
        # gather each row's trailing window (columns: offset window-1 .. 0);
        # offsets past the group start are NaN and sort to the row's tail
        offs = np.arange(window - 1, -1, -1)
        idx = np.arange(n)[:, None] - offs[None, :]
        valid = offs[None, :] <= pos[:, None]
        mat = np.where(valid, v_s[np.clip(idx, 0, n - 1)], np.nan)
        mat.sort(axis=1)  # NaNs last
        cnt = np.minimum(pos + 1, window)
        rank = 0.5 * (cnt - 1)
        lo_i = np.floor(rank).astype(np.int64)
        hi_i = np.ceil(rank).astype(np.int64)
        f = rank - lo_i
        rows = np.arange(n)
        lo = mat[rows, lo_i]
        hi = mat[rows, hi_i]
        med = lo * (1.0 - f) + hi * f
        return pa.table(
            {
                "id": pa.array(rid_s, type=pa.int64()),
                "key": pa.array(key_s, type=pa.int64()),
                "med_micros": pa.array(micros(med), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def global_row_number(
    ds: "ray.data.Dataset",
    order_cols: list,
    out_cols: list,
    rank_col: str = "rnk",
) -> "ray.data.Dataset":
    """EXACT global row_number() OVER (ORDER BY *order_cols*): Ray Data's
    range-partitioned sort does the wide work; ranks are the block-local
    index plus a per-block offset computed from O(blocks) driver state.

    Pass 1 reads each block's (row count, first-row key) in dataset order
    (Ray preserves block order over a materialized dataset, the same
    contract ``prefix_dups`` leans on); the driver cumsums counts into
    offsets keyed by the block's UNIQUE first-row key (``order_cols`` must
    end in a tiebreaker column making rows unique — the usual id column).
    Pass 2 over the SAME materialized blocks looks its offset up by first
    row and emits offset + local index.  No data moves twice; driver state
    is O(blocks), never O(rows).
    """
    sorted_ds = ds.sort(order_cols).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], type=pa.int64()),
                    "first_key": pa.array([], type=pa.string()),
                }
            )
        key = "|".join(str(t.column(c)[0].as_py()) for c in order_cols)
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "first_key": pa.array([key], type=pa.string()),
            }
        )

    metas = sorted_ds.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    offsets = {}
    acc = 0
    for mrow in metas:
        offsets[mrow["first_key"]] = acc
        acc += int(mrow["n"])
    off_ref = ray.put(offsets)

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(out_cols).append_column(
                rank_col, pa.array([], type=pa.int64())
            )
        offs = ray.get(off_ref)
        key = "|".join(str(t.column(c)[0].as_py()) for c in order_cols)
        base = offs[key]
        cols = {c: t.column(c) for c in out_cols}
        cols[rank_col] = pa.array(
            np.arange(1, t.num_rows + 1, dtype=np.int64) + base, type=pa.int64()
        )
        return pa.table(cols)

    return sorted_ds.map_batches(rank_block, batch_format="pyarrow", batch_size=None)


US_PER_DAY = 86_400_000_000
_EPOCH_MONDAY_OFFSET = 4  # 1970-01-05 (epoch day 4) was a Monday


def rolling_active_users(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """EXACT rolling ``window_days``-day distinct-user count per active day
    (the DAU/WAU shape) without replicating rows per window position.

    The textbook plan replicates every (user, day) pair to all
    ``window_days`` windows it covers and distinct-counts each — a
    ``window_days``× shuffle blow-up.  Instead, per user: a user counts
    toward window-day ``w`` iff some active day ``d`` has ``w-(window-1)
    ≤ d ≤ w``, i.e. ``w`` lies in the union of intervals ``[d, d+window-1]``
    — so merge each user's sorted active days into coverage runs (new run
    when the gap exceeds ``window_days``) and emit ±1 BOUNDARY deltas
    (+1 at run start, −1 at last_day + window).  The only wide op is ONE
    user-bucketed cogroup over distinct (user, day) pairs; the driver folds
    per-day deltas over the day grid — bounded by the calendar range, never
    by data volume (the `join_revenue` bounded-fold pattern).

    Output: (day_i, active_users) for every day with ≥1 event, where
    ``day_i`` is the epoch day number.
    """

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_int64(t.column(ts_col)) // US_PER_DAY
        pairs = np.unique(np.stack([key, day], axis=1), axis=0)
        return pa.table(
            {
                "bucket": pa.array(
                    (pairs[:, 0].astype(np.uint64) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(pairs[:, 0], type=pa.int64()),
                "day": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        day = g["day"].to_numpy(dtype=np.int64)
        order = np.lexsort((day, key))
        key_s, day_s = key[order], day[order]
        # global distinct (bucket holds every partial row for its users)
        keep = np.r_[True, (key_s[1:] != key_s[:-1]) | (day_s[1:] != day_s[:-1])]
        key_s, day_s = key_s[keep], day_s[keep]
        # coverage runs: new run on user change or gap > window
        new_run = np.r_[
            True,
            (key_s[1:] != key_s[:-1]) | (day_s[1:] - day_s[:-1] > window_days),
        ]
        starts = day_s[new_run]
        run_last = np.r_[new_run[1:], True]  # last pair of each run
        ends = day_s[run_last] + window_days  # half-open −1 position
        # present-day marker rows (distinct active days in this bucket)
        present = np.unique(day_s)
        d = np.concatenate([starts, ends])
        v = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        out = pd.DataFrame({"day": d, "delta": v, "present": 0})
        # pre-aggregate within the bucket before anything moves
        out = out.groupby("day", sort=False, as_index=False).sum()
        mark = pd.DataFrame({"day": present, "delta": 0, "present": 1})
        return pd.concat([out, mark], ignore_index=True)

    rows = (
        ds.select_columns([key_col, ts_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(deltas, batch_format="pandas")
        .groupby("day")
        .sum(["delta", "present"])
        .to_pandas()
    )
    # bounded driver fold over the calendar grid (np.add.at: one driver
    # batch can carry several rows per key — HANDOFF gotcha)
    day = rows["day"].to_numpy(dtype=np.int64)
    delta = rows["sum(delta)"].to_numpy(dtype=np.int64)
    present = rows["sum(present)"].to_numpy(dtype=np.int64)
    lo, hi = int(day.min()), int(day.max())
    grid = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(grid, day - lo, delta)
    active = np.cumsum(grid)
    mask = np.zeros(hi - lo + 1, dtype=bool)
    mask[day[present > 0] - lo] = True
    idx = np.flatnonzero(mask)
    return ray.data.from_arrow(
        pa.table(
            {
                "day_i": pa.array(idx + lo, type=pa.int64()),
                "active_users": pa.array(active[idx], type=pa.int64()),
            }
        )
    )


def cohort_retention(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Weekly cohort retention: users are cohorted by the Monday-aligned
    week of their FIRST event; for each (cohort_week, week_offset) count
    the distinct cohort users active that week.

    ONE user-bucketed cogroup over distinct (user, week) pairs computes
    per-user cohort + offsets vectorized (users are whole within a bucket,
    so per-bucket (cohort, offset) partial counts are over DISJOINT user
    sets — the final small groupby just sums them).

    Output: (cohort_week, week_offset, n_users); ``cohort_week`` is the
    epoch day of the cohort Monday (DuckDB date_trunc('week') alignment).
    """

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_int64(t.column(ts_col)) // US_PER_DAY
        week = day - ((day - _EPOCH_MONDAY_OFFSET) % 7)
        pairs = np.unique(np.stack([key, week], axis=1), axis=0)
        return pa.table(
            {
                "bucket": pa.array(
                    (pairs[:, 0].astype(np.uint64) % np.uint64(n_buckets)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(pairs[:, 0], type=pa.int64()),
                "week": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        week = g["week"].to_numpy(dtype=np.int64)
        order = np.lexsort((week, key))
        key_s, week_s = key[order], week[order]
        keep = np.r_[True, (key_s[1:] != key_s[:-1]) | (week_s[1:] != week_s[:-1])]
        key_s, week_s = key_s[keep], week_s[keep]
        new_user = np.r_[True, key_s[1:] != key_s[:-1]]
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.r_[starts, len(key_s)])
        cohort = np.repeat(week_s[starts], counts)
        offset = (week_s - cohort) // 7
        out = pd.DataFrame({"cohort_week": cohort, "week_offset": offset})
        return out.groupby(
            ["cohort_week", "week_offset"], sort=False, as_index=False
        ).size().rename(columns={"size": "n"})

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": t.column("cohort_week").cast(pa.int64()),
                "week_offset": t.column("week_offset").cast(pa.int64()),
                "n_users": t.column("sum(n)").cast(pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, ts_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .sum("n")
        .map_batches(finalize, batch_format="pyarrow")
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


def event_gap_stats(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    id_col: str,
    n_buckets: int = WINDOW_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key inter-event gap statistics: number of gaps, total gap, and
    maximum gap in integer MICROSECONDS (keys with fewer than two events
    yield no row — SQL ``lag`` null semantics).

    Gaps are consecutive-pair differences of the (ts, id)-ordered stream, so
    partial per-batch runs can NOT be merged (the merge interleaves unseen
    pairs) — the honest distributed shape is ONE hash-bucketed cogroup on
    the key, a local lexsort per bucket, and a vectorized diff with
    key-boundary masking.  Per-user order never needs cross-user order, so
    this is exactly the per-node layout a 256-node cluster wants."""

    def route(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
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
            }
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        ts = g["ts_i"].to_numpy(dtype=np.int64)
        rid = g["id"].to_numpy(dtype=np.int64)
        order = np.lexsort((rid, ts, key))
        key_s, ts_s = key[order], ts[order]
        same = key_s[1:] == key_s[:-1]          # consecutive pair stays in-key
        gap = (ts_s[1:] - ts_s[:-1])[same]
        gkey = key_s[1:][same]
        if len(gkey) == 0:
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=np.int64),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "sum_gap_us": pd.Series([], dtype=np.int64),
                    "max_gap_us": pd.Series([], dtype=np.int64),
                }
            )
        new = np.r_[True, gkey[1:] != gkey[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(gkey)])
        csum = np.cumsum(gap)
        tot = csum[starts + counts - 1] - np.where(starts > 0, csum[starts - 1], 0)
        mx = np.maximum.reduceat(gap, starts)
        return pd.DataFrame(
            {
                "key": gkey[starts],
                "n_gaps": counts.astype(np.int64),
                "sum_gap_us": tot.astype(np.int64),
                "max_gap_us": mx.astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, ts_col, id_col])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
        .map_batches(
            lambda df: df.rename(columns={"key": key_col}).drop(
                columns=[c for c in ("bucket",) if c in df.columns]
            ),
            batch_format="pandas",
        )
    )


def first_seen_growth(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = WINDOW_BUCKETS,
) -> "pd.DataFrame":
    """Cumulative distinct-key growth curve: each key counts once, on its
    FIRST-seen day — (day, new_users, cum_users) per first-seen day.

    The naive plan distinct-counts users per day prefix (quadratic in days
    or a full re-shuffle per day).  Exact min-per-key needs ONE wide op:
    map-side per-batch (key → min day) partials, then a key-bucketed
    cogroup takes the global min per key and folds to per-day first-seen
    counts INSIDE the bucket — so the driver receives ≤ buckets × calendar
    days rows and only cumsums over the bounded day grid (the
    `dense_daily_agg` bounded-fold pattern).

    Output ``day`` is a timestamp (midnight UTC), matching the SQL
    ``time_bucket(INTERVAL 1 DAY, ts)``."""

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_int64(t.column(ts_col)) // US_PER_DAY
        order = np.lexsort((day, key))
        ks, ds_ = key[order], day[order]
        first = np.r_[True, ks[1:] != ks[:-1]]  # min day per key in batch
        return pa.table(
            {
                "bucket": pa.array(
                    (ks[first].astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
                "key": pa.array(ks[first], type=pa.int64()),
                "day": pa.array(ds_[first], type=pa.int64()),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        day = g["day"].to_numpy(dtype=np.int64)
        order = np.lexsort((day, key))
        ks, ds_ = key[order], day[order]
        first = np.r_[True, ks[1:] != ks[:-1]]  # global min day per key
        ud, cnt = np.unique(ds_[first], return_counts=True)
        return pd.DataFrame({"day": ud, "new_users": cnt.astype(np.int64)})

    parts = (
        ds.select_columns([key_col, ts_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    # bounded driver fold: rows ≤ buckets × days; np.add.at (blocks coalesce)
    agg = parts.groupby("day", as_index=False)["new_users"].sum().sort_values("day")
    out = pd.DataFrame(
        {
            "day": (agg["day"].to_numpy(dtype=np.int64) * US_PER_DAY).astype(
                "datetime64[us]"
            ),
            "new_users": agg["new_users"].to_numpy(dtype=np.int64),
        }
    )
    out["cum_users"] = out["new_users"].cumsum().astype(np.int64)
    return out.reset_index(drop=True)


def daily_ohlc(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> "pd.DataFrame":
    """Per-day OHLC bars (open/high/low/close + count) over an event
    stream — the telemetry downsampling shape.  open/close tie-break on
    (ts, id) so the bar is deterministic under duplicate timestamps.

    open/close are NOT mergeable by value, but their (ts, id) argmin /
    argmax ARE: each batch folds to ≤ one partial row per day carrying its
    local extremes-with-witnesses, and the driver folds ≤ days × blocks
    partial rows over the bounded calendar grid (the `dense_daily_agg`
    zero-shuffle pattern)."""

    def partial(t: pa.Table) -> pa.Table:
        ts = _ts_int64(t.column(ts_col))
        val = t.column(val_col).to_numpy().astype(np.float64)
        eid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts // US_PER_DAY
        order = np.lexsort((eid, ts, day))
        d, tss, eids, vals = day[order], ts[order], eid[order], val[order]
        new = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(d)] - 1  # last index of each day run
        return pa.table(
            {
                "day": pa.array(d[starts], type=pa.int64()),
                "open_ts": pa.array(tss[starts], type=pa.int64()),
                "open_id": pa.array(eids[starts], type=pa.int64()),
                "open_value": pa.array(vals[starts]),
                "close_ts": pa.array(tss[ends], type=pa.int64()),
                "close_id": pa.array(eids[ends], type=pa.int64()),
                "close_value": pa.array(vals[ends]),
                "low_value": pa.array(np.minimum.reduceat(vals, starts)),
                "high_value": pa.array(np.maximum.reduceat(vals, starts)),
                "n": pa.array(np.diff(np.r_[starts, len(d)]).astype(np.int64)),
            }
        )

    parts = (
        ds.select_columns([ts_col, val_col, id_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    opens = (
        parts.sort_values(["day", "open_ts", "open_id"], kind="mergesort")
        .groupby("day", sort=True)["open_value"].first()
    )
    closes = (
        parts.sort_values(
            ["day", "close_ts", "close_id"], ascending=[True, False, False],
            kind="mergesort",
        ).groupby("day", sort=True)["close_value"].first()
    )
    agg = parts.groupby("day", sort=True).agg(
        low_value=("low_value", "min"),
        high_value=("high_value", "max"),
        n_events=("n", "sum"),
    )
    out = pd.DataFrame(
        {
            "day": (agg.index.to_numpy(dtype=np.int64) * US_PER_DAY).astype(
                "datetime64[us]"
            ),
            "open_value": opens.to_numpy(dtype=np.float64),
            "high_value": agg["high_value"].to_numpy(dtype=np.float64),
            "low_value": agg["low_value"].to_numpy(dtype=np.float64),
            "close_value": closes.to_numpy(dtype=np.float64),
            "n_events": agg["n_events"].to_numpy(dtype=np.int64),
        }
    )
    return out.reset_index(drop=True)
