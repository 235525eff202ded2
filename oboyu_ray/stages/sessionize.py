"""Sessionization — the stateful windowed operator pattern (brief: custom
operators Ray Data lacks, expressed as map_batches + co-partitioned reduce).

Events are assigned to sessions per user: a new session starts when the gap
to the user's previous event exceeds ``gap``.  The operator needs all of a
user's events together in time order — the partitioning assumption is
``user bucket`` (stable hash), the same bucketed-reduce shape as
stages/dedup.py: one vectorized ``map_groups`` call per bucket, users never
split across buckets, so the per-user ordered sweep is exact.  At 10^12
events the bucket count scales with the cluster and hot users are bounded by
their own event counts (per-user state, no cross-user coupling).

SQL-oracled: the identical lag/cumsum window-function formulation runs in
DuckDB (ties broken by event_id on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes
PATH_LEN = 3
PATH_TOPK = 20
SESSION_BUCKETS_MIN = 32
SESSION_BUCKETS_MAX = 65_536
SESSION_ROWS_PER_BUCKET = 2_000_000  # one bucket group ≈ a worker-heap-sized frame


def sessionize(
    events: "ray.data.Dataset",
    gap_us: int = SESSION_GAP_US,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(ts, user_id, event_id) → per-session summaries
    (user_id, session_idx, n_events, start_ts, end_ts); session_idx is
    1-based per user in time order (ties by event_id).

    Bucket count scales with input size when not given (rows /
    SESSION_ROWS_PER_BUCKET, clamped) so a bucket's map_groups frame stays
    worker-heap-sized at any corpus scale instead of 1/32 of the table —
    ``events.count()`` on a fresh parquet read is metadata-only."""
    if n_buckets is None:
        n_rows = events.count()
        n_buckets = int(
            np.clip(
                n_rows // SESSION_ROWS_PER_BUCKET + 1,
                SESSION_BUCKETS_MIN,
                SESSION_BUCKETS_MAX,
            )
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        b = (u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))

    def bucket_sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "session_idx": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "start_ts": pd.Series(dtype="datetime64[us]"),
                    "end_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_s = new_user | (gap > gap_us)
        s_global = np.cumsum(new_s.astype(np.int64))
        user_starts = np.flatnonzero(new_user)
        user_counts = np.diff(np.concatenate((user_starts, [n])))
        base = np.repeat(s_global[user_starts] - 1, user_counts)
        session_idx = s_global - base
        out = (
            pd.DataFrame(
                {
                    "user_id": u,
                    "session_idx": session_idx,
                    "ts": g["ts"].to_numpy(),
                }
            )
            .groupby(["user_id", "session_idx"], sort=False)
            .agg(n_events=("ts", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        events.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_sessions, batch_format="pandas")
    )


def session_paths(
    events: "ray.data.Dataset",
    gap_us: int = SESSION_GAP_US,
    k: int = PATH_TOPK,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Top-k event-type trigram PATHS within sessions ("signup>view>buy") —
    the path-mining shape funnels and UX analytics need.

    Same user-bucketed cogroup as ``sessionize``; inside a bucket the whole
    computation is factorized integer work: one lexsort, session boundaries
    by gap, a valid triple = three consecutive rows with no session break,
    combo id = c0·V² + c1·V + c2, ``np.unique`` over combo ids — path
    STRINGS materialize only for the bucket's distinct combos, never per
    row.  Buckets emit partial (path, n) counts; the global reduce is a
    groupby-sum over ≤ |event_type|³ rows (a bounded enum cubed), then the
    driver takes top-k by (n DESC, path ASC).
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        b = (u.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "event_type": batch.column("event_type").cast(pa.string()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def bucket_paths(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n = len(g)
        if n < 3:
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes, uniques = pd.factorize(g["event_type"].to_numpy(), sort=True)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_s = new_user | (gap > gap_us)
        # a triple starting at i stays inside one session iff rows i+1, i+2
        # are not session starts
        valid = ~new_s[1:-1] & ~new_s[2:]
        if not valid.any():
            return pd.DataFrame({"path": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        V = np.int64(len(uniques))
        c = codes.astype(np.int64)
        combo = (c[:-2] * V + c[1:-1]) * V + c[2:]
        uc, cnt = np.unique(combo[valid], return_counts=True)
        c0, rest = np.divmod(uc, V * V)
        c1, c2 = np.divmod(rest, V)
        paths = [f"{uniques[a]}>{uniques[b]}>{uniques[d]}" for a, b, d in zip(c0, c1, c2)]
        return pd.DataFrame({"path": paths, "n": cnt.astype(np.int64)})

    parts = (
        events.select_columns(["user_id", "ts", "event_id", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_paths, batch_format="pandas")
        .groupby("path")
        .sum("n")
        .to_pandas()
    )
    parts = parts.rename(columns={"sum(n)": "n"})
    parts["n"] = parts["n"].astype(np.int64)
    parts = parts.sort_values(["n", "path"], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return ray.data.from_pandas(parts.reset_index(drop=True))
