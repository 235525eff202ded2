"""Data-quality validation report — the contract gate a training pipeline
runs before ingesting a table.

One streaming pass computes every batch-local rule count (nulls, range
violations, malformed values) as map-side partials; the one inherently
GLOBAL rule — key uniqueness — is a distinct-count reduce with map-side
pre-aggregation (per-batch distinct first, so the shuffle moves ≤ one row
per (key, batch), the same shape as ``last_row_per_key``).  Output is a
tiny (rule, n_violations) table the driver can gate on.

Rules are data-driven: each is ``(name, batch_fn)`` where ``batch_fn(table)
→ int`` counts violations inside one Arrow batch — adding a rule never adds
a pass.  SQL-oracled per rule (scalar count UNION ALL).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

VALIDATE_BUCKETS = 64

BatchRule = Tuple[str, Callable[[pa.Table], int]]


def null_rule(col: str) -> BatchRule:
    fn = lambda t: int(t.column(col).null_count)  # noqa: E731
    fn.required_columns = (col,)
    return (f"null_{col}", fn)


def negative_rule(col: str) -> BatchRule:
    def fn(t: pa.Table) -> int:
        return int(
            pc.sum(
                pc.less(t.column(col), 0).cast(pa.int64())
            ).as_py()
            or 0
        )

    fn.required_columns = (col,)
    return (f"negative_{col}", fn)


def empty_string_rule(col: str) -> BatchRule:
    def fn(t: pa.Table) -> int:
        c = t.column(col)
        bad = pc.or_kleene(pc.is_null(c), pc.equal(c, ""))
        return int(pc.sum(bad.cast(pa.int64())).as_py() or 0)

    fn.required_columns = (col,)
    return (f"empty_{col}", fn)


def rules_columns(
    rules: List[BatchRule], unique_col: Optional[str] = None
) -> List[str]:
    """Union of the columns the given rules touch — the read-pruning list a
    caller should pass to ``read_parquet(columns=...)``.  A rule whose
    ``batch_fn`` lacks ``required_columns`` makes pruning unsound, so we
    refuse loudly rather than silently reading everything."""
    cols: set = set() if unique_col is None else {unique_col}
    for name, fn in rules:
        req = getattr(fn, "required_columns", None)
        if req is None:
            raise ValueError(
                f"rule {name!r} does not declare required_columns; "
                "cannot derive a pruned column list"
            )
        cols.update(req)
    return sorted(cols)


def validation_report(
    ds: "ray.data.Dataset",
    rules: List[BatchRule],
    unique_col: Optional[str] = None,
    n_buckets: int = VALIDATE_BUCKETS,
) -> "ray.data.Dataset":
    """(rule, n_violations) — batch rules in ONE pass; ``unique_col`` adds
    a ``duplicate_<col>`` rule counting surplus rows (total − distinct),
    computed as a bucketed distinct reduce."""

    names = [n for n, _ in rules]

    def partial(t: pa.Table) -> pa.Table:
        counts = [int(fn(t)) for _, fn in rules]
        return pa.table(
            {
                "rule": pa.array(names, type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    report = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {
                    "rule": t.column("rule"),
                    "n_violations": t.column("sum(n)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    if unique_col is None:
        return report

    def key_partial(t: pa.Table) -> pa.Table:
        k = t.column(unique_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(
                    (uk.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
                "k": pa.array(uk, type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    import pandas as pd

    def dup_count(g: pd.DataFrame) -> pd.DataFrame:
        per_key = g.groupby("k", sort=False)["c"].sum()
        return pd.DataFrame(
            {
                "rule": [f"duplicate_{unique_col}"],
                "n_violations": [int((per_key - 1).clip(lower=0).sum())],
            }
        )

    dups = (
        ds.select_columns([unique_col])
        .map_batches(key_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_count, batch_format="pandas")
        .groupby("rule")
        .sum("n_violations")
        .map_batches(
            lambda t: pa.table(
                {
                    "rule": t.column("rule"),
                    "n_violations": t.column("sum(n_violations)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return report.union(dups)


def profile_columns(
    ds: "ray.data.Dataset",
    columns: "list[str]",
) -> "pd.DataFrame":
    """One-pass column profiler: per column, row count, null count, and
    lexicographic min/max of the value CAST TO STRING (a single total order
    that works for every input type and matches SQL ``min(CAST(x AS
    VARCHAR))`` exactly — the point is drift detection, not numeric stats).

    Shape: each batch folds to ≤ ``len(columns)`` partial rows inside the
    task; the driver fold is bounded by columns × blocks.  No shuffle — the
    profiler is the cheapest possible full-table pass and the natural
    companion to ``validation_report``'s rule counts."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        names, nrows, nnulls, mins, maxs = [], [], [], [], []
        for c in columns:
            col = t.column(c)
            s = col.cast(pa.string())
            names.append(c)
            nrows.append(t.num_rows)
            nnulls.append(col.null_count)
            mn = pc.min(s).as_py()
            mx = pc.max(s).as_py()
            mins.append(mn)
            maxs.append(mx)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_rows": pa.array(nrows, pa.int64()),
                "n_nulls": pa.array(nnulls, pa.int64()),
                "min_str": pa.array(mins, pa.string()),
                "max_str": pa.array(maxs, pa.string()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    allp = pd.concat(parts, ignore_index=True)
    out = allp.groupby("column", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        min_str=("min_str", "min"),
        max_str=("max_str", "max"),
    )
    return out.astype({"n_rows": "int64", "n_nulls": "int64"})


def key_skew_report(
    ds: "ray.data.Dataset",
    key_col: str,
    top_n: int = 10,
    n_buckets: int = VALIDATE_BUCKETS,
) -> "pd.DataFrame":
    """Shuffle-planning skew diagnostic: the exact ``top_n`` heaviest keys
    with their row counts, integer-ppm share, and cumulative coverage —
    the table you read before choosing a partitioning key (a key holding
    5% of 100 TB makes one reducer eat 5 TB; this report says so upfront).

    Shape: per-batch partial counts per key (map-side combine) → ONE
    key-bucketed cogroup sums globally and emits only its LOCAL top_n plus
    one total-rows row — the global top_n is a subset of the union of
    bucket-local top_ns because bucket counts are already global.  Driver
    folds buckets × (top_n + 1) rows.  Ties break (count DESC, key ASC),
    pinned in both the kernel and the oracle."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(
                    (uk.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                ),
                "key": pa.array(uk, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("key", as_index=False)["n"].sum()
        c = c.sort_values(["n", "key"], ascending=[False, True], kind="mergesort")
        top = c.head(top_n).copy()
        top["is_total"] = 0
        total = pd.DataFrame(
            {"key": [-1], "n": [int(c["n"].sum())], "is_total": [1]}
        )
        return pd.concat([top, total], ignore_index=True)[["key", "n", "is_total"]]

    parts = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()
    )
    total = int(parts.loc[parts["is_total"] == 1, "n"].sum())
    top = (
        parts.loc[parts["is_total"] == 0]
        .sort_values(["n", "key"], ascending=[False, True], kind="mergesort")
        .head(top_n)
        .reset_index(drop=True)
    )
    n = [int(x) for x in top["n"]]
    cum = np.cumsum(n)
    return pd.DataFrame(
        {
            key_col: top["key"].astype(np.int64),
            "n_rows": pd.Series(n, dtype=np.int64),
            "share_ppm": pd.Series(
                [x * 1_000_000 // total for x in n], dtype=np.int64
            ),
            "cum_ppm": pd.Series(
                [int(c) * 1_000_000 // total for c in cum], dtype=np.int64
            ),
        }
    )


CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime; modular sum = order-free


def table_checksum(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
) -> "pd.DataFrame":
    """Order-insensitive content checksum of a table — the cheap equality
    proof for migration/replication at scale (two engines agree iff every
    row agrees, without ever co-locating the tables).

    Per row: md5 of ``id|text`` (md5 so ANY engine reproduces it — the
    deliberate md5-oracle trade documented at textstats.winnowing; a
    vectorized-FNV fast mode would not be cross-engine checkable), top 60
    bits as int, summed mod a Mersenne prime.  Partial sums fold modularly
    per batch, so the checksum is independent of row order, partitioning,
    and batch boundaries.  Returns one row: (n_rows, checksum)."""
    import hashlib

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        acc = 0
        for i, x in zip(ids, texts):
            h = hashlib.md5(f"{i}|{x or ''}".encode("utf-8")).hexdigest()
            acc = (acc + int(h[:15], 16)) % CHECKSUM_MOD
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "c": pa.array([acc], type=pa.int64()),
            }
        )

    n_rows, acc = 0, 0
    for b in (
        ds.select_columns([id_col, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        n_rows += int(np.sum(b.column("n").to_numpy()))
        # Python-int fold: a coalesced driver batch can hold many ~2^61
        # partials, which overflows an int64 accumulator after 4 rows
        acc = (acc + sum(b.column("c").to_pylist())) % CHECKSUM_MOD
    return pd.DataFrame(
        {"n_rows": pd.Series([n_rows], dtype=np.int64),
         "checksum": pd.Series([acc], dtype=np.int64)}
    )
