"""Emulate the driver's correctness gate locally: run every ``queries()``
entry at sf0.01 and compare row-count + sorted-value equality against its
``oracle_sql()`` in DuckDB (order-insensitive, like the driver's hash)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    ours = normalize(to_pandas(q(SF_DIR)))
    assert len(ours) > 0  # every registered query is non-empty at sf0.01
    if sql is None:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    theirs = normalize(con.execute(sql).fetchdf())
    assert list(ours.columns) == list(theirs.columns), name
    assert len(ours) == len(theirs), name
    for col in ours.columns:
        a, b = ours[col], theirs[col]
        if a.dtype != b.dtype:
            a = a.astype(b.dtype)
        pd.testing.assert_series_equal(a, b, check_names=False, obj=f"{name}.{col}")


def test_entry_smoke():
    result = to_pandas(entrymod.entry())
    assert len(result) > 0
    assert set(result.columns) == {"query_id", "doc_id", "score_micros", "rank"}
