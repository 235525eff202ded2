"""Boolean-expression retrieval: parser, leaf classification, and the
brute tier vs the DuckDB oracle at sf0.001 (sf0.01 runs in
test_entry_oracle.py; engine≡brute identity lives in test_build_pipeline)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from oboyu_ray.pipelines.bm25_batch import (
    bool_leaves,
    parse_bool_query,
    render_bool_query,
)


def test_parse_precedence_and_render():
    # NOT > AND > OR; infix NOT == AND NOT
    t = parse_bool_query("a AND b OR c")
    assert t == ["or", ["and", "a", "b"], "c"]
    t = parse_bool_query("a OR b AND c")
    assert t == ["or", "a", ["and", "b", "c"]]
    t = parse_bool_query("a NOT b")
    assert t == ["and", "a", ["not", "b"]]
    t = parse_bool_query("(a OR b) AND NOT (c AND d)")
    assert t == ["and", ["or", "a", "b"], ["not", ["and", "c", "d"]]]
    assert render_bool_query(t) == "((a OR b) AND NOT (c AND d))"
    # terms lowercase; parens tokenize even without spaces
    assert parse_bool_query("(Table AND Join)OR Vector") == \
        ["or", ["and", "table", "join"], "vector"]
    # round-trip: render(parse(x)) reparses to the same tree
    for s in ("a AND (b OR NOT c)", "x NOT y NOT z", "NOT NOT a AND b"):
        t = parse_bool_query(s)
        assert parse_bool_query(render_bool_query(t)) == t


def test_parse_errors():
    for bad in ("", "AND a", "a AND", "(a OR b", "a )", "a b AND c d ("):
        with pytest.raises(ValueError):
            parse_bool_query(bad)


def test_bool_leaves_positive_vs_filter_only():
    t = parse_bool_query("(a AND b) OR NOT (c AND NOT d)")
    pos, al = bool_leaves(t)
    # d sits under TWO NOTs -> positive again; c under one -> filter-only
    assert pos == {"a", "b", "d"}
    assert al == {"a", "b", "c", "d"}


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_bool_topk_matches_duckdb_oracle(sf_dir):
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)

    ours = norm(entrymod.queries()["bool_topk"](sf_dir))
    theirs = norm(con.execute(entrymod.oracle_sql()["bool_topk"]).fetchdf())
    assert len(ours) > 0
    pd.testing.assert_frame_equal(
        ours.astype(theirs.dtypes.to_dict()), theirs, obj="bool_topk"
    )
