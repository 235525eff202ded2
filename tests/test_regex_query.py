"""Regex / wildcard term retrieval kernels.

The oracle contract rests on pyarrow's ``match_substring_regex`` and
DuckDB's ``regexp_full_match`` being the SAME engine (RE2): these tests pin
that agreement on the driver pattern set plus adversarial cases, pin the
wildcard→regex translation, and verify the brute tier against the DuckDB
oracle at sf0.001 (the sf0.01 run lives in test_entry_oracle.py).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from oboyu_ray.pipelines.bm25_batch import wildcard_to_regex
from oboyu_ray.pipelines.entry_queries import REGEX_QUERIES, WILDCARD_QUERIES

TERMS = [
    "table", "tables", "tab", "tabXle", "join", "jon", "jo1n", "jin",
    "merge", "merges", "sort", "sorts", "sorted", "window", "windaw",
    "shadow", "scan", "scon", "scans", "zzznohit", "データ", "検索",
    "a", "", "tab.le", "j*in",
]


def _duck_matches(pattern: str) -> list:
    con = duckdb.connect()
    return sorted(
        r[0]
        for r in con.execute(
            "SELECT t FROM (SELECT unnest(?) AS t) WHERE regexp_full_match(t, ?)",
            [TERMS, pattern],
        ).fetchall()
    )


def _arrow_matches(pattern: str) -> list:
    m = pc.match_substring_regex(
        pa.array(TERMS, type=pa.string()), pattern=f"^(?:{pattern})$"
    )
    return sorted(t for t, ok in zip(TERMS, m.to_pylist()) if ok)


@pytest.mark.parametrize(
    "pattern",
    REGEX_QUERIES
    + [wildcard_to_regex(w) for w in WILDCARD_QUERIES]
    + [r"tab\.le", "j\\*in", "(a|tab)", ".", ".*", "[^a-z]+"],
)
def test_pyarrow_and_duckdb_regex_agree(pattern):
    assert _arrow_matches(pattern) == _duck_matches(pattern), pattern


def test_wildcard_to_regex_translation():
    assert wildcard_to_regex("tab*") == "tab.*"
    assert wildcard_to_regex("j?in") == "j.in"
    assert wildcard_to_regex("*dow") == ".*dow"
    assert wildcard_to_regex("sc?n*") == "sc.n.*"
    # regex metachars in the literal part are escaped, not interpreted
    assert wildcard_to_regex("a.b*") == "a\\.b.*"
    assert wildcard_to_regex("a+?") == "a\\+."
    # escaped literals stay literal through RE2
    m = pc.match_substring_regex(
        pa.array(["a.b", "axb", "a.bc"]), pattern=f"^(?:{wildcard_to_regex('a.b')})$"
    )
    assert m.to_pylist() == [True, False, False]


def test_wildcard_semantics():
    # * matches the empty run; ? matches exactly one codepoint (incl. multibyte)
    arr = pa.array(["tab", "table", "データ", "デーキ", "デー"])
    star = pc.match_substring_regex(arr, pattern=f"^(?:{wildcard_to_regex('tab*')})$")
    assert star.to_pylist()[:2] == [True, True]
    q = pc.match_substring_regex(arr, pattern=f"^(?:{wildcard_to_regex('デー?')})$")
    assert q.to_pylist()[2:] == [True, True, False]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_regex_topk_matches_duckdb_oracle(sf_dir):
    """Brute tier at sf0.001 vs the full SQL oracle (both pattern families)."""
    import pandas as pd

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)

    for name in ("regex_topk", "wildcard_topk"):
        ours = norm(entrymod.queries()[name](sf_dir))
        theirs = norm(con.execute(entrymod.oracle_sql()[name]).fetchdf())
        assert len(ours) > 0
        pd.testing.assert_frame_equal(
            ours.astype(theirs.dtypes.to_dict()), theirs, obj=name
        )
