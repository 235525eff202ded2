"""Ordered span retrieval (SpanNearQuery inOrder=true) semantics: terms in
order within a position window over the FILTERED token stream, scored like
phrase retrieval.  Pins the shared greedy latest-predecessor kernel against
a scalar reference, the brute ``span_near_topk`` against a DuckDB ordered
m-way positions self-join oracle, and the phrase degeneration
(window == m − 1 ≡ phrase_topk).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from oboyu_ray.config import BM25Config
from oboyu_ray.functions.spanmatch import SPAN_PK, ordered_span_docs
from oboyu_ray.pipelines.bm25_batch import phrase_topk, span_near_topk
from oboyu_ray.stages.postings import get_tokenizer

CFG = BM25Config()


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).repartition(3)


def _scalar_span_candidates(rows, phrase, window):
    """Scalar reference: exhaustive in-order position-tuple search with a
    pruning DFS (tiny docs — exactness over speed)."""
    tok = get_tokenizer(CFG)
    terms = tok.tokenize(phrase)
    if not terms:
        return set()
    hits = set()
    for doc_id, text in rows:
        toks = tok.tokenize(text or "")
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            continue

        def dfs(j, prev, p0):
            if j == len(terms):
                return True
            for p in pos[terms[j]]:
                if p > prev and p - p0 <= window:
                    if dfs(j + 1, p, p0):
                        return True
            return False

        for start in pos[terms[0]]:
            if len(terms) == 1 or dfs(1, start, start):
                hits.add(doc_id)
                break
    return hits


ROWS = [
    (1, "hash join beats merge sort"),
    (2, "the join hash is not a hash join ok"),
    (3, "merge the sort"),
    (4, "hash only here"),
    (5, "join hash"),
    (6, ""),
    (7, "sort sort sort"),
    (8, "hash alpha beta join"),       # ordered, gap 3
    (9, "join alpha beta hash"),       # reversed with gap — never "hash..join"
    (10, "hash alpha beta gamma delta join"),  # ordered, gap 5
]


@pytest.mark.parametrize("window", [1, 2, 3, 5, 9])
@pytest.mark.parametrize(
    "phrase", ["hash join", "merge sort", "sort sort", "hash beta join", "hash"]
)
def test_span_candidates_match_scalar_reference(phrase, window):
    out = span_near_topk(_docs(ROWS), [phrase], window, k=20, cfg=CFG)
    got = set(out["doc_id"].tolist())
    assert got == _scalar_span_candidates(ROWS, phrase, window), (phrase, window)


def test_span_window_adjacent_equals_phrase():
    """window == m − 1 is the adjacent phrase — bit-identical frames."""
    for phrase, m in (("hash join", 2), ("merge sort", 2)):
        a = span_near_topk(_docs(ROWS), [phrase], m - 1, k=20, cfg=CFG)
        b = phrase_topk(_docs(ROWS), [phrase], k=20, cfg=CFG)
        pd.testing.assert_frame_equal(a, b)


def test_span_window_too_small_is_empty():
    out = span_near_topk(_docs(ROWS), ["hash join"], 0, k=20, cfg=CFG)
    assert len(out) == 0


def test_span_ordered_only():
    # doc 5 "join hash" and doc 9 reversed-with-gap must never match the
    # ordered query even at huge windows
    out = span_near_topk(_docs(ROWS), ["hash join"], 100, k=20, cfg=CFG)
    got = set(out["doc_id"].tolist())
    assert 5 not in got and 9 not in got
    assert {1, 2, 8, 10} <= got


def test_span_scores_equal_bm25_on_candidates():
    """Span matching changes the candidate set, never the scoring."""
    from oboyu_ray.pipelines.bm25_batch import brute_force_topk, tokenize_queries

    plain = brute_force_topk(
        _docs(ROWS), tokenize_queries(["hash join"], CFG), k=20, cfg=CFG
    )
    sp = span_near_topk(_docs(ROWS), ["hash join"], 5, k=20, cfg=CFG)
    merged = sp.merge(plain, on="doc_id", suffixes=("_s", "_b"))
    assert len(merged) == len(sp) > 0
    assert (merged["score_micros_s"] == merged["score_micros_b"]).all()


def test_span_matches_duckdb_ordered_join_oracle():
    """Candidate sets vs an independent DuckDB ordered m-way positions
    self-join on the real sf0.001 documents table (2- and 3-term probes,
    several windows)."""
    from oboyu_ray.functions.tokenize import DEFAULT_JAPANESE_STOP_WORDS, TOKEN_PATTERN_SQL

    sw = ", ".join("'" + w + "'" for w in sorted(DEFAULT_JAPANESE_STOP_WORDS))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    pos_cte = f"""
seq AS (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '{TOKEN_PATTERN_SQL}'),
                       t -> length(t) >= {CFG.min_token_length} AND t NOT IN ({sw})) AS s
    FROM documents
),
pos AS (
    SELECT doc_id, unnest(s) AS term, generate_subscripts(s, 1) AS p FROM seq
)"""
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    probes = [("table join", 3), ("table join", 8), ("customer vector table", 12)]
    for phrase, w in probes:
        terms = get_tokenizer(CFG).tokenize(phrase)
        joins, conds = [], []
        for i in range(1, len(terms)):
            joins.append(
                f"JOIN pos p{i+1} ON p{i+1}.doc_id = p1.doc_id AND "
                f"p{i+1}.term = '{terms[i]}' AND p{i+1}.p > p{i}.p"
            )
        conds.append(f"p{len(terms)}.p - p1.p <= {w}")
        sql = f"""
WITH {pos_cte}
SELECT DISTINCT p1.doc_id FROM pos p1 {' '.join(joins)}
WHERE p1.term = '{terms[0]}' AND {' AND '.join(conds)}
ORDER BY 1
"""
        oracle = set(con.execute(sql).fetchdf()["doc_id"].tolist())
        ours = span_near_topk(docs, [phrase], w, k=10**6, cfg=CFG)
        assert set(ours["doc_id"].tolist()) == oracle, (phrase, w)
        assert len(oracle) > 0, (phrase, w)  # probes must be non-trivial


def test_kernel_property_random_streams():
    """Greedy latest-predecessor kernel vs the scalar DFS on random token
    streams (seeded): every (m, window) agrees on the matched doc set."""
    rng = np.random.default_rng(42)
    vocab = list("abcdefg")
    for trial in range(25):
        n_docs = int(rng.integers(1, 8))
        rows = []
        for d in range(n_docs):
            L = int(rng.integers(0, 14))
            rows.append((d, [vocab[i] for i in rng.integers(0, len(vocab), L)]))
        m = int(rng.integers(1, 4))
        terms = [vocab[i] for i in rng.integers(0, 3, m)]
        window = int(rng.integers(m - 1, m + 5)) if m > 0 else 0
        # kernel inputs: packed sorted occurrence arrays per phrase slot
        keys_per_slot = []
        for t in terms:
            ks = []
            for d, toks in rows:
                for i, x in enumerate(toks):
                    if x == t:
                        ks.append(d * int(SPAN_PK) + i)
            keys_per_slot.append(np.array(sorted(ks), dtype=np.int64))
        got = set(ordered_span_docs(keys_per_slot, window).tolist())
        # scalar reference on the same streams
        expect = set()
        for d, toks in rows:
            pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
            if any(not pos.get(t) for t in terms):
                continue

            def dfs(j, prev, p0):
                if j == len(terms):
                    return True
                for p in pos[terms[j]]:
                    if p > prev and p - p0 <= window:
                        if dfs(j + 1, p, p0):
                            return True
                return False

            for start in pos[terms[0]]:
                if len(terms) == 1 or dfs(1, start, start):
                    expect.add(d)
                    break
        assert got == expect, (trial, terms, window, rows)
