"""Phrase-retrieval semantics: adjacency over the FILTERED token stream
(reference position semantics, bm25_indexer.py:290-308 — positions are
indices in `tokenize(text)`), scored by BM25 over the phrase terms.

The brute-force `phrase_topk` is the rank-identity baseline the positional
engine path must match; its own correctness is pinned here against a scalar
reference and (in test_entry_oracle) against the DuckDB relational-division
oracle at sf0.01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from oboyu_ray.config import BM25Config
from oboyu_ray.pipelines.bm25_batch import phrase_topk
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


def _scalar_phrase_candidates(rows, phrase):
    """Reference implementation: per-doc tokenize + sublist scan."""
    tok = get_tokenizer(CFG)
    terms = tok.tokenize(phrase)
    if not terms:
        return set()
    hits = set()
    for doc_id, text in rows:
        toks = tok.tokenize(text or "")
        m = len(terms)
        if any(toks[i : i + m] == terms for i in range(len(toks) - m + 1)):
            hits.add(doc_id)
    return hits


ROWS = [
    (1, "hash join beats merge sort"),
    (2, "the join hash is not a hash join ok"),
    (3, "merge the sort"),  # stopword drops -> merge/sort ARE adjacent
    (4, "hash only here"),
    (5, "join hash"),  # reversed order must NOT match "hash join"
    (6, ""),  # empty doc never matches, still counts toward N/avgdl
    (7, "sort sort sort"),  # repeated-term phrase probe
]


@pytest.mark.parametrize(
    "phrase",
    ["hash join", "merge sort", "the hash", "sort sort", "absent phrase", "the", ""],
)
def test_phrase_candidates_match_scalar_reference(phrase):
    out = phrase_topk(_docs(ROWS), [phrase], k=10, cfg=CFG)
    got = set(out["doc_id"].tolist())
    assert got == _scalar_phrase_candidates(ROWS, phrase), phrase


def test_phrase_ordering_and_boundaries():
    out = phrase_topk(_docs(ROWS), ["hash join", "merge sort"], k=10, cfg=CFG)
    by_q = {q: g for q, g in out.groupby("query_id")}
    # adjacency in order: doc 5 ("join hash") excluded, doc 2 included
    assert set(by_q["hash join"]["doc_id"]) == {1, 2}
    # stopword-interrupted doc 3 matches "merge sort"
    assert set(by_q["merge sort"]["doc_id"]) == {1, 3}
    # ranks are 1..n, and the total order is (score_micros DESC, doc ASC)
    for _, g in by_q.items():
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        s = g.sort_values(["score_micros", "doc_id"], ascending=[False, True])
        assert s["doc_id"].tolist() == g["doc_id"].tolist()


def test_phrase_cross_doc_adjacency_never_matches():
    # last token of doc A + first token of doc B must not form a phrase,
    # in the same batch or across batches
    rows = [(1, "alpha beta gamma"), (2, "delta alpha beta")]
    out = phrase_topk(_docs(rows), ["gamma delta"], k=10, cfg=CFG)
    assert len(out) == 0


def test_phrase_scores_equal_bm25_on_candidates():
    """A phrase's score must equal plain BM25 (same terms) for the docs
    that pass the adjacency filter — the filter changes the candidate set,
    never the scoring function."""
    from oboyu_ray.pipelines.bm25_batch import brute_force_topk, tokenize_queries

    plain = brute_force_topk(
        _docs(ROWS), tokenize_queries(["hash join"], CFG), k=10, cfg=CFG
    )
    phr = phrase_topk(_docs(ROWS), ["hash join"], k=10, cfg=CFG)
    merged = phr.merge(plain, on="doc_id", suffixes=("_p", "_b"))
    assert len(merged) == len(phr)
    assert (merged["score_micros_p"] == merged["score_micros_b"]).all()
