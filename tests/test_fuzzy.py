"""Fuzzy (edit-distance) retrieval: lev_at_most conformance + the driver
query vs its DuckDB oracle (the same levenshtein() both sides)."""

from __future__ import annotations

import itertools
import random

import duckdb
import numpy as np
import pytest

from oboyu_ray.pipelines.bm25_batch import lev_at_most


def _lev_ref(a: str, b: str) -> int:
    """Textbook full-matrix Levenshtein over CODEPOINTS (the reference for
    the banded early-exit implementation)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_lev_at_most_matches_duckdb_levenshtein():
    """Property check on ASCII words: the banded-DP threshold test agrees
    with DuckDB's levenshtein() for every (pair, d).  ASCII only because
    DuckDB's levenshtein counts BYTES, not codepoints ('c' vs '検索' → 6);
    the documents vocabulary the fuzzy oracle runs over is pure ASCII at
    every sf (verified), so byte == codepoint there and the oracle is exact.
    Multibyte conformance is pinned against the codepoint reference DP in
    test_lev_at_most_multibyte instead."""
    rng = random.Random(7)
    alpha = "abcde"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        for _ in range(80)
    ] + [""]
    con = duckdb.connect()
    for a, b in itertools.combinations(words, 2):
        ref = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        for d in (0, 1, 2, 3):
            assert lev_at_most(a, b, d) == (ref <= d), (a, b, d, ref)
        assert lev_at_most(b, a, 2) == (ref <= 2), (a, b, ref)  # symmetry


def test_lev_at_most_multibyte():
    """Codepoint (not byte) semantics on multibyte text, vs the reference
    full-matrix DP."""
    words = ["検索", "検素", "索検", "インデックス", "インデクス", "インデックスエンジン", "c", ""]
    for a, b in itertools.combinations(words, 2):
        ref = _lev_ref(a, b)
        for d in (0, 1, 2, 3):
            assert lev_at_most(a, b, d) == (ref <= d), (a, b, d, ref)
    assert lev_at_most("検索", "検素", 1)  # one codepoint substitution


def test_lev_at_most_edges():
    assert lev_at_most("", "", 0)
    assert lev_at_most("", "ab", 2) and not lev_at_most("", "ab", 1)
    assert lev_at_most("abc", "abc", 0)
    assert not lev_at_most("abcdef", "abc", 2)
    # plain Levenshtein: a transposition costs 2, not 1 (no Damerau)
    assert not lev_at_most("tabel", "table", 1)
    assert lev_at_most("tabel", "table", 2)


def test_fuzzy_vocab_packed_matches_mask():
    """The pre-packed FuzzyVocab (zero-copy per-length views) must return
    exactly the terms fuzzy_mask flags, for d=1 and the d=2 fallback."""
    from oboyu_ray.pipelines.bm25_batch import FuzzyVocab, fuzzy_mask

    rng = random.Random(23)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
        for _ in range(400)
    ] + ["検索", "検素", "インデックス"]
    fv = FuzzyVocab(words)
    for q in ["abc", "aaa", "dcba", "検索", "インデクス"]:
        for d in (1, 2):
            got = sorted(int(i) for i in fv.candidates(q, d))
            exp = sorted(np.flatnonzero(fuzzy_mask(words, q, d)).tolist())
            assert got == exp, (q, d)


def test_fuzzy_mask_matches_banded_dp():
    """The vectorized d=1 prefix+suffix decomposition must agree with the
    banded DP on random words (incl. multibyte and adversarial repeats);
    d=2 exercises the fallback path."""
    from oboyu_ray.pipelines.bm25_batch import fuzzy_mask

    rng = random.Random(13)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 9)))
        for _ in range(600)
    ] + ["検索", "検素", "索検", "インデックス", "インデクス", "aaaa", "aaab", "baaa", "aba", "ab"]
    queries = ["abcd", "aaa", "ab", "検索", "インデックス", "e", "abcde"]
    for q in queries:
        for d in (1, 2):
            m = fuzzy_mask(words, q, d)
            ref = [lev_at_most(w, q, d) for w in words]
            assert m.tolist() == ref, (q, d)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_fuzzy_topk_matches_duckdb_oracle(sf_dir):
    """The registered driver query equals its oracle SQL row-for-row."""
    from oboyu_ray.pipelines.entry_queries import _sql_fuzzy_topk, q_fuzzy_topk

    got = (
        q_fuzzy_topk(sf_dir)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = (
        con.execute(_sql_fuzzy_topk())
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.shape == exp.shape and len(got) > 0
    cols = ["query_id", "doc_id", "score_micros", "rank"]
    assert (got[cols].values == exp[cols].values).all()
    # the no-hit spec must expand to nothing
    assert not (got["query_id"] == "zzznohit~1").any()
