"""Positional-index engine tests: build with store_positions=True, run
exact phrase retrieval through the shard actors, and pin rank+score
identity against the (DuckDB-oracled) brute-force ``phrase_topk`` over the
same docs.  Plus legacy-index refusal and lineage-toggle invalidation.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from oboyu_ray.config import BM25Config, BuildConfig
from oboyu_ray.pipelines.bm25_batch import phrase_topk, score_micros
from oboyu_ray.pipelines.build_index import build_index
from oboyu_ray.pipelines.query import QueryEngine
from oboyu_ray.sources.transcripts import write_synth_transcripts
from oboyu_ray.stages.postings import get_tokenizer

CFG = BM25Config()
N_CONVS = 200


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    base = tmp_path_factory.mktemp("posengine")
    data_dir = str(base / "transcripts")
    index_dir = str(base / "index")
    files = write_synth_transcripts(data_dir, n_convs=N_CONVS, seed=7, convs_per_file=50)
    cfg = BuildConfig(window_docs=256, store_positions=True)
    report = build_index(files, index_dir, cfg, files_per_part=2)
    return {"files": files, "index_dir": index_dir, "report": report, "cfg": cfg}


@pytest.fixture(scope="module")
def engine(built):
    eng = QueryEngine(built["index_dir"], num_shards=2)
    yield eng
    eng.close()


def _phrases_from_corpus(index_dir):
    """Deterministic phrase probes harvested from the built docs: real
    adjacent bigrams/trigrams (guaranteed hits) plus synthetic no-hits."""
    tok = get_tokenizer(CFG)
    docs_dir = os.path.join(index_dir, "docs")
    t = pa.concat_tables(
        [pq.read_table(os.path.join(docs_dir, f)) for f in sorted(os.listdir(docs_dir))]
    ).sort_by([("doc_num", "ascending")])
    phrases = []
    for text in t.column("text").to_pylist():
        toks = tok.tokenize(text or "")
        if len(toks) >= 3 and len(phrases) == 0:
            phrases.append(" ".join(toks[0:2]))
            phrases.append(" ".join(toks[0:3]))
        elif len(toks) >= 2 and len(phrases) == 2:
            phrases.append(" ".join(toks[-2:]))
            break
    assert len(phrases) == 3, "synthetic corpus must yield phrase probes"
    # reversed order of a real bigram (usually rarer/absent), an absent
    # term, and an empty phrase
    a, b = phrases[0].split()[:2]
    phrases += [f"{b} {a}", "zzz_nohit phrase", ""]
    return phrases


def test_phrase_engine_matches_brute_force(built, engine):
    docs_dir = os.path.join(built["index_dir"], "docs")
    docs_ds = ray.data.read_parquet(docs_dir)
    stats = json.load(open(os.path.join(built["index_dir"], "stats.json")))
    phrases = _phrases_from_corpus(built["index_dir"])
    k = 12
    brute = phrase_topk(
        docs_ds, phrases, k=k, cfg=CFG, id_col="doc_num", text_col="text",
        stats={"N": stats["N"], "total_dl": stats["total_dl"], "avgdl": stats["avgdl"]},
    )
    any_hits = 0
    for p in phrases:
        got = engine.search_phrase(p, k=k)
        expect = brute[brute.query_id == p]
        assert len(got) == len(expect), p
        assert got["doc_num"].tolist() == expect["doc_num"].tolist(), p
        if len(got):
            np.testing.assert_array_equal(
                score_micros(got["score"].to_numpy()),
                expect["score_micros"].to_numpy(), err_msg=p,
            )
            any_hits += 1
    assert any_hits >= 2  # the harvested phrases really exercised the path


def test_phrase_is_subset_of_conjunctive(built, engine):
    phrases = _phrases_from_corpus(built["index_dir"])
    p = phrases[0]
    phr = engine.search_phrase(p, k=1000)
    conj = engine.search(p, k=1000, require_all=True)
    assert set(phr["doc_num"]) <= set(conj["doc_num"])
    # and phrase scores equal the conjunctive scores for shared docs (the
    # adjacency filter changes the candidate set, never the scoring)
    merged = phr.merge(conj, on="doc_num", suffixes=("_p", "_c"))
    np.testing.assert_allclose(
        merged["score_p"].to_numpy(), merged["score_c"].to_numpy(), rtol=1e-12
    )


def test_positional_build_reports_positions_payload(built, tmp_path):
    """Positions cost extra payload; a position-free build of the same
    corpus must be smaller and must REFUSE phrase queries."""
    index2 = str(tmp_path / "index_nopos")
    cfg = BuildConfig(window_docs=256, store_positions=False)
    report2 = build_index(built["files"], index2, cfg, files_per_part=2)
    assert built["report"]["payload_bytes"] > report2["payload_bytes"]
    eng = QueryEngine(index2, num_shards=2)
    try:
        phrases = _phrases_from_corpus(built["index_dir"])
        with pytest.raises(Exception, match="store_positions"):
            eng.search_phrase(phrases[0], k=5)
        # non-phrase paths are unaffected
        assert len(eng.search(phrases[0], k=5)) > 0
    finally:
        eng.close()


def test_store_positions_toggle_invalidates_checkpoints(built, engine, tmp_path):
    """Building position-free then re-building the SAME index dir with
    store_positions=True must re-run tokenize/blocks (lineage key toggles)
    and serve phrase queries from the converged index."""
    index3 = str(tmp_path / "index_toggle")
    files = built["files"]
    build_index(files, index3, BuildConfig(window_docs=256), files_per_part=2)
    blocks0 = os.path.join(index3, "blocks", "blocks-00000.parquet")
    assert "pos" not in pq.read_schema(blocks0).names
    build_index(
        files, index3, BuildConfig(window_docs=256, store_positions=True),
        files_per_part=2,
    )
    assert "pos" in pq.read_schema(blocks0).names
    # expected ranking from the module engine (same corpus, positional build);
    # NOTE the session fixture has 4 CPUs and the module engine holds 2 shard
    # actors — spawn at most ONE extra 2-shard engine at a time
    eng = QueryEngine(index3, num_shards=2)
    try:
        phrases = _phrases_from_corpus(built["index_dir"])
        got = eng.search_phrase(phrases[0], k=5)
        expect = engine.search_phrase(phrases[0], k=5)
        assert got["doc_num"].tolist() == expect["doc_num"].tolist()
    finally:
        eng.close()


def test_phrase_dense_and_window_paths_identical(built):
    """The adaptive dense (whole-range packed intersect) and per-window
    phrase paths must return identical (doc, score) results for every
    probe, including hot-term phrases that trigger dense adaptively."""
    from oboyu_ray.state.shards import IndexShard

    # non-actor shard over ALL partitions (direct in-process use)
    import os as _os
    blocks = sorted(_os.listdir(_os.path.join(built["index_dir"], "blocks")))
    part_ids = [int(f.split("-")[1].split(".")[0]) for f in blocks]
    shard = IndexShard(built["index_dir"], part_ids, built["cfg"].window_docs)
    stats = json.load(open(os.path.join(built["index_dir"], "stats.json")))
    shard.configure(1.2, 0.75, float(stats["avgdl"]))

    from oboyu_ray.stages.postings import get_tokenizer
    tok = get_tokenizer(CFG)
    phrases = [p for p in _phrases_from_corpus(built["index_dir"]) if p]
    n_hits = 0
    for p in phrases:
        terms = tok.tokenize(p)
        if not terms:
            continue
        # weights like the engine computes (idf × multiplicity); absent term
        # → the engine would return empty before reaching the shard
        from oboyu_ray.stages.stats import idf
        eng = QueryEngine(built["index_dir"], num_shards=1)
        try:
            w = eng.term_weights(terms)
        finally:
            eng.close()
        if len(w) < len(set(terms)):
            continue
        d_docs, d_scores = shard.query_phrase(terms, w, 10, force="dense")
        w_docs, w_scores = shard.query_phrase(terms, w, 10, force="window")
        a_docs, a_scores = shard.query_phrase(terms, w, 10)  # adaptive
        np.testing.assert_array_equal(d_docs, w_docs, err_msg=p)
        np.testing.assert_allclose(d_scores, w_scores, rtol=1e-12, err_msg=p)
        np.testing.assert_array_equal(a_docs, w_docs, err_msg=p)
        n_hits += len(d_docs) > 0
    assert n_hits >= 2


def test_near_engine_matches_brute_force(built, engine):
    """search_near (packed-position searchsorted sweeps through the shard
    positions cache) must match the brute-force near_topk exactly,
    including self-NEAR multiplicity and strict-empty on absent terms."""
    from oboyu_ray.pipelines.bm25_batch import near_topk, score_micros

    docs_dir = os.path.join(built["index_dir"], "docs")
    docs_ds = ray.data.read_parquet(docs_dir)
    stats = json.load(open(os.path.join(built["index_dir"], "stats.json")))
    st = {"N": stats["N"], "total_dl": stats["total_dl"], "avgdl": stats["avgdl"]}

    # harvest two co-occurring tokens from a real doc for a guaranteed hit
    tok = get_tokenizer(CFG)
    t = pa.concat_tables(
        [pq.read_table(os.path.join(docs_dir, f))
         for f in sorted(os.listdir(docs_dir))]
    )
    a = b = None
    for text in t.column("text").to_pylist():
        ts = tok.tokenize(text or "")
        if len(ts) >= 4:
            a, b = ts[0], ts[3]
            break
    assert a is not None
    pairs = [(a, b, 5), (a, b, 1), (a, a, 6), (a, "zzznohit", 5)]
    k = 12
    brute = near_topk(docs_ds, pairs, k=k, cfg=CFG, id_col="doc_num",
                      text_col="text", stats=st)
    hits = 0
    for pa_, pb_, w in pairs:
        qid_terms = (tok.tokenize(pa_)[0], tok.tokenize(pb_)[0]) if tok.tokenize(pb_) else None
        qid = f"{qid_terms[0]} NEAR/{w} {qid_terms[1]}" if qid_terms else None
        got = engine.search_near(pa_, pb_, window=w, k=k)
        expect = brute[brute.query_id == qid] if qid else brute.iloc[0:0]
        assert len(got) == len(expect), (pa_, pb_, w)
        assert got["doc_num"].tolist() == expect["doc_num"].tolist(), (pa_, pb_, w)
        if len(got):
            np.testing.assert_array_equal(
                score_micros(got["score"].to_numpy()),
                expect["score_micros"].to_numpy(), err_msg=str((pa_, pb_, w)),
            )
            hits += 1
    assert hits >= 2
    # NEAR hits are a subset of the conjunctive AND candidates
    near_docs = set(engine.search_near(a, b, window=5, k=1000)["doc_num"])
    and_docs = set(engine.search(f"{a} {b}", k=1000, require_all=True)["doc_num"])
    assert near_docs <= and_docs


def test_span_near_engine_matches_brute_force(built, engine):
    """search_span_near (shared greedy latest-predecessor kernel over the
    whole-part positions cache) must be rank- and score-identical to the
    brute span_near_topk; window == m − 1 equals search_phrase; too-small
    windows and absent terms stay strict-empty; span hits ⊆ AND hits."""
    from oboyu_ray.pipelines.bm25_batch import score_micros, span_near_topk

    docs_dir = os.path.join(built["index_dir"], "docs")
    docs_ds = ray.data.read_parquet(docs_dir)
    stats = json.load(open(os.path.join(built["index_dir"], "stats.json")))
    st = {"N": stats["N"], "total_dl": stats["total_dl"], "avgdl": stats["avgdl"]}

    tok = get_tokenizer(CFG)
    t = pa.concat_tables(
        [pq.read_table(os.path.join(docs_dir, f))
         for f in sorted(os.listdir(docs_dir))]
    )
    a = b = c = None
    for text in t.column("text").to_pylist():
        ts = tok.tokenize(text or "")
        if len(ts) >= 5:
            a, b, c = ts[0], ts[2], ts[4]
            break
    assert a is not None
    probes = [
        (f"{a} {b}", 3), (f"{a} {b}", 2), (f"{a} {b} {c}", 4),
        (f"{b} {a}", 6), (f"{a} zzznohit", 8),
    ]
    k = 12
    for phrase, w in probes:
        brute = span_near_topk(docs_ds, [phrase], w, k=k, cfg=CFG,
                               id_col="doc_num", text_col="text", stats=st)
        got = engine.search_span_near(phrase, window=w, k=k)
        assert len(got) == len(brute), (phrase, w)
        assert got["doc_num"].tolist() == brute["doc_num"].tolist(), (phrase, w)
        if len(got):
            np.testing.assert_array_equal(
                score_micros(got["score"].to_numpy()),
                brute["score_micros"].to_numpy(), err_msg=str((phrase, w)),
            )
    # the guaranteed-hit probe must actually hit
    assert len(engine.search_span_near(f"{a} {b} {c}", window=4, k=k)) > 0
    # window == m − 1 ≡ adjacent phrase
    p2 = _phrases_from_corpus(built["index_dir"])[0]
    sp = engine.search_span_near(p2, window=len(p2.split()) - 1, k=k)
    ph = engine.search_phrase(p2, k=k)
    assert sp["doc_num"].tolist() == ph["doc_num"].tolist()
    np.testing.assert_allclose(sp["score"].to_numpy(), ph["score"].to_numpy(),
                               rtol=0, atol=1e-9)
    # unmatchable window → empty without touching shards
    assert engine.search_span_near(f"{a} {b}", window=0, k=k).empty
    # ordered span hits ⊆ conjunctive AND hits
    span_docs = set(engine.search_span_near(f"{a} {b}", window=9, k=1000)["doc_num"])
    and_docs = set(engine.search(f"{a} {b}", k=1000, require_all=True)["doc_num"])
    assert span_docs <= and_docs
    # scope composes
    hi = max(1, int(stats["N"]) // 3)
    s = engine.search_span_near(f"{a} {b}", window=9, k=1000, scope=(0, hi))
    assert ((s["doc_num"] >= 0) & (s["doc_num"] < hi)).all()
    deep = engine.search_span_near(f"{a} {b}", window=9, k=10**6)
    expect = deep[(deep["doc_num"] >= 0) & (deep["doc_num"] < hi)]
    assert s["doc_num"].tolist() == expect["doc_num"].tolist()


def test_cli_span_near_mode(built, engine, capsys):
    """`query --span-near W` drives the ordered-span path end-to-end; the
    page guard refuses it like every non-plain mode."""
    import argparse

    from oboyu_ray.cli import cmd_query

    tok = get_tokenizer(CFG)
    docs_dir = os.path.join(built["index_dir"], "docs")
    t = pq.read_table(os.path.join(docs_dir, sorted(os.listdir(docs_dir))[0]))
    ts = next(
        tok.tokenize(x or "") for x in t.column("text").to_pylist()
        if len(tok.tokenize(x or "")) >= 3
    )
    base = dict(index_dir=built["index_dir"], q=f"{ts[0]} {ts[2]}", k=5,
                num_shards=2, hydrate=False, num_cpus=None)
    rc = cmd_query(argparse.Namespace(**{**base, "span_near": 4}))
    assert rc == 0 and "doc_num" in capsys.readouterr().out
    rc = cmd_query(argparse.Namespace(**{**base, "span_near": 4, "page": 1}))
    assert rc == 2 and "plain search mode" in capsys.readouterr().err


def test_search_phrase_many_matches_single(built, engine):
    """Batched phrase retrieval (one df sweep + one fan-out) must equal the
    single-phrase path per phrase, including dead phrases (absent term /
    tokenizes away) which stay strict-empty."""
    phrases = _phrases_from_corpus(built["index_dir"])
    batched = engine.search_phrase_many(phrases, k=8)
    assert len(batched) == len(phrases)
    for p, got in zip(phrases, batched):
        single = engine.search_phrase(p, k=8)
        assert got["doc_num"].tolist() == single["doc_num"].tolist(), p
        np.testing.assert_allclose(
            got["score"].to_numpy(), single["score"].to_numpy(), rtol=1e-12
        )


def test_phrase_and_near_scope(built, engine):
    """Scoped phrase/NEAR: identical to the deep unscoped result filtered
    to the doc_num interval (deep k captures every match), across a
    part-boundary-straddling scope and an empty scope."""
    import json
    import os

    stats = json.load(open(os.path.join(built["index_dir"], "stats.json")))
    n = int(stats["N"])
    deep = 10_000
    probes = _phrases_from_corpus(built["index_dir"])[:2]
    nonempty = 0
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3 + 5), (n // 2, n // 2)]:
        for phrase in probes:
            full = engine.search_phrase(phrase, k=deep)
            keep = full[(full["doc_num"] >= lo) & (full["doc_num"] < hi)]
            got = engine.search_phrase(phrase, k=12, scope=(lo, hi))
            assert got["doc_num"].tolist() == keep["doc_num"].head(12).tolist(), (
                phrase, lo, hi,
            )
            if len(got):
                nonempty += 1
                np.testing.assert_allclose(
                    got["score"].to_numpy(),
                    keep["score"].head(12).to_numpy(), rtol=1e-12,
                )
        a, b = probes[0].split()[:2]
        full = engine.search_near(a, b, window=4, k=deep)
        keep = full[(full["doc_num"] >= lo) & (full["doc_num"] < hi)]
        got = engine.search_near(a, b, window=4, k=12, scope=(lo, hi))
        assert got["doc_num"].tolist() == keep["doc_num"].head(12).tolist(), (lo, hi)
        nonempty += bool(len(got))
    assert nonempty >= 3
