"""Enrichment pipeline tests: extraction-method semantics verified against
the importlib-loaded reference strategy class, plus an end-to-end enrich
over the transcript BM25 engine."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from oboyu_ray.pipelines import enrichment


@pytest.fixture(scope="module")
def ref_strategy():
    """Load the reference SearchContentStrategy (its helpers are sync and
    dependency-free; the async search entry is not exercised)."""
    import importlib.util

    for pkg in ("oboyu", "oboyu.application", "oboyu.application.enrichment"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    base = "/root/reference/src/oboyu/application/enrichment"
    for name, fname in (
        ("oboyu.application.enrichment.protocols", "protocols.py"),
        ("oboyu.application.enrichment.extraction_strategies", "extraction_strategies.py"),
    ):
        spec = importlib.util.spec_from_file_location(name, f"{base}/{fname}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return mod.SearchContentStrategy(None, 5, 0.5)


CONTENTS = [
    "これは日本語の文章です。二つ目の文。",
    "An English sentence. Another one follows!",
    "",
    "短い",
    "No sentence ending here just a long run of words " * 10,
    "数字123と英語mixedの content. 続き。",
]


def test_first_sentence_matches_reference(ref_strategy):
    for c in CONTENTS:
        assert enrichment.extract_first_sentence(c) == ref_strategy._extract_first_sentence(c), c[:30]


def test_first_result_matches_reference(ref_strategy):
    for c in CONTENTS:
        assert enrichment.extract_first_result(c) == ref_strategy._extract_first_result(
            {"content": c}
        )


def test_pattern_match_matches_reference(ref_strategy):
    results = [{"content": c} for c in CONTENTS]
    contents = CONTENTS
    for pattern in (r"\d+", r"[a-z]+", r"日本語", r"zzz_nomatch"):
        assert enrichment.extract_by_pattern(contents, pattern) == ref_strategy._extract_by_pattern(
            results, pattern
        )


def test_query_template_formatting():
    row = {"company": "トヨタ", "year": 2024, "missing": None}
    assert (
        enrichment.format_query_template("{company} 概要 {year}", row)
        == "トヨタ 概要 2024"
    )
    assert enrichment.format_query_template("{missing}x", row) == "x"
    assert enrichment.format_query_template("{unknown}", row) == "{unknown}"


def test_enrich_dataframe_end_to_end():
    """Enrich a small frame against a deterministic fake corpus search."""
    corpus = {
        "alpha": pd.DataFrame(
            {"text": ["alpha facts. more alpha.", "alpha again"], "score": [3.0, 1.0]}
        ),
        "beta": pd.DataFrame({"text": ["beta only result."], "score": [2.0]}),
    }

    def search_fn(query: str, k: int) -> pd.DataFrame:
        for key, frame in corpus.items():
            if key in query:
                return frame.head(k)
        return pd.DataFrame({"text": [], "score": []})

    df = pd.DataFrame({"name": ["alpha", "beta", "gamma"]})
    schema = {
        "enrichment_schema": {
            "columns": {
                "description": {
                    "query_template": "{name} description",
                    "source_strategy": "search_content",
                    "extraction_method": "first_sentence",
                }
            }
        }
    }
    out = enrichment.enrich_dataframe(df, schema, search_fn)
    assert out["description"].tolist()[0] == "alpha facts."
    # single-result frames min-max normalize degenerately (score unchanged,
    # above threshold when raw >= tau is irrelevant — unchanged 2.0 >= 0.5)
    assert out["description"].tolist()[1] == "beta only result."
    assert out["description"].tolist()[2] is None  # no hits


def test_enrich_with_bm25_engine(tmp_path):
    """End-to-end over the real engine: build a tiny index and enrich."""
    from oboyu_ray.config import BuildConfig
    from oboyu_ray.pipelines.build_index import build_index
    from oboyu_ray.pipelines.enrichment import enrich_dataframe, make_bm25_search_fn
    from oboyu_ray.pipelines.query import QueryEngine
    from oboyu_ray.sources.transcripts import write_synth_transcripts

    files = write_synth_transcripts(str(tmp_path / "t"), n_convs=80, seed=5, convs_per_file=40)
    index_dir = str(tmp_path / "idx")
    build_index(files, index_dir, BuildConfig(window_docs=256), files_per_part=1)
    engine = QueryEngine(index_dir, num_shards=2)

    df = pd.DataFrame({"topic": ["検索", "python", "zzznohit"]})
    schema = {
        "enrichment_schema": {
            "columns": {
                "context": {
                    "query_template": "{topic}",
                    "source_strategy": "search_content",
                    "extraction_method": "first_result",
                }
            }
        }
    }
    out = enrich_dataframe(df, schema, make_bm25_search_fn(engine))
    engine.close()
    assert out["context"].iloc[0] is not None and "検索" in out["context"].iloc[0]
    assert out["context"].iloc[1] is not None
    assert out["context"].iloc[2] is None
