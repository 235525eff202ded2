"""Load the reference implementation (read-only, /root/reference) as a
conformance oracle via importlib, with a minimal fake package tree so none of
the reference's heavy dependencies are needed.

Without fugashi (true in this sandbox) both the reference and our engine
select the regex FallbackTokenizer (reference tokenizer.py:327-359), so all
oracle comparisons are apples-to-apples.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from datetime import datetime
from functools import lru_cache

REF = "/root/reference/src/oboyu"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@lru_cache(maxsize=1)
def load_reference():
    """Returns a namespace with BM25Indexer, TokenizerService, create_tokenizer,
    Chunk, and a make_chunk helper."""
    for pkg in (
        "oboyu",
        "oboyu.common",
        "oboyu.common.services",
        "oboyu.common.types",
        "oboyu.indexer",
        "oboyu.indexer.algorithm",
    ):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m

    _load("oboyu.common.stop_words", f"{REF}/common/stop_words.py")
    tok = _load("oboyu.common.services.tokenizer", f"{REF}/common/services/tokenizer.py")
    sys.modules["oboyu.common.services"].TokenizerService = tok.TokenizerService
    sys.modules["oboyu.common.services"].create_tokenizer = tok.create_tokenizer
    chunk_mod = _load("oboyu.common.types.chunk", f"{REF}/common/types/chunk.py")
    sys.modules["oboyu.common.types"].Chunk = chunk_mod.Chunk
    _load(
        "oboyu.indexer.algorithm.bm25_statistics_calculator",
        f"{REF}/indexer/algorithm/bm25_statistics_calculator.py",
    )
    _load(
        "oboyu.indexer.algorithm.inverted_index_builder",
        f"{REF}/indexer/algorithm/inverted_index_builder.py",
    )
    _load(
        "oboyu.indexer.algorithm.term_frequency_analyzer",
        f"{REF}/indexer/algorithm/term_frequency_analyzer.py",
    )
    bm = _load("oboyu.indexer.algorithm.bm25_indexer", f"{REF}/indexer/algorithm/bm25_indexer.py")

    ns = types.SimpleNamespace()
    ns.BM25Indexer = bm.BM25Indexer
    ns.TokenizerService = tok.TokenizerService
    ns.create_tokenizer = tok.create_tokenizer
    ns.FallbackTokenizer = tok.FallbackTokenizer
    ns.HAS_JAPANESE_TOKENIZER = tok.HAS_JAPANESE_TOKENIZER
    ns.Chunk = chunk_mod.Chunk

    def make_chunk(id: str, content: str):
        return chunk_mod.Chunk(
            id=id,
            path="/p",
            title="t",
            content=content,
            chunk_index=0,
            language="ja",
            created_at=datetime(2020, 1, 1),
            modified_at=datetime(2020, 1, 1),
            metadata={},
        )

    ns.make_chunk = make_chunk
    return ns


@lru_cache(maxsize=1)
def load_reference_retrieval():
    """Load the reference's retrieval-side text/ranking operators
    (DocumentChunker, SnippetExtractor, TextHighlighter, ScoreNormalizer,
    HybridSearchCombiner, ResultMerger) with a plain fake SearchResult
    (pydantic's [0,1] score clamp would reject synthetic fixture scores;
    the loaded modules only read/construct attributes)."""
    for pkg in (
        "oboyu",
        "oboyu.common",
        "oboyu.common.types",
        "oboyu.retriever",
        "oboyu.retriever.search",
        "oboyu.indexer",
        "oboyu.indexer.core",
    ):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m

    class FakeSearchResult:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __repr__(self):  # pragma: no cover
            return f"FakeSearchResult({self.__dict__})"

    sys.modules["oboyu.common.types"].SearchResult = FakeSearchResult

    chunker = _load("oboyu.indexer.core.document_chunker", f"{REF}/indexer/core/document_chunker.py")
    snip = _load("oboyu.retriever.search.snippet_extractor", f"{REF}/retriever/search/snippet_extractor.py")
    hl = _load("oboyu.retriever.search.text_highlighter", f"{REF}/retriever/search/text_highlighter.py")
    norm = _load("oboyu.retriever.search.score_normalizer", f"{REF}/retriever/search/score_normalizer.py")
    comb = _load("oboyu.retriever.search.hybrid_search_combiner", f"{REF}/retriever/search/hybrid_search_combiner.py")
    merg = _load("oboyu.retriever.search.result_merger", f"{REF}/retriever/search/result_merger.py")
    # snippet strategy stack (relative imports resolve through sys.modules)
    stypes = _load("oboyu.retriever.search.snippet_types", f"{REF}/retriever/search/snippet_types.py")
    jproc = _load(
        "oboyu.retriever.search.japanese_snippet_processor",
        f"{REF}/retriever/search/japanese_snippet_processor.py",
    )
    ctx = _load("oboyu.retriever.search.context_provider", f"{REF}/retriever/search/context_provider.py")
    strat = _load("oboyu.retriever.search.snippet_strategies", f"{REF}/retriever/search/snippet_strategies.py")

    ns = types.SimpleNamespace()
    ns.SnippetConfig = stypes.SnippetConfig
    ns.SnippetMatch = stypes.SnippetMatch
    ns.JapaneseSnippetProcessor = jproc.JapaneseSnippetProcessor
    ns.ContextProvider = ctx.ContextProvider
    ns.FixedLengthStrategy = strat.FixedLengthStrategy
    ns.SentenceBoundaryStrategy = strat.SentenceBoundaryStrategy
    ns.ParagraphBoundaryStrategy = strat.ParagraphBoundaryStrategy
    ns.DocumentChunker = chunker.DocumentChunker
    ns.SnippetExtractor = snip.SnippetExtractor
    ns.TextHighlighter = hl.TextHighlighter
    ns.ScoreNormalizer = norm.ScoreNormalizer
    ns.NormalizationMethod = norm.NormalizationMethod
    ns.HybridSearchCombiner = comb.HybridSearchCombiner
    ns.ResultMerger = merg.ResultMerger
    ns.SearchResult = FakeSearchResult

    def make_result(chunk_id: str, score: float):
        return FakeSearchResult(
            chunk_id=chunk_id,
            path="/p",
            title="t",
            content="c",
            chunk_index=0,
            language="ja",
            metadata={},
            score=score,
        )

    ns.make_result = make_result
    return ns


def reference_topk(indexer, query_terms, k):
    """Score every indexed document with the reference's own score() method and
    return the top-k as [(doc_id, score)] ordered by (score DESC, doc_id ASC).

    The reference itself has no batch top-k API (its live search path is a
    degenerate LIKE filter — database_search_service.py:105-161); ranking its
    exact per-document scores is the semantics the north rule pins.
    """
    # rebuild per-doc term frequencies from the reference's own inverted index
    tf_by_doc: dict[str, dict[str, int]] = {}
    for term, postings in indexer.inverted_index.items():
        for entry in postings:
            doc_id, tf = entry[0], entry[1]
            tf_by_doc.setdefault(doc_id, {})[term] = tf
    scored = []
    for doc_id in indexer.document_lengths:
        s = indexer.score(query_terms, doc_id, tf_by_doc.get(doc_id, {}))
        scored.append((doc_id, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
