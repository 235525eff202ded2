"""Engine configuration.

Defaults mirror the reference's live BM25 indexing configuration
(``/root/reference/src/oboyu/indexer/algorithm/bm25_indexer.py:32-37`` and
``config/indexer.py:52-61``): k1=1.2, b=0.75, min_token_length=2,
min_doc_frequency=1 (stored but unenforced in the reference — kept off here
for rank-identity).

``use_stopwords=True`` is a deliberate correction of SURVEY §2-M13:
although ``BM25Indexer(use_stopwords=False)`` is the constructor default
(bm25_indexer.py:36), the statistics/index path never uses that tokenizer —
``index_chunks`` tokenizes through ``TermFrequencyAnalyzer`` built from
``TokenizerService(language, {"min_token_length": ...})``
(bm25_indexer.py:82), whose ``_create_tokenizer`` defaults
``use_stopwords=True`` (tokenizer.py:333,337-338).  The query path does the
same (retriever/orchestrators/service_registry.py:75-80).  So the LIVE
conformance semantics filter DEFAULT_JAPANESE_STOP_WORDS on both sides;
verified empirically against the reference oracle in
tests/test_bm25_conformance.py.

Scale knobs (ours; no reference equivalent — the reference is a
single-process in-memory engine):

* partitioning — the partition unit is the input file group
  (``build_index(files_per_part=…)``); at 10^12 turns with ~256k turns per
  file the build is ~4M independent partition tasks, and each partition's
  postings stay partition-local (document-partitioned index → no all-to-all
  shuffle of posting rows, see ``pipelines/build_index.py``).
* ``window_docs`` — width (in dense doc ordinals) of an aligned posting
  block/window.  All terms' blocks share window boundaries, which makes
  block-max pruning a vectorized per-window bound instead of per-cursor
  pointer chasing, and doubles as the skip structure (a query seeks directly
  to surviving windows).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75
    min_token_length: int = 2
    use_stopwords: bool = True
    language: str = "ja"
    # enforced only if > 1; reference stores it but never enforces
    min_doc_frequency: int = 1
    # "default" = reference-conformant selection (MeCab when available,
    # regex fallback otherwise); "ngram" = character-bigram CJK runs
    # (recall for glued Japanese compounds; NOT rank-comparable with the
    # reference — an optional mode, recorded in the index lineage)
    tokenizer_mode: str = "default"


@dataclass(frozen=True)
class BuildConfig:
    bm25: BM25Config = field(default_factory=BM25Config)
    # the partition unit is the input FILE GROUP (build_index files_per_part
    # — log-structured transcript stores control file sizing upstream);
    # a partition is the unit of checkpointing, of shard assignment, and of
    # the per-partition build tasks
    window_docs: int = 8_192
    # vocabulary aggregation: term partials are hash-bucketed (stable crc32)
    # into this many disjoint buckets at tokenize time; one task per bucket
    # then does a C++ (pyarrow) group_by — a deterministic file-based
    # two-phase aggregation instead of a Ray Data groupby shuffle (measured
    # ~30x faster at sandbox scale, and each bucket is an independent,
    # checkpointable unit).  At 10^6+ partitions add a combiner tree level
    # (partials-of-partials per partition range) to bound files per bucket.
    vocab_buckets: int = 32
    # opt-in positional index (reference BM25Indexer(store_positions=True),
    # bm25_indexer.py:38 — the reference allocates the slot but never fills
    # or reads it; here it is real): postings carry per-(term, doc) token
    # positions (indices in the FILTERED token stream) and blocks gain a
    # delta+varint positions payload, enabling exact phrase retrieval
    # (QueryEngine.search_phrase).  Costs ~1 varint per token occurrence;
    # default off so the non-phrase build is byte-identical to before.
    store_positions: bool = False


DEFAULT_BUILD_CONFIG = BuildConfig()
