"""Posting extraction stages: text columns → posting rows, vectorized per batch.

Semantics (reference parity):
* term frequencies = ``Counter(tokenize(text))`` per document
  (reference term_frequency_analyzer.py:27-37, tokenizer.py:221-229);
* document length ``dl`` = sum of term frequencies AFTER tokenization
  (reference bm25_statistics_calculator.py:73-77) — empty/stopword-only docs
  have dl=0 and emit no posting rows but still count toward N;
* posting uniqueness per (term, doc) holds by construction (one Counter per
  doc — reference schema.py:125's unique index is implicit here).

The batch functions are pure (module-level tokenizer cache; no per-batch
setup) and Arrow-in/Arrow-out so Ray Data runs them zero-copy as stateless
tasks.  ``dl`` is baked into each posting row at build time — the design
choice for J1 in SURVEY §2.4: scoring then needs no doc-side join, only the
broadcast scalars (N, avgdl) and per-term df.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pyarrow as pa

from oboyu_ray.config import BM25Config
from oboyu_ray.functions.tokenize import create_tokenizer

_TOKENIZER_CACHE: Dict[Tuple, object] = {}


def get_tokenizer(cfg: BM25Config):
    """Per-process tokenizer singleton (compiled regex shared across batches)."""
    key = (cfg.language, cfg.min_token_length, cfg.use_stopwords, cfg.tokenizer_mode)
    tok = _TOKENIZER_CACHE.get(key)
    if tok is None:
        tok = create_tokenizer(
            language=cfg.language,
            min_token_length=cfg.min_token_length,
            use_stopwords=cfg.use_stopwords,
            mode=cfg.tokenizer_mode,
        )
        _TOKENIZER_CACHE[key] = tok
    return tok


POSTINGS_FIELDS = ("term", "tf", "dl")


def postings_batch(
    batch: pa.Table,
    cfg: BM25Config = BM25Config(),
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_id_cols: Tuple[str, ...] = (),
) -> pa.Table:
    """(id, text) rows → (id, term, tf, dl) posting rows.

    One output row per unique (doc, term); docs tokenizing to nothing emit no
    rows.  tf/dl are int64 so results align with SQL-oracle BIGINT columns.
    """
    tok = get_tokenizer(cfg)
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    per_doc = [tok.get_term_frequencies(t or "") for t in texts]
    counts = [len(d) for d in per_doc]

    out_terms: list = []
    out_tf: list = []
    out_dl: list = []
    for d in per_doc:
        if d:
            dl = sum(d.values())
            out_terms.extend(d.keys())
            out_tf.extend(d.values())
            out_dl.extend([dl] * len(d))

    cols = {}
    names = []
    for c in (id_col, *extra_id_cols):
        src = batch.column(c)
        idx = pa.array(
            [i for i in range(n) for _ in range(counts[i])], type=pa.int64()
        )
        cols[c] = src.take(idx)
        names.append(c)
    cols["term"] = pa.array(out_terms, type=pa.string())
    cols["tf"] = pa.array(out_tf, type=pa.int64())
    cols["dl"] = pa.array(out_dl, type=pa.int64())
    return pa.table(cols)


def doc_stats_batch(
    batch: pa.Table,
    cfg: BM25Config = BM25Config(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """(id, text) rows → (id, dl, unique_terms), one row per doc INCLUDING
    empty docs (dl=0) — the reference counts every chunk toward N/avgdl
    (bm25_statistics_calculator.py:64-77)."""
    tok = get_tokenizer(cfg)
    texts = batch.column(text_col).to_pylist()
    dls = []
    uniqs = []
    for t in texts:
        d = tok.get_term_frequencies(t or "")
        dls.append(sum(d.values()))
        uniqs.append(len(d))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "dl": pa.array(dls, type=pa.int64()),
            "unique_terms": pa.array(uniqs, type=pa.int64()),
        }
    )


def term_partials_batch(postings: pa.Table) -> pa.Table:
    """In-batch partial aggregation for the vocabulary build: posting rows →
    (term, df_partial, cf_partial).  Pre-aggregating inside map_batches keeps
    the global groupby('term') shuffle proportional to (partitions × local
    vocabulary), not to total postings — the skew/scale treatment for A1/A2
    in SURVEY §2.5 (hot terms contribute ONE partial row per batch instead of
    one row per document)."""
    if postings.num_rows == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df_partial": pa.array([], type=pa.int64()),
                "cf_partial": pa.array([], type=pa.int64()),
            }
        )
    g = postings.group_by("term").aggregate([("tf", "count"), ("tf", "sum")])
    return pa.table(
        {
            "term": g.column("term"),
            "df_partial": g.column("tf_count").cast(pa.int64()),
            "cf_partial": g.column("tf_sum").cast(pa.int64()),
        }
    )
