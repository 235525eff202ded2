"""Collection statistics over Ray Datasets.

Reference semantics (bm25_statistics_calculator.py):
* df(term)  = number of documents containing the term        (:79-81)
* cf(term)  = total occurrences of the term                  (:83-85)
* N         = number of documents (empty docs included)      (:77)
* total_dl  = sum of document lengths                        (:76)
* avgdl     = total_dl / N                                   (:123-132)
* idf(term) = ln((N - df + 0.5) / (df + 0.5))                (:178) —
  deliberately WITHOUT the Lucene +1: idf goes NEGATIVE for terms in more
  than half the documents, asserted as correct by the reference's own tests
  (tests/indexer/algorithm/test_bm25_statistics_calculator.py:150-160).
"""

from __future__ import annotations

import math
from typing import Dict

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from oboyu_ray.config import BM25Config
from oboyu_ray.stages.postings import doc_stats_batch, term_partials_batch


def idf(df: int, n_docs: int) -> float:
    """BM25 IDF — reference bm25_statistics_calculator.py:178 (no +1; may be
    negative).  df=0 → 0.0 by convention (:173-175)."""
    if df <= 0:
        return 0.0
    return math.log((n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf, dl, idf_value: float, avgdl: float, k1: float, b: float):
    """Per-(term, doc) BM25 contribution — reference
    bm25_statistics_calculator.py:183-187.  Vectorizes over numpy arrays."""
    return idf_value * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))


def vocabulary(postings_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """postings (…, term, tf, dl) → vocabulary (term, df, cf).

    Two-level aggregation: vectorized in-batch partials (term_partials_batch)
    followed by a small groupby('term') over the partials — the only
    term-keyed shuffle in the engine, and its input is bounded by
    (#blocks × per-block vocabulary), not by total posting rows.
    """
    partials = postings_ds.map_batches(term_partials_batch, batch_format="pyarrow")
    agg = partials.groupby("term").aggregate(
        Sum("df_partial", alias_name="df"), Sum("cf_partial", alias_name="cf")
    )
    return agg


def term_dfs(postings_ds: "ray.data.Dataset") -> Dict[str, int]:
    """df for a SMALL term set (e.g. one query's terms): in-batch partials
    stream back and combine driver-side — same result as ``vocabulary`` with
    none of the groupby machinery.  Use only when the distinct-term count is
    driver-small (query terms, not corpus vocabulary)."""
    out: Dict[str, int] = {}
    partials = postings_ds.map_batches(term_partials_batch, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        for t, d in zip(b.column("term").to_pylist(), b.column("df_partial").to_pylist()):
            out[t] = out.get(t, 0) + int(d)
    return out


def collection_stats(docs_ds: "ray.data.Dataset", cfg: BM25Config = BM25Config(),
                     id_col: str = "doc_id", text_col: str = "text") -> Dict[str, float]:
    """Global scalars {N, total_dl, avgdl} — a streaming aggregate, no shuffle."""
    ds = docs_ds.map_batches(
        lambda b: doc_stats_batch(b, cfg, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    agg = ds.aggregate(Count(), Sum("dl", alias_name="total_dl"))
    n = int(agg["count()"])
    total_dl = int(agg["total_dl"] or 0)
    return {
        "N": n,
        "total_dl": total_dl,
        "avgdl": (total_dl / n) if n else 0.0,
    }
