"""Dataset-native brute-force BM25 scoring — the rank-identity baseline.

This is the M3 "exact scorer" of SURVEY §7: a pure Ray Data expression of
BM25 top-k (filter postings to query terms → per-batch complete (query, doc)
scores — a doc's postings never cross batch boundaries, so there is NO
global groupby shuffle — → per-query top-k).  The sharded WAND engine
(state/shards.py) must return exactly these results; the driver's DuckDB
oracle checks this pipeline's output SQL-side.

Candidate semantics: a document is ranked iff it contains at least one query
term (classic document-at-a-time retrieval over the inverted index).  The
reference's ``BM25Indexer.score`` (bm25_indexer.py:310-341) scores any given
doc; docs with no query terms score 0 and are never surfaced by an
inverted-index traversal, so the candidate set is the union of the query
terms' posting lists.

Scores are float64 summed per (query, doc); ``topk`` additionally emits
``score_micros = floor(score * 1e6 + 0.5)`` as int64 and ranks by
(score_micros DESC, doc ASC) so results are bit-stable across summation
orders and comparable against SQL oracles.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from oboyu_ray.config import BM25Config
from oboyu_ray.stages.postings import get_tokenizer, postings_batch
from oboyu_ray.stages.stats import bm25_term_score, collection_stats, idf, term_dfs


def tokenize_queries(queries: Sequence[str], cfg: BM25Config = BM25Config()) -> Dict[str, List[str]]:
    """Query string → term list via the same tokenizer as indexing
    (reference tokenize_query == tokenize, tokenizer.py:374-376)."""
    tok = get_tokenizer(cfg)
    return {q: tok.tokenize(q) for q in queries}


def score_micros(scores: np.ndarray) -> np.ndarray:
    """floor(score*1e6 + 0.5) as int64 via the shared fixed-point helper —
    identical expression used in the DuckDB oracle SQL."""
    from oboyu_ray.fixedpoint import micros

    return np.atleast_1d(micros(scores))


def query_postings(
    docs_ds: "ray.data.Dataset",
    terms: Sequence[str],
    cfg: BM25Config = BM25Config(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Postings restricted to the given terms (still over ALL docs)."""
    term_set = pa.array(sorted(set(terms)), type=pa.string())

    def extract(batch: pa.Table) -> pa.Table:
        p = postings_batch(batch, cfg, id_col=id_col, text_col=text_col)
        return p.filter(pc.is_in(p.column("term"), value_set=term_set))

    return docs_ds.map_batches(extract, batch_format="pyarrow")


def brute_force_scores(
    docs_ds: "ray.data.Dataset",
    queries: Dict[str, List[str]],
    cfg: BM25Config = BM25Config(),
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: Dict[str, float] | None = None,
) -> pd.DataFrame:
    """Exact BM25 scores for every (query, candidate doc) pair.

    Returns a pandas DataFrame (query_id, <id_col>, score) — small output
    (candidates only).  ``stats`` may be passed to avoid recomputing the
    global N/avgdl pass.
    """
    if stats is None:
        stats = collection_stats(docs_ds, cfg, id_col=id_col, text_col=text_col)
    n_docs, avgdl = int(stats["N"]), float(stats["avgdl"])

    all_terms = sorted({t for ts in queries.values() for t in ts})
    if not all_terms or n_docs == 0:
        return pd.DataFrame({"query_id": [], id_col: [], "score": []})

    qp = query_postings(docs_ds, all_terms, cfg, id_col=id_col, text_col=text_col)

    # df for the query terms — in-batch partials combined driver-side (the
    # term set is query-small; a groupby shuffle here is pure overhead)
    df_map = term_dfs(qp)
    idf_map = {t: idf(int(df_map.get(t, 0)), n_docs) for t in all_terms}

    # per-query term weights: idf × multiplicity (reference sums per query
    # term occurrence — bm25_indexer.py:332; duplicate query terms count
    # multiply)
    weights: Dict[str, Dict[str, float]] = {}
    for qid, terms in queries.items():
        w: Dict[str, float] = {}
        for t in terms:
            if df_map.get(t, 0) > 0:
                w[t] = w.get(t, 0.0) + idf_map[t]
        if w:
            weights[qid] = w

    k1, b = cfg.k1, cfg.b

    term_set = pa.array(sorted(set(all_terms)), type=pa.string())

    def score_docs(batch: pa.Table) -> pa.Table:
        # STRUCTURAL per-doc completeness: this single function tokenizes a
        # batch of DOCS and scores their postings in place, so a document's
        # (query, doc) sum can never be split across batches regardless of
        # how Ray re-batches upstream data — no global groupby shuffle
        p = postings_batch(batch, cfg, id_col=id_col, text_col=text_col)
        pdf = p.filter(pc.is_in(p.column("term"), value_set=term_set)).to_pandas()
        frames = []
        for qid, w in weights.items():
            sub = pdf[pdf["term"].isin(w.keys())]
            if sub.empty:
                continue
            iw = sub["term"].map(w).to_numpy(dtype=np.float64)
            tf = sub["tf"].to_numpy(dtype=np.float64)
            dl = sub["dl"].to_numpy(dtype=np.float64)
            contrib = bm25_term_score(tf, dl, 1.0, avgdl, k1, b) * iw
            g = (
                pd.DataFrame({id_col: sub[id_col].to_numpy(), "contrib": contrib})
                .groupby(id_col, sort=True)["contrib"]
                .sum()
                .reset_index()
            )
            g.insert(0, "query_id", qid)
            frames.append(g.rename(columns={"contrib": "score"}))
        if not frames:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.string()),
                    id_col: pa.array([], type=batch.schema.field(id_col).type),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

    return docs_ds.map_batches(score_docs, batch_format="pyarrow").to_pandas()


def brute_force_topk(
    docs_ds: "ray.data.Dataset",
    queries: Dict[str, List[str]],
    k: int = 10,
    cfg: BM25Config = BM25Config(),
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: Dict[str, float] | None = None,
) -> pd.DataFrame:
    """Top-k per query: (query_id, <id_col>, score_micros, rank), ranked by
    (score_micros DESC, doc ASC) — deterministic across engines."""
    pdf = brute_force_scores(docs_ds, queries, cfg, id_col=id_col, text_col=text_col, stats=stats)
    if pdf.empty:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype=object), id_col: pd.Series(dtype=np.int64),
             "score_micros": pd.Series(dtype=np.int64), "rank": pd.Series(dtype=np.int64)}
        )
    pdf = pdf.copy()
    pdf["score_micros"] = score_micros(pdf["score"].to_numpy())
    pdf = pdf.sort_values(
        ["query_id", "score_micros", id_col], ascending=[True, False, True], kind="mergesort"
    )
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    out = pdf[pdf["rank"] <= k][["query_id", id_col, "score_micros", "rank"]]
    out = out.reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out
