"""Ranking composition: RRF hybrid combination, score normalizers, result
merging.

Driver-side operators over small top-k frames (ids + scores) — matching the
reference, where these run over ≤ limit×multiplier results
(SURVEY §2-J5/K3/§2.8).  Semantics verified against importlib-loaded
reference classes in tests/test_textproc.py:

* rrf_combine        — Reciprocal Rank Fusion, rrf_k=60 default:
                       S(d) = Σ_lists 1/(k + rank_list(d)), ranks 1-based in
                       list order; reference
                       retriever/search/hybrid_search_combiner.py:56-107.
                       The reference's tie order is accidental (stable sort
                       over dict-insertion order); ``tie_break_ids=True``
                       instead orders ties by ascending id — the documented
                       deterministic choice (SURVEY §2-K4).
* normalize_scores   — min_max / z_score(sigmoid) / rank_based,
                       retriever/search/score_normalizer.py:65-155.
* merge_results      — dedup by id keeping max score (first-seen wins ties),
                       sort desc, limit; retriever/search/result_merger.py:14-55.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd

DEFAULT_RRF_K = 60  # reference config/indexer.py:52


def rrf_combine(
    rankings: Sequence[pd.DataFrame],
    rrf_k: int = DEFAULT_RRF_K,
    limit: int = 10,
    id_col: str = "doc_id",
    tie_break_ids: bool = True,
) -> pd.DataFrame:
    """Combine ranked frames (already in rank order, best first) via RRF.

    Each input frame needs ``id_col``; rank = 1-based row position.  Returns
    (id_col, rrf_score, rank) with rank 1..limit.  With
    ``tie_break_ids=False`` ties keep first-list insertion order exactly like
    the reference's stable sort.
    """
    if rrf_k <= 0:
        raise ValueError("rrf_k must be positive")
    scores: Dict[object, float] = {}
    order: Dict[object, int] = {}
    for frame in rankings:
        for rank, did in enumerate(frame[id_col].tolist(), start=1):
            scores[did] = scores.get(did, 0.0) + 1.0 / (rrf_k + rank)
            order.setdefault(did, len(order))
    if tie_break_ids:
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    else:  # reference-accidental order: stable sort over insertion order
        items = sorted(
            sorted(scores.items(), key=lambda kv: order[kv[0]]),
            key=lambda kv: kv[1],
            reverse=True,
        )
    items = items[:limit]
    return pd.DataFrame(
        {
            id_col: [k for k, _ in items],
            "rrf_score": [v for _, v in items],
            "rank": pd.array(range(1, len(items) + 1), dtype=np.int64),
        }
    )


def normalize_scores(
    frame: pd.DataFrame, method: str = "min_max", score_col: str = "score"
) -> pd.DataFrame:
    """score_normalizer.py semantics, vectorized.

    min_max: (s-min)/(max-min) clamped to [0,1]; degenerate (max==min) →
    unchanged.  z_score: sigmoid((s-mean)/std); std==0 → unchanged.
    rank_based: rows re-sorted desc by score (stable), i-th gets (n-i)/n.
    """
    if frame.empty:
        return frame
    s = frame[score_col].to_numpy(dtype=np.float64)
    if method == "min_max":
        lo, hi = s.min(), s.max()
        if hi == lo:
            return frame
        out = frame.copy()
        out[score_col] = np.clip((s - lo) / (hi - lo), 0.0, 1.0)
        return out
    if method == "z_score":
        mu, sd = s.mean(), s.std()
        if sd == 0:
            return frame
        out = frame.copy()
        out[score_col] = 1.0 / (1.0 + np.exp(-(s - mu) / sd))
        return out
    if method == "rank_based":
        n = len(frame)
        order = np.argsort(-s, kind="stable")
        out = frame.iloc[order].copy()
        out[score_col] = (n - np.arange(n)) / n
        return out.reset_index(drop=True)
    raise ValueError(f"unknown normalization method: {method}")


def merge_results(
    *frames: pd.DataFrame,
    limit: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> pd.DataFrame:
    """result_merger.py:14-55: keep max score per id (strictly-greater
    replaces, so the FIRST list wins score ties), stable sort desc, limit."""
    best: Dict[object, Tuple[float, int, dict]] = {}
    seq = 0
    for frame in frames:
        for row in frame.to_dict("records"):
            did = row[id_col]
            if did not in best or row[score_col] > best[did][0]:
                best[did] = (row[score_col], seq if did not in best else best[did][1], row)
            seq += 1
    rows = sorted(best.values(), key=lambda v: v[1])  # insertion order …
    rows = sorted(rows, key=lambda v: -v[0])  # … then stable desc by score
    return pd.DataFrame([r for _, _, r in rows[:limit]])
