"""Stateful query-side index shards: exact top-k BM25 with aligned-window
block-max pruning (our block-max WAND variant).

Each shard actor loads the compressed posting blocks of a set of document
partitions once (actor ``__init__`` — the T7 stateful stage of SURVEY §2.3)
and answers top-k queries over ITS documents completely: because the index
is document-partitioned, a shard computes full multi-term scores locally and
the driver's per-shard top-k merge is exact.

Pruning (safe, exact — results equal brute force by construction):
1. All terms' blocks share window boundaries (win = doc_num // window_docs),
   so the per-window score upper bound is a vectorized scatter-add over each
   query term's (win → signed block bound) arrays.  The signed bound of a
   block is ``idf ≥ 0 ? idf·max_tfnorm : idf·min_tfnorm`` — negative-IDF
   terms (df > N/2, reference-legal) contribute their least-negative value.
   Windows a term is absent from contribute 0, which is ≥ that term's
   contribution for every doc there (0 for non-matching docs; for matching
   docs the term has a block, contradiction) — hence a true upper bound.
2. Windows are processed in DESCENDING upper-bound order (MaxScore-style
   ordering on top of block-max WAND); once the bound of the next window is
   strictly below the current k-th best score θ, every remaining window is
   pruned.  Equal-to-θ windows are still processed so (score DESC, doc ASC)
   tie-breaking stays exact.
3. Surviving windows are scored exactly and fully vectorized: decode the ≤|q|
   blocks (numpy varint+cumsum, state/codec.py), scatter-add contributions
   into a dense window-local accumulator, lexsort-merge candidates into the
   running top-k.

The block table itself is the skip structure (window granularity): a query
touches only the block rows of surviving windows and never iterates postings
in Python.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow.parquet as pq

from oboyu_ray.state.codec import varint_decode

NEG_INF = float("-inf")


class _PartIndex:
    """In-memory image of one partition's block table."""

    __slots__ = ("terms", "win", "n", "docs", "tfs", "dls", "max_tfnorm",
                 "min_tfnorm", "term_slices", "n_windows", "win_base")

    def __init__(self, blocks_path: str, window_docs: int) -> None:
        t = pq.read_table(blocks_path)
        self.terms = t.column("term").to_pylist()
        self.win = t.column("win").to_numpy().astype(np.int64)
        self.n = t.column("n").to_numpy()
        docs_col = t.column("docs").combine_chunks()
        tfs_col = t.column("tfs").combine_chunks()
        dls_col = t.column("dls").combine_chunks()
        self.docs = docs_col
        self.tfs = tfs_col
        self.dls = dls_col
        self.max_tfnorm = t.column("max_tfnorm").to_numpy()
        self.min_tfnorm = t.column("min_tfnorm").to_numpy()
        # term → contiguous block-row slice (blocks sorted by term, win)
        self.term_slices: Dict[str, Tuple[int, int]] = {}
        i = 0
        nrows = len(self.terms)
        while i < nrows:
            j = i + 1
            term = self.terms[i]
            while j < nrows and self.terms[j] == term:
                j += 1
            self.term_slices[term] = (i, j)
            i = j
        if nrows:
            self.win_base = int(self.win.min())
            self.n_windows = int(self.win.max()) - self.win_base + 1
        else:
            self.win_base = 0
            self.n_windows = 0


def _merge_topk(
    cur_docs: np.ndarray, cur_scores: np.ndarray,
    new_docs: np.ndarray, new_scores: np.ndarray, k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    docs = np.concatenate((cur_docs, new_docs))
    scores = np.concatenate((cur_scores, new_scores))
    order = np.lexsort((docs, -scores))[:k]
    return docs[order], scores[order]


class IndexShard:
    """Actor serving top-k BM25 for a set of document partitions.

    Constructed once per actor (block tables + dl arrays resident); queries
    pass the per-term weights (idf × query multiplicity) computed by the
    driver from the vocabulary, so shards hold no global state beyond their
    own partitions.
    """

    def __init__(self, index_dir: str, part_ids: List[int], window_docs: int) -> None:
        self.window_docs = window_docs
        self.parts: List[_PartIndex] = []
        for pid in part_ids:
            path = os.path.join(index_dir, "blocks", f"blocks-{pid:05d}.parquet")
            self.parts.append(_PartIndex(path, window_docs))

    def query(
        self, term_weights: Dict[str, float], k: int, theta0: float = NEG_INF
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k over this shard's docs.  ``term_weights`` maps term →
        idf × multiplicity.  Returns (doc_nums, scores) sorted by
        (score DESC, doc ASC), at most k rows."""
        W = self.window_docs
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        theta = theta0

        for part in self.parts:
            hits = [
                (w, *part.term_slices[t])
                for t, w in term_weights.items()
                if t in part.term_slices
            ]
            if not hits:
                continue
            # sparse per-window upper bound (signed block-max), only over
            # windows where at least one query term has a block
            all_wins = np.concatenate([part.win[s:e] for _, s, e in hits])
            uniq_wins, inv = np.unique(all_wins, return_inverse=True)
            ub = np.zeros(len(uniq_wins), dtype=np.float64)
            pos = 0
            for w, s, e in hits:
                m = e - s
                bound = part.max_tfnorm[s:e] if w >= 0 else part.min_tfnorm[s:e]
                np.add.at(ub, inv[pos : pos + m], w * bound)
                pos += m
            # process in descending-bound order; prune the strict tail
            order = np.argsort(-ub, kind="stable")
            for oi in order:
                bound = ub[oi]
                if len(top_docs) >= k and bound < theta:
                    break  # strict <: equal-bound windows still processed
                win_abs = int(uniq_wins[oi])
                acc = np.zeros(W, dtype=np.float64)
                present = np.zeros(W, dtype=bool)
                base = win_abs * W
                for w, s, e in hits:
                    # binary search this term's block row for the window
                    bi = s + int(np.searchsorted(part.win[s:e], win_abs))
                    if bi >= e or part.win[bi] != win_abs:
                        continue
                    gaps = varint_decode(part.docs[bi].as_py())
                    local = np.cumsum(gaps.astype(np.int64))
                    tf = varint_decode(part.tfs[bi].as_py()).astype(np.float64)
                    dl = varint_decode(part.dls[bi].as_py()).astype(np.float64)
                    contrib = w * self._tfnorm(tf, dl)
                    acc[local] += contrib
                    present[local] = True
                idx = np.flatnonzero(present)
                if len(idx) == 0:
                    continue
                top_docs, top_scores = _merge_topk(
                    top_docs, top_scores, base + idx, acc[idx], k
                )
                if len(top_docs) >= k:
                    theta = top_scores[-1]
        return top_docs, top_scores

    def _tfnorm(self, tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
        # set per-query via configure(); defaults match BM25Config
        k1 = getattr(self, "k1", 1.2)
        b = getattr(self, "b", 0.75)
        avgdl = getattr(self, "avgdl", 1.0)
        return (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))

    def configure(self, k1: float, b: float, avgdl: float) -> None:
        self.k1 = k1
        self.b = b
        self.avgdl = avgdl

    def ping(self) -> bool:
        return True
