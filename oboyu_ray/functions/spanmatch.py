"""Vectorized ordered span matching — the SpanNearQuery(inOrder=true) kernel.

Shared by the Dataset brute tier (`bm25_batch.span_near_topk`) and the shard
engine (`IndexShard.query_span_near`): given per-phrase-position packed
occurrence arrays, find the documents containing an in-order occurrence
sequence whose total extent fits a window.

Position semantics follow the reference's ``_get_term_positions``
(bm25_indexer.py:290-308): positions are indices in the FILTERED token
stream.  A phrase (adjacent, in order) is the ``window == m - 1`` special
case — pinned by tests.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

# packed key = doc * SPAN_PK + position; positions are bounded by the
# filtered document length, far below 2^40 (same packing as the phrase path)
SPAN_PK = np.int64(1) << 40


def ordered_span_docs(
    keys_per_term: Sequence[np.ndarray], window: int, pk: np.int64 = SPAN_PK
) -> np.ndarray:
    """Documents containing positions p_1 < p_2 < … < p_m — one per phrase
    slot, in order — with extent ``p_m − p_1 <= window``.

    ``keys_per_term[j]`` is the SORTED packed (doc·pk + pos) occurrence
    array of the j-th phrase term.  Greedy latest-predecessor chain, fully
    vectorized: anchored at each occurrence of the LAST term, walk the
    phrase backwards taking for each slot the largest same-doc position
    strictly below the current one (one ``searchsorted`` per slot).  Taking
    the latest valid predecessor maximizes the remaining room for earlier
    slots, so for every anchor the chain reaches the maximal feasible p_1 —
    i.e. the minimal extent ending there (exchange argument: a larger
    p_{j} only loosens the strict upper bound on p_{j-1}).  The doc matches
    iff any anchor's minimal extent fits the window.

    Strict inequality between consecutive slots makes a duplicated phrase
    term require genuinely distinct occurrences.  Returns the unique doc
    ids (ascending).
    """
    m = len(keys_per_term)
    if m == 0 or any(len(k) == 0 for k in keys_per_term):
        return np.empty(0, dtype=np.int64)
    cur = keys_per_term[-1]
    if m == 1:
        return np.unique(cur // pk)
    end_pos = cur % pk
    docs = cur // pk
    for j in range(m - 2, -1, -1):
        kj = keys_per_term[j]
        ii = np.searchsorted(kj, cur, side="left") - 1
        ok = ii >= 0
        ii = np.maximum(ii, 0)
        pred = kj[ii]
        ok &= (pred // pk) == docs
        cur, end_pos, docs = pred[ok], end_pos[ok], docs[ok]
        if not len(cur):
            return np.empty(0, dtype=np.int64)
    span = end_pos - (cur % pk)
    return np.unique(docs[span <= window])


def pack_token_positions(
    codes: np.ndarray, doc_of: np.ndarray, lens: np.ndarray, n_terms: int
) -> List[np.ndarray]:
    """Per interned term id, the sorted packed (doc·SPAN_PK + in-doc
    position) occurrence array, from a batch flattened to one int-code
    stream (`codes`; non-phrase terms −1), the doc index per token
    (`doc_of`) and per-doc token counts (`lens`).  One vectorized pass."""
    n = len(codes)
    if n == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n_terms)]
    starts = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    pos_in_doc = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    keys = doc_of * SPAN_PK + pos_in_doc
    out = []
    for tid in range(n_terms):
        kt = keys[codes == tid]
        out.append(kt)  # flat stream is doc- then position-ordered → sorted
    return out
