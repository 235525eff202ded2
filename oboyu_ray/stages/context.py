"""Conversation context windows — the SFT-sample extraction shape for
multi-turn transcripts: for every turn, the concatenation of its previous
``n_prev`` turns (oldest first) as the training context, paired with the
turn itself as the response.

This is the transcript-payload operator a training pipeline runs right
before packing: (conv_id, turn_idx, text) → (context, response) samples,
usually filtered to assistant turns.  The distributed shape is the
engine's standard ONE key-bucketed cogroup (conversations are independent;
a conversation's turns fit one reduce task — same partitioning assumption
as every per-key window in `stages/window.py`), with the window concat
vectorized as ``n_prev`` pandas group-shifts instead of a per-row loop.

Determinism: order within a key is (order_col, then text as tiebreak-free
dense positions) — transcripts order by turn_idx which is unique per conv;
the generic driver query orders events by (ts, event_id).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

CONTEXT_BUCKETS = 64


def context_window_concat(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: List[str],
    text_col: str,
    n_prev: int = 2,
    sep: str = " ",
    n_buckets: int = CONTEXT_BUCKETS,
) -> "ray.data.Dataset":
    """Per row: ``context`` = the previous ``n_prev`` rows' ``text_col``
    within ``key_col`` (ordered by ``order_cols``), joined oldest-first by
    ``sep``; rows with no predecessors get ''.  Output: key, order cols,
    text_col, context."""

    from oboyu_ray.stages.sketch import _hash64

    def add_kb(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        if pa.types.is_integer(col.type):
            kb = (
                col.to_numpy(zero_copy_only=False).astype(np.uint64)
                % np.uint64(n_buckets)
            ).astype(np.int64)
        else:
            kb = (_hash64(col) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("kb", pa.array(kb))

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False)
        # explicit has-predecessor mask: an EMPTY text is a real turn and
        # must contribute its separator (sentinel "" would swallow it)
        ctx = np.full(len(g), "", dtype=object)
        has = np.zeros(len(g), dtype=bool)
        for i in range(n_prev, 0, -1):  # oldest first
            p = grp[text_col].shift(i)
            valid = p.notna().to_numpy()
            pv = p.fillna("").to_numpy(dtype=object)
            ctx = np.where(valid & has, ctx + sep + pv, np.where(valid, pv, ctx))
            has |= valid
        out = g[[key_col, *order_cols, text_col]].copy()
        out["context"] = pd.Series(ctx, dtype=object).astype(str)
        return out.drop(columns=[c for c in ("kb",) if c in out.columns])

    cols = [key_col, *order_cols, text_col]
    return (
        ds.select_columns(cols)
        .map_batches(add_kb, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(concat, batch_format="pandas")
    )


def sft_samples(
    transcripts: "ray.data.Dataset",
    n_prev: int = 2,
    sep: str = "\n",
    response_role: str = "assistant",
) -> "ray.data.Dataset":
    """Multi-turn transcripts → (conv_id, turn_idx, context, response)
    SFT pairs: context = previous ``n_prev`` turns (any role, oldest
    first), response = the turn's text, keeping only ``response_role``
    turns with a non-empty context.  ``role`` rides through the window op
    as a trailing order column (turn_idx is already unique per conv, so
    appending it never changes the order — it just survives projection)."""

    def keep_responses(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.equal(t.column("role"), response_role),
            pc.invert(pc.equal(t.column("context"), "")),
        )
        out = t.filter(m)
        return pa.table(
            {
                "conv_id": out.column("conv_id"),
                "turn_idx": out.column("turn_idx"),
                "context": out.column("context"),
                "response": out.column("text"),
            }
        )

    ds = context_window_concat(
        transcripts,
        key_col="conv_id",
        order_cols=["turn_idx", "role"],
        text_col="text",
        n_prev=n_prev,
        sep=sep,
    )
    return ds.map_batches(keep_responses, batch_format="pyarrow")
