"""Text-analysis operators for large-scale training-data pipelines.

Per-batch, SQL-reproducible text statistics over a (doc_id, text) table:
language ID (character-class heuristic), token counting (whitespace +
word-regex), quality scoring (length/stopword/word-shape ratios) and document
fingerprinting (normalized-text hash + winnowing-style min-hash over
character windows).

Every operator is a pure function over a pyarrow batch (stateless
``map_batches`` stage — no shuffle, embarrassingly parallel, streams at any
scale), and each has an exactly-matching DuckDB SQL oracle in
``pipelines/corpus_queries.py``: identical regexes (RE2-safe), identical
float expressions, fixed-point ``*_micros`` outputs so value hashes are
stable.

The oracle-mode fingerprints use md5 (not a numeric rolling hash) so the
oracle can reproduce them with DuckDB's ``md5()``; the production variant
(``fingerprint_fast_batch``) swaps in a vectorized Karp-Rabin rolling hash
with identical window semantics.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa

from oboyu_ray.fixedpoint import micros

# word tokens — deliberately simpler than the BM25 conformance tokenizer:
# these are corpus-analysis operators, not the ranking tokenizer
WORD_RE = re.compile(r"[a-z0-9]+")
WORD_RE_SQL = r"[a-z0-9]+"

# Whitespace pinned to the SAME explicit ASCII class on both engines:
# Python's \s is Unicode (U+3000 ideographic space matches) while DuckDB's
# RE2 \s is ASCII-only — dedup keys / fingerprints / token counts would
# silently diverge from the oracle on ordinary Japanese text otherwise.
WS_SQL = r"[ \t\n\r\f\v]"
WS_RE = re.compile(r"[ \t\n\r\f\v]+")
NON_WS_RE = re.compile(r"[^ \t\n\r\f\v]+")

JP_KANA_RE = re.compile(r"[぀-ゟ゠-ヿ]")
CJK_RE = re.compile(r"[一-鿿]")
JP_KANA_SQL = r"[\x{3040}-\x{309f}\x{30a0}-\x{30ff}]"
CJK_SQL = r"[\x{4e00}-\x{9fff}]"

# EN function words for the quality stop-ratio (tiny, frozen, mirrored in SQL)
QUALITY_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

WINNOW_WINDOW = 16


def _normalize(text: str) -> str:
    """lower + collapse ASCII-whitespace runs to single spaces + strip
    spaces.  SQL twin: trim(regexp_replace(lower(text), WS_SQL+'+', ' ',
    'g'), ' ') — strip(" ") / two-arg trim because the default trim/strip
    whitespace sets differ between the engines (DuckDB trims Zs-category
    Unicode spaces but not \\x0b/\\x85/\\u2028; Python strips all of them),
    and the explicit class leaves non-ASCII whitespace in place."""
    return WS_RE.sub(" ", text.lower()).strip(" ")



def text_stats_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, text) → token counts + language ID per document.

    Columns: n_chars, n_ws_tokens (ASCII-whitespace-separated tokens — the
    pinned NON_WS_RE class, identical in the SQL oracle), n_word_tokens
    (``[a-z0-9]+`` on lowered text), n_kana, n_cjk, lang ('ja' if any kana,
    'zh' if CJK only, else 'en').
    """
    texts = batch.column(text_col).to_pylist()
    n_chars: List[int] = []
    n_ws: List[int] = []
    n_words: List[int] = []
    n_kana: List[int] = []
    n_cjk: List[int] = []
    langs: List[str] = []
    for t in texts:
        t = t or ""
        n_chars.append(len(t))
        n_ws.append(len(NON_WS_RE.findall(t)))
        n_words.append(len(WORD_RE.findall(t.lower())))
        kana = len(JP_KANA_RE.findall(t))
        cjk = len(CJK_RE.findall(t))
        n_kana.append(kana)
        n_cjk.append(cjk)
        langs.append("ja" if kana > 0 else ("zh" if cjk > 0 else "en"))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_ws_tokens": pa.array(n_ws, type=pa.int64()),
            "n_word_tokens": pa.array(n_words, type=pa.int64()),
            "n_kana": pa.array(n_kana, type=pa.int64()),
            "n_cjk": pa.array(n_cjk, type=pa.int64()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def quality_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, text) → quality signals + combined score, all fixed-point micros.

    stop_ratio = stopword tokens / word tokens; len_score = min(n_chars,
    500)/500; quality = 0.5*len_score + 0.5*(1 - min(stop_ratio, 0.5)).
    The exact same double-precision expression runs in the SQL oracle.
    """
    texts = batch.column(text_col).to_pylist()
    sw = set(QUALITY_STOPWORDS)
    stop_ratio_u: List[int] = []
    len_score_u: List[int] = []
    quality_u: List[int] = []
    for t in texts:
        t = t or ""
        words = WORD_RE.findall(t.lower())
        n_stop = sum(1 for w in words if w in sw)
        stop_ratio = (n_stop / len(words)) if words else 0.0
        len_score = min(len(t), 500) / 500.0
        quality = 0.5 * len_score + 0.5 * (1.0 - min(stop_ratio, 0.5))
        stop_ratio_u.append(micros(stop_ratio))
        len_score_u.append(micros(len_score))
        quality_u.append(micros(quality))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "stop_ratio_micros": pa.array(stop_ratio_u, type=pa.int64()),
            "len_score_micros": pa.array(len_score_u, type=pa.int64()),
            "quality_micros": pa.array(quality_u, type=pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, text) → (fingerprint, winnow_fingerprint).

    fingerprint = md5(normalized text); winnow_fingerprint = min over md5 of
    every WINNOW_WINDOW-char window of the normalized text (the winnowing /
    MOSS document-fingerprint construction with min-selection over the whole
    doc) — robust to local edits anywhere outside the minimal window.
    """
    texts = batch.column(text_col).to_pylist()
    fps: List[str] = []
    wfps: List[str] = []
    for t in texts:
        norm = _normalize(t or "")
        fps.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        W = WINNOW_WINDOW
        if len(norm) <= W:
            wfps.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        else:
            wfps.append(
                min(
                    hashlib.md5(norm[i : i + W].encode("utf-8")).hexdigest()
                    for i in range(len(norm) - W + 1)
                )
            )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fingerprint": pa.array(fps, type=pa.string()),
            "winnow_fingerprint": pa.array(wfps, type=pa.string()),
        }
    )


# Karp-Rabin base for the production fingerprint mode: odd (invertible mod
# 2^64) so the rolling difference trick works with a precomputed inverse.
FP_BASE = 0x9E3779B97F4A7C15
FP_BASE_INV = pow(FP_BASE, -1, 1 << 64)
_FP_EMPTY = "0" * 16


def fingerprint_fast_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = WINNOW_WINDOW,
) -> pa.Table:
    """Production fingerprint kernel: identical window semantics to
    ``fingerprint_batch`` (min over every ``window``-char window of the
    normalized text; the whole text when shorter) but with a Karp-Rabin
    rolling hash — O(len) uint64 numpy work per batch instead of O(len)
    Python md5 calls per doc.  Values differ from the md5 oracle mode by
    design (different hash family); the oracle mode stays the
    SQL-reproducible twin, this is the one a 100 TB run uses.

    Scheme: all docs' normalized text concatenates into one codepoint
    array; with prefix sums P_k = Σ_{j<k} c_j·B^j (wrapping uint64), the
    hash of the window starting at t is (P_{t+W} − P_t)·B^{−t}, computed
    for EVERY window of every doc in one vectorized pass, finished with a
    splitmix64 mix (xored with the effective window length so short docs
    don't collide with their own prefixes); per-doc min via reduceat."""
    from oboyu_ray.stages.sketch import _splitmix64

    texts = batch.column(text_col).to_pylist()
    norms = [_normalize(t or "") for t in texts]
    lens = np.fromiter((len(s) for s in norms), dtype=np.int64, count=len(norms))
    blob = "".join(norms)
    out = np.empty(len(norms), dtype=np.uint64)
    nonempty = lens > 0
    if blob:
        c = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        L = len(c)
        with np.errstate(over="ignore"):
            pw = np.ones(L, dtype=np.uint64)
            pinv = np.ones(L, dtype=np.uint64)
            if L > 1:
                pw[1:] = np.cumprod(np.full(L - 1, FP_BASE, dtype=np.uint64))
                pinv[1:] = np.cumprod(np.full(L - 1, FP_BASE_INV, dtype=np.uint64))
            P = np.zeros(L + 1, dtype=np.uint64)
            P[1:] = np.cumsum(c * pw)
            doc_starts = np.cumsum(lens) - lens
            ne = np.flatnonzero(nonempty)
            weff = np.minimum(lens[ne], window)
            m = lens[ne] - weff + 1  # windows per nonempty doc
            wstart = np.cumsum(m) - m
            within = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(wstart, m)
            gstart = np.repeat(doc_starts[ne], m) + within
            gw = np.repeat(weff, m)
            h = (P[gstart + gw] - P[gstart]) * pinv[gstart]
            mixed = _splitmix64(h ^ gw.astype(np.uint64))
            out[ne] = np.minimum.reduceat(mixed, wstart)
    fps = [format(int(v), "016x") if ok else _FP_EMPTY for v, ok in zip(out, nonempty)]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "winnow_fingerprint": pa.array(fps, type=pa.string()),
        }
    )


def sample_by_hash(
    batch: pa.Table, id_col: str = "doc_id", threshold_hex: str = "28"
) -> pa.Table:
    """Deterministic Bernoulli-by-key sampling: keep rows whose
    md5(str(key)) hex digest sorts below ``threshold_hex`` (e.g. "28" ≈
    15.6% rate at 2-hex granularity, longer prefixes for finer rates).
    Reproducible across runs/engines — the property a training-data
    pipeline needs from its samplers (re-runs and oracle checks see the
    SAME sample; no RNG state to coordinate across tasks).  SQL twin:
    ``WHERE md5(CAST(key AS VARCHAR)) < 'threshold'``."""
    keys = batch.column(id_col).to_pylist()
    keep = [
        hashlib.md5(str(k).encode("utf-8")).hexdigest() < threshold_hex for k in keys
    ]
    return batch.filter(pa.array(keep, type=pa.bool_()))


# BPE-ish pre-tokenizer (GPT-2-style segmentation simplified to RE2-safe
# alternation: space-prefixed letter runs / digit runs / punctuation runs —
# no lookarounds, identical under Python re and DuckDB RE2).  Counts from
# this are the training-cost proxy a data pipeline budgets with.
BPE_RE_SQL = r" ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"
BPE_RE = re.compile(BPE_RE_SQL)


def bpe_token_counts_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, text) → BPE-ish token counts + chars-per-token compression
    ratio (micros).  Stateless map_batches stage; the per-doc regex scan is
    one C call per row."""
    texts = batch.column(text_col).to_pylist()
    n_tok: List[int] = []
    ratio_u: List[int] = []
    for t in texts:
        t = (t or "").lower()
        n = len(BPE_RE.findall(t))
        n_tok.append(n)
        ratio_u.append(micros(len(t) / n) if n else 0)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_bpe_tokens": pa.array(n_tok, type=pa.int64()),
            "chars_per_token_micros": pa.array(ratio_u, type=pa.int64()),
        }
    )
