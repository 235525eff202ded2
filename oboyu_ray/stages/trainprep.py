"""Training-data preparation operators: PII redaction, repetition (Gopher)
signals, benchmark decontamination, boilerplate n-gram mining, stratified
sampling.

These are the corpus-hygiene stages a large-scale LLM training-data pipeline
runs between raw ingest and tokenization (reference scope: oboyu's crawler /
quality filtering has no equivalents — these extend the engine the way
`stages/dedup.py` / `stages/textstats.py` do).  Design rules shared with the
rest of the repo:

* every per-batch function is a pure pyarrow kernel (stateless
  ``map_batches`` stage, zero shuffle, streams at any scale);
* wide steps (boilerplate doc-counts) pre-aggregate map-side so the groupby
  moves one row per distinct key per batch, not one row per occurrence;
* small sides (the benchmark n-gram set for decontamination) are broadcast
  once via ``ray.put`` and read zero-copy in every task — benchmark suites
  are tiny (10^3..10^5 docs) next to a 100 TB corpus, so broadcast is the
  correct join side at scale;
* each driver query has an exactly-matching DuckDB oracle (identical RE2
  regexes, identical double expressions, fixed-point ``*_micros`` outputs).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oboyu_ray.fixedpoint import micros
from oboyu_ray.stages.dedup import _batch_shingle_hashes, _flat_word_hashes
from oboyu_ray.stages.textstats import WORD_RE


def _np(col, dtype=None) -> np.ndarray:
    """Column (Array or ChunkedArray) → numpy, tolerating nulls/chunks."""
    arr = col.to_numpy(zero_copy_only=False)
    return arr if dtype is None else arr.astype(dtype)

# ---------------------------------------------------------------- redaction

# Ordered PII scrub rules: (RE2-safe pattern, replacement).  Patterns must
# behave identically under pyarrow's RE2 and DuckDB's RE2 — keep them free of
# lookarounds/backrefs (RE2 has neither).  Emails first so their digits are
# not half-eaten by the number rule.
PII_RULES: List[Tuple[str, str]] = [
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<EMAIL>"),
    (r"[0-9]+", "<NUM>"),
]


def redact_batch(
    batch: pa.Table,
    id_col: str = "event_id",
    text_col: str = "props",
    rules: Sequence[Tuple[str, str]] = tuple(PII_RULES),
) -> pa.Table:
    """(id, text) → (id, <text>_redacted, n_redacted): apply the scrub rules
    in order with vectorized RE2 kernels (``pc.count_substring_regex`` +
    ``pc.replace_substring_regex`` — no Python row loop), counting matches of
    each rule against the text as it stands when that rule runs (so a rule
    never double-counts text an earlier rule already replaced)."""
    cur = batch.column(text_col)
    n = np.zeros(len(batch), dtype=np.int64)
    for pat, rep in rules:
        cnt = pc.count_substring_regex(cur, pattern=pat)
        n += _np(pc.fill_null(cnt, 0), np.int64)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
    return pa.table(
        {
            id_col: batch.column(id_col),
            f"{text_col}_redacted": cur,
            "n_redacted": pa.array(n, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------- repetition

# Gopher-style repetition gate: docs whose single most frequent word exceeds
# this fraction of all word tokens are flagged repetitive.
REP_TOP_TAU = 0.12


def repetition_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-doc repetition signals (the Gopher quality-rule family): total /
    distinct word-token counts, duplicate-token ratio (1 - distinct/total),
    top-token ratio (max term frequency / total), and the ``repetitive``
    flag (top ratio > REP_TOP_TAU).

    Vectorized end-to-end: one bulk FNV-1a word-hash pass for the whole
    batch (``dedup._flat_word_hashes``), one lexsort, then run-length
    reductions — no per-doc Counter.  A doc's text is a single row, so all
    its words live in this batch and the per-doc counts are exact regardless
    of how Ray splits blocks downstream."""
    texts = batch.column(text_col).to_pylist()
    wh, counts = _flat_word_hashes(texts)
    ndocs = len(texts)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    n_words = counts
    n_distinct = np.zeros(ndocs, dtype=np.int64)
    max_tf = np.zeros(ndocs, dtype=np.int64)
    if len(wh):
        order = np.lexsort((wh, doc_of))
        h, d = wh[order], doc_of[order]
        run_start = np.ones(len(h), dtype=bool)
        run_start[1:] = (h[1:] != h[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(run_start)
        run_len = np.diff(np.append(starts, len(h)))
        run_doc = d[starts]
        n_distinct += np.bincount(run_doc, minlength=ndocs).astype(np.int64)
        # runs are contiguous per doc after the lexsort → per-doc max via
        # reduceat over the first-run-of-each-doc offsets
        doc_first_run = np.ones(len(starts), dtype=bool)
        doc_first_run[1:] = run_doc[1:] != run_doc[:-1]
        seg = np.flatnonzero(doc_first_run)
        max_tf[run_doc[seg]] = np.maximum.reduceat(run_len, seg)
    nz = n_words > 0
    dup_ratio = np.zeros(ndocs, dtype=np.float64)
    top_ratio = np.zeros(ndocs, dtype=np.float64)
    dup_ratio[nz] = (n_words[nz] - n_distinct[nz]) / n_words[nz]
    top_ratio[nz] = max_tf[nz] / n_words[nz]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
            "dup_ratio_micros": pa.array(micros(dup_ratio), type=pa.int64()),
            "top_ratio_micros": pa.array(micros(top_ratio), type=pa.int64()),
            "repetitive": pa.array(top_ratio > REP_TOP_TAU, type=pa.bool_()),
        }
    )


# ------------------------------------------------------- trigram boilerplate

BOILERPLATE_MIN_DOCS = 5


def _batch_trigram_strings(
    texts: Sequence[Optional[str]],
) -> Tuple[np.ndarray, pa.Array]:
    """Distinct word-trigram STRINGS per doc, batch-vectorized.

    Word split stays per-doc (C-speed ``WORD_RE.findall``); trigram
    construction is one Arrow ``binary_join_element_wise`` over the packed
    word array, and per-doc dedup is a lexsort keep-mask over the trigram
    hashes.  Returns (doc_idx int64 ascending, trigram pa.StringArray) —
    the string-typed sibling of ``dedup._batch_shingle_hashes`` for
    operators whose OUTPUT is the n-gram itself."""
    from oboyu_ray.stages.sketch import _hash64

    words: List[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = WORD_RE.findall((t or "").lower())
        counts[i] = len(w)
        words.extend(w)
    empty = np.zeros(0, dtype=np.int64), pa.array([], type=pa.string())
    if not words:
        return empty
    wa = pa.array(words, type=pa.string())
    n = len(words)
    starts = np.cumsum(counts) - counts
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    valid = pos <= np.repeat(counts, counts) - 3
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return empty
    tri = pc.binary_join_element_wise(
        wa.take(pa.array(idx)), wa.take(pa.array(idx + 1)), wa.take(pa.array(idx + 2)), " "
    )
    d = doc_of[idx]
    th = _hash64(tri)
    order = np.lexsort((th, d))
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (th[order][1:] != th[order][:-1]) | (d[order][1:] != d[order][:-1])
    sel = order[keep]
    return d[sel], tri.take(pa.array(sel))


def boilerplate_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side partial for boilerplate mining: distinct trigrams per doc,
    then per-trigram row counts WITHIN this batch.  Each (doc, trigram) pair
    exists at most once globally (per-doc dedup above, one row per doc), so
    summing these partials per trigram yields exact distinct-doc counts —
    the groupby moves one row per distinct trigram per batch instead of one
    per occurrence."""
    _, tri = _batch_trigram_strings(batch.column(text_col).to_pylist())
    if len(tri) == 0:
        return pa.table(
            {"ngram": pa.array([], type=pa.string()), "partial_docs": pa.array([], type=pa.int64())}
        )
    vc = pc.value_counts(tri)
    return pa.table(
        {"ngram": vc.field("values"), "partial_docs": vc.field("counts").cast(pa.int64())}
    )


def boilerplate_ngrams(
    ds: "ray.data.Dataset", text_col: str = "text", min_docs: int = BOILERPLATE_MIN_DOCS
) -> "ray.data.Dataset":
    """Word trigrams appearing in ≥ ``min_docs`` distinct documents — the
    shared-boilerplate miner (C4/RefinedWeb-style template detection).  One
    partial-agg ``map_batches`` + one groupby-sum over distinct trigrams
    (vocabulary-scale keys, occurrence-scale rows never shuffle)."""
    import ray.data  # noqa: F401

    part = ds.map_batches(
        lambda b: boilerplate_partial(b, text_col=text_col), batch_format="pyarrow"
    )

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("sum(partial_docs)")
        t = pa.table({"ngram": b.column("ngram"), "n_docs": nd.cast(pa.int64())})
        return t.filter(pc.greater_equal(t.column("n_docs"), min_docs))

    return part.groupby("ngram").sum("partial_docs").map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------- decontamination

# Deterministic stand-in for "the benchmark/eval suite": every doc_id
# divisible by this modulus plays the held-out set whose n-grams must not
# leak into training data.
BENCH_MOD = 97


def benchmark_shingle_set(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_mod: int = BENCH_MOD,
) -> np.ndarray:
    """Sorted unique word-trigram hashes of the benchmark docs.

    The benchmark side of decontamination is SMALL by construction (an eval
    suite, not the corpus), so materializing its distinct shingle hashes on
    the driver — after per-batch dedup inside ``map_batches`` — is the
    broadcast-build step, not a scale risk.  Returns a numpy uint64 array
    ready for ``ray.put``."""

    import ray

    def partial(b: pa.Table) -> pa.Table:
        ids = _np(b.column(id_col), np.int64)
        sel = np.flatnonzero(ids % bench_mod == 0)
        texts = b.column(text_col).take(pa.array(sel)).to_pylist()
        _, h = _batch_shingle_hashes(texts)
        return pa.table({"h": pa.array(np.unique(h), type=pa.uint64())})

    parts = [
        _np(t.column("h"), np.uint64)
        for t in ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    ds: "ray.data.Dataset",
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_mod: int = BENCH_MOD,
) -> "ray.data.Dataset":
    """Flag training docs sharing ≥1 word-trigram with the benchmark set.

    ``bench_ref`` is a ``ray.put`` ObjectRef to the sorted benchmark hash
    array — fetched zero-copy from the local object store in every task
    (broadcast once, never re-shipped per batch).  Output: (id, n_hits =
    number of DISTINCT shared trigrams) for contaminated non-benchmark docs
    only.  Embarrassingly parallel — no shuffle at any corpus size."""
    import ray

    def flag(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = _np(b.column(id_col), np.int64)
        texts = b.column(text_col).to_pylist()
        d, h = _batch_shingle_hashes(texts)
        n_hits = np.zeros(len(ids), dtype=np.int64)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == h
            n_hits += np.bincount(d[hit], minlength=len(ids))
        keep = (n_hits > 0) & (ids % bench_mod != 0)
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                id_col: b.column(id_col).take(sel),
                "n_hits": pa.array(n_hits[np.flatnonzero(keep)], type=pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# Bloom variant: the scale path for when the benchmark n-gram set is too
# big to broadcast as raw sorted hashes (billions of eval n-grams).  The
# filter is a FIXED-size bit array regardless of set size; the trade is a
# bounded false-positive rate — decontamination stays SAFE (no false
# negatives: every true benchmark trigram probes positive, so the flagged
# set is a superset of the exact one; FPs only over-redact).
BLOOM_BITS_LOG2 = 20  # 2^20 bits = 128 KiB packed
BLOOM_K = 4


def _bloom_positions(h: np.ndarray, bits_log2: int, k: int) -> list:
    """k probe positions per hash via double hashing (h + i*step) — the
    standard Kirsch–Mitzenmacher construction; step forced odd so probes
    cover the table."""
    mask = np.uint64((1 << bits_log2) - 1)
    step = (h >> np.uint64(32)) | np.uint64(1)
    out = []
    with np.errstate(over="ignore"):
        for i in range(k):
            out.append((h + np.uint64(i) * step) & mask)
    return out


def _bloom_set(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def _bloom_test(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1) != 0


def benchmark_bloom(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_mod: int = BENCH_MOD,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
) -> np.ndarray:
    """Distributed Bloom build over the benchmark docs: each map task emits
    its batch's PACKED bit words as one binary blob; the driver ORs the
    bounded set of blobs (n_batches x 2^bits_log2/8 bytes — independent of
    how many n-grams the benchmark holds).  Returns the uint64 word array
    ready for ``ray.put``."""
    import ray

    n_words = (1 << bits_log2) >> 6

    def partial(b: pa.Table) -> pa.Table:
        ids = _np(b.column(id_col), np.int64)
        sel = np.flatnonzero(ids % bench_mod == 0)
        texts = b.column(text_col).take(pa.array(sel)).to_pylist()
        _, h = _batch_shingle_hashes(texts)
        words = np.zeros(n_words, dtype=np.uint64)
        for pos in _bloom_positions(h, bits_log2, k):
            _bloom_set(words, pos)
        return pa.table({"blob": pa.array([words.tobytes()], type=pa.binary())})

    acc = np.zeros(n_words, dtype=np.uint64)
    for t in ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows and t.num_columns:
            for blob in t.column("blob").to_pylist():
                acc |= np.frombuffer(blob, dtype=np.uint64)
    return acc


def decontaminate_bloom(
    ds: "ray.data.Dataset",
    bloom_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_mod: int = BENCH_MOD,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
) -> "ray.data.Dataset":
    """``decontaminate`` with Bloom membership instead of the sorted hash
    array — same output shape (id, n_hits over distinct trigrams), flagged
    set guaranteed to be a SUPERSET of the exact operator's (no false
    negatives; pytest pins both the superset property and the FPR bound)."""
    import ray

    def flag(b: pa.Table) -> pa.Table:
        words = ray.get(bloom_ref)
        ids = _np(b.column(id_col), np.int64)
        texts = b.column(text_col).to_pylist()
        d, h = _batch_shingle_hashes(texts)
        n_hits = np.zeros(len(ids), dtype=np.int64)
        if len(h) and words.any():
            hit = np.ones(len(h), dtype=bool)
            for pos in _bloom_positions(h, bits_log2, k):
                hit &= _bloom_test(words, pos)
            n_hits += np.bincount(d[hit], minlength=len(ids))
        keep = (n_hits > 0) & (ids % bench_mod != 0)
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                id_col: b.column(id_col).take(sel),
                "n_hits": pa.array(n_hits[np.flatnonzero(keep)], type=pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------------- stratified sampling

def stratified_sample_by_hash(
    batch: pa.Table,
    id_col: str = "doc_id",
    strat_col: str = "lang",
    thresholds: Optional[Dict[str, str]] = None,
    default_hex: str = "40",
) -> pa.Table:
    """Deterministic stratified sampling: per-stratum Bernoulli-by-key rates
    (e.g. downsample the over-represented language) with the same
    md5-prefix-threshold rule as ``textstats.sample_by_hash`` — reproducible
    across runs and engines, no RNG state to coordinate.  ``thresholds``
    maps stratum value → hex threshold; unlisted strata use ``default_hex``.
    SQL twin: ``WHERE md5(CAST(key AS VARCHAR)) < CASE strat WHEN … END``.
    Per-row md5 is the documented SQL-reproducibility trade shared with
    ``sample_by_hash``."""
    import hashlib

    thresholds = thresholds or {}
    keys = batch.column(id_col).to_pylist()
    strata = batch.column(strat_col).to_pylist()
    keep = [
        hashlib.md5(str(k).encode("utf-8")).hexdigest() < thresholds.get(s, default_hex)
        for k, s in zip(keys, strata)
    ]
    return batch.filter(pa.array(keep, type=pa.bool_()))


# ----------------------------------------------------------- corpus profile

def corpus_profile(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source corpus mixing report: doc count, distinct-language count,
    mean doc length — the profile a training pipeline consults when
    weighting data sources.

    ONE shuffle: in-batch pyarrow group_by over (source, lang) collapses
    each block to at most |sources|x|langs| partial rows (occurrence-scale
    rows never shuffle), and a single groupby(source) rollup computes doc
    totals and distinct-lang counts from the partials directly — source
    cardinality is unbounded at web scale (domains), so the reduce stays
    distributed."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([("n_chars", "sum"), ("n_chars", "count")])
        return pa.table(
            {
                "source": g.column("source"),
                "lang": g.column("lang"),
                "chars": g.column("n_chars_sum").cast(pa.int64()),
                "docs": g.column("n_chars_count").cast(pa.int64()),
            }
        )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        n_docs = int(g["docs"].sum())
        total = float(g["chars"].sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([n_docs], dtype=np.int64),
                "n_langs": np.array([g["lang"].nunique()], dtype=np.int64),
                "mean_chars_micros": np.array(
                    [micros(total / n_docs)] if n_docs else [0], dtype=np.int64
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(rollup, batch_format="pandas")
    )


# ------------------------------------------------------- composed clean pass

QUALITY_TAU_MICROS = 620_000  # quality gate, fixed-point micros


def clean_corpus(
    ds: "ray.data.Dataset",
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """The composed training-prep pass: quality gate + repetition gate +
    benchmark decontamination + exact-duplicate canonicalization, the
    end-to-end hygiene pipeline a corpus runs before tokenization.

    All three per-doc gates evaluate in ONE map_batches stage (three
    vectorized kernels over the same in-memory batch), and docs failing any
    gate drop before the only shuffle — the exact-dedup groupby over md5
    keys — so the wide step sees the already-thinned corpus.  Output: one
    row per kept canonical doc (smallest id of its duplicate group) with
    the group size."""
    import ray

    from oboyu_ray.stages.dedup import exact_dedup
    from oboyu_ray.stages.textstats import quality_batch

    def gates(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = _np(b.column(id_col), np.int64)
        q = quality_batch(b, id_col, text_col)
        r = repetition_batch(b, id_col, text_col)
        d, h = _batch_shingle_hashes(b.column(text_col).to_pylist())
        hits = np.zeros(len(ids), dtype=np.int64)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == h
            hits += np.bincount(d[hit], minlength=len(ids))
        keep = (
            (_np(q.column("quality_micros"), np.int64) >= QUALITY_TAU_MICROS)
            & ~_np(r.column("repetitive"))
            & (hits == 0)
            & (ids % BENCH_MOD != 0)  # benchmark members never train
        )
        return b.filter(pa.array(keep, type=pa.bool_()))

    deduped = exact_dedup(ds.map_batches(gates, batch_format="pyarrow"), id_col, text_col)
    return deduped.map_batches(
        lambda t: t.drop_columns(["key"]), batch_format="pyarrow"
    )


# ------------------------------------------------------- unigram surprisal

SURPRISAL_TOP_K = 1 << 16  # vocabulary entries the broadcast model keeps


def unigram_model(
    ds: "ray.data.Dataset", text_col: str = "text", top_k: int = SURPRISAL_TOP_K
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Corpus unigram model for surprisal scoring: (sorted word-hash array,
    per-word surprisal micros, total token count).

    Distributed shape: in-batch ``value_counts`` partials → groupby-sum per
    word (occurrence rows never shuffle) → distributed sort by (count DESC,
    word ASC) → ``limit(top_k)`` — the driver holds at most ``top_k``
    entries regardless of corpus size (at 100 TB the tail is OOV by
    design; the test corpora fit entirely, making the SQL oracle exact).
    Surprisal is fixed-pointed PER VOCAB ENTRY — ``micros(-ln(c/N))`` — so
    every doc-level aggregate downstream is integer arithmetic, exactly
    associative and engine-identical."""
    from oboyu_ray.stages.sketch import _hash64

    def partial(b: pa.Table) -> pa.Table:
        words: List[str] = []
        for t in b.column(text_col).to_pylist():
            words.extend(WORD_RE.findall((t or "").lower()))
        if not words:
            return pa.table(
                {"word": pa.array([], type=pa.string()), "cnt": pa.array([], type=pa.int64())}
            )
        vc = pc.value_counts(pa.array(words, type=pa.string()))
        return pa.table({"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .materialize()  # consumed twice: grand total + top-k sort
    )
    n_total = int(agg.sum("sum(cnt)") or 0)
    if n_total == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64), 0
    top = agg.sort(["sum(cnt)", "word"], descending=[True, False]).limit(top_k).to_pandas()
    cnt = top["sum(cnt)"].to_numpy(dtype=np.int64)
    s_micros = micros(-np.log(cnt.astype(np.float64) / float(n_total))).astype(np.int64)
    wh = _hash64(pa.array(top["word"].tolist(), type=pa.string()))
    order = np.argsort(wh)
    return wh[order], s_micros[order], n_total


def doc_surprisal(
    ds: "ray.data.Dataset",
    model_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-doc mean unigram surprisal (the simplest statistical LM quality
    signal: low = stereotyped/common text, high = rare-token soup).

    ``model_ref`` is a ``ray.put`` ObjectRef to the (sorted word hashes,
    surprisal micros, N) triple — broadcast once, read zero-copy per task.
    Per batch: one bulk word-hash pass, one searchsorted lookup, one
    integer bincount per doc.  OOV words (beyond the model's top-K) score
    ``micros(-ln(1/N))`` — the rarest-possible-word surprisal.  Output
    mean is integer division of micro sums: engine-exact."""
    import ray

    def score(b: pa.Table) -> pa.Table:
        wh_sorted, s_micros, n_total = ray.get(model_ref)
        oov = int(micros(-np.log(1.0 / float(n_total)))) if n_total else 0
        texts = b.column(text_col).to_pylist()
        wh, counts = _flat_word_hashes(texts)
        ndocs = len(texts)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        total = np.zeros(ndocs, dtype=np.int64)
        if len(wh):
            pos = np.searchsorted(wh_sorted, wh)
            pos[pos == len(wh_sorted)] = 0
            known = len(wh_sorted) > 0
            hit = (wh_sorted[pos] == wh) if known else np.zeros(len(wh), dtype=bool)
            s = np.where(hit, s_micros[pos] if known else 0, oov)
            total = np.bincount(doc_of, weights=s, minlength=ndocs).astype(np.int64)
        mean = np.zeros(ndocs, dtype=np.int64)
        nz = counts > 0
        mean[nz] = total[nz] // counts[nz]
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_words": pa.array(counts, type=pa.int64()),
                "mean_surprisal_micros": pa.array(mean, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------- sequence packing

PACK_BUDGET = 512     # token budget per packed bin
PACK_BUCKETS = 256    # md5-prefix buckets defining the scan order


def pack_sequences(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
) -> "ray.data.Dataset":
    """Deterministic sequence packing: assign each doc to a fixed
    token-budget bin under a pseudo-random global order — the pretraining
    batch-packing op (bin = exclusive-prefix-token-count // budget, so bins
    are budget-sized up to one straddling doc; no doc is split).

    The primitive underneath is a DISTRIBUTED PREFIX SCAN without a global
    sort: the order is (md5(id), id); its first hex pair partitions docs
    into 256 ordered buckets.  Pass 1 computes per-bucket token totals
    (map-side partials → one groupby); the driver prefix-sums the 256
    totals into bucket offsets (bounded state) and broadcasts them; pass 2
    sorts WITHIN each bucket, adds the local exclusive cumsum to the
    bucket's offset, and emits the bin.  Scan cost: two streaming passes +
    one bucket-bounded shuffle, at any corpus size."""
    import hashlib

    import ray

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        keys = [hashlib.md5(str(k).encode("utf-8")).hexdigest() for k in ids]
        texts = b.column(text_col).to_pylist()
        n = np.fromiter(
            (len(WORD_RE.findall((t or "").lower())) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        bucket = np.fromiter((int(k[:2], 16) for k in keys), dtype=np.int64, count=len(keys))
        return pa.table(
            {
                id_col: b.column(id_col),
                "key": pa.array(keys, type=pa.string()),
                "n_words": pa.array(n, type=pa.int64()),
                "bucket": pa.array(bucket % n_buckets, type=pa.int64()),
            }
        )

    # materialized because BOTH passes consume it and the keyed stage pays a
    # per-row md5; the object store spills rather than recomputing — for an
    # upstream cheaper than the md5 keying, drop this and let it re-execute
    rows = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def tot_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("bucket").aggregate([("n_words", "sum")])
        return pa.table(
            {"bucket": g.column("bucket"), "t": g.column("n_words_sum").cast(pa.int64())}
        )

    totals = np.zeros(n_buckets, dtype=np.int64)
    for b in rows.map_batches(tot_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # np.add.at, not fancy-index +=: one driver batch may carry several
        # partial rows for the same bucket (iter_batches coalesces blocks),
        # and += silently drops duplicate-index contributions
        np.add.at(
            totals,
            b.column("bucket").to_numpy(zero_copy_only=False),
            b.column("t").to_numpy(zero_copy_only=False),
        )
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    off_ref = ray.put(offsets)

    import pandas as pd

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["key", id_col], kind="mergesort").reset_index(drop=True)
        n = g["n_words"].to_numpy(dtype=np.int64)
        cume = int(offs[int(g["bucket"].iloc[0])]) + (np.cumsum(n) - n)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_words": n,
                "bin": (cume // budget).astype(np.int64),
            }
        )

    return rows.groupby("bucket").map_groups(assign, batch_format="pandas")


# ------------------------------------------------------- keyword extraction

KEYWORDS_PER_DOC = 3


def doc_keywords(
    ds: "ray.data.Dataset",
    model_ref,
    k: int = KEYWORDS_PER_DOC,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-doc keyword extraction: the k distinct words with the highest
    corpus surprisal (rarity — the IDF-style signal), ties broken by word
    ascending.  Reuses the broadcast unigram model from ``unigram_model``;
    per batch this is one bulk hash pass + per-doc dedup + one lexsort —
    no shuffle, streams at any scale.  Words beyond the model's top-K all
    score the OOV (rarest) surprisal and compete alphabetically."""
    import ray

    def extract(b: pa.Table) -> pa.Table:
        from oboyu_ray.stages.sketch import _hash64

        wh_sorted, s_micros, n_total = ray.get(model_ref)
        oov = int(micros(-np.log(1.0 / float(n_total)))) if n_total else 0
        texts = b.column(text_col).to_pylist()
        words: List[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            w = WORD_RE.findall((t or "").lower())
            counts[i] = len(w)
            words.extend(w)
        out_doc: List[int] = []
        out_word: List[str] = []
        out_s: List[int] = []
        out_rank: List[int] = []
        if words:
            wa = pa.array(words, type=pa.string())
            wh = _hash64(wa)
            doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
            # per-doc distinct words (dedup by hash within doc)
            order = np.lexsort((wh, doc_of))
            keep = np.ones(len(order), dtype=bool)
            keep[1:] = (wh[order][1:] != wh[order][:-1]) | (
                doc_of[order][1:] != doc_of[order][:-1]
            )
            sel = order[keep]
            d = doc_of[sel]
            h = wh[sel]
            if len(wh_sorted):
                pos = np.searchsorted(wh_sorted, h)
                pos[pos == len(wh_sorted)] = 0
                hit = wh_sorted[pos] == h
                s = np.where(hit, s_micros[pos], oov).astype(np.int64)
            else:
                s = np.full(len(h), oov, dtype=np.int64)
            wstr = np.asarray(wa.take(pa.array(sel)).to_pylist(), dtype=object)
            # top-k per doc by (s DESC, word ASC): lexsort then cumcount
            o2 = np.lexsort((wstr, -s, d))
            d2, s2, w2 = d[o2], s[o2], wstr[o2]
            new = np.r_[True, d2[1:] != d2[:-1]]
            starts = np.flatnonzero(new)
            cum = np.arange(len(d2)) - np.repeat(starts, np.diff(np.r_[starts, len(d2)]))
            top = cum < k
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            out_doc = ids[d2[top]].tolist()
            out_word = w2[top].tolist()
            out_s = s2[top].tolist()
            out_rank = (cum[top] + 1).tolist()
        return pa.table(
            {
                id_col: pa.array(out_doc, type=pa.int64()),
                "word": pa.array(out_word, type=pa.string()),
                "s_micros": pa.array(out_s, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


# ------------------------------------------------- fixed-size group samples

STRAT_TOPK = 20


def stratified_topk_sample(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    strat_col: str = "lang",
    k: int = STRAT_TOPK,
) -> "ray.data.Dataset":
    """Deterministic FIXED-SIZE sample per stratum: the k members whose
    md5(id) sorts smallest within each stratum (vs ``stratified_sample_by_
    hash``'s fixed-RATE gate) — the eval-slice sampler: "exactly k docs per
    language, reproducibly, at any corpus size".

    Map-side partial top-k per (stratum, batch) → groupby(stratum) reduce:
    each batch ships at most k rows per stratum it touches, so the shuffle
    is bounded by strata × batches × k regardless of corpus size.  The
    md5-per-row loop is the documented SQL-reproducibility trade shared
    with the other samplers."""
    import hashlib

    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        strat = b.column(strat_col).to_pylist()
        df = pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                strat_col: strat,
                "hkey": [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids],
            }
        )
        top = (
            df.sort_values(["hkey", id_col], kind="mergesort")
            .groupby(strat_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(["hkey", id_col], kind="mergesort").head(k)
        return top[[strat_col, id_col]].reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(strat_col)
        .map_groups(reduce, batch_format="pandas")
    )


# ------------------------------------------------------------- collocations

COLLOC_MIN_COUNT = 5


def collocations(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_count: int = COLLOC_MIN_COUNT,
) -> "ray.data.Dataset":
    """Collocation mining: PMI of adjacent word pairs vs their unigram
    frequencies — the classic corpus-statistics operator for multi-word
    expressions.

    Distributed shape: (1) per-batch bigram value_counts → groupby-sum,
    count-thresholded (collocation mining always hard-thresholds: the
    long tail is noise AND volume); (2) per-batch word value_counts →
    groupby-sum; (3) the surviving bigrams split into (w1, w2) columns and
    join word counts via TWO hash-bucketed joins (both sides corpus-vocab
    scale — exactly ``hash_join``'s regime); (4) PMI per row with the two
    scalar totals broadcast.  The PMI double expression is mirrored
    verbatim in the SQL oracle."""
    import ray
    import ray.data  # noqa: F401

    from oboyu_ray.stages.relational import hash_join

    def bigram_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        words: List[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            w = WORD_RE.findall((t or "").lower())
            counts[i] = len(w)
            words.extend(w)
        if not words:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        wa = pa.array(words, type=pa.string())
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(words), dtype=np.int64) - np.repeat(starts, counts)
        valid = pos <= np.repeat(counts, counts) - 2
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        bg = pc.binary_join_element_wise(wa.take(pa.array(idx)), wa.take(pa.array(idx + 1)), " ")
        vc = pc.value_counts(bg)
        return pa.table({"bg": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def word_partial(b: pa.Table) -> pa.Table:
        words: List[str] = []
        for t in b.column(text_col).to_pylist():
            words.extend(WORD_RE.findall((t or "").lower()))
        if not words:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        vc = pc.value_counts(pa.array(words, type=pa.string()))
        return pa.table({"word": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    src = ds.materialize()  # consumed by both count passes
    bgc = (
        src.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bg").sum("n")
    )
    wc = (
        src.map_batches(word_partial, batch_format="pyarrow")
        .groupby("word").sum("c")
        .map_batches(
            lambda b: pa.table({"word": b.column("word"),
                                "c": b.column("sum(c)").cast(pa.int64())}),
            batch_format="pyarrow",
        ).materialize()  # totals + two join sides
    )
    n_uni = float(wc.sum("c") or 0)

    def split_keep(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").cast(pa.int64())
        keep = pc.greater_equal(n, min_count)
        t = pa.table({"bg": b.column("bg"), "n": n}).filter(keep)
        parts = pc.split_pattern(t.column("bg"), " ")
        return pa.table(
            {
                "bg": t.column("bg"),
                "n": t.column("n"),
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
            }
        )

    bgc = bgc.materialize()  # consumed by the total and the survivor filter
    surv = bgc.map_batches(split_keep, batch_format="pyarrow")

    # PMI denominator uses TOTAL bigram occurrences, not just survivors
    tot_bg = float(
        bgc.map_batches(
            lambda b: pa.table({"n": b.column("sum(n)").cast(pa.int64())}),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )

    wc1 = wc.map_batches(
        lambda b: pa.table({"w1j": b.column("word"), "c1": b.column("c")}),
        batch_format="pyarrow",
    )
    wc2 = wc.map_batches(
        lambda b: pa.table({"w2j": b.column("word"), "c2": b.column("c")}),
        batch_format="pyarrow",
    )
    j1 = hash_join(surv, wc1, "w1", "w1j")
    j2 = hash_join(j1, wc2, "w2", "w2j")

    def pmi(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = b.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = b.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        val = np.log((n / tot_bg) / ((c1 / n_uni) * (c2 / n_uni)))
        return pa.table(
            {
                "bigram": b.column("bg"),
                "n": b.column("n"),
                "pmi_micros": pa.array(micros(val), type=pa.int64()),
            }
        )

    return j2.map_batches(pmi, batch_format="pyarrow")


# ---------------------------------------------------------- model evaluation

def langid_confusion(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed confusion matrix: labeled language column vs the
    heuristic language-ID prediction — the model-evaluation pattern at
    corpus scale (per-batch partial (label, pred) counts, one tiny
    groupby; the matrix is |langs|² rows no matter the corpus size)."""
    from oboyu_ray.stages.textstats import CJK_SQL, JP_KANA_SQL

    def partial(b: pa.Table) -> pa.Table:
        # Arrow's regex kernels are RE2 — same \x{...} class syntax as the
        # DuckDB oracle, so prediction semantics are pinned to one engine.
        text = b.column("text").combine_chunks()
        has_kana = pc.fill_null(
            pc.match_substring_regex(text, JP_KANA_SQL), False
        ).to_numpy(zero_copy_only=False)
        has_cjk = pc.fill_null(
            pc.match_substring_regex(text, CJK_SQL), False
        ).to_numpy(zero_copy_only=False)
        preds = np.where(has_kana, "ja", np.where(has_cjk, "zh", "en"))
        t = pa.table(
            {
                "label_lang": b.column("lang"),
                "pred_lang": pa.array(preds, type=pa.string()),
                "one": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )
        g = t.group_by(["label_lang", "pred_lang"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "label_lang": g.column("label_lang"),
                "pred_lang": g.column("pred_lang"),
                "n": g.column("one_sum").cast(pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label_lang": b.column("label_lang"),
                "pred_lang": b.column("pred_lang"),
                "n": b.column("sum(n)").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label_lang", "pred_lang"])
        .sum("n")
        .map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------------ flat-JSON field extraction

def _json_field_pattern(field: str) -> str:
    """RE2 pattern extracting ``field``'s scalar value from a FLAT JSON
    object.  Two named branches: ``s`` captures a quoted string body (escape
    sequences kept verbatim, not unescaped), ``r`` captures a bare scalar
    token (number / true / false / null).  ``r`` is non-empty whenever its
    branch participates, which is how the two branches are told apart —
    pyarrow's extract_regex fills non-participating groups with ""."""
    esc = "".join(c if c.isalnum() or c in "_-" else "\\" + c for c in field)
    return (
        '"' + esc + '"\\s*:\\s*'
        '(?:"(?P<s>(?:[^"\\\\]|\\\\.)*)"|(?P<r>[^,}\\]\\s]+))'
    )


def json_field(col: "pa.Array | pa.ChunkedArray", field: str) -> pa.Array:
    """Vectorized scalar-field extraction from a flat-JSON string column
    (one ``pc.extract_regex`` kernel call, no Python row loop).

    Parity target is DuckDB ``json_extract_string(col, '$.field')``:
    missing field / unparsable row / JSON ``null`` → null; numbers and
    booleans come back as their literal token text; strings come back
    unquoted.  Deliberate fast-path limits (documented, test-pinned): the
    object must be flat (no nested objects/arrays holding a same-named key)
    and string values are not unescaped.  At 100 TB this is the difference
    between an Arrow C++ scan and a per-row ``json.loads`` — the strict
    general case belongs in an actor-pool stage with a real parser."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    st = pc.extract_regex(col, _json_field_pattern(field))
    s = pc.struct_field(st, "s")
    r = pc.struct_field(st, "r")
    raw = pc.not_equal(r, "")          # raw branch participated
    val = pc.if_else(raw, r, s)
    # JSON null literal → SQL NULL (json_extract_string parity)
    return pc.if_else(pc.equal(val, "null"), pa.nulls(len(val), pa.string()), val)


def json_int_field(col, field: str) -> pa.Array:
    """``json_field`` then cast to int64 (nulls propagate)."""
    return pc.cast(json_field(col, field), pa.int64())


def json_grouped_stats(
    ds: "ray.data.Dataset",
    group_col: str,
    json_col: str,
    field: str,
) -> "pd.DataFrame":
    """Per-group stats of an integer JSON field: row count, sum, and EXACT
    distinct-value count.

    Shape: in-batch extract + ``group_by (group, value)`` partial (shrinks a
    batch to its distinct pairs before anything is shuffled) → ONE Ray
    groupby over ``(group, value)`` → per-block second-level partials →
    driver fold bounded by |groups| × blocks.  The only all-to-all moves one
    row per distinct (group, value) pair per batch; the distinct count is
    exact because the shuffle co-locates equal pairs."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "grp": b.column(group_col),
                "val": json_int_field(b.column(json_col), field),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["grp", "val"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "grp": g.column("grp"),
                "val": g.column("val"),
                "n": g.column("one_sum").cast(pa.int64()),
            }
        )

    def second(b: pa.Table) -> pa.Table:
        # rows are distinct (grp, val) pairs after the shuffle; nulls (field
        # absent / JSON null) count toward n_events but not sum/distinct,
        # matching SQL aggregate null semantics
        n = b.column("sum(n)").cast(pa.int64())
        val = b.column("val")
        valid = pc.is_valid(val)
        val0 = pc.fill_null(val, 0)
        contrib = pc.multiply_checked(n, val0)
        t = pa.table(
            {
                "grp": b.column("grp"),
                "n_events": n,
                "sum_k": pc.if_else(valid, contrib, pa.scalar(0, pa.int64())),
                "n_distinct_k": pc.cast(valid, pa.int64()),
            }
        )
        g = t.group_by("grp").aggregate(
            [("n_events", "sum"), ("sum_k", "sum"), ("n_distinct_k", "sum")]
        )
        return pa.table(
            {
                "grp": g.column("grp"),
                "n_events": g.column("n_events_sum"),
                "sum_k": g.column("sum_k_sum"),
                "n_distinct_k": g.column("n_distinct_k_sum"),
            }
        )

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["grp", "val"])
        .sum("n")
        .map_batches(second, batch_format="pyarrow")
    )
    parts = [b.to_pandas() for b in pairs.iter_batches(batch_format="pyarrow")]
    out = (
        pd.concat(parts, ignore_index=True)
        .groupby("grp", as_index=False)[["n_events", "sum_k", "n_distinct_k"]]
        .sum()
        .rename(columns={"grp": group_col})
    )
    return out.astype(
        {"n_events": "int64", "sum_k": "int64", "n_distinct_k": "int64"}
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
) -> "pd.DataFrame":
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res): each row draws key = u^(1/w) with u a reproducible
    md5-uniform of its id, and the global top-k keys are the sample —
    P(selection) is proportional-to-weight-without-replacement, and the
    whole draw replays bit-identically on any partitioning (importance
    sampling for training mixes that must be auditable).

    u = (md5₅₂(id) + 1) / 2⁵², a 52-bit integer ratio — every u is an
    EXACT double.  pow() itself differs from DuckDB's by ≤1 ulp (neither
    libm is correctly rounded), but adjacent sample keys are separated by
    orders of magnitude more than 1 ulp (measured ≥1e-14 in the top-300 at
    150k rows vs 2e-16 ulp), so the SELECTED SET — the operator's contract
    — is identical; only key values may differ in the last bit.  Per-batch
    local top-k (a global top-k row survives its batch's top-k) → bounded
    driver merge; ties break on id.  Per-row md5 is the documented
    SQL-reproducibility trade (see stratified_sample).  Weights must be
    strictly positive (raises otherwise — u^(1/w) is undefined at w ≤ 0).
    """
    import hashlib

    two52 = float(1 << 52)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy().astype(np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_sample requires strictly positive weights")
        h = np.fromiter(
            (
                int(hashlib.md5(str(i).encode("utf-8")).hexdigest()[:13], 16)
                for i in ids
            ),
            dtype=np.float64,
            count=len(ids),
        )
        u = (h + 1.0) / two52
        key = np.power(u, 1.0 / w)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        return pa.table(
            {
                id_col: pa.array(ids[order], type=pa.int64()),
                weight_col: pa.array(w[order]),
                "skey": pa.array(key[order]),
            }
        )

    cand = ds.select_columns([id_col, weight_col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    cand = cand.sort_values(
        ["skey", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return cand.drop(columns=["skey"]).reset_index(drop=True)


# ------------------------------------------------------ domain mixture plan

def domain_mixture(
    ds: "ray.data.Dataset",
    domain_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    alpha: float = 0.7,
) -> "pd.DataFrame":
    """Training-mixture planner: per domain (the ``domain_cols`` tuple),
    doc count, whitespace-token count, and a temperature-scaled sampling
    weight ``w_d ∝ n_tokens_d^alpha`` (the multilingual up/down-sampling
    rule of mBERT/XLM-R; alpha=1 is proportional, alpha→0 uniform).

    Shape: per-batch partial (domain, docs, tokens) groupby → one small
    groupby-sum over #domains rows → the weight normalization is a driver
    fold over the bounded domain list (10^4 domains ≪ driver memory at any
    corpus size).  ``weight_ppm`` is floor(1e6·pow(n,α)/Σpow + 0.5) in
    float64 on both sides; like ``weighted_sample``'s pinned pow note, the
    oracle's unordered Σpow can differ by ~1 ulp from the driver fold — a
    ppm boundary flip needs the fractional part within ~1e-10 of 0.5
    (verified exact at every sf in this repo's testdata).
    """
    import pandas as pd
    import ray.data  # noqa: F401  (ds is already a Dataset)

    dcols = list(domain_cols)

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        toks = np.fromiter(
            (len((x or "").split()) for x in texts), dtype=np.int64, count=len(texts)
        )
        base = pa.table(
            {**{c: t.column(c) for c in dcols},
             "n_tokens": pa.array(toks, type=pa.int64())}
        )
        g = base.group_by(dcols).aggregate([("n_tokens", "sum"), ([], "count_all")])
        return pa.table(
            {**{c: g.column(c) for c in dcols},
             "n_docs": g.column("count_all").cast(pa.int64()),
             "n_tokens": g.column("n_tokens_sum").cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(dcols)
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
    )
    agg = agg.sort_values(dcols, kind="mergesort").reset_index(drop=True)
    n = agg["n_tokens"].to_numpy(dtype=np.float64)
    p = np.power(n, float(alpha))
    z = float(p.sum())
    agg["weight_ppm"] = np.floor(p * 1e6 / z + 0.5).astype(np.int64) if z else 0
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["n_tokens"] = agg["n_tokens"].astype(np.int64)
    return agg[dcols + ["n_docs", "n_tokens", "weight_ppm"]]
