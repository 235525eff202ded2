"""Query engine facade: shard actor pool + driver-side merge + hydration.

Query lifecycle (SURVEY §3.4): driver tokenizes the query with the same
conformance tokenizer as indexing → looks up df for the query's terms in the
vocabulary → computes signed per-term weights (idf × multiplicity) → fans
out to the shard actors (each holding a document-partition range) → merges
per-shard exact top-k by (score DESC, doc_num ASC) → optionally hydrates
(conv_id, turn_idx, text) from the docs parquet (J2 broadcast-small-side
lookup: the top-k id list is tiny).

Vocabulary lookup is a driver-side point lookup: the vocab parquet is
term-sorted, so at scale the df of ≤~10 query terms is a predicate-pushdown
read over row groups; below ``VOCAB_INMEM_LIMIT`` rows it is simply loaded
into a dict once.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray

from oboyu_ray.config import BM25Config
from oboyu_ray.stages.postings import get_tokenizer
from oboyu_ray.stages.stats import idf
from oboyu_ray.state.shards import IndexShard, _merge_topk, _merge_topk_multi

VOCAB_INMEM_LIMIT = 5_000_000


def _fuzzy_scan_table(path: str, q: str, d: int, cap: int) -> Dict[str, int]:
    """Sweep ONE vocab parquet file for terms within levenshtein distance
    ``d`` of ``q``: vectorized utf8_length band filter (cheap, kills ~70-90%
    of rows before any string leaves Arrow), then the banded DP on the
    survivors.  Stops early past ``cap`` matches (the caller raises)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from oboyu_ray.pipelines.bm25_batch import lev_at_most

    from oboyu_ray.pipelines.bm25_batch import fuzzy_mask

    t = _pq.read_table(path, columns=["term", "df"])
    lens = pc.utf8_length(t.column("term"))
    lq = len(q)
    band = pc.and_(pc.greater_equal(lens, lq - d), pc.less_equal(lens, lq + d))
    t = t.filter(band)
    terms = t.column("term").to_pylist()
    m = fuzzy_mask(terms, q, d)
    dfs = t.column("df").to_pylist()
    out: Dict[str, int] = {}
    for ix in np.flatnonzero(m):
        out[terms[ix]] = int(dfs[ix])
        if len(out) > cap:
            break
    return out


# num_cpus=0: the engine's shard actors typically reserve EVERY cluster CPU,
# so a 1-CPU task here would never schedule (observed deadlock at 32 actors
# on 32 CPUs).  The sweep is a short read+vectorized-compare burst; brief
# oversubscription is the correct trade.
_scan_vocab_fuzzy_file = ray.remote(num_cpus=0)(_fuzzy_scan_table)


def _regex_scan_table(path: str, anchored: str, cap: int) -> Dict[str, int]:
    """Sweep ONE vocab parquet file for terms fully matching ``anchored``
    (an ``^(?:...)$`` RE2 pattern): a single vectorized
    ``match_substring_regex`` over the term column — no per-term Python.
    Stops early past ``cap`` matches (the caller raises)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=["term", "df"])
    m = pc.match_substring_regex(t.column("term"), pattern=anchored)
    t = t.filter(m)
    out: Dict[str, int] = {}
    for term, df in zip(t.column("term").to_pylist(), t.column("df").to_pylist()):
        out[term] = int(df)
        if len(out) > cap:
            break
    return out


# same num_cpus=0 rationale as the fuzzy sweep above
_scan_vocab_regex_file = ray.remote(num_cpus=0)(_regex_scan_table)


class VocabLookup:
    """df lookup for query terms.

    Small vocabularies load into one dict.  Beyond ``VOCAB_INMEM_LIMIT`` the
    lookup exploits the build's bucketed layout: a term lives in exactly
    vocab-{crc32(term) % B}.parquet, so a query reads ≤ |query terms| files
    (term-sorted row groups inside), not the whole directory — the point
    lookup stays O(terms) regardless of vocabulary size."""

    def __init__(self, vocab_dir: str) -> None:
        self.vocab_dir = vocab_dir
        files = [
            os.path.join(vocab_dir, f)
            for f in sorted(os.listdir(vocab_dir))
            if f.endswith(".parquet")
        ]
        self.files = files
        total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        self.n_terms = total
        # bucketed layout: contiguous vocab-00000..vocab-{B-1} (the build's
        # invariant, enforced by its bucket GC)
        import re as _re

        idx = sorted(
            int(m.group(1))
            for f in files
            if (m := _re.search(r"vocab-(\d{5})\.parquet$", f))
        )
        self._bucketed = bool(files) and idx == list(range(len(files)))
        # beyond-the-limit vocabularies: bounded per-term df memo so
        # repeated query terms skip the file lookup entirely
        self._df_cache: Dict[str, int] = {}
        self._df_cache_cap = 200_000
        # open ParquetFile handles + per-row-group min-term statistics
        # (vocab files are term-sorted with small row groups, so a point
        # lookup is: binary-search the row group, read ONLY it, searchsorted
        # inside — measured ~2 ms vs 50-300 ms for read_table(filters=...))
        self._pf_cache: Dict[str, tuple] = {}
        self._map: Optional[Dict[str, int]] = None
        if total <= VOCAB_INMEM_LIMIT:
            m: Dict[str, int] = {}
            for f in files:
                t = pq.read_table(f, columns=["term", "df"])
                m.update(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))
            self._map = m

    def _point_lookup(self, f: str, terms_sorted: List[str]) -> Dict[str, int]:
        """df of sorted terms from one term-sorted vocab file via row-group
        statistics: binary-search the covering row group per term, decode
        only the needed groups, searchsorted inside.  Terms absent from the
        vocabulary simply don't appear in the result (df 0 upstream)."""
        import bisect

        cached = self._pf_cache.get(f)
        if cached is None:
            pf = pq.ParquetFile(f)
            mins = [
                pf.metadata.row_group(i).column(0).statistics.min
                for i in range(pf.metadata.num_row_groups)
            ]
            cached = (pf, mins)
            self._pf_cache[f] = cached
        pf, mins = cached
        if not mins:
            return {}
        by_group: Dict[int, List[str]] = {}
        for t in terms_sorted:
            gi = max(bisect.bisect_right(mins, t) - 1, 0)
            by_group.setdefault(gi, []).append(t)
        out: Dict[str, int] = {}
        for gi, ts in by_group.items():
            tb = pf.read_row_group(gi, columns=["term", "df"])
            col = tb.column("term").to_pylist()
            dfs = tb.column("df").to_pylist()
            for t in ts:
                ix = bisect.bisect_left(col, t)
                if ix < len(col) and col[ix] == t:
                    out[t] = int(dfs[ix])
        return out

    def df_prefix(self, prefix: str, max_terms: int = 1000) -> Dict[str, int]:
        """df for EVERY vocabulary term starting with ``prefix`` — the
        PrefixQuery expansion.  The vocabulary is hash-BUCKETED by term, so
        the range scan visits all B bucket files, but each is term-sorted
        with small row groups: per file only the row groups overlapping
        [prefix, prefix+U+FFFF) decode (row-group min statistics, same
        machinery as the point lookup).  Raises when the expansion exceeds
        ``max_terms`` — an unbounded wildcard ("a*") is a user error, not a
        silent 100k-term OR query."""
        if not prefix:
            raise ValueError("df_prefix: empty prefix")
        hi = prefix + "￿"  # exclusive upper bound of the prefix range
        out: Dict[str, int] = {}
        if self._map is not None:
            # lazily pack the vocabulary once (sorted term list + aligned
            # df array): every expansion is then two bisects + one slice —
            # the per-item startswith sweep measured 26-35 ms at 279k terms,
            # this ~0.1 ms
            import bisect

            cache = getattr(self, "_pfx_sorted", None)
            if cache is None:
                terms = sorted(self._map.keys())
                dfs_np = np.fromiter(
                    (self._map[t] for t in terms), dtype=np.int64,
                    count=len(terms),
                )
                cache = self._pfx_sorted = (terms, dfs_np)
            terms, dfs_np = cache
            i0 = bisect.bisect_left(terms, prefix)
            i1 = bisect.bisect_left(terms, hi)
            out = {
                t: int(d) for t, d in zip(terms[i0:i1], dfs_np[i0:i1])
            }
        else:
            import bisect

            for f in self.files:
                cached = self._pf_cache.get(f)
                if cached is None:
                    pf = pq.ParquetFile(f)
                    mins = [
                        pf.metadata.row_group(i).column(0).statistics.min
                        for i in range(pf.metadata.num_row_groups)
                    ]
                    cached = (pf, mins)
                    self._pf_cache[f] = cached
                pf, mins = cached
                if not mins:
                    continue
                g0 = max(bisect.bisect_right(mins, prefix) - 1, 0)
                g1 = bisect.bisect_left(mins, hi)  # first group past the range
                for gi in range(g0, min(g1, len(mins))):
                    tb = pf.read_row_group(gi, columns=["term", "df"])
                    col = tb.column("term").to_pylist()
                    lo_ix = bisect.bisect_left(col, prefix)
                    hi_ix = bisect.bisect_left(col, hi)
                    for t, d in zip(col[lo_ix:hi_ix], tb.column("df").to_pylist()[lo_ix:hi_ix]):
                        out[t] = int(d)
                if len(out) > max_terms:
                    break  # raise below with the (partial) count
        if len(out) > max_terms:
            raise ValueError(
                f"prefix {prefix!r} expands to >{max_terms} terms; "
                "narrow the prefix or raise max_terms"
            )
        return out

    def df_regex(
        self, pattern: str, max_terms: int = 1000, parallel: bool = True,
        literal_prefix: str = "",
    ) -> Dict[str, int]:
        """df for EVERY vocabulary term fully matching ``pattern`` (RE2,
        implicit anchors — Lucene RegexpQuery semantics).  In-memory
        vocabularies answer with one vectorized ``match_substring_regex``
        over the packed sorted term list; beyond the limit the hash-bucketed
        files sweep as parallel Ray tasks (the same fan-out shape as
        ``df_fuzzy`` — a regex has no hash locality).  ``literal_prefix``
        (the pattern's leading literal run, supplied by the wildcard
        rewrite) prunes the sweep to the covering term range exactly like
        ``df_prefix``.  Raises past ``max_terms`` — an unbounded ``.*`` is a
        user error, not a silent full-vocabulary OR query."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        if not pattern:
            raise ValueError("df_regex: empty pattern")
        anchored = f"^(?:{pattern})$"
        out: Dict[str, int] = {}
        if self._map is not None:
            import bisect

            cache = getattr(self, "_pfx_sorted", None)
            if cache is None:
                terms = sorted(self._map.keys())
                dfs_np = np.fromiter(
                    (self._map[t] for t in terms), dtype=np.int64,
                    count=len(terms),
                )
                cache = self._pfx_sorted = (terms, dfs_np)
            terms, dfs_np = cache
            i0, i1 = 0, len(terms)
            if literal_prefix:
                i0 = bisect.bisect_left(terms, literal_prefix)
                i1 = bisect.bisect_left(terms, literal_prefix + "￿")
            sl = terms[i0:i1]
            m = _pc.match_substring_regex(
                _pa.array(sl, type=_pa.string()), pattern=anchored
            ).to_numpy(zero_copy_only=False)
            for ix in np.flatnonzero(m):
                out[sl[int(ix)]] = int(dfs_np[i0 + int(ix)])
        elif parallel and len(self.files) > 1:
            futs = [
                _scan_vocab_regex_file.remote(f, anchored, max_terms)
                for f in self.files
            ]
            for part in ray.get(futs):
                out.update(part)
        else:
            for f in self.files:
                out.update(_regex_scan_table(f, anchored, max_terms))
                if len(out) > max_terms:
                    break
        if len(out) > max_terms:
            raise ValueError(
                f"regex {pattern!r} expands to >{max_terms} terms; "
                "narrow the pattern or raise max_terms"
            )
        return out

    def df_fuzzy(
        self, term: str, max_edits: int = 1, max_terms: int = 1000,
        parallel: bool = True,
    ) -> Dict[str, int]:
        """df for EVERY vocabulary term within levenshtein distance
        ``max_edits`` of ``term`` — the FuzzyQuery expansion.  The vocabulary
        is hash-bucketed by term, so NO range pruning applies (one edit
        changes the hash and the sort position): the expansion is a full
        vocabulary sweep with a vectorized length prefilter.  Bucket files
        are independent, so beyond-the-limit vocabularies sweep them as
        parallel Ray tasks (``parallel=True``) — wall time = one bucket's
        decode, the same fan-out shape a multi-node cluster would run.

        Scale path: when the FastSS deletion-neighborhood sidecar is built
        (``state/fuzzy_index.py``, CLI ``build-fuzzy``), the expansion is
        O(len(q)) POINT READS — flat in vocabulary size — and this method
        routes through it automatically (measured 14-36 ms at 4.2M terms
        vs 19-245 ms for the packed in-mem scan; 2.0 GB sidecar for the
        82M deletion variants — the explicit storage-for-latency trade).

        Raises when the expansion exceeds ``max_terms`` like ``df_prefix``
        (a distance-2 two-char query is an unbounded OR, not a search)."""
        if not term:
            raise ValueError("df_fuzzy: empty term")
        q = term.strip().lower()
        d = int(max_edits)
        # FastSS sidecar (state/fuzzy_index.py), when built for this index
        # and covering d: O(len(q)) point reads instead of any sweep
        sc = self._sidecar()
        if sc is not None and d <= sc.max_edits:
            return sc.lookup(q, d, max_terms=max_terms)
        out: Dict[str, int] = {}
        if self._map is not None:
            # lazily pre-pack the vocab once (length-sorted flat codepoints):
            # per-query expansion is then zero-copy vectorized compares —
            # the dict-items Python loop measured 0.2-1.6 s at 4.2M terms,
            # the packed sweep ~10-40 ms
            from oboyu_ray.pipelines.bm25_batch import FuzzyVocab

            cache = getattr(self, "_fz_packed", None)
            if cache is None:
                terms = list(self._map.keys())
                dfs_np = np.fromiter(
                    self._map.values(), dtype=np.int64, count=len(terms)
                )
                cache = self._fz_packed = (FuzzyVocab(terms), terms, dfs_np)
            fv, terms, dfs_np = cache
            for ix in fv.candidates(q, d):
                out[terms[int(ix)]] = int(dfs_np[int(ix)])
        elif parallel and len(self.files) > 1:
            futs = [
                _scan_vocab_fuzzy_file.remote(f, q, d, max_terms)
                for f in self.files
            ]
            for part in ray.get(futs):
                out.update(part)
        else:
            for f in self.files:
                out.update(_fuzzy_scan_table(f, q, d, max_terms))
                if len(out) > max_terms:
                    break
        if len(out) > max_terms:
            raise ValueError(
                f"fuzzy {q!r}~{d} expands to >{max_terms} terms; "
                "lower max_edits or raise max_terms"
            )
        return out

    def _sidecar(self):
        if not hasattr(self, "_sc"):
            from oboyu_ray.state.fuzzy_index import open_sidecar

            self._sc = open_sidecar(os.path.dirname(self.vocab_dir))
        return self._sc

    def df(self, terms: Sequence[str]) -> Dict[str, int]:
        if self._map is not None:
            return {t: self._map.get(t, 0) for t in terms}
        import zlib

        out = {t: 0 for t in terms}
        missing = [t for t in set(terms) if t not in self._df_cache]
        for t in set(terms) - set(missing):
            out[t] = self._df_cache[t]
        if not missing:
            return out
        tset = sorted(missing)
        if self._bucketed:
            by_file: Dict[str, list] = {}
            B = len(self.files)
            for t in tset:
                f = os.path.join(self.vocab_dir, f"vocab-{zlib.crc32(t.encode('utf-8')) % B:05d}.parquet")
                by_file.setdefault(f, []).append(t)
            for f, ts in by_file.items():
                out.update(self._point_lookup(f, sorted(ts)))
        else:
            for f in self.files:
                t = pq.read_table(f, columns=["term", "df"], filters=[("term", "in", tset)])
                out.update(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))
        if len(self._df_cache) + len(tset) > self._df_cache_cap:
            self._df_cache.clear()
        for t in tset:  # absent terms memoize as 0 — df=0 is a valid answer
            self._df_cache[t] = out[t]
        return out


class ConvResolver:
    """doc_num ↔ (conv_id, turn_idx) via ConvMapHandle: in-memory
    searchsorted below the conversation-count threshold, per-call range
    reads of only the covering conv-map files above it — neither build nor
    query ever loads the full conversation space at scale."""

    def __init__(self, index_dir: str, conv_inmem_limit: Optional[int] = None) -> None:
        from oboyu_ray.pipelines.build_index import CONV_INMEM_LIMIT, ConvMapHandle

        self._handle = ConvMapHandle(
            index_dir,
            inmem_limit=CONV_INMEM_LIMIT if conv_inmem_limit is None else conv_inmem_limit,
        )

    def resolve(self, doc_nums: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self._handle.resolve(np.asarray(doc_nums, dtype=np.int64))


# shard fan-out width above which the driver stops merging every shard's
# top-k itself and interposes aggregator actors (two-level merge, DESIGN §5:
# per-node aggregator over its shards, driver over aggregators)
MERGE_FANOUT = 64


def _read_doc_texts_local(path: str, wanted: list):
    """One part's hydration point-read: (doc_nums, texts) for the wanted
    ids — row-group predicate pushdown keeps it metadata-scale."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=["doc_num", "text"],
                       filters=[("doc_num", "in", wanted)])
    return t.column("doc_num").to_pylist(), t.column("text").to_pylist()


# num_cpus=0: hydration reads must schedule while shard actors hold every
# CPU (same rule as the fuzzy bucket sweeps)
_read_doc_texts = ray.remote(num_cpus=0)(_read_doc_texts_local)


class MergeAggregator:
    """Intermediate merge tier: owns a group of shard actors, fans a query
    to them, merges their exact top-ks, returns one top-k — same query /
    query_many interface as IndexShard, so the driver code is agnostic.
    At 256 nodes one aggregator runs per node over its local shards and the
    driver merges #nodes results instead of #shards."""

    def __init__(self, shard_actors: List) -> None:
        self.shards = shard_actors

    def query(self, term_weights: Dict[str, float], k: int, theta0: float = None,
              exclude_terms: Sequence[str] = (), scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query.remote(
                    term_weights, k, exclude_terms=exclude_terms, scope=scope
                )
                for s in self.shards
            ]
        ), k)

    def query_all(self, term_weights: Dict[str, float], k: int,
                  exclude_terms: Sequence[str] = (), scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_all.remote(
                    term_weights, k, exclude_terms=exclude_terms, scope=scope
                )
                for s in self.shards
            ]
        ), k)

    def query_bool(self, tree, term_weights: Dict[str, float], k: int,
                   scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_bool.remote(tree, term_weights, k, scope=scope)
                for s in self.shards
            ]
        ), k)

    def query_synonym(self, groups, group_weights, k: int, scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_synonym.remote(groups, group_weights, k, scope=scope)
                for s in self.shards
            ]
        ), k)

    def query_dismax(self, term_weights: Dict[str, float], tiebreak: float,
                     k: int, scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_dismax.remote(term_weights, tiebreak, k, scope=scope)
                for s in self.shards
            ]
        ), k)

    def explain(self, term_weights: Dict[str, float], doc_abs: int):
        import ray as _ray

        out = []
        for rows in _ray.get(
            [s.explain.remote(term_weights, doc_abs) for s in self.shards]
        ):
            out.extend(rows)
        return out

    def query_term_range(self, lo: str, hi: str,
                         term_weights: Dict[str, float], k: int,
                         exclude_terms: Sequence[str] = (), scope=None,
                         weights_key=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_term_range.remote(
                    lo, hi, term_weights, k, exclude_terms=exclude_terms,
                    scope=scope, weights_key=weights_key,
                )
                for s in self.shards
            ]
        ), k)

    def query_phrase(self, phrase_terms: List[str], term_weights: Dict[str, float],
                     k: int, scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_phrase.remote(phrase_terms, term_weights, k, scope=scope)
                for s in self.shards
            ]
        ), k)

    def count_matches(self, terms: List[str], require_all: bool = False,
                      exclude_terms: Sequence[str] = (), scope=None):
        import ray as _ray

        return sum(_ray.get(
            [
                s.count_matches.remote(
                    terms, require_all=require_all,
                    exclude_terms=exclude_terms, scope=scope,
                )
                for s in self.shards
            ]
        ))

    def query_span_near(self, phrase_terms: List[str], window: int,
                        term_weights: Dict[str, float], k: int, scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_span_near.remote(
                    phrase_terms, window, term_weights, k, scope=scope
                )
                for s in self.shards
            ]
        ), k)

    def query_near(self, term_a: str, term_b: str, window: int,
                   term_weights: Dict[str, float], k: int, scope=None):
        import ray as _ray

        return _merge_topk_multi(_ray.get(
            [
                s.query_near.remote(term_a, term_b, window, term_weights, k,
                                    scope=scope)
                for s in self.shards
            ]
        ), k)

    def query_phrase_many(self, phrase_lists, weights_list, k: int):
        import ray as _ray

        per_shard = _ray.get(
            [
                s.query_phrase_many.remote(phrase_lists, weights_list, k)
                for s in self.shards
            ]
        )
        return [
            _merge_topk_multi([sr[j] for sr in per_shard], k)
            for j in range(len(phrase_lists))
        ]

    def query_many(self, weight_dicts, k: int, require_all: bool = False,
                   exclude_terms=(), scope=None):
        import ray as _ray

        per_shard = _ray.get(
            [
                s.query_many.remote(
                    weight_dicts, k, require_all,
                    exclude_terms=exclude_terms, scope=scope,
                )
                for s in self.shards
            ]
        )
        return [
            _merge_topk_multi([sr[j] for sr in per_shard], k)
            for j in range(len(weight_dicts))
        ]

    def count_many(self, term_lists, require_all: bool = False):
        import ray as _ray

        per_shard = _ray.get(
            [s.count_many.remote(term_lists, require_all) for s in self.shards]
        )
        return [
            sum(sr[j] for sr in per_shard) for j in range(len(term_lists))
        ]


class QueryEngine:
    """Facade over the shard actor pool.  Create once, query many times."""

    def __init__(
        self,
        index_dir: str,
        num_shards: Optional[int] = None,
        cfg: Optional[BM25Config] = None,
        conv_inmem_limit: Optional[int] = None,
        merge_fanout: int = MERGE_FANOUT,
        stats_override: Optional[Dict] = None,
    ) -> None:
        """``stats_override``: replace this index's global statistics
        (N / total_dl / avgdl) with externally merged ones — the federated
        multi-index path.  Shards then receive BOTH the query avgdl and the
        build avgdl so the stored block-max bounds rescale soundly (see
        IndexShard.configure)."""
        self.index_dir = index_dir
        self._conv_inmem_limit = conv_inmem_limit
        self._merge_fanout = max(1, merge_fanout)
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.build_avgdl = float(self.stats["avgdl"]) or 1.0
        if stats_override is not None:
            self.stats = {**self.stats, **stats_override}
        with open(os.path.join(index_dir, "build_report.json")) as f:
            self.report = json.load(f)
        # query-time tokenization must match the INDEX's tokenizer settings
        # (the reference builds its query tokenizer identically to its index
        # tokenizer, service_registry.py:75-80): reconstruct the full BM25
        # config from the build report unless the caller overrides it
        bc = self.report.get("config", {}).get("bm25", {})
        if cfg is None:
            defaults = BM25Config()
            cfg = BM25Config(
                k1=float(bc.get("k1", defaults.k1)),
                b=float(bc.get("b", defaults.b)),
                min_token_length=int(bc.get("min_token_length", defaults.min_token_length)),
                use_stopwords=bool(bc.get("use_stopwords", defaults.use_stopwords)),
                language=str(bc.get("language", defaults.language)),
                tokenizer_mode=str(bc.get("tokenizer_mode", defaults.tokenizer_mode)),
            )
        else:
            # k1/b are baked into the stored block-max bounds; querying with
            # different values would make pruning unsound — reject loudly
            built_k1 = float(bc.get("k1", cfg.k1))
            built_b = float(bc.get("b", cfg.b))
            if (cfg.k1, cfg.b) != (built_k1, built_b):
                raise ValueError(
                    f"index was built with k1={built_k1}, b={built_b}; "
                    f"override ({cfg.k1}, {cfg.b}) would invalidate the stored "
                    "block-max bounds — rebuild the index with the new values"
                )
        self.cfg = cfg
        self.k1 = float(bc.get("k1", self.cfg.k1))
        self.b = float(bc.get("b", self.cfg.b))
        self.window_docs = int(self.report.get("config", {}).get("window_docs", 8192))
        self.vocab = VocabLookup(os.path.join(index_dir, "vocab"))
        self.resolver = ConvResolver(index_dir, conv_inmem_limit=self._conv_inmem_limit)
        self.tokenizer = get_tokenizer(self.cfg)

        parts = [int(p) for p in self.report["parts"]]
        if num_shards is None:
            avail = int(ray.available_resources().get("CPU", 4))
            num_shards = max(1, min(len(parts), avail))
        assign: List[List[int]] = [parts[i::num_shards] for i in range(num_shards)]
        self._assign = [a for a in assign if a]
        self.actors: List = []
        self.aggregators: List = []
        self._pool_epoch = 0
        self._spawn_pool()

    def _spawn_pool(self) -> None:
        """(Re)create the shard actor pool from the on-disk index.  All
        shard state lives on disk (block tables, dl arrays, vocab), so a
        respawned pool answers every query identically — this is both the
        initial construction and the fault-recovery path."""
        for a in self.aggregators + self.actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        Shard = ray.remote(IndexShard)
        self.actors = [
            Shard.options(num_cpus=1).remote(self.index_dir, a, self.window_docs)
            for a in self._assign
        ]
        avgdl = float(self.stats["avgdl"]) or 1.0
        ray.get([
            a.configure.remote(self.k1, self.b, avgdl, build_avgdl=self.build_avgdl)
            for a in self.actors
        ])

        # two-level merge beyond the fan-out width: ~sqrt-sized groups of
        # shards behind aggregator actors (num_cpus=0 — they only wait+merge)
        self.aggregators = []
        if len(self.actors) > self._merge_fanout:
            import math

            n_groups = math.ceil(math.sqrt(len(self.actors)))
            Agg = ray.remote(MergeAggregator)
            self.aggregators = [
                Agg.options(num_cpus=0).remote(self.actors[g::n_groups])
                for g in range(n_groups)
                if self.actors[g::n_groups]
            ]
        self._targets = self.aggregators or self.actors
        # bumped on every respawn: in-flight pipelined handles stamped with
        # an older epoch know the pool was already rebuilt (see _fanout_wait)
        self._pool_epoch += 1

    def _fanout(self, submit):
        """ray.get(submit(targets)) with one-shot fault recovery: a dead
        shard/aggregator actor (node loss, OOM kill) raises RayActorError —
        respawn the whole pool from disk and re-issue.  Queries are pure
        reads, so the retry is idempotent and rank-identical.

        An EMPTY target list (engine was close()d) must respawn EAGERLY:
        fanning out to zero actors raises nothing and would silently return
        an empty — wrong — result.  (This exact bug made every historical
        bench QPS ladder measure empty calls: bench.py closed the engine
        before its QPS loop.  Found round 4; see BASELINE.)"""
        return self._fanout_wait(self._fanout_submit(submit), submit,
                                 self._pool_epoch)

    def _fanout_submit(self, submit):
        """Issue the fan-out WITHOUT waiting — returns the in-flight object
        refs.  Pair with ``_fanout_wait``; the split is what lets a serving
        loop keep the next batch executing on the shard actors while the
        driver merges the previous one (pipelined batched search)."""
        if not self._targets:
            self._spawn_pool()
        return submit(self._targets)

    def _fanout_wait(self, refs, submit, epoch):
        """ray.get(refs) with the one-shot fault recovery described above;
        ``submit`` re-issues the same pure-read work after a respawn.

        ``epoch`` is the pool epoch the refs were submitted against: with
        SEVERAL pipelined handles in flight, the first failed wait respawns
        the pool ONCE and bumps the epoch — later handles' refs still point
        at dead actors, but their waits see the newer epoch and only
        re-issue against the already-healthy pool instead of discarding it
        (one actor death must not cost one full pool rebuild per queued
        handle)."""
        try:
            return ray.get(refs)
        except ray.exceptions.RayActorError:
            pass  # a target actor died
        except ray.exceptions.RayTaskError as e:
            # an aggregator survived but one of ITS shards died mid-merge
            if not isinstance(e.cause, ray.exceptions.RayActorError):
                raise
        if epoch == self._pool_epoch:
            self._spawn_pool()
        return ray.get(submit(self._targets))

    # ------------------------------------------------------------ querying

    @staticmethod
    def _weights_from_dfs(terms: List[str], dfs: Dict[str, int], n: int) -> Dict[str, float]:
        weights: Dict[str, float] = {}
        for t in terms:
            if dfs.get(t, 0) > 0:
                weights[t] = weights.get(t, 0.0) + idf(int(dfs[t]), n)
        return weights

    def term_weights(self, terms: List[str]) -> Dict[str, float]:
        """idf × multiplicity per unique term (duplicate query terms double-
        count, reference bm25_indexer.py:332)."""
        return self._weights_from_dfs(terms, self.vocab.df(terms), int(self.stats["N"]))

    def search_terms(
        self, terms: List[str], k: int = 10, require_all: bool = False,
        exclude: Optional[List[str]] = None,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """``scope`` restricts candidates to the doc_num interval [lo, hi)
        — scoped retrieval (search inside a conversation range: doc numbers
        are contiguous per conversation by construction).  Statistics stay
        full-corpus; shards skip disjoint parts/windows outright."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        weights = self.term_weights(terms)
        if not weights:
            return empty
        if scope is not None:
            scope = (int(scope[0]), int(scope[1]))
            if scope[0] >= scope[1]:
                return empty
        # boolean NOT: only excluded terms that exist in the vocabulary can
        # exclude anything (df=0 terms are no-ops, dropped here so shards
        # skip the slice lookup)
        excl = sorted(
            t for t, d in self.vocab.df(sorted(set(exclude or []))).items() if d > 0
        )
        if require_all:
            # strict AND: a corpus-absent distinct term is unmatchable —
            # term_weights drops df=0 terms, so compare against the asked set
            if len(weights) < len(set(terms)):
                return empty
            results = self._fanout(
                lambda ts: [
                    a.query_all.remote(weights, k, exclude_terms=excl, scope=scope)
                    for a in ts
                ]
            )
        else:
            results = self._fanout(
                lambda ts: [
                    a.query.remote(weights, k, exclude_terms=excl, scope=scope)
                    for a in ts
                ]
            )
        top_docs, top_scores = _merge_topk_multi(results, k)
        return pd.DataFrame({"doc_num": top_docs, "score": top_scores})

    def search_prefix(
        self, prefix: str, k: int = 10, max_terms: int = 1000,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Wildcard ``pre*`` retrieval: expand the prefix against the
        vocabulary (bounded by ``max_terms``), then run the ordinary OR
        query over the expanded term set (idf per matched term,
        multiplicity 1) — Lucene's PrefixQuery → BooleanQuery rewrite.
        Unknown prefix → empty frame.  ``scope`` composes like search()."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        # engine-level expansion cache: the expansion and its weights are a
        # pure function of (prefix, index) — repeated prefixes skip the
        # vocabulary walk AND the object-store put.  The max_terms cap is
        # re-checked per call (it bounds the CALL, not the cache entry).
        cache = getattr(self, "_pfx_cache", None)
        if cache is None:
            cache = self._pfx_cache = {}
        ent = cache.get(prefix)
        if ent is None:
            dfs = self.vocab.df_prefix(prefix, max_terms=max_terms)
            n = int(self.stats["N"])
            weights = {t: idf(int(d), n) for t, d in dfs.items() if d > 0}
            # ray.put ships the expansion ONCE (re-serializing a 10^4-term
            # dict per actor call measured ~1 ms × #actors per query)
            ref = ray.put(weights) if weights else None
            while len(cache) >= 256:
                cache.pop(next(iter(cache)))
            ent = cache[prefix] = (len(dfs), weights, ref)
        n_exp, weights, weights_ref = ent
        if n_exp > max_terms:
            raise ValueError(
                f"prefix {prefix!r} expands to >{max_terms} terms; "
                "narrow the prefix or raise max_terms"
            )
        if not weights:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        # term-RANGE fan-out: the blocks layout is term-sorted, so shards
        # answer the prefix as one contiguous decode per part
        # (query_term_range) instead of per-term work over the expansion;
        # weights_key=prefix lets shards reuse per-range weight vectors.
        hi_bound = prefix + "￿"
        results = self._fanout(
            lambda ts: [
                a.query_term_range.remote(prefix, hi_bound, weights_ref, k,
                                          scope=scope, weights_key=prefix)
                for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_fuzzy(
        self, term: str, max_edits: int = 1, k: int = 10, max_terms: int = 1000,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Fuzzy ``term~d`` retrieval: expand the term against the vocabulary
        (every term within levenshtein distance ``max_edits``, bounded by
        ``max_terms``), then run the ordinary OR query over the expanded set
        (idf per matched term, multiplicity 1) — Lucene's FuzzyQuery →
        BooleanQuery rewrite, identical scoring to ``fuzzy_topk``.  Unknown
        neighborhood → empty frame.  ``scope`` composes like search()."""
        dfs = self.vocab.df_fuzzy(term, max_edits=max_edits, max_terms=max_terms)
        n = int(self.stats["N"])
        weights = {t: idf(int(d), n) for t, d in dfs.items() if d > 0}
        return self._search_expanded(weights, k, hydrate, resolve, scope)

    def _search_expanded(
        self, weights: Dict[str, float], k: int,
        hydrate: bool, resolve: bool, scope,
    ) -> pd.DataFrame:
        """OR query over a pre-expanded term→weight map (the shared tail of
        every multi-term rewrite: fuzzy / regex / wildcard).  ≥64 matched
        terms take the shards' wide-OR dense path automatically."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        if not weights:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        results = self._fanout(
            lambda ts: [a.query.remote(weights, k, scope=scope) for a in ts]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_regex(
        self, pattern: str, k: int = 10, max_terms: int = 1000,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
        _literal_prefix: str = "",
    ) -> pd.DataFrame:
        """Regex term retrieval: expand the pattern against the vocabulary
        (every term it FULLY matches — implicit anchors, RE2; bounded by
        ``max_terms``), then run the ordinary OR query over the expanded
        set (idf per matched term, multiplicity 1) — Lucene's RegexpQuery →
        BooleanQuery rewrite, identical scoring to ``regex_topk``.  No
        vocabulary match → empty frame.  ``scope`` composes like search().

        The expansion is a pure function of (pattern, index), so it memoizes
        like the prefix cache — a repeated pattern skips the vocabulary
        sweep entirely (measured 58 → ~11 ms p50 at 385k terms; the FIRST
        occurrence still pays one full RE2 scan of the vocabulary — exact
        general-regex matching has no sub-linear path without a
        term-automaton index).  The max_terms cap re-checks per call."""
        cache = getattr(self, "_rx_cache", None)
        if cache is None:
            cache = self._rx_cache = {}
        ent = cache.get(pattern)
        if ent is None:
            dfs = self.vocab.df_regex(
                pattern, max_terms=max_terms, literal_prefix=_literal_prefix
            )
            n = int(self.stats["N"])
            weights = {t: idf(int(d), n) for t, d in dfs.items() if d > 0}
            while len(cache) >= 256:
                cache.pop(next(iter(cache)))
            ent = cache[pattern] = (len(dfs), weights)
        n_exp, weights = ent
        if n_exp > max_terms:
            raise ValueError(
                f"regex {pattern!r} expands to >{max_terms} terms; "
                "narrow the pattern or raise max_terms"
            )
        return self._search_expanded(weights, k, hydrate, resolve, scope)

    def search_wildcard(
        self, pattern: str, k: int = 10, max_terms: int = 1000,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Wildcard term retrieval (``*`` any run, ``?`` one codepoint):
        rewrites to the equivalent anchored regex and reuses the regex
        path; the leading literal run (chars before the first metachar)
        prunes the vocabulary sweep to its covering term range.  A pure
        trailing-``*`` pattern (``lit*`` with no other metachars) IS a
        prefix query and routes to ``search_prefix``'s term-range fan-out —
        identical expansion and scoring (measured 62 → 18 ms p50 at sf0.1:
        shards answer one contiguous block decode instead of a wide-OR
        scatter over thousands of expanded terms)."""
        from oboyu_ray.pipelines.bm25_batch import wildcard_to_regex

        lit = []
        for ch in pattern:
            if ch in "*?":
                break
            lit.append(ch)
        literal = "".join(lit)
        if literal and pattern == literal + "*":
            return self.search_prefix(
                literal, k=k, max_terms=max_terms, hydrate=hydrate,
                resolve=resolve, scope=scope,
            )
        return self.search_regex(
            wildcard_to_regex(pattern), k=k, max_terms=max_terms,
            hydrate=hydrate, resolve=resolve, scope=scope,
            _literal_prefix=literal,
        )

    def more_like_this(
        self, doc_num: int, k: int = 10, n_terms: int = 10, min_df: int = 2,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """More-like-this (Lucene MoreLikeThis): hydrate the source turn's
        text (one point read), re-tokenize it with the indexing tokenizer,
        select its ``n_terms`` most characteristic terms by
        tf × ln(1+(N-df+0.5)/(df+0.5)) (the positive selection weight;
        df ≥ ``min_df``; ties (tfidf_micros DESC, term ASC) — identical
        selection to ``mlt_topk``), then run the ordinary signed-idf OR
        query over the selected set with the source document dropped from
        the merged result.  Unknown doc_num → empty frame."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        src = self._hydrate(pd.DataFrame({"doc_num": [int(doc_num)]}))
        text = src["text"].iloc[0] if len(src) else None
        if not text:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        from collections import Counter

        from oboyu_ray.fixedpoint import micros

        tf = Counter(self.tokenizer.tokenize(text))
        dfs = self.vocab.df(sorted(tf))
        n = int(self.stats["N"])
        import math

        cands = []
        for t, c in tf.items():
            d = int(dfs.get(t, 0))
            if d < min_df:
                continue
            selw = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            cands.append((-int(micros(float(c) * selw)), t, idf(d, n)))
        cands.sort()
        weights = {t: w for _, t, w in cands[:n_terms]}
        if not weights:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        # k+1 then drop the source doc — it may rank anywhere in its own
        # neighborhood (typically first)
        results = self._fanout(
            lambda ts: [a.query.remote(weights, k + 1, scope=scope) for a in ts]
        )
        top_docs, top_scores = _merge_topk_multi(results, k + 1)
        keep = top_docs != int(doc_num)
        out = pd.DataFrame(
            {"doc_num": top_docs[keep][:k], "score": top_scores[keep][:k]}
        )
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_bool(
        self, query: str, k: int = 10,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Boolean-expression retrieval: ``query`` is a ``(a AND b) OR c
        NOT d`` expression (see ``parse_bool_query``) over INDEX TERMS.
        Candidates must match ≥1 positive (non-negated) term; scoring is
        the signed-idf BM25 sum over the distinct positive terms present —
        identical to ``bool_topk``.  Terms are looked up verbatim (the
        boolean grammar names index terms directly; no tokenizer pass)."""
        from oboyu_ray.pipelines.bm25_batch import bool_leaves, parse_bool_query

        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        tree = parse_bool_query(query) if isinstance(query, str) else query
        pos_terms, _ = bool_leaves(tree)
        dfs = self.vocab.df(sorted(pos_terms))
        n = int(self.stats["N"])
        weights = {
            t: idf(int(dfs.get(t, 0)), n) for t in sorted(pos_terms)
        }
        if not any(int(dfs.get(t, 0)) > 0 for t in pos_terms):
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        results = self._fanout(
            lambda ts: [a.query_bool.remote(tree, weights, k, scope=scope)
                        for a in ts]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_synonym(
        self, query: str, synonyms: Dict[str, "Sequence[str]"],
        k: int = 10, hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Blended synonym retrieval (Lucene SynonymQuery): each query
        token expands to its synonym group scored AS ONE TERM — group tf =
        per-doc SUM of member tfs (before BM25 saturation), group idf =
        idf(max member df), duplicate tokens multiply the group weight.
        Identical scoring to ``synonym_topk``.  ``synonyms`` is the
        one-directional map form {term: [synonyms...]}."""
        from oboyu_ray.pipelines.bm25_batch import synonym_groups

        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        terms = self.tokenizer.tokenize(query)
        gs = synonym_groups(terms, synonyms)
        all_terms = sorted({t for g in gs for t in g})
        dfs = self.vocab.df(all_terms)
        n = int(self.stats["N"])
        w: Dict[tuple, float] = {}
        for g in gs:
            df_max = max((int(dfs.get(t, 0)) for t in g), default=0)
            if df_max <= 0:
                continue
            key = tuple(g)
            w[key] = w.get(key, 0.0) + idf(df_max, n)
        if not w:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        groups = [list(g) for g in w]
        weights = [w[g] for g in w]
        results = self._fanout(
            lambda ts: [
                a.query_synonym.remote(groups, weights, k, scope=scope)
                for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_collapse(
        self, query: str, k: int = 10, per_conv: int = 1,
        hydrate: bool = False,
        require_all: bool = False, exclude: Optional[str] = None,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Collapsed retrieval (the Lucene/Solr field-collapse shape,
        CollapsingTopDocsCollector): the top-k CONVERSATIONS ranked by
        their best-scoring turn — the natural transcript-search result
        ("which conversations match", not "which turns").  ``per_conv``
        > 1 additionally returns each group's top matching turns (the
        Elasticsearch collapse ``inner_hits`` shape) — rows stay in group
        order, ``group_rank`` numbers the conversations.

        EXACT via iterative deepening: ``search(k=d)`` returns the exact
        PREFIX of the global (score DESC, doc ASC) total order, and a
        conversation's collapsed rank is the rank of its FIRST occurrence
        in that order — any conversation absent from the top-d has its
        best turn strictly after position d and cannot precede the k-th
        seen group; likewise a group's members within the prefix are its
        exact top members.  Quadruple d until k distinct conversations
        appear AND each carries ``per_conv`` members (or the matches are
        exhausted — a group with fewer matching turns than ``per_conv``
        is only provably complete at exhaustion).  Depth stays
        driver-side only — shards always run top-d heaps, never full
        materialization."""
        empty = pd.DataFrame(
            {"conv_id": pd.Series(dtype=object),
             "doc_num": pd.Series(dtype=np.int64),
             "turn_idx": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64),
             "doc_id": pd.Series(dtype=object),
             "group_rank": pd.Series(dtype=np.int64)}
        )
        per_conv = max(1, int(per_conv))
        depth = max(4 * k * per_conv, 32)
        while True:
            deep = self.search(query, k=depth, require_all=require_all,
                               exclude=exclude, scope=scope)
            if not len(deep):
                return empty
            # deep is (score DESC, doc ASC); first row per conversation IS
            # its best turn under the global total order
            best = deep.drop_duplicates(subset=["conv_id"], keep="first")
            exhausted = len(deep) < depth
            done = exhausted or len(best) >= k
            if done and per_conv > 1 and not exhausted:
                top_convs = best["conv_id"].head(k)
                counts = deep["conv_id"].value_counts()
                done = bool((counts.reindex(top_convs).fillna(0) >= per_conv).all())
            if done:
                top_convs = best["conv_id"].head(k).tolist()
                rank_of = {c: i + 1 for i, c in enumerate(top_convs)}
                sel = deep[deep["conv_id"].isin(rank_of)].copy()
                sel["group_rank"] = sel["conv_id"].map(rank_of)
                sel["__m"] = sel.groupby("conv_id").cumcount()
                sel = sel[sel["__m"] < per_conv]
                sel = sel.sort_values(["group_rank", "__m"], kind="mergesort")
                out = sel[["conv_id", "doc_num", "turn_idx", "score",
                           "doc_id", "group_rank"]].reset_index(drop=True)
                if hydrate:
                    out = self._hydrate(out)
                return out
            depth *= 4

    def count_matches(
        self, query: str, require_all: bool = False,
        exclude: Optional[str] = None,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> int:
        """Total matching-document count (Lucene IndexSearcher.count):
        exact number of documents matching the query under OR / AND
        semantics with optional NOT exclusions and scope — no scoring, no
        top-k, each shard returns one integer.  Strict-AND on a corpus-
        absent term counts zero (same semantics as search)."""
        terms = self.tokenizer.tokenize(query)
        dfs = self.vocab.df(sorted(set(terms)))
        live = [t for t in terms if dfs.get(t, 0) > 0]
        if not live:
            return 0
        if require_all and len(set(live)) < len(set(terms)):
            return 0
        if scope is not None:
            scope = (int(scope[0]), int(scope[1]))
            if scope[0] >= scope[1]:
                return 0
        excl_terms = self.tokenizer.tokenize(exclude) if exclude else []
        excl = sorted(
            t for t, d in self.vocab.df(sorted(set(excl_terms))).items() if d > 0
        )
        return sum(self._fanout(
            lambda ts: [
                a.count_matches.remote(
                    live, require_all=require_all, exclude_terms=excl,
                    scope=scope,
                )
                for a in ts
            ]
        ))

    def search_dismax(
        self, query: str, k: int = 10, tiebreak: float = 0.3,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Disjunction-max retrieval (Lucene DisjunctionMaxQuery): per doc
        ``max + tiebreak·(sum − max)`` over single-term BM25 contributions.
        Clauses are the query's DISTINCT terms (a duplicated token is the
        same clause) — identical scoring to ``dismax_topk``."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        terms = sorted(set(self.tokenizer.tokenize(query)))
        weights = self.term_weights(terms)
        if not weights:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        if scope is not None:
            scope = (int(scope[0]), int(scope[1]))
            if scope[0] >= scope[1]:
                return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        results = self._fanout(
            lambda ts: [
                a.query_dismax.remote(weights, float(tiebreak), k, scope=scope)
                for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def search_boosted(
        self, query: str, boosts: Dict[str, float], k: int = 10,
        exclude: "Optional[str]" = None,
        hydrate: bool = False, resolve: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Per-term query-time boosts (Lucene BoostQuery): score =
        Σ boost_t × bm25_t.  Terms absent from ``boosts`` keep 1.0;
        boost 0 removes the clause; ``boosts={}`` ≡ ``search_terms``.
        ``exclude`` is a boolean-NOT term STRING tokenized like the query
        (same contract as ``search``).  Rides the ordinary WAND/dense OR
        path with pre-scaled weights — the block-max bounds are computed
        FROM the passed weights, so pruning stays sound for any sign
        combination (signed-idf rules, state/shards.py block-max
        docstring)."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        terms = self.tokenizer.tokenize(query)
        weights = self.term_weights(terms)
        weights = {
            t: w * float(boosts.get(t, 1.0)) for t, w in weights.items()
        }
        weights = {t: w for t, w in weights.items() if w != 0.0}
        if not weights:
            return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        if scope is not None:
            scope = (int(scope[0]), int(scope[1]))
            if scope[0] >= scope[1]:
                return self._finish(empty, hydrate) if (resolve or hydrate) else empty
        excl_terms = self.tokenizer.tokenize(exclude) if exclude else []
        excl = sorted(
            t for t, d in self.vocab.df(sorted(set(excl_terms))).items() if d > 0
        )
        results = self._fanout(
            lambda ts: [
                a.query.remote(weights, k, exclude_terms=excl, scope=scope)
                for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        out = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        if resolve or hydrate:
            out = self._finish(out, hydrate)
        return out

    def explain(self, query: str, doc_num: int) -> pd.DataFrame:
        """Per-term score breakdown for one document — the Lucene `explain`
        shape: (term, tf, dl, df, weight, contribution) rows plus the same
        resolved metadata the search path returns.  The contribution sum
        equals the document's search score (pytest-pinned); each row's
        weight is idf × query-term multiplicity.  One point-read per term
        on the owning shard — no scan."""
        terms = self.tokenizer.tokenize(query)
        weights = self.term_weights(terms)
        cols = {
            "term": pd.Series(dtype=object),
            "tf": pd.Series(dtype=np.int64),
            "dl": pd.Series(dtype=np.int64),
            "df": pd.Series(dtype=np.int64),
            "weight": pd.Series(dtype=np.float64),
            "contribution": pd.Series(dtype=np.float64),
        }
        if not weights:
            return pd.DataFrame(cols)
        dfs = self.vocab.df(sorted(weights))
        results = self._fanout(
            lambda ts: [a.explain.remote(weights, int(doc_num)) for a in ts]
        )
        rows = [r for shard_rows in results for r in shard_rows]
        if not rows:
            return pd.DataFrame(cols)
        out = pd.DataFrame(
            rows, columns=["term", "tf", "dl", "weight", "contribution"]
        )
        out.insert(3, "df", out["term"].map(dfs).astype(np.int64))
        return out.astype(
            {"tf": "int64", "dl": "int64", "weight": "float64",
             "contribution": "float64"}
        )

    def search_phrase_terms(
        self, terms: List[str], k: int = 10,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Exact phrase top-k over the ORDERED term list: only docs where the
        terms occur adjacently in order rank (BM25-scored over the phrase
        terms).  Strict like conjunctive search: a corpus-absent term makes
        the phrase unmatchable → empty.  Requires a positional index
        (build with ``BuildConfig(store_positions=True)``).  ``scope``
        composes like search()."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        if not terms:
            return empty
        weights = self.term_weights(terms)
        if len(weights) < len(set(terms)):
            return empty  # some term has df 0 → no doc can hold the phrase
        results = self._fanout(
            lambda ts: [
                a.query_phrase.remote(terms, weights, k, scope=scope) for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        return pd.DataFrame({"doc_num": top_docs, "score": top_scores})

    def search_near(
        self, term_a: str, term_b: str, window: int = 5, k: int = 10,
        hydrate: bool = False, scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Proximity retrieval: docs where the two (single-token) terms
        occur within ``window`` tokens of each other, any order, BM25-scored
        over both.  Either term absent from the corpus → empty."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        ta = self.tokenizer.tokenize(term_a)
        tb = self.tokenizer.tokenize(term_b)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("search_near takes exactly one token per side")
        a, b = ta[0], tb[0]
        # duplicate-term multiplicity matches the brute force: a self-NEAR
        # query [a, a] double-weights the term like any duplicated query term
        weights = self.term_weights([a, b])
        if len(weights) < len({a, b}):
            return self._finish(empty, hydrate)
        results = self._fanout(
            lambda ts: [
                x.query_near.remote(a, b, int(window), weights, k, scope=scope)
                for x in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        return self._finish(
            pd.DataFrame({"doc_num": top_docs, "score": top_scores}), hydrate
        )

    def search_span_near(
        self, phrase: str, window: int, k: int = 10, hydrate: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Ordered span retrieval (Lucene SpanNearQuery, inOrder=true):
        tokenize ``phrase`` and rank docs containing the terms IN ORDER at
        positions spanning at most ``window`` (p_last − p_first over the
        filtered token stream).  ``window == m − 1`` ≡ search_phrase;
        smaller windows are unmatchable → empty.  Identical scoring to
        ``span_near_topk``."""
        empty = pd.DataFrame(
            {"doc_num": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        terms = self.tokenizer.tokenize(phrase)
        if not terms or int(window) < len(terms) - 1:
            return self._finish(empty, hydrate)
        weights = self.term_weights(terms)
        if len(weights) < len(set(terms)):
            return self._finish(empty, hydrate)  # df-0 term → unmatchable
        results = self._fanout(
            lambda ts: [
                a.query_span_near.remote(terms, int(window), weights, k, scope=scope)
                for a in ts
            ]
        )
        top_docs, top_scores = _merge_topk_multi(results, k)
        return self._finish(
            pd.DataFrame({"doc_num": top_docs, "score": top_scores}), hydrate
        )

    def search_phrase(
        self, phrase: str, k: int = 10, hydrate: bool = False,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Tokenize ``phrase`` and run exact adjacency retrieval (the token
        stream is the FILTERED stream, so stopwords drop out before
        adjacency — identical semantics to the brute-force ``phrase_topk``)."""
        return self._finish(
            self.search_phrase_terms(
                self.tokenizer.tokenize(phrase), k, scope=scope
            ),
            hydrate,
        )

    def search_phrase_many(self, phrases: List[str], k: int = 10) -> List[pd.DataFrame]:
        """Batched phrase retrieval: ONE vocab df sweep for the union of all
        phrases' terms and ONE fan-out round for all phrases (per-shard
        query_phrase_many; consecutive phrases share the shard caches) —
        the phrase counterpart of search_many."""
        token_lists = [self.tokenizer.tokenize(p) for p in phrases]
        dfs = self.vocab.df(sorted({t for ts in token_lists for t in ts}))
        n = int(self.stats["N"])
        weight_list = [self._weights_from_dfs(ts, dfs, n) for ts in token_lists]
        # a phrase is live only when EVERY distinct term exists (adjacency
        # over a missing term is unmatchable — strict empty)
        live = [
            (i, token_lists[i], weight_list[i])
            for i in range(len(phrases))
            if token_lists[i] and len(weight_list[i]) == len(set(token_lists[i]))
        ]
        out: List[pd.DataFrame] = [
            pd.DataFrame({"doc_num": pd.Series(dtype=np.int64),
                          "score": pd.Series(dtype=np.float64)})
            for _ in phrases
        ]
        if not live:
            return out
        results = self._fanout(
            lambda ts: [
                a.query_phrase_many.remote(
                    [t for _, t, _ in live], [w for _, _, w in live], k
                )
                for a in ts
            ]
        )
        for j, (i, _, _) in enumerate(live):
            top_docs, top_scores = _merge_topk_multi(
                [sr[j] for sr in results], k
            )
            out[i] = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        return out

    def count_many(
        self, queries: List[str], require_all: bool = False
    ) -> List[int]:
        """Batched total-hit counts: ONE vocab df sweep for the union of
        all queries' terms, ONE fan-out round (per-shard count_many), then
        per-query integer sums — the counting counterpart of search_many.
        Semantics per query match count_matches (df-0 terms drop; strict
        AND on a corpus-absent term counts zero)."""
        token_lists = [self.tokenizer.tokenize(q) for q in queries]
        dfs = self.vocab.df(sorted({t for ts in token_lists for t in ts}))
        live_lists: List[List[str]] = []
        idx_of: List[int] = []
        out = [0] * len(queries)
        for i, ts in enumerate(token_lists):
            live = [t for t in ts if dfs.get(t, 0) > 0]
            if not live:
                continue
            if require_all and len(set(live)) < len(set(ts)):
                continue
            idx_of.append(i)
            live_lists.append(live)
        if not live_lists:
            return out
        results = self._fanout(
            lambda targets: [
                a.count_many.remote(live_lists, require_all) for a in targets
            ]
        )
        for j, i in enumerate(idx_of):
            out[i] = sum(r[j] for r in results)
        return out

    def search_many(
        self, queries: List[str], k: int = 10, require_all: bool = False,
        exclude: Optional[str] = None,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> List[pd.DataFrame]:
        """Batched search: ONE vocab df pass for the union of all queries'
        terms (a single grouped point-lookup sweep instead of one per
        query), ONE fan-out round for all queries (per-shard query_many),
        then per-query exact merges — the throughput-serving path
        (single-query latency is search()).  ``require_all`` applies
        strict conjunctive semantics per query; ``exclude`` (a term string
        tokenized like the queries) and ``scope`` apply UNIFORMLY to the
        whole batch — the one-tenant / one-conversation-range serving
        shape."""
        return self.search_many_result(
            self.search_many_submit(queries, k, require_all,
                                    exclude=exclude, scope=scope)
        )

    def search_many_submit(self, queries: List[str], k: int = 10,
                           require_all: bool = False,
                           exclude: Optional[str] = None,
                           scope: "Optional[Tuple[int, int]]" = None) -> dict:
        """Issue a batched search WITHOUT waiting: tokenize + one vocab df
        sweep + one fan-out, returning an opaque in-flight handle for
        ``search_many_result``.  A serving loop that keeps one batch in
        flight while merging the previous one (double buffering) hides the
        driver-side merge + RPC turnaround behind shard compute — the
        shard actors process queued batches back-to-back with no idle gap.

        Handles must be collected in submission order per engine (shard
        actors execute their queues in order; results are matched by
        handle, so out-of-order collection is correct too, just pointless).
        """
        token_lists = [self.tokenizer.tokenize(q) for q in queries]
        excl_terms = self.tokenizer.tokenize(exclude) if exclude else []
        if scope is not None:
            scope = (int(scope[0]), int(scope[1]))
        dfs = self.vocab.df(
            sorted({t for ts in token_lists for t in ts} | set(excl_terms))
        )
        excl = sorted(t for t in set(excl_terms) if dfs.get(t, 0) > 0)
        n = int(self.stats["N"])
        weight_list = [self._weights_from_dfs(ts, dfs, n) for ts in token_lists]
        dead_scope = scope is not None and scope[0] >= scope[1]
        live = [
            (i, w)
            for i, w in enumerate(weight_list)
            if w and not dead_scope
            and not (require_all and len(w) < len(set(token_lists[i])))
        ]
        handle = {"n": len(queries), "k": k, "live": live, "refs": None,
                  "submit": None}
        if not live:
            return handle
        submit = lambda ts: [  # noqa: E731 — re-issued verbatim on respawn
            a.query_many.remote([w for _, w in live], k, require_all,
                                exclude_terms=excl, scope=scope)
            for a in ts
        ]
        handle["submit"] = submit
        handle["refs"] = self._fanout_submit(submit)
        handle["epoch"] = self._pool_epoch
        return handle

    def search_many_result(self, handle: dict) -> List[pd.DataFrame]:
        """Wait on a ``search_many_submit`` handle and merge — same output
        (order, schema, values) as ``search_many`` on the same inputs."""
        out: List[pd.DataFrame] = [
            pd.DataFrame({"doc_num": pd.Series(dtype=np.int64),
                          "score": pd.Series(dtype=np.float64)})
            for _ in range(handle["n"])
        ]
        if not handle["live"]:
            return out
        per_shard = self._fanout_wait(handle["refs"], handle["submit"],
                                      handle.get("epoch", -1))
        k = handle["k"]
        for j, (i, _) in enumerate(handle["live"]):
            top_docs, top_scores = _merge_topk_multi(
                [sr[j] for sr in per_shard], k
            )
            out[i] = pd.DataFrame({"doc_num": top_docs, "score": top_scores})
        return out

    def _finish(self, out: pd.DataFrame, hydrate: bool) -> pd.DataFrame:
        """Attach (conv_id, turn_idx, doc_id) to a (doc_num, score) frame,
        optionally hydrating text — shared tail of every search flavor."""
        if len(out):
            conv, turn = self.resolver.resolve(out["doc_num"].to_numpy())
            out = out.assign(conv_id=conv, turn_idx=turn)
            out["doc_id"] = [
                f"{c}:{t:08d}" for c, t in zip(out["conv_id"], out["turn_idx"])
            ]
        else:
            out = out.assign(conv_id=pd.Series(dtype=object),
                             turn_idx=pd.Series(dtype=np.int64),
                             doc_id=pd.Series(dtype=object))
        if hydrate and len(out):
            out = self._hydrate(out)
        return out

    def attach_snippets(
        self, out: pd.DataFrame, query: str, length: int = 200,
        context_window: int = 50, highlight: bool = False,
    ) -> pd.DataFrame:
        """Attach a ``snippet`` column to hydrated results — the reference
        search-result shape (retriever/search/snippet_extractor.py:9-107:
        center on the first query-term match, expand toward the target
        length, cover every match, head-truncate matchless docs).  With
        ``highlight``, query terms in the snippet are wrapped in the
        reference's ``**…**`` format (text_highlighter.py:19-80).  Pure
        driver-side post-processing over the ≤k result rows — no shard or
        Dataset work; composable with every search flavor's hydrated
        output."""
        from oboyu_ray.functions.textproc import highlight_matches, snippet_for_terms

        if not len(out):
            return out.assign(snippet=pd.Series(dtype=object))
        if "text" not in out.columns:
            raise ValueError("attach_snippets needs hydrated results "
                             "(search with hydrate=True)")
        terms = self.tokenizer.tokenize(query)
        snips = []
        for t in out["text"]:
            s = snippet_for_terms(t or "", terms, length, context_window)
            if highlight:
                s = highlight_matches(s, terms)
            snips.append(s)
        return out.assign(
            snippet=pd.Series(snips, index=out.index, dtype=object)
        )

    def search(
        self, query: str, k: int = 10, hydrate: bool = False,
        require_all: bool = False, exclude: Optional[str] = None,
        scope: "Optional[Tuple[int, int]]" = None,
        snippet: bool = False, highlight: bool = False,
    ) -> pd.DataFrame:
        """``exclude`` is a boolean-NOT term string (tokenized like the
        query): documents containing ANY excluded term never rank.
        ``scope`` = (lo, hi) restricts candidates to that doc_num interval
        (scores keep full-corpus statistics).  ``snippet`` implies hydrate
        and attaches the reference-shaped snippet (optionally
        ``highlight``-ed) per result."""
        terms = self.tokenizer.tokenize(query)
        excl = self.tokenizer.tokenize(exclude) if exclude else None
        out = self._finish(
            self.search_terms(
                terms, k, require_all=require_all, exclude=excl, scope=scope
            ),
            hydrate or snippet,
        )
        if snippet:
            out = self.attach_snippets(out, query, highlight=highlight)
        return out

    def search_page(
        self, query: str, k: int = 10, page: int = 0, hydrate: bool = False,
        require_all: bool = False, exclude: Optional[str] = None,
        scope: "Optional[Tuple[int, int]]" = None,
    ) -> pd.DataFrame:
        """Result pagination (Lucene ``searchAfter`` result shape): EXACT
        rows k·page+1 .. k·(page+1) of the global (score DESC, doc ASC)
        ranking, plus a global ``rank`` column.  Implemented as a
        top-k·(page+1) retrieval sliced to the requested page — the global
        top-m is exact, so every page is; deep pages cost O(k·page) per
        shard, the same trade Lucene documents for searchAfter without a
        collector cursor.  Composes with AND / NOT / scope like search()."""
        if page < 0:
            raise ValueError(f"page must be >= 0, got {page}")
        terms = self.tokenizer.tokenize(query)
        excl = self.tokenizer.tokenize(exclude) if exclude else None
        full = self.search_terms(
            terms, k * (page + 1), require_all=require_all, exclude=excl,
            scope=scope,
        )
        out = full.iloc[k * page : k * (page + 1)].reset_index(drop=True)
        out = out.assign(rank=np.arange(k * page + 1, k * page + 1 + len(out),
                                        dtype=np.int64))
        return self._finish(out, hydrate)

    def _hydrate(self, out: pd.DataFrame) -> pd.DataFrame:
        """Attach turn text via point lookups on the partitioned docs parquet
        (only the top-k ids are read — row-group predicate pushdown).  A
        top-k usually spreads across several parts; the per-part filtered
        reads fan out as num_cpus=0 Ray tasks (zero-CPU so they schedule
        under a full-width actor pool — see the fuzzy-sweep precedent) and
        run concurrently instead of serially on the driver — at 1000 parts
        the serial version paid k sequential parquet opens per query."""
        texts: Dict[int, str] = {}
        doc_nums = out["doc_num"].tolist()
        jobs = []
        for s in self.report.get("part_summaries", []):
            lo, hi = s["doc_min"], s["doc_max"]
            wanted = [d for d in doc_nums if lo <= d <= hi]
            if wanted:
                jobs.append((
                    os.path.join(self.index_dir, "docs",
                                 f"docs-{int(s['part_id']):05d}.parquet"),
                    wanted,
                ))
        if len(jobs) > 1:
            for nums, txts in ray.get(
                [_read_doc_texts.remote(p, w) for p, w in jobs]
            ):
                texts.update(zip(nums, txts))
        elif jobs:
            nums, txts = _read_doc_texts_local(*jobs[0])
            texts.update(zip(nums, txts))
        out = out.assign(text=[texts.get(d) for d in doc_nums])
        return out

    def query_stats(self, reset: bool = False) -> Dict[str, int]:
        """Aggregate per-shard scan telemetry (windows scanned/pruned,
        postings decoded, cache hit/miss, execution-path counts) across the
        actor pool — the 'what did queries actually cost' surface the build
        manifests don't cover.  ``reset=True`` zeroes the counters after
        reading (epoch-style sampling)."""
        counts = ray.get([a.get_counters.remote() for a in self.actors])
        if reset:
            ray.get([a.reset_counters.remote() for a in self.actors])
        out: Dict[str, int] = {}
        for c in counts:
            for k, v in c.items():
                out[k] = out.get(k, 0) + int(v)
        return out

    def close(self) -> None:
        for a in self.aggregators:
            ray.kill(a)
        self.aggregators = []
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        self._targets = []
