"""Federated search over MULTIPLE indexes as one logical corpus.

The rolling-index shape real deployments run at 100 TB: one index per day /
tenant / shard-group, queried together without a merge-rebuild.  Global
statistics merge EXACTLY — N and total_dl add, df per term adds across the
member vocabularies — so per-document BM25 scores are bit-identical to a
single index built over the concatenated corpus (pinned in
tests/test_federated.py).  The only deviation from a monolithic index is
tie ORDER at equal score_micros: ties break by (member index, doc_num)
instead of the monolith's global doc numbering.

Soundness: each member's stored block-max bounds were computed with its OWN
build avgdl; members are spawned with the merged avgdl plus their build
avgdl so the shard tier rescales bounds by the provable factor
(IndexShard.configure).  Exact contributions always recompute from decoded
(tf, dl) with the merged avgdl.

No reference counterpart (the reference is a single-process, single-DB
engine); the statistics-merge semantics follow distributed IR practice
(global idf in sharded engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from typing import Dict, List, Optional, Sequence, Tuple

from oboyu_ray.pipelines.query import QueryEngine
from oboyu_ray.stages.stats import idf
from oboyu_ray.state.shards import _merge_topk


class FederatedEngine:
    """Query facade over N member indexes with merged global statistics."""

    def __init__(
        self,
        index_dirs: Sequence[str],
        num_shards_each: Optional[int] = None,
    ) -> None:
        if not index_dirs:
            raise ValueError("FederatedEngine needs at least one index")
        # merged stats pass: read every member's stats.json first so all
        # member pools spawn already configured with the merged avgdl
        import json
        import os

        raw = []
        confs = []
        for d in index_dirs:
            with open(os.path.join(d, "stats.json")) as f:
                raw.append(json.load(f))
            with open(os.path.join(d, "build_report.json")) as f:
                confs.append(json.load(f).get("config", {}).get("bm25", {}))
        # all members must agree on scoring + tokenizer parameters — a
        # federation mixing k1/b or tokenizer modes is a config error.
        # Validate from the on-disk reports BEFORE spawning any pool: a
        # failed construction must not leak (or deadlock-pend) actors.
        keys = ("k1", "b", "tokenizer_mode", "use_stopwords", "min_token_length")
        sig0 = tuple(confs[0].get(k) for k in keys)
        for c in confs[1:]:
            if tuple(c.get(k) for k in keys) != sig0:
                raise ValueError(
                    "federated members disagree on k1/b/tokenizer config"
                )
        n = sum(int(s["N"]) for s in raw)
        total_dl = sum(int(s["total_dl"]) for s in raw)
        self.stats = {
            "N": n,
            "total_dl": total_dl,
            "avgdl": (total_dl / n) if n else 0.0,
        }
        if num_shards_each is None:
            # divide the CPU budget across members up front: letting each
            # member auto-size would hand EVERY CPU to the first pool and
            # deadlock-pend the rest (observed via the CLI path)
            avail = int(ray.available_resources().get("CPU", 4))
            num_shards_each = max(1, avail // max(1, len(index_dirs)))
        self.engines: List[QueryEngine] = [
            QueryEngine(
                d, num_shards=num_shards_each, stats_override=self.stats
            )
            for d in index_dirs
        ]
        self.tokenizer = self.engines[0].tokenizer

    # ------------------------------------------------------------- stats

    def df(self, terms: Sequence[str]) -> Dict[str, int]:
        """Merged document frequency: per-term sum across member vocabs."""
        out = {t: 0 for t in terms}
        for e in self.engines:
            for t, d in e.vocab.df(list(terms)).items():
                out[t] += int(d)
        return out

    def term_weights(self, terms: List[str]) -> Dict[str, float]:
        dfs = self.df(sorted(set(terms)))
        n = int(self.stats["N"])
        w: Dict[str, float] = {}
        for t in terms:
            if dfs.get(t, 0) > 0:
                w[t] = w.get(t, 0.0) + idf(int(dfs[t]), n)
        return w

    # ------------------------------------------------------------ search

    def search_terms(
        self, terms: List[str], k: int = 10, require_all: bool = False,
        exclude: Optional[List[str]] = None,
    ) -> pd.DataFrame:
        """Exact top-k across every member: (index_id, doc_num, score),
        ranked by (score DESC, index_id ASC, doc_num ASC)."""
        empty = pd.DataFrame(
            {"index_id": pd.Series(dtype=np.int64),
             "doc_num": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64)}
        )
        weights = self.term_weights(terms)
        if not weights:
            return empty
        if require_all and len(weights) < len(set(terms)):
            return empty  # some term absent from EVERY member
        excl = sorted(
            t for t, d in self.df(sorted(set(exclude or []))).items() if d > 0
        )
        return self._fan_weights(weights, k, require_all=require_all, excl=excl)

    def _fan_weights(
        self, weights: Dict[str, float], k: int,
        require_all: bool = False, excl: Sequence[str] = (),
    ) -> pd.DataFrame:
        """Fan the SAME merged weights to every member's pool; the
        per-member exact top-ks merge on the driver with member order as
        the tie-break after score (the one documented deviation from a
        monolith's global doc order)."""
        per_member = []
        for ei, e in enumerate(self.engines):
            if require_all:
                results = e._fanout(
                    lambda ts: [
                        a.query_all.remote(weights, k, exclude_terms=excl)
                        for a in ts
                    ]
                )
            else:
                results = e._fanout(
                    lambda ts: [
                        a.query.remote(weights, k, exclude_terms=excl)
                        for a in ts
                    ]
                )
            docs = np.empty(0, dtype=np.int64)
            scores = np.empty(0, dtype=np.float64)
            for d_, s_ in results:
                docs, scores = _merge_topk(docs, scores, d_, s_, k)
            per_member.append((ei, docs, scores))
        rows = []
        for ei, docs, scores in per_member:
            for d_, s_ in zip(docs.tolist(), scores.tolist()):
                rows.append((s_, ei, d_))
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        rows = rows[:k]
        return pd.DataFrame(
            {
                "index_id": np.array([r[1] for r in rows], dtype=np.int64),
                "doc_num": np.array([r[2] for r in rows], dtype=np.int64),
                "score": np.array([r[0] for r in rows], dtype=np.float64),
            }
        )

    def search_fuzzy(
        self, term: str, max_edits: int = 1, k: int = 10,
        max_terms: int = 1000,
    ) -> pd.DataFrame:
        """Federated fuzzy retrieval: each member expands the term against
        its own vocabulary (sidecar / packed scan / sweep — whatever that
        member has), expansions merge by SUMMING df per matched term, and
        the ordinary federated OR runs with merged-idf weights — identical
        scoring to a monolithic index's search_fuzzy (same expansion set:
        the union of member vocabularies IS the monolith vocabulary)."""
        dfs: Dict[str, int] = {}
        for e in self.engines:
            for t, dv in e.vocab.df_fuzzy(
                term, max_edits=max_edits, max_terms=max_terms
            ).items():
                dfs[t] = dfs.get(t, 0) + int(dv)
        if len(dfs) > max_terms:
            raise ValueError(
                f"fuzzy {term!r}~{max_edits} expands to >{max_terms} terms "
                "across the federation"
            )
        n = int(self.stats["N"])
        weights = {t: idf(int(d), n) for t, d in dfs.items() if d > 0}
        if not weights:
            return pd.DataFrame(
                {"index_id": pd.Series(dtype=np.int64),
                 "doc_num": pd.Series(dtype=np.int64),
                 "score": pd.Series(dtype=np.float64)}
            )
        return self._fan_weights(weights, k)

    def search(
        self, query: str, k: int = 10, hydrate: bool = False,
        require_all: bool = False, exclude: Optional[str] = None,
    ) -> pd.DataFrame:
        terms = self.tokenizer.tokenize(query)
        excl = self.tokenizer.tokenize(exclude) if exclude else None
        out = self.search_terms(terms, k, require_all=require_all, exclude=excl)
        if not len(out):
            out["conv_id"] = pd.Series(dtype=object)
            out["turn_idx"] = pd.Series(dtype=np.int64)
            return out
        convs = np.empty(len(out), dtype=object)
        turns = np.zeros(len(out), dtype=np.int64)
        for ei, e in enumerate(self.engines):
            m = out["index_id"].to_numpy() == ei
            if m.any():
                c, t = e.resolver.resolve(out.loc[m, "doc_num"].to_numpy())
                convs[m] = c
                turns[m] = t
        out["conv_id"] = convs
        out["turn_idx"] = turns
        if hydrate:
            parts = []
            for ei, e in enumerate(self.engines):
                sub = out[out["index_id"] == ei]
                if len(sub):
                    h = e._hydrate(sub.drop(columns=["index_id"]))
                    h.insert(0, "index_id", ei)
                    parts.append(h)
            out = (
                pd.concat(parts, ignore_index=True)
                .sort_values(
                    ["score", "index_id", "doc_num"],
                    ascending=[False, True, True], kind="mergesort",
                )
                .reset_index(drop=True)
            )
        return out

    def count_matches(
        self, query: str, require_all: bool = False,
        exclude: Optional[str] = None,
    ) -> int:
        """Federated total-hit count: Σ per-member counts — counts are
        score-free, so unlike ranked search no statistic merge or bound
        rescale is involved; members answer independently and the driver
        sums #members integers."""
        return sum(
            e.count_matches(query, require_all=require_all, exclude=exclude)
            for e in self.engines
        )

    def close(self) -> None:
        for e in self.engines:
            e.close()
