"""Knowledge-graph pipeline (SURVEY §2-T6/D4) — extraction, EDC entity
dedup, and GraphRAG-style query expansion, Ray-Data-first.

Reference subsystem: LLM KG extraction
(`adapters/kg_extraction/llm_kg_extraction_service.py:54-459` — llama-cpp
chat with a JSON schema, entity types PERSON/COMPANY/…/CONCEPT, relation
types WORKS_AT/…, per-element confidence), EDC entity deduplication
(`adapters/entity_deduplication/edc_deduplication_service.py:26-439` —
embedding-similarity candidates → LLM merge verification → canonicalize)
and GraphRAG query expansion
(`adapters/graphrag/oboyu_graphrag_service.py:51-131`).  Storage schema:
`indexer/storage/schema.py:389-462` (kg_entities / kg_relations).

The LLM is absent here, so — like the embedder/reranker/codec — the model
call is a seam with two implementations:

* ``RealLLMExtractorStub`` / ``RealLLMVerifierStub`` raise
  ``NotImplementedError`` where llama-cpp would run;
* ``GazetteerExtractor`` is the deterministic stand-in: a fixed
  lexicon→type table over the corpus tokenizer's word stream (real
  gazetteer NER shape), with adjacent-mention CO_OCCURS_WITH relations.
  Deterministic, batch-shaped, SQL-reproducible — so the distributed
  plumbing (actor-pool extraction, entity/relation tables, dedup,
  expansion) is real and oracled even though the model is faked.

EDC dedup is re-expressed distributed: normalize names (reference
normalize_entity_name rules, stdlib NFKC standing in for jaconv) →
candidate pairs from exact normalized-name groups + fake-embedding cosine
→ verification seam (token-Jaccard fake / LLM stub) → canonical ids via
the distributed connected-components operator (stages/components.py) —
the reference's O(n²) in-process loop (edc_deduplication_service.py:
300-357) becomes bucketed reduces end-to-end.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from oboyu_ray.fixedpoint import micros

# deterministic gazetteer: lexicon term → entity type (reference entity
# types, llm_kg_extraction_service.py:178)
DEFAULT_LEXICON: Dict[str, str] = {
    "spark": "TECHNOLOGY",
    "vector": "TECHNOLOGY",
    "stream": "TECHNOLOGY",
    "hash": "TECHNOLOGY",
    "customer": "CONCEPT",
    "table": "CONCEPT",
    "window": "CONCEPT",
    "merge": "CONCEPT",
    "join": "CONCEPT",
    "query": "CONCEPT",
}
ENTITY_CONFIDENCE = 0.9
RELATION_CONFIDENCE = 0.5
RELATION_TYPE = "CO_OCCURS_WITH"

WORD_RE = re.compile(r"[a-z0-9]+")  # the corpus-analysis word stream
WORD_RE_SQL = r"[a-z0-9]+"


def entity_id(name: str, entity_type: str) -> str:
    """Deterministic global entity id (replaces the reference's uuid4 —
    knowledge_graph.py:17 — per the engine's determinism rule)."""
    return hashlib.md5(f"{name}:{entity_type}".encode("utf-8")).hexdigest()


class RealLLMExtractorStub:
    """Seam for the llama-cpp structured-extraction call
    (llm_kg_extraction_service.py:95-253); the model is absent here."""

    def __init__(self, model_path: str = "gemma-3n") -> None:
        self.model_path = model_path

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "LLM KG extraction requires llama-cpp, absent in this container; "
            "use GazetteerExtractor for the tested flow"
        )


class GazetteerExtractor:
    """Actor-pool extraction stage: lexicon NER over the word stream.

    ``__init__`` = once-per-actor setup (compiled regex + lexicon — where
    the real model would load); ``__call__`` = per-batch extraction
    emitting one row per entity MENTION plus adjacent-mention relations.
    """

    def __init__(self, lexicon: Optional[Dict[str, str]] = None) -> None:
        self.lexicon = dict(lexicon or DEFAULT_LEXICON)
        self.word_re = re.compile(WORD_RE.pattern)

    def extract_one(self, text: str) -> Tuple[List[Tuple[str, str]], List[Tuple[str, str]]]:
        """text → (mentions [(name, type)...] in token order,
        relations [(source, target)...] adjacent distinct pairs)."""
        hits = [w for w in self.word_re.findall((text or "").lower()) if w in self.lexicon]
        mentions = [(w, self.lexicon[w]) for w in hits]
        rels = []
        seen = set()
        for a, b in zip(hits, hits[1:]):
            if a != b and (a, b) not in seen:
                seen.add((a, b))
                rels.append((a, b))
        return mentions, rels

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = {
            "doc_id": [], "kind": [], "name": [], "entity_type": [],
            "target": [], "confidence_micros": [],
        }
        for d, t in zip(ids, texts):
            mentions, rels = self.extract_one(t)
            for name, etype in mentions:
                out["doc_id"].append(int(d))
                out["kind"].append(0)  # entity mention
                out["name"].append(name)
                out["entity_type"].append(etype)
                out["target"].append("")
                out["confidence_micros"].append(micros(ENTITY_CONFIDENCE))
            for a, b in rels:
                out["doc_id"].append(int(d))
                out["kind"].append(1)  # relation
                out["name"].append(a)
                out["entity_type"].append(RELATION_TYPE)
                out["target"].append(b)
                out["confidence_micros"].append(micros(RELATION_CONFIDENCE))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "kind": pa.array(out["kind"], type=pa.int64()),
                "name": pa.array(out["name"], type=pa.string()),
                "entity_type": pa.array(out["entity_type"], type=pa.string()),
                "target": pa.array(out["target"], type=pa.string()),
                "confidence_micros": pa.array(out["confidence_micros"], type=pa.int64()),
            }
        )


def extract_kg(
    docs: "ray.data.Dataset",
    lexicon: Optional[Dict[str, str]] = None,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """(doc_id, text) → flat mention/relation rows via the actor pool."""
    return docs.map_batches(
        GazetteerExtractor,
        fn_constructor_kwargs={"lexicon": lexicon},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def kg_entities(
    docs: "ray.data.Dataset" = None, lexicon=None, rows: "ray.data.Dataset" = None
) -> "ray.data.Dataset":
    """Aggregated kg_entities table: (entity_id, name, entity_type,
    n_mentions, n_docs, confidence_micros) — the reference's kg_entities
    rows (schema.py:394-409) with mention statistics.

    Pass ``rows`` (a materialized ``extract_kg`` output) to share ONE
    extraction pass between this and ``kg_relations`` — the actor-pool NER
    is the expensive stage and its output feeds both tables."""
    if rows is None:
        rows = extract_kg(docs, lexicon)

    def partial(t: pa.Table) -> pa.Table:
        ent = t.filter(pc.equal(t.column("kind"), 0))
        g = (
            pa.Table.from_pandas(
                ent.to_pandas()
                .groupby(["name", "entity_type", "doc_id"], sort=False)
                .size()
                .reset_index(name="mentions"),
                preserve_index=False,
            )
            if ent.num_rows
            else pa.table(
                {
                    "name": pa.array([], type=pa.string()),
                    "entity_type": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "mentions": pa.array([], type=pa.int64()),
                }
            )
        )
        return g

    # ONE bucketed shuffle for both reductions.  The map-side partial()
    # shrinks mention rows to per-(name, type, doc) counts WITHIN a batch,
    # but Ray's dynamic block splitting can slice one doc's mention rows
    # across blocks — so the same (name, type, doc) key may yield several
    # partial rows, and n_docs must be a count of DISTINCT docs after
    # merging them.  Bucketing by hash(name, type) co-locates everything
    # both reductions need (the per-doc merge groups by a superset of the
    # bucket key), so one shuffle + a vectorized two-level pandas groupby
    # inside the bucket replaces two chained Ray sort-aggregates.
    from oboyu_ray.stages.sketch import _hash64, _splitmix64

    def add_eb(t: pa.Table) -> pa.Table:
        eb = _splitmix64(
            _hash64(t.column("name")) ^ _hash64(t.column("entity_type"))
        ) % np.uint64(64)
        return t.append_column("eb", pa.array(eb.astype(np.int64)))

    def reduce_entities(g: pd.DataFrame) -> pd.DataFrame:
        per_doc = (
            g.groupby(["name", "entity_type", "doc_id"], sort=False)["mentions"]
            .sum()
            .reset_index()
        )
        out = (
            per_doc.groupby(["name", "entity_type"], sort=False)
            .agg(n_mentions=("mentions", "sum"), n_docs=("doc_id", "size"))
            .reset_index()
        )
        return out

    agg = (
        rows.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_eb, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(reduce_entities, batch_format="pandas")
    )

    def finalize(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        types = t.column("entity_type").to_pylist()
        return pa.table(
            {
                "entity_id": pa.array(
                    [entity_id(n, e) for n, e in zip(names, types)], type=pa.string()
                ),
                "name": t.column("name"),
                "entity_type": t.column("entity_type"),
                "n_mentions": t.column("n_mentions").cast(pa.int64()),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "confidence_micros": pa.array(
                    np.full(t.num_rows, micros(ENTITY_CONFIDENCE), dtype=np.int64)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def kg_relations(
    docs: "ray.data.Dataset" = None, lexicon=None, rows: "ray.data.Dataset" = None
) -> "ray.data.Dataset":
    """Aggregated kg_relations table: (source_name, target_name,
    relation_type, n_docs, confidence_micros) — adjacent-mention
    co-occurrence edges (the deterministic stand-in for the LLM's typed
    relations; schema.py:416-430 shape).  ``rows`` shares a materialized
    extraction with ``kg_entities``."""
    from ray.data.aggregate import Count

    if rows is None:
        rows = extract_kg(docs, lexicon)

    def rels(t: pa.Table) -> pa.Table:
        r = t.filter(pc.equal(t.column("kind"), 1))
        return pa.table(
            {
                "source_name": r.column("name"),
                "target_name": r.column("target"),
                "doc_id": r.column("doc_id"),
            }
        )

    agg = (
        rows.map_batches(rels, batch_format="pyarrow")
        .groupby(["source_name", "target_name"])
        .aggregate(Count(alias_name="n_docs"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source_name": t.column("source_name"),
                "target_name": t.column("target_name"),
                "relation_type": pa.array(
                    [RELATION_TYPE] * t.num_rows, type=pa.string()
                ),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "confidence_micros": pa.array(
                    np.full(t.num_rows, micros(RELATION_CONFIDENCE), dtype=np.int64)
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# ----------------------------------------------------------------- EDC dedup

_COMPANY_SUFFIX = re.compile(r"株式会社|㈱|有限会社|㈲|合同会社|LLC", re.IGNORECASE)
_CORP_SUFFIX = re.compile(r"Corporation|Corp\.?|Inc\.?|Ltd\.?", re.IGNORECASE)
_HONORIFICS = re.compile(r"さん|氏|様|先生|博士|Dr\.?|Mr\.?|Ms\.?|Mrs\.?", re.IGNORECASE)


def normalize_entity_name(name: str, entity_type: str) -> str:
    """Reference normalize_entity_name (edc_deduplication_service.py:
    358-385): jaconv.normalize + z2h(ascii, digit) — NFKC covers both with
    the stdlib — then type-specific suffix stripping, then whitespace
    collapse."""
    normalized = unicodedata.normalize("NFKC", name or "")
    if entity_type in ("COMPANY", "ORGANIZATION"):
        normalized = _COMPANY_SUFFIX.sub("", normalized)
        normalized = _CORP_SUFFIX.sub("", normalized)
    elif entity_type == "PERSON":
        normalized = _HONORIFICS.sub("", normalized)
    return re.sub(r"\s+", " ", normalized).strip()


class RealLLMVerifierStub:
    """Seam for the LLM merge-verification call
    (edc_deduplication_service.py:212-263)."""

    def verify(self, name_a: str, name_b: str) -> Tuple[bool, float]:
        raise NotImplementedError(
            "LLM merge verification requires llama-cpp; use token_jaccard_verify"
        )


def token_jaccard_verify(name_a: str, name_b: str) -> Tuple[bool, float]:
    """Deterministic merge verifier: Jaccard of name character-bigram sets
    (the fake standing in for the LLM yes/no + confidence)."""

    def grams(s: str) -> set:
        s = s.replace(" ", "")
        return {s[i : i + 2] for i in range(max(len(s) - 1, 0))} or {s}

    ga, gb = grams(name_a.lower()), grams(name_b.lower())
    j = len(ga & gb) / len(ga | gb) if ga | gb else 0.0
    return j >= 0.5, j


EDC_BUCKETS = 32
EDC_COLUMNS = [
    "entity_id", "name", "entity_type", "normalized_name",
    "canonical_id", "canonical_name", "is_canonical",
]


def edc_dedup_entities_ds(
    entities: "ray.data.Dataset",
    similarity_threshold: float = 0.85,
    verification_threshold: float = 0.8,
    n_buckets: int = EDC_BUCKETS,
) -> "ray.data.Dataset":
    """EDC pipeline over an entities Dataset (entity_id, name, entity_type)
    — Dataset-native end to end (reference parity target:
    edc_deduplication_service.py:112-357, an O(n²) in-process loop).

    normalize (map_batches) → merge edges from (a) exact normalized-name
    groups, a bucketed reduce, and (b) near-name candidates via the
    distributed cell-routed cosine operator, verified by char-bigram
    Jaccard inside the pair-bucketed cogroup (the LLM-verify seam's
    deterministic fake) → canonical components via the Dataset-native
    connected-components operator → component attach + canonical pick as
    two more bucketed cogroups.  Entity tables grow with corpus vocabulary,
    so no stage holds the table on the driver; the only driver-held
    intermediates are the verified MERGE PAIRS (|near-dup merges|-sized,
    the same pattern as embedding_cosine_pairs) and per-type counts.

    Returns the table + (normalized_name, canonical_id, canonical_name,
    is_canonical)."""
    from oboyu_ray.functions.embed import FakeEmbedder
    from oboyu_ray.stages.components import connected_components_ds
    from oboyu_ray.stages.dedup import (
        _batch_char_bigram_hashes,
        _verify_pairs_exact,
        embedding_cosine_pairs,
    )
    from oboyu_ray.stages.sketch import _hash64, _splitmix64

    def prep_batch(t: pa.Table) -> pa.Table:
        names = t.column("name").to_pylist()
        types = t.column("entity_type").to_pylist()
        norm = [normalize_entity_name(n, ty) for n, ty in zip(names, types)]
        # stable non-negative int64 node ids for the component step
        node = (_hash64(t.column("entity_id")) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "entity_id": t.column("entity_id").cast(pa.string()),
                "name": t.column("name").cast(pa.string()),
                "entity_type": t.column("entity_type").cast(pa.string()),
                "normalized_name": pa.array(norm, type=pa.string()),
                "node": pa.array(node, type=pa.int64()),
            }
        )

    prep = entities.map_batches(prep_batch, batch_format="pyarrow").materialize()

    # (a) exact normalized-name groups within a type → always merge.
    # Bucketed by hash(normalized_name, type) so each reduce task handles
    # B⁻¹ of the key space; inside a bucket the min-node-per-key edge list
    # is one vectorized sort + run-length pass.
    def add_kb(t: pa.Table) -> pa.Table:
        kh = _splitmix64(
            _hash64(t.column("normalized_name")) ^ _hash64(t.column("entity_type"))
        )
        return t.append_column(
            "kb", pa.array((kh % np.uint64(n_buckets)).astype(np.int64))
        )

    def exact_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["entity_type", "normalized_name", "node"], kind="mergesort")
        new_key = (
            g["entity_type"].ne(g["entity_type"].shift())
            | g["normalized_name"].ne(g["normalized_name"].shift())
        ).to_numpy()
        nodes = g["node"].to_numpy(dtype=np.int64)
        first = np.maximum.accumulate(np.where(new_key, np.arange(len(g)), 0))
        rest = ~new_key
        return pd.DataFrame({"doc_a": nodes[first[rest]], "doc_b": nodes[rest]})

    exact_edge_ds = (
        prep.map_batches(add_kb, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(exact_edges, batch_format="pandas")
    )

    # (b) near-name candidates within a type via the DISTRIBUTED cell-routed
    # cosine operator over fake char-feature embeddings of normalized names
    # (character-unigram features: single-word names share characters,
    # whole-word hashing would make every distinct name orthogonal).  Types
    # are a bounded enum (reference entity types), so the per-type loop is
    # O(1) driver iterations, each fully distributed.
    tdf = prep.groupby("entity_type").count().to_pandas()
    cnt_col = [c for c in tdf.columns if c != "entity_type"][0]
    cand_frames: List[pd.DataFrame] = []
    for ty, cnt in zip(tdf["entity_type"], tdf[cnt_col]):
        if int(cnt) < 2:
            continue

        def embed_names(t: pa.Table, ty=ty) -> pa.Table:
            sel = t.filter(pc.equal(t.column("entity_type"), ty))
            emb = FakeEmbedder(dim=64, prefix="")
            vecs = [
                emb._encode_one(" ".join(n)).tolist()
                for n in sel.column("normalized_name").to_pylist()
            ]
            return pa.table(
                {
                    "vec_id": sel.column("node"),
                    "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
                }
            )

        cand = embedding_cosine_pairs(
            prep.map_batches(embed_names, batch_format="pyarrow"),
            tau=similarity_threshold,
        )
        if len(cand):
            cand_frames.append(
                cand.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"})[
                    ["doc_a", "doc_b"]
                ]
            )

    # verify candidates with the LLM-seam fake (char-bigram Jaccard ≥
    # max(0.5, verification_threshold)) INSIDE the pair-bucketed cogroup —
    # names attach by node bucket, Jaccard computes per pair bucket.
    edge_sets = [exact_edge_ds]
    if cand_frames:
        verified = _verify_pairs_exact(
            prep,
            ray.data.from_pandas(pd.concat(cand_frames, ignore_index=True)),
            tau=max(0.5, verification_threshold),
            id_col="node",
            text_col="normalized_name",
            shingler=_batch_char_bigram_hashes,
        )
        if len(verified):
            edge_sets.append(
                ray.data.from_pandas(verified[["doc_a", "doc_b"]].astype(np.int64))
            )

    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    labels = connected_components_ds(edges)

    # component attach (node-bucketed cogroup: label rows meet entity rows;
    # unlabeled nodes are their own singleton component) …
    def ent_rows(t: pa.Table) -> pa.Table:
        return t.append_column(
            "component", pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        )

    def label_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "entity_id": pa.nulls(n, type=pa.string()),
                "name": pa.nulls(n, type=pa.string()),
                "entity_type": pa.nulls(n, type=pa.string()),
                "normalized_name": pa.nulls(n, type=pa.string()),
                "node": t.column("doc_id").cast(pa.int64()),
                "component": t.column("component").cast(pa.int64()),
            }
        )

    def add_nb(t: pa.Table) -> pa.Table:
        nb = t.column("node").to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        return t.append_column("nb", pa.array(nb.astype(np.int64)))

    def attach_component(g: pd.DataFrame) -> pd.DataFrame:
        is_label = g["entity_id"].isna().to_numpy()
        comp = dict(
            zip(
                g.loc[is_label, "node"].to_numpy(dtype=np.int64),
                g.loc[is_label, "component"].to_numpy(dtype=np.int64),
            )
        )
        e = g.loc[~is_label].copy()
        nodes = e["node"].to_numpy(dtype=np.int64)
        e["component"] = np.fromiter(
            (comp.get(n, n) for n in nodes), dtype=np.int64, count=len(nodes)
        )
        return e.drop(columns=["nb"])

    attached = (
        prep.map_batches(ent_rows, batch_format="pyarrow")
        .union(labels.map_batches(label_rows, batch_format="pyarrow"))
        .map_batches(add_nb, batch_format="pyarrow")
        .groupby("nb")
        .map_groups(attach_component, batch_format="pandas")
    )

    # … then canonical pick per component (component-bucketed cogroup:
    # canonical = the min-node member, matching exact_dedup's keep-first
    # rule; all members of a component share its bucket by construction).
    def add_cb(t: pa.Table) -> pa.Table:
        cb = t.column("component").to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        return t.append_column("cb", pa.array(cb.astype(np.int64)))

    def canonicalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["component", "node"], kind="mergesort")
        canon = g.groupby("component", sort=False)[["entity_id", "name"]].first()
        g = g.merge(
            canon.rename(
                columns={"entity_id": "canonical_id", "name": "canonical_name"}
            ),
            left_on="component",
            right_index=True,
        )
        g["is_canonical"] = (g["entity_id"] == g["canonical_id"]).astype(np.int64)
        return g[EDC_COLUMNS]

    return (
        attached.map_batches(add_cb, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(canonicalize, batch_format="pandas")
    )


def edc_dedup_entities(
    entities,
    similarity_threshold: float = 0.85,
    verification_threshold: float = 0.8,
) -> pd.DataFrame:
    """Driver-frame wrapper over ``edc_dedup_entities_ds`` — accepts a
    pandas frame or a Dataset, returns a pandas frame (the convenient shape
    for query results and the GraphRAG funnel)."""
    ds = (
        entities
        if isinstance(entities, ray.data.Dataset)
        else ray.data.from_pandas(entities.reset_index(drop=True))
    )
    out = edc_dedup_entities_ds(
        ds, similarity_threshold, verification_threshold
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in EDC_COLUMNS})
    return (
        out.sort_values(["entity_type", "normalized_name", "entity_id"])
        .reset_index(drop=True)[EDC_COLUMNS]
    )


# ------------------------------------------------------------- GraphRAG-ish

def expand_query_with_entities(
    query: str,
    entities: pd.DataFrame,
    relations: pd.DataFrame,
    max_entities: int = 10,
    expand_depth: int = 1,
) -> Dict:
    """Reference expand_query_with_entities shape
    (oboyu_graphrag_service.py:51-131): extract candidates from the query,
    match entity names, expand one hop over relations, return matched +
    expanded entities (here by deterministic exact/normalized matching —
    the repository lookups become dataframe joins over the kg tables)."""
    candidates = [w for w in WORD_RE.findall((query or "").lower())]
    names = set(entities["name"])
    matched = [c for c in candidates if c in names]
    expanded = set(matched)
    if expand_depth > 0 and len(relations):
        frontier = set(matched)
        for _ in range(expand_depth):
            nxt = set(
                relations[relations["source_name"].isin(frontier)]["target_name"]
            ) | set(relations[relations["target_name"].isin(frontier)]["source_name"])
            nxt -= expanded
            expanded |= nxt
            frontier = nxt
    ranked = sorted(expanded, key=lambda n: (n not in matched, n))[:max_entities]
    return {
        "original_query": query,
        "extracted_candidates": candidates,
        "matched_entities": matched,
        "expanded_entities": ranked,
    }


def graphrag_search(query: str, engine, entities: pd.DataFrame, relations: pd.DataFrame, k: int = 10):
    """GraphRAG-flavored search: expand the query with KG neighbors, then
    run the ordinary BM25 engine over original + expansion terms (the
    reference's `--graph` path funnels expansion into its retriever the
    same way)."""
    exp = expand_query_with_entities(query, entities, relations)
    expanded_query = " ".join([query] + [e for e in exp["expanded_entities"] if e not in query])
    return engine.search(expanded_query, k=k), exp
