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


def kg_entities(docs: "ray.data.Dataset", lexicon=None) -> "ray.data.Dataset":
    """Aggregated kg_entities table: (entity_id, name, entity_type,
    n_mentions, n_docs, confidence_micros) — the reference's kg_entities
    rows (schema.py:394-409) with mention statistics."""
    from ray.data.aggregate import Count, Sum

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

    # Two-level distributed reduction.  The map-side partial() shrinks
    # mention rows to per-(name, type, doc) counts WITHIN a batch, but Ray's
    # dynamic block splitting can slice one doc's mention rows across blocks
    # — so the same (name, type, doc) key may yield several partial rows.
    # A first groupby on the full key merges those (Sum is the correct
    # combiner for mention counts); only then is Count() per (name, type) a
    # true distinct-doc count.  Both shuffles share the leading key.
    per_doc = (
        rows.map_batches(partial, batch_format="pyarrow")
        .groupby(["name", "entity_type", "doc_id"])
        .aggregate(Sum("mentions", alias_name="mentions"))
    )
    agg = per_doc.groupby(["name", "entity_type"]).aggregate(
        Sum("mentions", alias_name="n_mentions"), Count(alias_name="n_docs")
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


def kg_relations(docs: "ray.data.Dataset", lexicon=None) -> "ray.data.Dataset":
    """Aggregated kg_relations table: (source_name, target_name,
    relation_type, n_docs, confidence_micros) — adjacent-mention
    co-occurrence edges (the deterministic stand-in for the LLM's typed
    relations; schema.py:416-430 shape)."""
    from ray.data.aggregate import Count

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


def edc_dedup_entities(
    entities: pd.DataFrame,
    similarity_threshold: float = 0.85,
    verification_threshold: float = 0.8,
) -> pd.DataFrame:
    """EDC pipeline over an entities table (entity_id, name, entity_type):
    normalize → candidates (same normalized name, or fake-embedding cosine
    ≥ threshold within a type) → verify (token-Jaccard fake) → canonical
    components via distributed connected components.

    Returns the table + (normalized_name, canonical_id, canonical_name,
    is_canonical).  Candidate generation and the transitive closure are
    the distributed operators; the per-pair verification here is a
    vectorizable pure function.
    """
    from oboyu_ray.stages.components import connected_components

    df = entities.reset_index(drop=True).copy()
    df["normalized_name"] = [
        normalize_entity_name(n, t) for n, t in zip(df["name"], df["entity_type"])
    ]
    # stable int64 node ids for the component step
    df["node"] = [
        int.from_bytes(hashlib.md5(e.encode()).digest()[:8], "little") >> 1
        for e in df["entity_id"]
    ]

    pairs: List[Tuple[int, int]] = []
    # (a) exact normalized-name groups within a type → always merge
    for _, g in df.groupby(["normalized_name", "entity_type"], sort=False):
        nodes = sorted(g["node"].tolist())
        pairs.extend((nodes[0], n) for n in nodes[1:])
    # (b) near-name candidates within a type via the DISTRIBUTED cell-routed
    #     cosine operator (no driver matmul — the same scaling fix r1's
    #     review demanded of embedding dedup applies to entity tables, which
    #     grow with the corpus vocabulary): fake char-feature embeddings of
    #     normalized names, exact pairs ≥ threshold, then the LLM-verify
    #     seam per surviving pair (pairs, not candidates, are driver-small)
    from oboyu_ray.functions.embed import FakeEmbedder
    from oboyu_ray.stages.dedup import embedding_cosine_pairs

    emb = FakeEmbedder(dim=64, prefix="")
    name_by_node = dict(zip(df["node"], df["normalized_name"]))
    for _, g in df.groupby("entity_type", sort=False):
        if len(g) < 2:
            continue
        # character-unigram features: single-word names share characters,
        # whole-word hashing would make every distinct name orthogonal
        vecs = [emb._encode_one(" ".join(list(n))) for n in g["normalized_name"]]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(g["node"].to_numpy(dtype=np.int64), type=pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float64())),
                }
            )
        )
        cand = embedding_cosine_pairs(ds, tau=similarity_threshold)
        for a, b in cand[["vec_a", "vec_b"]].itertuples(index=False):
            ok, conf = token_jaccard_verify(name_by_node[int(a)], name_by_node[int(b)])
            if ok and conf >= verification_threshold:
                pairs.append((int(a), int(b)))

    if pairs:
        pairs_ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                    "doc_b": pa.array([b for _, b in pairs], type=pa.int64()),
                }
            )
        )
        cc = connected_components(pairs_ds)
        comp = dict(zip(cc["doc_id"], cc["component"]))
    else:
        comp = {}
    df["component"] = [comp.get(n, n) for n in df["node"]]
    canon = (
        df.sort_values(["component", "node"], kind="mergesort")
        .groupby("component", sort=False)
        .first()[["entity_id", "name"]]
        .rename(columns={"entity_id": "canonical_id", "name": "canonical_name"})
    )
    df = df.merge(canon, left_on="component", right_index=True)
    df["is_canonical"] = (df["entity_id"] == df["canonical_id"]).astype(np.int64)
    return df.drop(columns=["node", "component"]).reset_index(drop=True)


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
