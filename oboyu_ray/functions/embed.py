"""Embedding stage (SURVEY §2-T2) — actor-pool batch inference plumbing.

Reference flow (`indexer/services/embedding.py:91-298`): chunks are
prefixed ("検索文書: ", the Ruri prefix scheme, config/indexer.py:24-27),
encoded by a SentenceTransformer/ONNX model in batches of 64, and the
vectors land keyed by chunk id.  The model is absent in this container, so
— as with the reranker and the multimodal codec — the model call is stubbed
two ways, clearly marked:

* ``RealEmbedderStub`` raises ``NotImplementedError`` at the model seam;
* ``FakeEmbedder`` is a deterministic stand-in: feature-hashed bag-of-words
  projected to ``dim`` and L2-normalized.  Cheap, batch-shaped, and it
  preserves the property retrieval cares about (shared vocabulary ⇒ higher
  cosine), so the downstream vector pipeline — actor pool, batch size,
  vector parquet sink, cosine search, RRF hybrid — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_EMBED_DIM = 64
DEFAULT_EMBED_BATCH = 64  # reference embedding.py:97
EMBED_PREFIX = "検索文書: "  # reference config/indexer.py:24-27


class FakeEmbedder:
    """Deterministic embedding 'model' — actor-pool stage.

    ``__init__`` = once-per-actor setup (where the real model loads);
    ``__call__`` = per-batch encode.  Use with::

        ds.map_batches(FakeEmbedder, concurrency=(1, 4),
                       batch_size=DEFAULT_EMBED_BATCH, batch_format="pyarrow")
    """

    def __init__(self, dim: int = DEFAULT_EMBED_DIM, prefix: str = EMBED_PREFIX) -> None:
        self.dim = dim
        self.prefix = prefix

    def _encode_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for w in (self.prefix + (text or "")).lower().split():
            h = hashlib.md5(w.encode("utf-8")).digest()
            idx = int.from_bytes(h[:4], "little") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        vecs = [self._encode_one(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )


class EmbeddingCache:
    """sha256-keyed per-text .npy cache — reference embedding.py:20-88
    semantics (key = sha256(f"{model_name}:{text}"), one .npy per entry).

    Ray-friendly: the cache is plain files on a shared path, so every actor
    in the pool reads/writes it independently with no coordination (atomic
    rename on write; a lost race just writes the same bytes twice)."""

    def __init__(self, cache_dir: str) -> None:
        import os

        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, text: str, model_name: str) -> str:
        import os

        key = hashlib.sha256(f"{model_name}:{text}".encode()).hexdigest()
        return os.path.join(self.cache_dir, f"{key}.npy")

    def get(self, text: str, model_name: str):
        import os

        p = self._path(text, model_name)
        if os.path.exists(p):
            try:
                return np.load(p).astype(np.float32)
            except Exception:
                os.unlink(p)  # corrupted entry — drop like the reference
        return None

    def set(self, text: str, model_name: str, embedding: np.ndarray) -> None:
        import os

        p = self._path(text, model_name)
        tmp = f"{p}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:  # np.save(path) would append '.npy'
            np.save(f, embedding)
        os.replace(tmp, p)


class CachedEmbedder(FakeEmbedder):
    """FakeEmbedder + the reference's embedding cache (T3): per-actor cache
    handle in __init__, per-text get/encode/set in __call__.  The real-model
    variant swaps ``_encode_one`` for the model call — the cache flow is the
    part the reference implements and the part tested here."""

    def __init__(
        self,
        cache_dir: str,
        dim: int = DEFAULT_EMBED_DIM,
        prefix: str = EMBED_PREFIX,
        model_name: str = "fake-feature-hash",
    ) -> None:
        super().__init__(dim=dim, prefix=prefix)
        self.cache = EmbeddingCache(cache_dir)
        self.model_name = model_name
        self.hits = 0
        self.misses = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        vecs: List[np.ndarray] = []
        for t in texts:
            cached = self.cache.get(t or "", self.model_name)
            if cached is not None:
                self.hits += 1
                vecs.append(cached.astype(np.float64))
                continue
            self.misses += 1
            v = self._encode_one(t)
            self.cache.set(t or "", self.model_name, v.astype(np.float32))
            vecs.append(v)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )


class RealEmbedderStub:
    """Seam for a real SentenceTransformer/ONNX model.

    When ``sentence_transformers`` is importable (NOT in this container),
    ``__init__`` loads the model once per actor and ``__call__`` encodes
    with the reference semantics: document prefix prepended, batch encode,
    L2-normalized float32 vectors (embedding.py:91-298).  Otherwise the
    call raises at this exact seam and ``FakeEmbedder`` is the tested
    stand-in.  The contract both implementations must satisfy —
    constructor kwargs, (doc_id, embedding list<float32>) output schema,
    unit norm, prefix application — is pinned in
    tests/test_real_model_contract.py; set ``OBOYU_RAY_REAL_MODELS=1``
    there to run the same assertions against the real weights.
    """

    def __init__(self, model_name: str = "cl-nagoya/ruri-v3-30m",
                 prefix: str = EMBED_PREFIX) -> None:
        self.model_name = model_name
        self.prefix = prefix
        self._model = None
        try:  # pragma: no cover - torch absent in this container
            from sentence_transformers import SentenceTransformer

            self._model = SentenceTransformer(model_name)
        except ImportError:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._model is None:
            raise NotImplementedError(
                "sentence-transformer inference requires torch/onnxruntime, absent "
                "in this container; use FakeEmbedder for the tested flow"
            )
        texts = [self.prefix + (t or "") for t in batch.column("text").to_pylist()]
        vecs = self._model.encode(  # pragma: no cover
            texts, batch_size=DEFAULT_EMBED_BATCH, normalize_embeddings=True
        )
        return pa.table(  # pragma: no cover
            {
                "doc_id": batch.column("doc_id"),
                "embedding": pa.array(
                    [np.asarray(v, dtype=np.float32) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )


def embed_documents(
    docs: "ray.data.Dataset",
    dim: int = DEFAULT_EMBED_DIM,
    concurrency=(1, 4),
    batch_size: int = DEFAULT_EMBED_BATCH,
    cache_dir: str | None = None,
) -> "ray.data.Dataset":
    """(doc_id, text) → (doc_id, embedding: list<float32>[dim]) via the
    actor-pool embed stage; pass ``cache_dir`` to enable the reference's
    sha256-keyed embedding cache (T3)."""
    cls = CachedEmbedder if cache_dir else FakeEmbedder
    kwargs = {"dim": dim}
    if cache_dir:
        kwargs["cache_dir"] = cache_dir
    return docs.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
