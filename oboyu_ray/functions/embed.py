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


class RealEmbedderStub:
    """Seam for a real SentenceTransformer/ONNX model (absent here)."""

    def __init__(self, model_name: str = "cl-nagoya/ruri-v3-30m") -> None:
        self.model_name = model_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "sentence-transformer inference requires torch/onnxruntime, absent "
            "in this container; use FakeEmbedder for the tested flow"
        )


def embed_documents(
    docs: "ray.data.Dataset",
    dim: int = DEFAULT_EMBED_DIM,
    concurrency=(1, 4),
    batch_size: int = DEFAULT_EMBED_BATCH,
) -> "ray.data.Dataset":
    """(doc_id, text) → (doc_id, embedding: list<float32>[dim]) via the
    actor-pool embed stage."""
    return docs.map_batches(
        FakeEmbedder,
        fn_constructor_kwargs={"dim": dim},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
