"""Fake-to-real model-seam contract tests (VERDICT r4 #7).

Four seams gate real model weights behind ``NotImplementedError`` /
ImportError with deterministic fakes as the tested stand-ins:

  T2 embedding   functions/embed.py    FakeEmbedder   ↔ RealEmbedderStub
  T4 reranker    functions/rerank.py   FakeCrossEncoder ↔ RealCrossEncoderStub
  T5 fasttext    functions/langid.py   heuristic/injected ↔ lid.176.bin
  M8 MeCab       functions/tokenize.py FallbackTokenizer ↔ JapaneseTokenizer

The CONTRACT half of this module always runs: it pins the exact interface
both sides of each seam must satisfy (constructor kwargs, method names,
output schema/dtype/shape, prefix semantics, gate messages), so the fake
and the real path cannot drift apart silently.

The REAL half runs the same assertions against actual weights when
``OBOYU_RAY_REAL_MODELS=1`` is set AND the libraries are importable
(never true in this sandbox — no torch/fasttext/fugashi wheels, no
network).  With the flag set but a library absent, the test fails loudly
rather than skipping: the flag is an explicit claim that weights exist.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from oboyu_ray.functions.embed import (
    DEFAULT_EMBED_DIM,
    EMBED_PREFIX,
    FakeEmbedder,
    RealEmbedderStub,
)
from oboyu_ray.functions.rerank import FakeCrossEncoder, RealCrossEncoderStub

REAL = os.environ.get("OBOYU_RAY_REAL_MODELS") == "1"


def _batch(texts):
    return pa.table(
        {"doc_id": [f"d{i}" for i in range(len(texts))],
         "text": pa.array(texts, type=pa.string())}
    )


def _assert_embedder_contract(embedder, dim=None):
    """The schema/shape/normalization contract every embedder — fake or
    real — must satisfy for the downstream vector pipeline."""
    out = embedder(_batch(["日本語のテキスト", "spark merge sort", ""]))
    assert out.column_names == ["doc_id", "embedding"]
    assert out.schema.field("embedding").type == pa.list_(pa.float32())
    vecs = [np.asarray(v, dtype=np.float32) for v in out.column("embedding").to_pylist()]
    dims = {len(v) for v in vecs}
    assert len(dims) == 1  # fixed dimensionality
    if dim is not None:
        assert dims == {dim}
    for v in vecs[:2]:  # non-empty texts embed to unit vectors
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
    # deterministic: same batch → same bytes
    out2 = embedder(_batch(["日本語のテキスト", "spark merge sort", ""]))
    for a, b in zip(out.column("embedding").to_pylist(),
                    out2.column("embedding").to_pylist()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fake_embedder_contract():
    _assert_embedder_contract(FakeEmbedder(), dim=DEFAULT_EMBED_DIM)


def test_fake_embedder_applies_document_prefix():
    """The Ruri prefix scheme (reference config/indexer.py:24-27) must be
    applied INSIDE the embedder: the same text embeds differently with the
    prefix disabled, and the default prefix is the reference's."""
    assert EMBED_PREFIX == "検索文書: "
    with_p = FakeEmbedder()(_batch(["結合 テスト"])).column("embedding").to_pylist()[0]
    no_p = FakeEmbedder(prefix="")(_batch(["結合 テスト"])).column("embedding").to_pylist()[0]
    assert not np.array_equal(np.asarray(with_p), np.asarray(no_p))


def test_real_embedder_seam_is_constructible_and_gated():
    """Constructing the real seam never raises (actor-pool __init__ must be
    safe to schedule); only the model call gates.  Its constructor accepts
    the same prefix override the fake does."""
    stub = RealEmbedderStub(prefix=EMBED_PREFIX)
    assert stub.model_name == "cl-nagoya/ruri-v3-30m"
    if stub._model is None:
        with pytest.raises(NotImplementedError, match="sentence-transformer"):
            stub(_batch(["x"]))


def _assert_cross_encoder_contract(enc):
    pairs = [("クエリ", "関連 文書"), ("クエリ", "unrelated noise"), ("q", "")]
    scores = enc.predict(pairs)
    assert isinstance(scores, np.ndarray)
    assert scores.dtype == np.float64
    assert scores.shape == (len(pairs),)
    np.testing.assert_array_equal(scores, enc.predict(pairs))  # deterministic


def test_fake_cross_encoder_contract():
    _assert_cross_encoder_contract(FakeCrossEncoder())


def test_real_cross_encoder_seam_is_constructible_and_gated():
    stub = RealCrossEncoderStub()
    assert stub.model_name == "cl-nagoya/ruri-reranker-small"
    if stub._model is None:
        with pytest.raises(NotImplementedError, match="cross-encoder"):
            stub.predict([("q", "d")])


def test_langid_fasttext_protocol_contract():
    """detect_language speaks the exact fasttext protocol —
    model.predict(sample, k=1) → ([__label__xx], [conf]) — and applies the
    reference's decision order around it (JP-char shortcut first, length
    floor, confidence floor)."""
    from oboyu_ray.functions.langid import detect_language

    class FakeFT:
        def __init__(self, label, conf):
            self.label, self.conf = label, conf
            self.calls = []

        def predict(self, sample, k=1):
            self.calls.append((sample, k))
            return ([self.label], [self.conf])

    m = FakeFT("__label__fr", 0.97)
    assert detect_language("bonjour le monde, ceci est un texte", model=m) == "fr"
    assert m.calls and m.calls[0][1] == 1
    assert "\n" not in m.calls[0][0]  # newlines stripped before predict
    # JP-char shortcut never consults the model
    m2 = FakeFT("__label__fr", 0.99)
    assert detect_language("日本語のテキストです、形態素解析を行います", model=m2) == "ja"
    assert not m2.calls
    # short content floor
    assert detect_language("hi", model=m2) == "en"


def test_mecab_seam_gate_message():
    from oboyu_ray.functions.tokenize import HAS_JAPANESE_TOKENIZER, JapaneseTokenizer

    if not HAS_JAPANESE_TOKENIZER:
        with pytest.raises(ImportError, match="fugashi"):
            JapaneseTokenizer()


# ---------------------------------------------------------------- real half

requires_real = pytest.mark.skipif(
    not REAL, reason="real-model pass is opt-in: set OBOYU_RAY_REAL_MODELS=1"
)


@requires_real
def test_real_embedder_satisfies_contract():
    stub = RealEmbedderStub()
    assert stub._model is not None, (
        "OBOYU_RAY_REAL_MODELS=1 but sentence_transformers is not importable"
    )
    _assert_embedder_contract(stub)


@requires_real
def test_real_cross_encoder_satisfies_contract():
    stub = RealCrossEncoderStub()
    assert stub._model is not None, (
        "OBOYU_RAY_REAL_MODELS=1 but sentence_transformers is not importable"
    )
    _assert_cross_encoder_contract(stub)
    # a relevant pair must outscore an irrelevant one on real weights
    rel, irr = stub.predict(
        [("検索 エンジン", "検索 エンジン の 仕組み"), ("検索 エンジン", "zzz")]
    )
    assert rel > irr


@requires_real
def test_real_fasttext_satisfies_decision_order():
    from oboyu_ray.functions.langid import HAS_FASTTEXT, detect_language

    assert HAS_FASTTEXT, "OBOYU_RAY_REAL_MODELS=1 but fasttext is not importable"
    assert detect_language("bonjour le monde, ceci est un texte en français") == "fr"
    assert detect_language("日本語のテキストです、形態素解析を行います") == "ja"


@requires_real
def test_real_mecab_tokenizer_satisfies_contract():
    from oboyu_ray.functions.tokenize import HAS_JAPANESE_TOKENIZER, JapaneseTokenizer

    assert HAS_JAPANESE_TOKENIZER, (
        "OBOYU_RAY_REAL_MODELS=1 but fugashi/unidic-lite is not importable"
    )
    tok = JapaneseTokenizer()
    out = tok.tokenize("東京タワーへ行きました")
    assert out and all(isinstance(t, str) for t in out)
    assert all(len(t) >= 2 for t in out)  # min_token_length respected
