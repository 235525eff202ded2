"""Language detection (SURVEY §2-M1 / T5) — reference semantics with the
fasttext model availability-gated.

Reference `crawler/services/language_detector.py:19-129`: a 5000-char
sample, short-text → "en", Japanese char-ratio pre-check (>10% of sample in
U+3000–U+9FFF → "ja"), then the fasttext lid.176 model at confidence ≥ 0.5
with a known-language allowlist, and char-presence fallbacks.  fasttext is
absent in this container, so — like MeCab / the embedder — the model hook
is a process-global gated singleton (`language_detector.py:8-9`): with the
library absent every decision point falls through to the deterministic
fallbacks, which IS the reference's behavior on fasttext failure.

Batch stage: ``detect_language_batch`` is a pure map_batches fn (model
state, when present, is process-global — loaded once per worker, the
reference's own pattern).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

try:  # availability gate — reference language_detector.py:8-16
    import fasttext  # type: ignore

    HAS_FASTTEXT = True
except ImportError:
    fasttext = None
    HAS_FASTTEXT = False

_MODEL = None  # process-global singleton (language_detector.py:8-9)
_KNOWN = ("en", "zh", "ko", "fr", "de", "es", "it", "ru")


def _get_model():
    global _MODEL
    if _MODEL is None:
        if not HAS_FASTTEXT:
            raise ImportError("fasttext is not installed")
        _MODEL = fasttext.load_model("lid.176.bin")  # pragma: no cover
    return _MODEL


def _jp_char_count(sample: str) -> int:
    return sum(1 for ch in sample if 0x3000 <= ord(ch) <= 0x9FFF)


def detect_language(content: str, model=None) -> str:
    """Reference detect_language, line-for-line decision order.  ``model``
    injects a fake predictor in tests (predict(sample, k=1) →
    ([label], [conf]) pairs like fasttext)."""
    sample = (content or "")[:5000].replace("\n", " ").strip()
    if len(sample) < 10:
        return "en"
    jp = _jp_char_count(sample)
    if jp > len(sample) * 0.1:
        return "ja"
    try:
        m = model if model is not None else _get_model()
        predictions = m.predict(sample, k=1)
        if predictions and len(predictions) == 2 and len(predictions[0]) > 0:
            label = predictions[0][0]
            confidence = float(predictions[1][0])
            detected = label[9:] if label.startswith("__label__") else label
            if confidence >= 0.5:
                if detected == "ja":
                    return "ja"
                if detected in _KNOWN:
                    return str(detected)
            if jp > 0:
                return "ja"
            if detected in _KNOWN:
                return str(detected)
            return str(detected)
    except Exception:
        pass  # graceful fallback, reference behavior
    if jp > 0:
        return "ja"
    return "en"


def detect_language_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", model=None
) -> pa.Table:
    langs: List[str] = [detect_language(t, model=model) for t in batch.column(text_col).to_pylist()]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
