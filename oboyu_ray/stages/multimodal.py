"""Multimodal (binary-payload) column plumbing.

Treats image/audio payloads as opaque ``binary`` columns with typed header
metadata, processed by stateful actor-pool ``map_batches`` stages — the
shape a real decode/feature-extract pipeline has at 100 TB.  The actual
codec libraries are not in this container, so decoding is STUBBED two ways,
both clearly marked:

* ``RealDecodeStub`` raises ``NotImplementedError`` (the seam where
  PIL/ffmpeg would plug in), and
* ``FakeDecodeFeatures`` is a deterministic fake: it parses the (real)
  header we synthesize and computes numpy features over the payload bytes.

Everything around the stub is real and tested: schema (binary + metadata
columns), deterministic payload synthesis, actor-pool construction
(``map_batches(Cls, concurrency=N, batch_size=B)`` with setup in
``__init__``), small ``batch_size`` sizing for large payloads, and the
output layout.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data

from oboyu_ray.fixedpoint import micros

MAGIC = b"OBIM"  # fake image container magic
HEADER = struct.Struct("<4sHHI")  # magic, width, height, payload_len

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
    ]
)


def synth_payload_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministic fake binary column: a parseable header + md5-stretched
    bytes derived from (doc_id, text).  Stands in for real image bytes so
    the decode stage's batch plumbing is exercised with realistic-shaped
    (variable-length, incompressible) payloads."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    payloads: List[bytes] = []
    for d, t in zip(ids, texts):
        seed = hashlib.md5(f"{d}:{t or ''}".encode("utf-8")).digest()
        w = 16 + seed[0] % 64
        h = 16 + seed[1] % 64
        n = w * h
        body = bytearray()
        block = seed
        while len(body) < n:
            block = hashlib.md5(block).digest()
            body.extend(block)
        payloads.append(HEADER.pack(MAGIC, w, h, n) + bytes(body[:n]))
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in ids], type=pa.int64()),
            "mime": pa.array(["image/x-fake"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class FakeDecodeFeatures:
    """Actor-pool decode/feature stage (deterministic fake).

    ``__init__`` = once-per-actor setup (where a real stage loads its codec
    / model); ``__call__`` = per-batch work: parse header, 'decode' payload
    bytes into a numpy array, compute features.  Use with::

        ds.map_batches(FakeDecodeFeatures, concurrency=(1, 4),
                       batch_size=64, batch_format="pyarrow")

    batch_size stays small because payload bytes dominate batch memory.
    """

    def __init__(self) -> None:
        self.header = HEADER  # stands in for codec/model load

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths: List[int] = []
        heights: List[int] = []
        n_bytes: List[int] = []
        mean_u: List[int] = []
        for p in payloads:
            magic, w, h, n = self.header.unpack_from(p, 0)
            if magic != MAGIC:
                raise ValueError("bad payload magic")
            body = np.frombuffer(p, dtype=np.uint8, count=n, offset=self.header.size)
            widths.append(int(w))
            heights.append(int(h))
            n_bytes.append(int(n))
            mean_u.append(micros(body.mean()) if n else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "mean_byte_micros": pa.array(mean_u, type=pa.int64()),
            }
        )


class RealDecodeStub:
    """The seam for a real decoder (PIL / torchvision / ffmpeg), which is
    not available in this container.  Clearly-marked stub per the build
    contract: constructing it works (so pool setup is testable); calling it
    raises."""

    def __init__(self, target_size: Optional[tuple] = None) -> None:
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "real image decode requires PIL/ffmpeg, absent in this container; "
            "use FakeDecodeFeatures for the tested deterministic path"
        )


def multimodal_features(
    docs: "ray.data.Dataset", concurrency=(1, 4), batch_size: int = 64
) -> "ray.data.Dataset":
    """documents → synthesized binary column → actor-pool feature extract.
    Returns (doc_id, width, height, n_bytes, mean_byte_micros)."""
    payloads = docs.map_batches(synth_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        FakeDecodeFeatures,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
