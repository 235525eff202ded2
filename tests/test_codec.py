"""Property tests for the delta+varint codec: decode(encode(x)) == x."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oboyu_ray.state.codec import (
    delta_decode,
    delta_encode,
    grouped_delta_encode,
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_known_values():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


def test_varint_byte_lengths():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**62], dtype=np.uint64)
    assert varint_byte_lengths(v).tolist() == [1, 1, 1, 2, 2, 3, 9]


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=0, max_size=200),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(values, base_offset):
    v = np.unique(np.array(values, dtype=np.int64))
    base = int(v[0]) - base_offset if len(v) else 0
    gaps = delta_encode(v, base=base)
    assert np.array_equal(delta_decode(gaps, base=base), v)


def test_grouped_delta_matches_per_group():
    rng = np.random.default_rng(7)
    groups = []
    bases = []
    for base in (0, 100, 5000):
        vals = np.unique(rng.integers(base, base + 400, size=30).astype(np.int64))
        groups.append(vals)
        bases.append(base)
    concat = np.concatenate(groups)
    starts = np.cumsum([0] + [len(g) for g in groups[:-1]])
    gaps = grouped_delta_encode(concat, starts.astype(np.int64), np.array(bases))
    expected = np.concatenate([delta_encode(g, base=b) for g, b in zip(groups, bases)])
    assert np.array_equal(gaps, expected)


def test_full_block_roundtrip():
    # delta → varint → bytes → varint → cumsum, as the block build/query do
    rng = np.random.default_rng(42)
    docs = np.unique(rng.integers(0, 8192, size=500).astype(np.int64))
    payload = varint_encode(delta_encode(docs, base=0))
    assert len(payload) < docs.nbytes  # actually compresses vs raw int64
    back = delta_decode(varint_decode(payload), base=0)
    assert np.array_equal(back, docs)


def test_positions_payload_roundtrip_property():
    """Property: arbitrary per-posting position lists survive the blocks
    positions encoding (delta+varint with tf as the length stream) exactly —
    the same reconstruction decode_positions performs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oboyu_ray.state.codec import grouped_delta_encode, varint_decode, varint_encode

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=0, max_value=2**20), min_size=1,
                     max_size=30).map(lambda v: sorted(set(v))),
            min_size=1, max_size=40,
        )
    )
    def check(lists):
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in lists])
        counts = np.array([len(v) for v in lists], dtype=np.int64)
        pstarts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=pstarts[1:])
        gaps = grouped_delta_encode(flat, pstarts, np.zeros(len(pstarts), np.int64))
        payload = varint_encode(gaps)
        # decode exactly like _PartIndex.decode_positions
        dec = varint_decode(payload).astype(np.int64)
        tot = np.cumsum(dec)
        shift = np.zeros(len(counts), dtype=np.int64)
        if len(counts) > 1:
            shift[1:] = tot[pstarts[1:] - 1]
        back = tot - np.repeat(shift, counts)
        assert np.array_equal(back, flat)

    check()
