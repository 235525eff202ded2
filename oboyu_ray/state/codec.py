"""Delta + varint posting-block codec, fully numpy-vectorized.

North-rule layout: per (term, window) block the docIDs are stored as
delta-encoded LEB128 varints (first value = offset from the window start,
then gaps), term frequencies as raw varints.  Encode and decode are
vectorized — encode loops over BYTE POSITIONS (≤10 iterations regardless of
value count), decode reconstructs all values in one ``np.add.reduceat`` —
so the per-query hot path never iterates Python per posting.

The aligned-window block table itself (one row per (term, window) with
doc_min/doc_max implied by the window) is the skip structure: a query seeks
directly to surviving windows, which subsumes intra-list skip pointers at
window granularity (see state/shards.py).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """LEB128 encoded length in bytes for each uint64 value (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        n += (v >= t).astype(np.int64)
    return n


def varint_encode(values: np.ndarray) -> bytes:
    """Encode an array of non-negative ints as concatenated LEB128 varints."""
    v = np.asarray(values).astype(np.uint64, copy=False)
    if len(v) == 0:
        return b""
    lens = varint_byte_lengths(v)
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(lens.max())
    for j in range(max_len):
        mask = lens > j
        idx = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(lens[mask] - 1 > j, 0x80, 0).astype(np.uint64)
        out[idx] = (chunk | cont).astype(np.uint8)
    return out.tobytes()


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode concatenated LEB128 varints → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & 0x80) == 0  # terminator bytes end a value
    ends = np.flatnonzero(term)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_values: np.ndarray, base: int = 0) -> np.ndarray:
    """Strictly-increasing ints → gaps (first = value - base)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if len(v) == 0:
        return v.astype(np.uint64)
    d = np.empty(len(v), dtype=np.int64)
    d[0] = v[0] - base
    np.subtract(v[1:], v[:-1], out=d[1:])
    return d.astype(np.uint64)


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    """Inverse of delta_encode → int64 absolute values."""
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    if len(g) == 0:
        return g
    g[0] += base
    return np.cumsum(g)


def grouped_delta_encode(values: np.ndarray, group_starts: np.ndarray,
                         bases: np.ndarray) -> np.ndarray:
    """Delta-encode many concatenated groups at once: within each group
    (starting at ``group_starts[i]``) the first gap is relative to
    ``bases[i]``.  Returns uint64 gaps, same length as ``values``."""
    v = np.asarray(values, dtype=np.int64)
    if len(v) == 0:
        return v.astype(np.uint64)
    d = np.empty(len(v), dtype=np.int64)
    d[0] = 0
    np.subtract(v[1:], v[:-1], out=d[1:])
    d[group_starts] = v[group_starts] - np.asarray(bases, dtype=np.int64)
    return d.astype(np.uint64)
