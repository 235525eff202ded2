"""Arrow-native embedding-column decode.

Every vector stage needs (n, dim) float64 matrices out of an Arrow
``list<float>`` / ``fixed_size_list<float>`` column.  ``to_pylist()`` +
``np.stack`` materializes one Python list object PER ROW — a constant-factor
tax on every embedding batch at 100 TB scale.  ``vec_matrix`` instead
reshapes the underlying flat values buffer: zero-copy from the object store
up to the final dtype cast.

Handles chunked arrays, sliced arrays (offsets honored), and both list
types; rejects ragged rows (embedding columns are uniform by contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list<float>`` column → (n, dim)
    float64 matrix via flat-buffer reshape (no per-row Python objects)."""
    if isinstance(col, pa.ChunkedArray):
        arrs = col.chunks
    else:
        arrs = [col]
    mats = []
    for a in arrs:
        if len(a) == 0:
            continue
        if pa.types.is_fixed_size_list(a.type):
            dim = a.type.list_size
            vals = a.values.to_numpy(zero_copy_only=False)
            start = a.offset * dim
            m = vals[start : start + len(a) * dim].reshape(len(a), dim)
        elif not (pa.types.is_list(a.type) or pa.types.is_large_list(a.type)):
            # extension types (e.g. Ray's ArrowTensorArray) decode straight
            # to an (n, dim) ndarray
            m = np.asarray(a.to_numpy(zero_copy_only=False))
            if m.ndim == 1 and m.dtype == object:
                m = np.stack(m)
        else:
            off = a.offsets.to_numpy()
            widths = np.diff(off)
            dim = int(widths[0])
            if not (widths == dim).all():
                raise ValueError("ragged embedding column (rows differ in length)")
            vals = a.values.to_numpy(zero_copy_only=False)
            m = vals[off[0] : off[-1]].reshape(len(a), dim)
        mats.append(np.ascontiguousarray(m, dtype=np.float64))
    if not mats:
        return np.zeros((0, 0), dtype=np.float64)
    return np.concatenate(mats) if len(mats) > 1 else mats[0]


def matrix_to_fixed_list(m: np.ndarray, dtype=pa.float64()) -> pa.Array:
    """(n, dim) matrix → ``fixed_size_list`` array without per-row Python
    lists (the write-side twin of ``vec_matrix``)."""
    m = np.ascontiguousarray(m)
    n, dim = m.shape
    return pa.FixedSizeListArray.from_arrays(
        pa.array(m.ravel(), type=dtype), dim
    )
