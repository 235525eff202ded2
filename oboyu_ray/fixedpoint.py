"""THE fixed-point micros conversion shared with every DuckDB oracle.

Python side: ``micros(x)``; SQL side: ``CAST(floor(x * 1e6 + 0.5) AS
BIGINT)``.  Both must stay the same expression — the driver value-hashes
query results against the oracles, so a rounding-rule change here must land
in every oracle simultaneously (and vice versa).
"""

from __future__ import annotations

import numpy as np


def micros(x) -> "np.ndarray | int":
    """floor(x * 1e6 + 0.5) as int64 — scalar in → int, array in → int64
    ndarray."""
    arr = np.asarray(x, dtype=np.float64)
    out = np.floor(arr * 1e6 + 0.5).astype(np.int64)
    return int(out) if arr.ndim == 0 else out
