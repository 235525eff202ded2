"""Pareto frontier: vectorized kernel vs brute-force NOT-EXISTS dominance
on random data with duplicates, plus the distributed operator's parity
and adversarial (anti-sorted) shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from oboyu_ray.stages.skyline import _skyline_min2, pareto_frontier_min2


def brute_skyline(x: np.ndarray, y: np.ndarray) -> set:
    pts = set(zip(x.tolist(), y.tolist()))
    out = set()
    for (px, py) in pts:
        dominated = any(
            (qx <= px and qy <= py and (qx < px or qy < py)) for (qx, qy) in pts
        )
        if not dominated:
            out.add((px, py))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_brute(seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 30, 400).astype(np.float64)
    y = rng.randint(0, 30, 400).astype(np.float64)
    xs, ys = _skyline_min2(x, y)
    assert set(zip(xs.tolist(), ys.tolist())) == brute_skyline(x, y)
    # frontier is strictly decreasing in y over increasing x
    assert (np.diff(xs) > 0).all() and (np.diff(ys) < 0).all()


def test_distributed_matches_kernel():
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "price": rng.exponential(50.0, 50_000).round(2),
            "score": rng.exponential(10.0, 50_000).round(3),
        }
    )
    got = pareto_frontier_min2(ray.data.from_pandas(df).repartition(16), "price", "score")
    xs, ys = _skyline_min2(df["price"].to_numpy(), df["score"].to_numpy())
    assert np.array_equal(got["price"].to_numpy(), xs)
    assert np.array_equal(got["score"].to_numpy(), ys)


def test_adversarial_anti_sorted():
    # x up, y down: every distinct point is on the frontier
    n = 5_000
    df = pd.DataFrame({"a": np.arange(n, dtype=np.float64),
                       "b": np.arange(n, 0, -1, dtype=np.float64)})
    got = pareto_frontier_min2(ray.data.from_pandas(df).repartition(8), "a", "b")
    assert len(got) == n


def test_all_equal_single_point():
    df = pd.DataFrame({"a": np.full(100, 3.0), "b": np.full(100, 9.0)})
    got = pareto_frontier_min2(ray.data.from_pandas(df).repartition(4), "a", "b")
    assert len(got) == 1 and got["a"][0] == 3.0 and got["b"][0] == 9.0


def test_timestamp_dim():
    df = pd.DataFrame(
        {
            "p": [5.0, 4.0, 4.0, 6.0],
            "t": pd.to_datetime(
                ["2025-01-03", "2025-01-04", "2025-01-05", "2025-01-01"]
            ).astype("datetime64[us]"),
        }
    )
    got = pareto_frontier_min2(ray.data.from_pandas(df), "p", "t")
    want = {(4.0, pd.Timestamp("2025-01-04")), (5.0, pd.Timestamp("2025-01-03")),
            (6.0, pd.Timestamp("2025-01-01"))}
    assert set(zip(got["p"], got["t"])) == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=60,
    )
)
def test_kernel_property_vs_brute(pairs):
    x = np.array([p[0] for p in pairs], dtype=np.float64)
    y = np.array([p[1] for p in pairs], dtype=np.float64)
    xs, ys = _skyline_min2(x, y)
    assert set(zip(xs.tolist(), ys.tolist())) == brute_skyline(x, y)
