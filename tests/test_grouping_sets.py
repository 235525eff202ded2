"""grouping_sets_sum / cube_sum: validation, and consistency with
rollup_sum on the prefix sets (ROLLUP ⊂ CUBE)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from oboyu_ray.stages.relational import (
    ROLLUP_ALL,
    cube_sum,
    grouping_sets_sum,
    rollup_sum,
)


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(4)
    n = 500
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(1, 1000, n).astype(np.int64),
        }
    )
    return df, ray.data.from_pandas(df).repartition(4)


def _key(df):
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_cube_covers_all_grouping_sets(toy):
    df, ds = toy
    out = _key(cube_sum(ds, ["a", "b"], "v").to_pandas())
    # (a,b) cells
    cell = out[(out.a != ROLLUP_ALL) & (out.b != ROLLUP_ALL)]
    exp = df.groupby(["a", "b"], as_index=False).agg(
        n_rows=("v", "size"), value_sum=("v", "sum")
    )
    pd.testing.assert_frame_equal(
        _key(cell).astype({"n_rows": "int64", "value_sum": "int64"}),
        _key(exp).astype({"n_rows": "int64", "value_sum": "int64"}),
    )
    # b-only subtotals — the set ROLLUP cannot produce
    bonly = out[(out.a == ROLLUP_ALL) & (out.b != ROLLUP_ALL)]
    expb = df.groupby("b", as_index=False).agg(
        n_rows=("v", "size"), value_sum=("v", "sum")
    )
    assert sorted(bonly.b) == sorted(expb.b)
    assert (
        bonly.sort_values("b")["value_sum"].to_numpy()
        == expb.sort_values("b")["value_sum"].to_numpy()
    ).all()
    # grand total
    gt = out[(out.a == ROLLUP_ALL) & (out.b == ROLLUP_ALL)]
    assert len(gt) == 1
    assert int(gt["value_sum"].iloc[0]) == int(df["v"].sum())
    assert int(gt["n_rows"].iloc[0]) == len(df)
    assert len(out) == len(exp) + len(expb) + df["a"].nunique() + 1


def test_cube_restricted_to_prefix_sets_equals_rollup(toy):
    _, ds = toy
    cube = _key(cube_sum(ds, ["a", "b"], "v").to_pandas())
    roll = _key(rollup_sum(ds, ["a", "b"], "v").to_pandas())
    sub = _key(cube[~((cube.a == ROLLUP_ALL) & (cube.b != ROLLUP_ALL))])
    pd.testing.assert_frame_equal(
        sub.reset_index(drop=True), roll.reset_index(drop=True)
    )


def test_grouping_sets_validation(toy):
    _, ds = toy
    with pytest.raises(ValueError, match="not in keys"):
        grouping_sets_sum(ds, ["a", "b"], "v", [("c",)])
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_sum(ds, ["a", "b"], "v", [("a",), ("a",)])


def test_sentinel_and_null_keys_rejected():
    """r5 ADVICE: a key column containing the ROLLUP_ALL sentinel would
    collide with subtotal rows, and nulls would form their own arrow group
    while the SQL twin COALESCEs them into ALL — both must raise, in both
    rollup_sum and grouping_sets_sum (cube_sum delegates)."""
    bad_sentinel = ray.data.from_pandas(
        pd.DataFrame({"a": ["x", ROLLUP_ALL], "b": ["p", "q"],
                      "v": np.int64([1, 2])})
    )
    bad_null = ray.data.from_pandas(
        pd.DataFrame({"a": ["x", None], "b": ["p", "q"],
                      "v": np.int64([1, 2])})
    )
    for build in (
        lambda ds: rollup_sum(ds, ["a", "b"], "v"),
        lambda ds: grouping_sets_sum(ds, ["a", "b"], "v", [("a", "b"), ()]),
    ):
        with pytest.raises(Exception, match="reserved sentinel"):
            build(bad_sentinel).to_pandas()
        with pytest.raises(Exception, match="contains nulls"):
            build(bad_null).to_pandas()
