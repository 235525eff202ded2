"""Range-partitioned sort export: global sortedness across part files,
deterministic boundary routing (ties, NaN), and summary exactness."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from oboyu_ray.stages.sortexport import range_boundaries, range_sort_export


@pytest.fixture(scope="module")
def keyed(tmp_path_factory):
    rng = np.random.RandomState(13)
    n = 20_000
    # skewed keys with heavy duplicates at 7.0 to exercise tie routing
    v = np.round(np.concatenate([rng.exponential(100.0, n - 2_000),
                                 np.full(2_000, 7.0)]), 2)
    df = pd.DataFrame({"k": v, "payload": np.arange(len(v), dtype=np.int64)})
    return df


def test_global_sortedness_and_summary(keyed, tmp_path):
    out_dir = str(tmp_path / "sorted")
    ds = ray.data.from_pandas(keyed).repartition(8)
    summary = range_sort_export(ds, "k", out_dir, n_parts=4)

    files = sorted(os.listdir(out_dir))
    assert files == [f"part-{p:05d}.parquet" for p in summary["part_id"]]
    allk = []
    for f, (_, row) in zip(files, summary.iterrows()):
        t = pq.read_table(os.path.join(out_dir, f))
        k = t.column("k").to_numpy()
        assert (np.diff(k) >= 0).all()  # locally sorted
        assert k[0] == row["key_min"] and k[-1] == row["key_max"]
        assert len(k) == row["n_rows"]
        allk.append(k)
    cat = np.concatenate(allk)
    assert (np.diff(cat) >= 0).all()  # globally sorted across files
    assert len(cat) == len(keyed)
    # exact summary vs brute force
    want = np.sort(keyed["k"].to_numpy())
    assert np.array_equal(cat, want)
    cents = np.floor(keyed["k"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert summary["key_sum_cents"].sum() == cents.sum()
    # no payload loss
    rows = sum(pq.read_table(os.path.join(out_dir, f)).num_rows for f in files)
    assert rows == len(keyed)


def test_ties_route_to_one_partition(keyed, tmp_path):
    ds = ray.data.from_pandas(keyed).repartition(4)
    bnds = range_boundaries(ds, "k", 4)
    assert (np.diff(bnds) >= 0).all()
    summary = range_sort_export(ds, "k", str(tmp_path / "t"), n_parts=4)
    # every duplicate of 7.0 lands in exactly one part file
    holders = []
    for p in summary["part_id"]:
        t = pq.read_table(str(tmp_path / "t" / f"part-{p:05d}.parquet"))
        if (t.column("k").to_numpy() == 7.0).any():
            holders.append(int(p))
    assert len(holders) == 1


def test_nan_lands_last(tmp_path):
    df = pd.DataFrame({"k": [1.0, np.nan, 3.0, 2.0, np.nan, 5.0, 4.0, 0.5]})
    ds = ray.data.from_pandas(df).repartition(2)
    summary = range_sort_export(ds, "k", str(tmp_path / "n"), n_parts=2)
    last = int(summary["part_id"].max())
    t = pq.read_table(str(tmp_path / "n" / f"part-{last:05d}.parquet"))
    assert np.isnan(t.column("k").to_numpy()).sum() == 2
    first = pq.read_table(str(tmp_path / "n" / f"part-{int(summary['part_id'].min()):05d}.parquet"))
    assert not np.isnan(first.column("k").to_numpy()).any()


def test_rerun_smaller_nparts_removes_stale(keyed, tmp_path):
    """Re-running with fewer parts must not leave part files from the
    earlier wider plan — in-order reads stay globally sorted (ADVICE r3)."""
    out_dir = str(tmp_path / "rerun")
    ds = ray.data.from_pandas(keyed).repartition(8)
    range_sort_export(ds, "k", out_dir, n_parts=6)
    summary = range_sort_export(ds, "k", out_dir, n_parts=3)
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert files == [f"part-{int(p):05d}.parquet" for p in summary["part_id"]]
    cat = np.concatenate(
        [pq.read_table(os.path.join(out_dir, f)).column("k").to_numpy() for f in files]
    )
    assert np.array_equal(cat, np.sort(keyed["k"].to_numpy()))
