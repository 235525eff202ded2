"""Small-file compaction: content preservation (order-insensitive
checksum), packing bounds, row-order preservation, and crash resume."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from oboyu_ray.sources.compaction import compact_parquet, plan_compaction
from oboyu_ray.stages.validate import table_checksum


@pytest.fixture(scope="module")
def small_files(tmp_path_factory):
    base = tmp_path_factory.mktemp("compact_src")
    rng = np.random.RandomState(4)
    paths = []
    start = 0
    for i in range(23):
        n = int(rng.randint(50, 400))
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(start, start + n), type=pa.int64()),
                "text": pa.array([f"doc {j} body" for j in range(start, start + n)]),
            }
        )
        p = str(base / f"shard-{i:04d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        start += n
    return paths


def test_plan_respects_target_and_order(small_files):
    groups = plan_compaction(small_files, target_bytes=20_000)
    flat = [f for g in groups for f in g["files"]]
    assert flat == sorted(small_files)  # name order preserved across groups
    for g in groups:
        assert len(g["files"]) == 1 or g["bytes"] <= 20_000


def test_content_and_order_preserved(small_files, tmp_path):
    outs = compact_parquet(small_files, str(tmp_path / "out"), target_bytes=20_000)
    assert 1 < len(outs) < len(small_files)
    a = table_checksum(ray.data.read_parquet(small_files), "doc_id", "text")
    b = table_checksum(ray.data.read_parquet(outs), "doc_id", "text")
    assert a.equals(b)
    # reading outputs in order yields the same row order as inputs in order
    ids = pa.concat_tables([pq.read_table(p) for p in outs]).column("doc_id")
    want = pa.concat_tables([pq.read_table(p) for p in small_files]).column("doc_id")
    assert ids.equals(want)


def test_resume_skips_committed_groups(small_files, tmp_path):
    out_dir = str(tmp_path / "r")
    outs = compact_parquet(small_files, out_dir, target_bytes=20_000)
    mtimes = {p: os.path.getmtime(p) for p in outs}
    os.unlink(outs[2])
    outs2 = compact_parquet(small_files, out_dir, target_bytes=20_000)
    assert outs2 == outs and os.path.exists(outs[2])
    for p in outs:
        if p != outs[2]:
            assert os.path.getmtime(p) == mtimes[p]


def test_changed_input_changes_signature(small_files, tmp_path):
    out_dir = str(tmp_path / "sig")
    outs = compact_parquet(small_files, out_dir, target_bytes=20_000)
    # rewrite one input (same rows, new mtime/size signature)
    t = pq.read_table(small_files[0])
    pq.write_table(t, small_files[0])
    outs2 = compact_parquet(small_files, out_dir, target_bytes=20_000)
    assert outs2[0] != outs[0]  # stale output never reused


def test_stale_outputs_retired_and_manifest(small_files, tmp_path):
    """Re-running over a changed input set removes obsolete compact-*
    outputs and writes a manifest of the valid ones — a directory-swapping
    caller never reads stale rows (ADVICE r3)."""
    import json

    out_dir = str(tmp_path / "stale")
    outs = compact_parquet(small_files, out_dir, target_bytes=20_000)
    # shrink the input set → fewer groups, different sigs
    outs2 = compact_parquet(small_files[:5], out_dir, target_bytes=20_000)
    on_disk = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    assert on_disk == {os.path.basename(p) for p in outs2}
    assert len(on_disk) < len(outs)
    man = json.load(open(os.path.join(out_dir, "compaction_manifest.json")))
    assert man["outputs"] == [os.path.basename(p) for p in outs2]
    # content of the shrunk set still exact
    a = table_checksum(ray.data.read_parquet(small_files[:5]), "doc_id", "text")
    b = table_checksum(ray.data.read_parquet(outs2), "doc_id", "text")
    assert a.equals(b)
