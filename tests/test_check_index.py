"""Index integrity checker (`cli check`, Lucene CheckIndex analog): a clean
build passes every check; each seeded corruption is detected by the check
that owns it.  Corruptions rewrite real index parquet/json in a copy of the
built index — the checker must find them from the files alone."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oboyu_ray.config import BuildConfig
from oboyu_ray.pipelines.build_index import build_index
from oboyu_ray.pipelines.check_index import check_index


@pytest.fixture(scope="module")
def clean_index(ray_session, tmp_path_factory):
    from oboyu_ray.sources.transcripts import write_synth_transcripts

    root = tmp_path_factory.mktemp("checkidx")
    files = write_synth_transcripts(str(root / "in"), 60, seed=11,
                                    convs_per_file=15)
    index_dir = str(root / "idx")
    build_index(files, index_dir, BuildConfig(window_docs=64, vocab_buckets=4,
                                              store_positions=True),
                files_per_part=1)
    return index_dir


def _copy(clean_index, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(clean_index, dst)
    return dst


def test_clean_index_passes(clean_index):
    report = check_index(clean_index, sample_terms=32)
    assert report["errors"] == []
    assert report["ok"] is True
    assert all(c["ok"] for c in report["checks"].values()), report["checks"]
    assert report["checks"]["sampled_terms"]["n_sampled"] >= 8


def test_missing_file_detected(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "missing")
    os.remove(os.path.join(idx, "dls", "dls-00001.parquet"))
    report = check_index(idx, sample_terms=8)
    assert not report["ok"]
    assert not report["checks"]["structure"]["ok"]
    assert any("dls-00001" in m for m in report["checks"]["structure"]["missing"])


def test_tampered_stats_detected(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "stats")
    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    stats["total_dl"] += 7
    with open(os.path.join(idx, "stats.json"), "w") as f:
        json.dump(stats, f)
    report = check_index(idx, sample_terms=8)
    assert not report["ok"]
    assert not report["checks"]["dls"]["ok"]


def test_tampered_vocab_df_detected(clean_index, tmp_path):
    """A wrong df in the vocabulary must surface as a sampled-term mismatch
    (vocab vs blocks vs postings) when the term lands in the sample — force
    that by tampering EVERY row of one bucket."""
    idx = _copy(clean_index, tmp_path, "vocabdf")
    path = os.path.join(idx, "vocab", "vocab-00002.parquet")
    t = pq.read_table(path)
    df = t.column("df").to_numpy() + 1
    pq.write_table(
        pa.table({"term": t.column("term"),
                  "df": pa.array(df, type=pa.int64()),
                  "cf": t.column("cf")}),
        path,
    )
    report = check_index(idx, sample_terms=64)
    assert not report["ok"]
    assert not report["checks"]["sampled_terms"]["ok"]
    assert report["checks"]["sampled_terms"]["mismatches"]


def test_tampered_block_bounds_detected(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "bounds")
    path = os.path.join(idx, "blocks", "blocks-00000.parquet")
    t = pq.read_table(path)
    mx = t.column("max_tfnorm").to_numpy().copy()
    mx[len(mx) // 2] += 0.25
    cols = {n: t.column(n) for n in t.schema.names}
    cols["max_tfnorm"] = pa.array(mx, type=pa.float64())
    pq.write_table(pa.table(cols), path)
    report = check_index(idx, sample_terms=1_000_000)  # sample EVERY term
    assert not report["ok"]
    assert not report["checks"]["block_bounds"]["ok"]
    assert report["checks"]["block_bounds"]["bad"] >= 1


def test_tampered_postings_detected(clean_index, tmp_path):
    """blocks ≡ postings: bump one tf in the RAW postings table — df/cf
    totals and the multiset digest must both flag the sampled term."""
    idx = _copy(clean_index, tmp_path, "postings")
    path = os.path.join(idx, "postings", "postings-00000.parquet")
    t = pq.read_table(path)
    tf = t.column("tf").to_numpy().copy()
    tf[0] += 1
    cols = {n: t.column(n) for n in t.schema.names}
    cols["tf"] = pa.array(tf, type=pa.int64())
    pq.write_table(pa.table(cols), path)
    report = check_index(idx, sample_terms=1_000_000)
    assert not report["ok"]
    assert not report["checks"]["sampled_terms"]["ok"]


def test_unsorted_conv_map_detected(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path, "convmap")
    cm_dir = os.path.join(idx, "conv_map")
    fname = sorted(f for f in os.listdir(cm_dir) if f.endswith(".parquet"))[0]
    path = os.path.join(cm_dir, fname)
    t = pq.read_table(path)
    if t.num_rows < 2:
        pytest.skip("need >= 2 conv rows to break ordering")
    order = np.arange(t.num_rows)
    order[0], order[1] = order[1], order[0]
    pq.write_table(t.take(pa.array(order)), path)
    report = check_index(idx, sample_terms=8)
    assert not report["ok"]
    assert not report["checks"]["conv_map"]["ok"]


def test_stale_fuzzy_sidecar_detected(clean_index, tmp_path):
    """A sidecar built over a DIFFERENT vocabulary (stale after re-index)
    must flag; a fresh one passes."""
    from oboyu_ray.state.fuzzy_index import build_fuzzy_sidecar

    idx = _copy(clean_index, tmp_path, "sidecar")
    build_fuzzy_sidecar(idx, max_edits=1, n_buckets=4)
    report = check_index(idx, sample_terms=8)
    assert report["ok"], report["errors"]
    assert report["checks"]["fuzzy_sidecar"]["ok"]

    man_path = os.path.join(idx, "fuzzy_fastss", "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    man["n_terms"] -= 1
    with open(man_path, "w") as f:
        json.dump(man, f)
    report = check_index(idx, sample_terms=8)
    assert not report["ok"]
    assert not report["checks"]["fuzzy_sidecar"]["ok"]
    assert any("stale sidecar" in e for e in report["errors"])


def test_cli_check_exit_codes(clean_index, tmp_path, capsys):
    import argparse

    from oboyu_ray.cli import cmd_check

    rc = cmd_check(argparse.Namespace(index_dir=clean_index, sample_terms=8,
                                      num_cpus=None))
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True

    idx = _copy(clean_index, tmp_path, "cli_bad")
    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    stats["total_dl"] += 1
    with open(os.path.join(idx, "stats.json"), "w") as f:
        json.dump(stats, f)
    rc = cmd_check(argparse.Namespace(index_dir=idx, sample_terms=8,
                                      num_cpus=None))
    assert rc == 1


def test_unreadable_metadata_is_failing_report_not_crash(clean_index, tmp_path):
    """Regression (round-5 review): an fsck must not crash on the exact
    corruption it diagnoses — missing/truncated stats.json yields a
    failing report."""
    idx = _copy(clean_index, tmp_path, "nostats")
    os.remove(os.path.join(idx, "stats.json"))
    report = check_index(idx, sample_terms=4)
    assert report["ok"] is False
    assert not report["checks"]["metadata"]["ok"]

    idx2 = _copy(clean_index, tmp_path, "badjson")
    with open(os.path.join(idx2, "stats.json"), "w") as f:
        f.write("{not json")
    report = check_index(idx2, sample_terms=4)
    assert report["ok"] is False and not report["checks"]["metadata"]["ok"]

    idx3 = _copy(clean_index, tmp_path, "noconvmap")
    shutil.rmtree(os.path.join(idx3, "conv_map"))
    report = check_index(idx3, sample_terms=4)
    assert report["ok"] is False
    assert any("conv_map" in m for m in report["checks"]["structure"]["missing"])


def test_sample_terms_budget_respected(clean_index):
    """--sample-terms is a ceiling (per-bucket rounding must not overshoot)
    and 0 disables the deep per-term checks."""
    report = check_index(clean_index, sample_terms=3)
    assert report["ok"]
    assert report["checks"]["sampled_terms"]["n_sampled"] <= 3
    report0 = check_index(clean_index, sample_terms=0)
    assert report0["ok"]
    assert report0["checks"]["sampled_terms"]["n_sampled"] == 0
