"""first_seen_growth / key_skew_report / table_checksum — partitioning
invariance and scalar-reference parity."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray.data

from oboyu_ray.stages.validate import CHECKSUM_MOD, key_skew_report, table_checksum
from oboyu_ray.stages.window import first_seen_growth


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(3)
    n = 30_000
    return pd.DataFrame(
        {
            # Zipf-ish keys → real skew
            "user_id": (rng.zipf(1.3, n) % 500).astype(np.int64),
            "ts": pd.Timestamp("2025-02-01").value // 1000
            + rng.randint(0, 40 * 86_400_000_000, n),
        }
    ).assign(ts=lambda d: d["ts"].astype("datetime64[us]"))


def test_first_seen_growth_matches_pandas(events):
    got = first_seen_growth(ray.data.from_pandas(events).repartition(16))
    f = events.assign(day=events["ts"].dt.floor("D")).groupby("user_id")["day"].min()
    want = f.value_counts().sort_index()
    assert np.array_equal(got["day"].to_numpy(), want.index.to_numpy())
    assert np.array_equal(got["new_users"].to_numpy(), want.to_numpy())
    assert got["cum_users"].iloc[-1] == events["user_id"].nunique()
    assert (np.diff(got["cum_users"]) > 0).all()


def test_key_skew_report_exact(events):
    got = key_skew_report(ray.data.from_pandas(events).repartition(16), "user_id", top_n=5)
    c = events["user_id"].value_counts()
    want = (
        c.reset_index()
        .sort_values(["count", "user_id"], ascending=[False, True], kind="mergesort")
        .head(5)
    )
    assert np.array_equal(got["user_id"].to_numpy(), want["user_id"].to_numpy())
    assert np.array_equal(got["n_rows"].to_numpy(), want["count"].to_numpy())
    total = len(events)
    assert got["share_ppm"].tolist() == [
        int(x) * 1_000_000 // total for x in want["count"]
    ]
    assert got["cum_ppm"].is_monotonic_increasing
    assert got["cum_ppm"].iloc[-1] <= 1_000_000


def test_checksum_partition_invariant():
    df = pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64),
         "text": [f"doc {i} 検索" * (i % 7) for i in range(1000)]}
    )
    a = table_checksum(ray.data.from_pandas(df).repartition(1), "doc_id", "text")
    b = table_checksum(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=5)).repartition(13),
        "doc_id", "text",
    )
    assert a["checksum"][0] == b["checksum"][0]
    assert a["n_rows"][0] == b["n_rows"][0] == 1000
    # scalar reference
    want = sum(
        int(hashlib.md5(f"{i}|{t}".encode()).hexdigest()[:15], 16)
        for i, t in zip(df["doc_id"], df["text"])
    ) % CHECKSUM_MOD
    assert a["checksum"][0] == want


def test_checksum_detects_single_row_change():
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": ["x"] * 200})
    df2 = df.copy()
    df2.loc[137, "text"] = "y"
    a = table_checksum(ray.data.from_pandas(df), "doc_id", "text")
    b = table_checksum(ray.data.from_pandas(df2), "doc_id", "text")
    assert a["checksum"][0] != b["checksum"][0]


def test_weighted_sample_deterministic_and_biased():
    from oboyu_ray.stages.trainprep import weighted_sample

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {"id": np.arange(1, 20_001, dtype=np.int64),
         "w": np.round(rng.exponential(100.0, 20_000) + 1.0, 2)}
    )
    a = weighted_sample(ray.data.from_pandas(df).repartition(8), "id", "w", k=50)
    b = weighted_sample(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(3),
        "id", "w", k=50,
    )
    # partitioning/order invariant
    assert a.equals(b)
    assert len(a) == 50 and a["id"].is_unique
    # scalar A-Res reference: global top-k of u^(1/w)
    import hashlib

    h = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) for i in df["id"]),
        dtype=np.float64, count=len(df),
    )
    key = np.power((h + 1.0) / float(1 << 52), 1.0 / df["w"].to_numpy())
    want = set(df["id"].to_numpy()[np.argsort(-key)[:50]].tolist())
    assert set(a["id"]) == want
    # weight bias: sampled mean weight far above population mean
    assert a["w"].mean() > 2 * df["w"].mean()


def test_weighted_sample_rejects_nonpositive():
    from oboyu_ray.stages.trainprep import weighted_sample

    df = pd.DataFrame({"id": [1, 2, 3], "w": [1.0, 0.0, 2.0]})
    with pytest.raises(Exception):
        weighted_sample(ray.data.from_pandas(df), "id", "w", k=2)


def test_daily_ohlc_ties_and_partition_invariance():
    from oboyu_ray.stages.window import daily_ohlc

    # two events share the day-open timestamp: lower event_id wins open;
    # two share the day-close timestamp: higher event_id wins close
    df = pd.DataFrame(
        {
            "event_id": np.array([5, 2, 9, 7, 3, 8], dtype=np.int64),
            "ts": pd.to_datetime(
                ["2025-03-01 00:00:00", "2025-03-01 00:00:00",
                 "2025-03-01 23:59:59", "2025-03-01 23:59:59",
                 "2025-03-02 10:00:00", "2025-03-02 11:00:00"]
            ).astype("datetime64[us]"),
            "value": [10.0, 20.0, 30.0, 40.0, 5.0, 6.0],
        }
    )
    a = daily_ohlc(ray.data.from_pandas(df).repartition(3))
    assert a["open_value"].tolist() == [20.0, 5.0]   # event_id 2 and 3
    assert a["close_value"].tolist() == [30.0, 6.0]  # event_id 9 and 8
    assert a["high_value"].tolist() == [40.0, 6.0]
    assert a["low_value"].tolist() == [10.0, 5.0]
    assert a["n_events"].tolist() == [4, 2]
    b = daily_ohlc(ray.data.from_pandas(df.sample(frac=1.0, random_state=2)))
    assert a.equals(b)


def test_leakage_safe_split_invariants():
    """No near-dup pair straddles the split; every doc is assigned; split
    fractions are sane."""
    from oboyu_ray.pipelines.corpus_queries import (
        q_dedup_ngram_jaccard,
        q_leakage_safe_split,
    )

    sf = "/root/testdata/sf0.001"
    out = q_leakage_safe_split(sf)
    assert out["doc_id"].is_unique
    # every component lands in exactly one split
    assert (out.groupby("component")["split"].nunique() == 1).all()
    # near-dup PAIRS never straddle
    pairs = q_dedup_ngram_jaccard(sf)
    s = dict(zip(out["doc_id"], out["split"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert s[int(a)] == s[int(b)]
    frac = (out["split"] == "train").mean()
    assert 0.3 < frac < 0.7


def test_sft_samples_from_transcripts():
    """The transcript-payload SFT extraction: context = previous n turns
    oldest-first, response = assistant turn text; first-turn responses
    (no context) are dropped; partitioning-invariant."""
    from oboyu_ray.sources.transcripts import synth_transcripts_table
    from oboyu_ray.stages.context import sft_samples

    t = synth_transcripts_table(21, 0, 40)
    ds = ray.data.from_arrow(t).repartition(6)
    out = sft_samples(ds, n_prev=2, sep="\n").to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # scalar reference over the same table
    df = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = []
    for conv, g in df.groupby("conv_id", sort=True):
        texts = g["text"].tolist()
        for i, (ti, role, text) in enumerate(zip(g["turn_idx"], g["role"], g["text"])):
            ctx = "\n".join(texts[max(i - 2, 0):i])
            if role == "assistant" and ctx != "":
                want.append((conv, int(ti), ctx, text))
    assert list(zip(out["conv_id"], out["turn_idx"], out["context"], out["response"])) == want
    assert len(want) > 50  # the synthetic corpus actually exercises this
