"""Substring-containment dedup (winnowing-fingerprint candidates + exact
verify): equality vs an O(n²) brute force on corpora with MID-STRING
containment (the testdata's containments are all prefix-shaped, so the
winnowing path is pinned here), plus edge semantics."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

import ray.data

from oboyu_ray.stages.dedup import (
    SUBSTR_MIN_LEN,
    _batch_substr_rows,
    substring_dups,
)


def _brute(rows):
    flag = set()
    for ai, at in rows:
        for bi, bt in rows:
            if ai == bi:
                continue
            if len(at) >= SUBSTR_MIN_LEN and len(bt) > len(at) and at in bt:
                flag.add(ai)
            if at == bt and bi > ai:
                flag.add(ai)
    return sorted(flag)


def _run(rows, parts=4):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    ds = ray.data.from_pandas(df).repartition(parts)
    out = substring_dups(ds)
    # the Dataset schema is typed (doc_id int64) even when empty, but Ray's
    # to_pandas drops columns on zero-row results — guard the conversion
    assert [f.name for f in out.schema().base_schema] == ["doc_id"]
    pdf = out.to_pandas()
    return sorted(pdf["doc_id"].tolist()) if "doc_id" in pdf.columns else []


def test_substring_dups_midstring_matches_brute_force():
    rng = random.Random(5)
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "distributed systems need careful shuffle planning at scale",
        "winnowing fingerprints guarantee shared substring detection",
    ]
    rows, did = [], 0
    for b in base:
        rows.append((did, "PREFIX " + b + " SUFFIX TAIL MORE")); did += 1
        rows.append((did, b)); did += 1                 # mid-contained
        rows.append((did, b[10:45])); did += 1          # interior slice
        rows.append((did, b[-30:])); did += 1           # suffix slice
    rows.append((did, "tiny")); did += 1                # short unique
    rows.append((did, "tiny")); did += 1                # short exact dup
    rows.append((did, "")); did += 1                    # empty text
    for i in range(60):
        rows.append((did, f"noise doc {i} padded with words {rng.random()}"))
        did += 1
    got = _run(rows)
    assert got == _brute(rows)
    # the interior and suffix slices really are non-prefix containments
    assert any(rows[i][1] and not rows[0][1].startswith(rows[i][1])
               for i in range(len(rows)) if rows[i][0] in got)


def test_substring_dups_edges():
    # single empty doc: not flagged (below the length bound, no equal twin)
    assert _run([(0, ""), (1, "x" * 40)]) == []
    # two empties: all-but-max flagged
    assert _run([(0, ""), (1, ""), (2, "x" * 40)]) == [0]
    # equal long texts: all but max id flagged (no strict containment)
    t = "z" * 50
    assert _run([(3, t), (7, t), (5, t)]) == [3, 5]
    # just-below vs at the length bound
    short = "a" * (SUBSTR_MIN_LEN - 1)
    long_ = "a" * (SUBSTR_MIN_LEN)
    container = "pad " + "a" * 60 + " pad"
    assert _run([(0, short), (1, long_), (2, container)]) == [1]


def test_batch_substr_rows_anchor_in_winnowed_set():
    """The contained-side anchor (global-min gram) must be selected by the
    container-side winnow of the SAME text — the exactness argument."""
    rng = random.Random(11)
    for trial in range(20):
        n = rng.randint(SUBSTR_MIN_LEN, 200)
        txt = "".join(rng.choice("abcdef ") for _ in range(n))
        fp, side, did, _ = _batch_substr_rows([txt], np.array([1]), 16, 8)
        cont = set(fp[side == 0].tolist())
        anch = fp[side == 1]
        assert len(anch) == 1 and int(anch[0]) in cont, trial


def test_substring_dups_oracle_sf0001():
    import duckdb

    d = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{d}/documents.parquet", columns=["doc_id", "text"])
    got = sorted(substring_dups(docs).to_pandas()["doc_id"].tolist())
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{d}/documents.parquet')"
    )
    from oboyu_ray.pipelines.corpus_queries import SQL_SUBSTRING_DUPS

    exp = sorted(r[0] for r in con.execute(SQL_SUBSTRING_DUPS).fetchall())
    assert got == exp and len(got) > 0
