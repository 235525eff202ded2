"""Property tests for the training-prep kernels: each vectorized batch
kernel must agree with an obviously-correct scalar reference on arbitrary
inputs (the same discipline as the codec / conformance property suites).
No Ray needed — these are pure batch functions."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from oboyu_ray.stages import trainprep as tp
from oboyu_ray.stages.textstats import WORD_RE

# text alphabet stresses: word chars, digits, separators, unicode, @ for emails
TEXTS = st.lists(
    st.one_of(
        st.text(alphabet="ab1 .@-\t\n", max_size=40),
        st.text(max_size=20),
        st.none(),
    ),
    min_size=0,
    max_size=12,
)


def _mk(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_repetition_matches_counter_reference(texts):
    out = tp.repetition_batch(_mk(texts)).to_pandas()
    for i, t in enumerate(texts):
        words = WORD_RE.findall((t or "").lower())
        c = Counter(words)
        assert out["n_words"][i] == len(words)
        assert out["n_distinct"][i] == len(c)
        mx = max(c.values()) if c else 0
        want_top = int(np.floor((mx / len(words) if words else 0.0) * 1e6 + 0.5))
        assert out["top_ratio_micros"][i] == want_top
        assert bool(out["repetitive"][i]) == (
            (mx / len(words) if words else 0.0) > tp.REP_TOP_TAU
        )


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_trigram_strings_match_scalar_reference(texts):
    d, tri = tp._batch_trigram_strings(texts)
    got = sorted(zip(d.tolist(), tri.to_pylist()))
    want = []
    for i, t in enumerate(texts):
        w = WORD_RE.findall((t or "").lower())
        want.extend(
            (i, g) for g in sorted({" ".join(w[j : j + 3]) for j in range(len(w) - 2)})
        )
    assert got == sorted(want)


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_redact_matches_re_reference(texts):
    b = pa.table(
        {
            "event_id": pa.array(range(len(texts)), type=pa.int64()),
            "props": pa.array(texts, type=pa.string()),
        }
    )
    out = tp.redact_batch(b).to_pandas()
    for i, t in enumerate(texts):
        if t is None:
            assert out["props_redacted"][i] is None or out["props_redacted"].isna()[i]
            assert out["n_redacted"][i] == 0
            continue
        cur, n = t, 0
        for pat, rep in tp.PII_RULES:
            n += len(re.findall(pat, cur))
            cur = re.sub(pat, rep, cur)
        assert out["props_redacted"][i] == cur
        assert out["n_redacted"][i] == n


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), min_size=1, max_size=2000
    ),
    st.integers(min_value=2, max_value=7),
)
def test_quantile_sketch_rank_bound_property(values, n_parts):
    from oboyu_ray.stages.quantiles import QuantileSketch, _disc_rank

    data = np.asarray(values, dtype=np.float64)
    parts = np.array_split(data, n_parts)
    sk = QuantileSketch(capacity=64)
    for bl in sorted(QuantileSketch(capacity=64).add(p).to_bytes() for p in parts):
        sk.merge(QuantileSketch.from_bytes(bl))
    assert sk.n == len(data)
    srt = np.sort(data)
    n = len(srt)
    # compaction depth for capacity 64 at n<=2000 keeps rank error modest;
    # assert a conservative 10% bound plus exactness when nothing compacted
    for q in (0.0, 0.5, 1.0):
        est = sk.quantile(q)
        lo = np.searchsorted(srt, est, side="left")
        hi = np.searchsorted(srt, est, side="right")
        target = _disc_rank(q, n) + 1
        err = 0 if lo < target <= hi else min(abs(target - lo - 1), abs(target - hi))
        if n <= 64 * n_parts and sum(len(p) <= 64 for p in parts) == n_parts and n <= 64:
            assert err == 0  # no compaction ever fired → exact
        else:
            assert err <= max(0.1 * n, 1.0), (q, est, target, lo, hi)


# ------------------------------------------------------ flat-JSON extraction

# scalar JSON values whose serialized form round-trips the fast path: no
# escape-needing characters in strings (documented kernel limit)
_JSON_SCALARS = st.one_of(
    st.integers(min_value=-10**12, max_value=10**12),
    st.booleans(),
    st.none(),
    st.text(
        alphabet=st.characters(
            blacklist_characters='"\\', blacklist_categories=("Cs", "Cc")
        ),
        max_size=15,
    ),
)


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(["k", "j", "x-y"]), _JSON_SCALARS, max_size=3
            ),
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_json_field_matches_json_loads_reference(objs):
    import json

    rows = [None if o is None else json.dumps(o, ensure_ascii=False) for o in objs]
    got = tp.json_field(pa.array(rows, pa.string()), "k").to_pylist()
    for o, g in zip(objs, got):
        if o is None or "k" not in o or o["k"] is None:
            assert g is None
        elif isinstance(o["k"], bool):
            assert g == ("true" if o["k"] else "false")
        elif isinstance(o["k"], int):
            assert g == str(o["k"])
        else:
            assert g == o["k"]


def test_json_field_edge_cases():
    a = pa.array(
        ['{"k": 69}', '{"j": 1}', '{"k": null}', '{"k": ""}', '{"k": "a b"}', None,
         '{"k":-3}', 'not json at all'],
        pa.string(),
    )
    assert tp.json_field(a, "k").to_pylist() == [
        "69", None, None, "", "a b", None, "-3", None,
    ]
    assert tp.json_int_field(pa.array(['{"k": 7}', '{"j": 1}']), "k").to_pylist() == [7, None]
