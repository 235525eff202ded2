"""Zipf-realistic synthetic corpus (VERDICT r3 #7): a second bench corpus
with ~10^5 content words so latency numbers generalize beyond the
adversarially scan-heavy default vocabulary."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from oboyu_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synth_zipf_table,
    write_synth_transcripts,
)


def test_zipf_table_deterministic_and_schema():
    t1 = synth_zipf_table(7, 100, 400)
    t2 = synth_zipf_table(7, 100, 400)
    assert t1.equals(t2)
    assert t1.schema.equals(TRANSCRIPT_SCHEMA)
    convs = set(t1.column("conv_id").to_pylist())
    assert min(convs) == "c00000100" and len(convs) == 300


def test_zipf_distribution_shape():
    t = synth_zipf_table(42, 0, 2000)
    texts = t.column("text").to_pylist()
    # ~1% empty + ~1% whitespace-only (reference dl=0 semantics)
    n = len(texts)
    assert 0.003 < sum(1 for x in texts if x == "") / n < 0.03
    assert 0.003 < sum(1 for x in texts if x == "   ") / n < 0.03
    tf = Counter()
    df = Counter()
    for x in texts:
        words = x.split()
        tf.update(words)
        df.update(set(words))
    # realistic ladder: a stop-like head, a long df=1 tail, wide vocabulary
    assert len(tf) > 20_000, "vocabulary should be ~10^5-scale, not ~10^2"
    head = tf.most_common(1)[0]
    assert head[0] == "t00000" and head[1] / sum(tf.values()) > 0.05
    ranks = sorted(df.values(), reverse=True)
    assert ranks[0] / n > 0.5  # head term appears in most docs
    assert ranks[len(ranks) // 2] == 1  # median term is rare


def test_zipf_writer_resumable(tmp_path):
    paths = write_synth_transcripts(str(tmp_path), 120, seed=3,
                                    convs_per_file=50, vocab="zipf")
    assert len(paths) == 3
    before = [pq.read_table(p) for p in paths]
    # second call regenerates nothing and the bytes are identical
    again = write_synth_transcripts(str(tmp_path), 120, seed=3,
                                    convs_per_file=50, vocab="zipf")
    assert again == paths
    for p, t in zip(paths, before):
        assert pq.read_table(p).equals(t)


def test_unknown_vocab_raises(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_synth_transcripts(str(tmp_path), 10, vocab="nope")
