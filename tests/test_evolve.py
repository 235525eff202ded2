"""Schema-drift-tolerant reading: mixed shard generations unify to one
explicit schema (cast / null-fill / drop), lossy casts raise."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oboyu_ray.sources.evolve import coerce_table, read_parquet_evolved

TARGET = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("text", pa.string()),
        ("tool", pa.string()),
    ]
)


@pytest.fixture(scope="module")
def generations(tmp_path_factory):
    base = tmp_path_factory.mktemp("gens")
    # gen0: missing 'tool', turn_idx as int64 (needs narrowing cast)
    g0 = pa.table(
        {
            "conv_id": pa.array(["a", "a"], type=pa.string()),
            "turn_idx": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["t0", "t1"]),
        }
    )
    # gen1: canonical + an extra debug column (must be dropped)
    g1 = pa.table(
        {
            "conv_id": pa.array(["b"], type=pa.string()),
            "turn_idx": pa.array([0], type=pa.int32()),
            "text": pa.array(["u0"]),
            "tool": pa.array(["bash"]),
            "debug_latency_ms": pa.array([12.5]),
        }
    )
    p0, p1 = str(base / "gen0.parquet"), str(base / "gen1.parquet")
    pq.write_table(g0, p0)
    pq.write_table(g1, p1)
    return [p0, p1]


def test_unifies_generations(generations):
    ds = read_parquet_evolved(generations, TARGET)
    t = pa.concat_tables(
        [pa.Table.from_pandas(b.to_pandas(), schema=TARGET) for b in
         ds.iter_batches(batch_format="pyarrow")]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert t.schema.equals(TARGET)
    assert t.column("conv_id").to_pylist() == ["a", "a", "b"]
    assert t.column("turn_idx").to_pylist() == [0, 1, 0]
    assert t.column("tool").to_pylist() == [None, None, "bash"]
    assert "debug_latency_ms" not in t.column_names


def test_lossy_cast_raises():
    big = pa.table({"turn_idx": pa.array([2**40], type=pa.int64()),
                    "conv_id": pa.array(["x"]), "text": pa.array(["y"])})
    with pytest.raises(pa.ArrowInvalid):
        coerce_table(big, TARGET)


def test_coerce_preserves_row_order():
    t = pa.table(
        {
            "text": pa.array([f"r{i}" for i in range(100)]),
            "conv_id": pa.array(["c"] * 100),
            "turn_idx": pa.array(np.arange(100), type=pa.int64()),
        }
    )
    out = coerce_table(t, TARGET)
    assert out.column("turn_idx").to_pylist() == list(range(100))
    assert out.column("text").to_pylist() == [f"r{i}" for i in range(100)]
