"""End-to-end training-corpus build — the data-pipeline counterpart of the
search-index build (`pipelines/build_index.py`): one driver call takes a raw
documents table to packed, sharded, training-ready parquet.

Stages (every one an already-oracled operator; this module only composes):

1. **hygiene** — ``clean_corpus``: quality + repetition + benchmark-
   decontamination gates in ONE text pass, then exact-dup
   canonicalization (the only shuffle sees the thinned corpus).
2. **near-dup thinning** — ngram-Jaccard pairs → distributed connected
   components → keep the best-quality representative per cluster
   (``topk_per_group`` argmax), drop the other members via an anti join.
3. **packing** — ``pack_sequences``: token-budget bin assignment by
   distributed prefix scan (bins are budget-sized, no doc split).
4. **export** — ``export_shards``: md5-keyed deterministic shards with
   per-shard commit markers; a re-run resumes from the last committed
   shard.

Returns a per-stage manifest the caller can gate on.  Driver-visible as
the ``corpus_build_summary`` query (rows-only: side-effecting composition);
determinism and export-resume pinned in pytest.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from oboyu_ray.sources.sinks import export_shards
from oboyu_ray.stages import trainprep
from oboyu_ray.stages.components import dedup_clusters
from oboyu_ray.stages.dedup import ngram_jaccard_pairs
from oboyu_ray.stages.relational import hash_join, topk_per_group
from oboyu_ray.stages.textstats import quality_batch

NEARDUP_TAU = 0.5


def build_corpus(
    docs: "ray.data.Dataset",
    out_dir: str,
    pack_budget: int = trainprep.PACK_BUDGET,
    n_shards: int = 64,
    neardup_tau: float = NEARDUP_TAU,
) -> Dict:
    """docs (doc_id, text) → cleaned, near-dup-thinned, packed, sharded
    parquet under ``out_dir``; returns the per-stage manifest."""
    n_input = docs.count()

    # 1. hygiene gates + exact dedup; clean_corpus emits (doc_id, n_dups) —
    # recover the surviving texts with a semi join (left columns only, so
    # just the id travels on the right side)
    bench = trainprep.benchmark_shingle_set(docs)
    kept_ids = trainprep.clean_corpus(docs, ray.put(bench)).map_batches(
        lambda t: pa.table({"kdoc": t.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    kept = hash_join(
        docs.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        kept_ids,
        "doc_id",
        "kdoc",
        how="semi",
    ).materialize()
    n_clean = kept.count()

    # 2. near-dup clusters over the CLEANED corpus; keep the best-quality
    # representative of each cluster (ties → smallest doc_id)
    pairs = ngram_jaccard_pairs(kept, tau=neardup_tau)
    drop_ids = np.array([], dtype=np.int64)
    if len(pairs):
        cc = dedup_clusters(
            ray.data.from_pandas(pairs[["doc_a", "doc_b"]].astype(np.int64))
        )
        members = ray.data.from_pandas(cc[["doc_id", "component"]].astype(np.int64))
        qual = kept.map_batches(
            lambda t: pa.table(
                {
                    "qdoc": t.column("doc_id").cast(pa.int64()),
                    "quality_micros": quality_batch(t)
                    .column("quality_micros")
                    .cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(members, qual, "doc_id", "qdoc")
        reps = topk_per_group(joined, "component", "doc_id", "quality_micros", k=1)
        rep_ids = set(int(v) for v in reps.to_pandas()["key"])
        drop_ids = np.array(
            sorted(set(cc["doc_id"].astype(int)) - rep_ids), dtype=np.int64
        )
    if len(drop_ids):
        drop_set = pa.array(drop_ids, type=pa.int64())

        def keep_reps(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.invert(
                    pc.is_in(t.column("doc_id").cast(pa.int64()), value_set=drop_set)
                )
            )

        survivors = kept.map_batches(keep_reps, batch_format="pyarrow").materialize()
    else:
        survivors = kept
    n_thinned = survivors.count()

    # 3. token-budget packing over the survivors
    packed = trainprep.pack_sequences(survivors, budget=pack_budget).map_batches(
        lambda t: pa.table(
            {
                "pdoc": t.column("doc_id").cast(pa.int64()),
                "n_words": t.column("n_words").cast(pa.int64()),
                "bin": t.column("bin").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    n_bins = int(packed.max("bin")) + 1 if n_thinned else 0
    final = hash_join(
        survivors.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        packed,
        "doc_id",
        "pdoc",
    ).drop_columns(["pdoc"])

    # 4. resumable sharded export
    export_manifest = export_shards(final, out_dir, key_col="doc_id", n_shards=n_shards)

    return {
        "n_input": int(n_input),
        "n_clean": int(n_clean),
        "n_neardup_dropped": int(len(drop_ids)),
        "n_exported": int(export_manifest["n_rows"]),
        "n_bins": int(n_bins),
        "n_shards": int(n_shards),
        "rewritten_shards": export_manifest["rewritten_shards"],
        "out_dir": os.path.abspath(out_dir),
    }


def corpus_build_summary(sf_dir: str, out_dir: str = None) -> pd.DataFrame:
    """Driver-contract wrapper: run the full corpus build into a
    signature-keyed /tmp dir and return the per-stage counts as rows."""
    st = os.stat(f"{sf_dir}/documents.parquet")
    out = out_dir or (
        f"/tmp/oboyu_corpus/{os.path.basename(sf_dir.rstrip('/'))}"
        f"-{st.st_size}-{st.st_mtime_ns}"
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    man = build_corpus(docs, out)
    rows = [
        ("input", man["n_input"]),
        ("after_clean", man["n_clean"]),
        ("neardup_dropped", man["n_neardup_dropped"]),
        ("exported", man["n_exported"]),
        ("bins", man["n_bins"]),
    ]
    return pd.DataFrame(rows, columns=["stage", "n_rows"]).astype({"n_rows": np.int64})
