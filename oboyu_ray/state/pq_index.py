"""Persisted product-quantization (PQ) vector index — the MEMORY-compressed
scale path for similarity search.

The IVF index (`state/vector_index.py`) prunes which vectors a query READS;
PQ compresses what each vector COSTS: every unit-normalized vector is split
into ``m`` subspaces and each subvector replaced by the index of its nearest
codeword in a per-subspace codebook (``ksub`` codewords), so a 64-dim
float64 vector (512 B) becomes ``m`` uint8 codes (8 B) — the asymmetric-
distance-computation (ADC) scan of Jégou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011; public method).  At 100 TB the codes
table is what streams through the object store; the raw vectors are touched
only for the final re-rank of a bounded candidate set via row-group-pushdown
point reads.

Layout under ``index_dir``::

    manifest.json          {m, ksub, dim, n_vectors}
    codebooks.parquet      (subspace, code, centroid fixed_size_list<float64>)
    codes/*.parquet        (vec_id, code fixed_size_list<uint8, m>)

Search: broadcast the per-query ADC lookup tables (m × ksub inner products
— queries vs codewords), one ``map_batches`` pass over the CODES dataset
sums table entries per row (pure numpy take/sum, no vector math) and emits
local top-``rerank`` candidates; the driver merges, fetches the candidates'
raw vectors with a ``filters=`` pushdown read, and re-ranks EXACTLY — so
returned scores are true cosines and only the candidate CHOICE is
approximate.  Recall is pinned in tests; the driver check is rows-only.

Training is deterministic: per-subspace Lloyd k-means on a bounded sample
(first ``train_max`` rows in id order — seedless, reproducible), the same
convention as ``ivf_train``.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from oboyu_ray.fixedpoint import micros
from oboyu_ray.functions.arrowvec import matrix_to_fixed_list, vec_matrix
from oboyu_ray.state.checkpoint import atomic_write_json
from oboyu_ray.stages.simsearch import (
    DEFAULT_QUERY_IDS,
    _normalize_rows,
    _rank_and_cut,
    load_query_matrix,
)

PQ_M = 16
PQ_KSUB = 32
PQ_ITERS = 8
PQ_TRAIN_MAX = 4096


def pq_train(sample: np.ndarray, m: int = PQ_M, ksub: int = PQ_KSUB,
             iters: int = PQ_ITERS) -> np.ndarray:
    """Per-subspace Lloyd k-means over a (bounded, already-normalized)
    training sample → (m, ksub, dim//m) codebooks.  Deterministic: init =
    the first ``ksub`` sample rows per subspace; empty clusters keep their
    previous centroid (same rule as ``ivf_train``)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    if n < ksub:
        raise ValueError(f"pq_train: {n} training rows < ksub {ksub}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        X = np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub])
        C = X[:ksub].copy()
        for _ in range(iters):
            # argmin ||x - c||^2 = argmin (|c|^2 - 2 x·c); ties → lowest code
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            a = np.argmin(d, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=ksub)
            nz = counts > 0
            C[nz] = sums[nz] / counts[nz, None]
        books[j] = C
    return books


def _encode(bm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) → (n, m) uint8 codes: nearest codeword per subspace."""
    n, dim = bm.shape
    m, ksub, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        X = bm[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def build_pq_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train codebooks on a bounded sample, encode the full dataset in one
    ``map_batches`` pass, persist codes + codebooks.  Manifest commits LAST
    (atomic json replace) so a crashed build is invisible."""
    sample_t = pa.concat_tables(
        t for t in ray.get(ds.limit(PQ_TRAIN_MAX).to_arrow_refs()) if t.num_columns
    )
    sample_t = sample_t.take(pc.sort_indices(sample_t.column(id_col)))
    sample = _normalize_rows(vec_matrix(sample_t.column(vec_col)))
    ksub_eff = min(ksub, len(sample))
    books = pq_train(sample, m=m, ksub=ksub_eff)
    bref = ray.put(books)

    codes_dir = os.path.join(index_dir, "codes")
    shutil.rmtree(codes_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    def encode_batch(batch: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        ids = batch.column(id_col).cast(pa.int64())
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        codes = _encode(bm, bk)
        return pa.table(
            {
                "vec_id": ids,
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), type=pa.uint8()), codes.shape[1]
                ),
            }
        )

    encoded = ds.map_batches(encode_batch, batch_format="pyarrow")
    encoded.write_parquet(codes_dir)
    n_vectors = sum(
        pq.read_metadata(os.path.join(codes_dir, f)).num_rows
        for f in sorted(os.listdir(codes_dir))
        if f.endswith(".parquet")
    )

    mm, kk, dsub = books.shape
    book_t = pa.table(
        {
            "subspace": pa.array(np.repeat(np.arange(mm), kk), type=pa.int64()),
            "code": pa.array(np.tile(np.arange(kk), mm), type=pa.int64()),
            "centroid": matrix_to_fixed_list(books.reshape(mm * kk, dsub)),
        }
    )
    pq.write_table(book_t, os.path.join(index_dir, "codebooks.parquet"))
    manifest = {"m": int(mm), "ksub": int(kk), "dim": int(mm * dsub),
                "n_vectors": int(n_vectors)}
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest


def _load_books(index_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(index_dir, "codebooks.parquet"))
    order = np.lexsort(
        (t.column("code").to_numpy(), t.column("subspace").to_numpy())
    )
    t = t.take(pa.array(order))
    m = int(t.column("subspace").to_numpy().max()) + 1
    flat = vec_matrix(t.column("centroid"))
    return flat.reshape(m, len(flat) // m, flat.shape[1])


def pq_persisted_topk(
    ds: "ray.data.Dataset",
    index_dir: str,
    k: int = 10,
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    rerank: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> pd.DataFrame:
    """ADC scan over the (build-if-absent) PQ codes + exact re-rank of the
    top-``rerank`` candidates per query.  Output schema matches brute force:
    (query_id, vec_id, cos_micros, rank) with EXACT cosines — only recall
    (which ids make the candidate set) is approximate."""
    rerank = rerank or 8 * k
    manifest_path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        build_pq_index(ds, index_dir, id_col=id_col, vec_col=vec_col)
    books = _load_books(index_dir)

    qids, Q = load_query_matrix(ds, query_ids, id_col, vec_col, source_path)
    Qn = _normalize_rows(Q)
    m, ksub, dsub = books.shape
    # ADC tables: T[q, j, c] = q_subvec_j · codeword_jc (inner product ≈
    # cosine once both sides are unit vectors)
    T = np.einsum("qjd,jcd->qjc", Qn.reshape(len(Qn), m, dsub), books)
    tref = ray.put((qids, T))

    def adc_topr(batch: pa.Table) -> pa.Table:
        q_ids, tables = ray.get(tref)
        bids = batch.column("vec_id").to_numpy().astype(np.int64)
        codes = (
            vec_matrix(batch.column("code")).astype(np.int64)
        )  # (n, m) small ints
        n = len(bids)
        out_q, out_v, out_s = [], [], []
        rr = min(rerank, n)
        col = np.arange(codes.shape[1])
        for qi in range(tables.shape[0]):
            approx = tables[qi][col[None, :], codes].sum(axis=1)
            su = micros(approx)
            order = np.lexsort((bids, -su))[:rr]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(bids[order].tolist())
            out_s.extend(su[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "approx_micros": pa.array(out_s, type=pa.int64()),
            }
        )

    codes_ds = ray.data.read_parquet(os.path.join(index_dir, "codes"))
    cand = codes_ds.map_batches(adc_topr, batch_format="pyarrow").to_pandas()
    # global top-rerank per query by approx score
    cand = cand.sort_values(
        ["query_id", "approx_micros", "vec_id"], ascending=[True, False, True]
    )
    cand["r"] = cand.groupby("query_id").cumcount()
    cand = cand[cand["r"] < rerank]

    # exact re-rank: pushdown point-read of the candidates' raw vectors
    cand_ids = sorted(set(cand["vec_id"].tolist()))
    if source_path is not None:
        raw = pq.read_table(
            source_path, columns=[id_col, vec_col],
            filters=[(id_col, "in", cand_ids)],
        )
    else:
        vs = pa.array(cand_ids, type=pa.int64())

        def pick(b: pa.Table) -> pa.Table:
            mask = pc.is_in(b.column(id_col).cast(pa.int64()), value_set=vs)
            return b.select([id_col, vec_col]).filter(mask)

        raw = pa.concat_tables(
            ray.get(ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
        )
    rid = raw.column(id_col).to_numpy().astype(np.int64)
    rmat = _normalize_rows(vec_matrix(raw.column(vec_col)))
    pos = {int(v): i for i, v in enumerate(rid)}

    rows = []
    for qi, q in enumerate(qids):
        ids_q = cand.loc[cand["query_id"] == int(q), "vec_id"].to_numpy()
        idx = np.fromiter((pos[int(v)] for v in ids_q), dtype=np.int64,
                          count=len(ids_q))
        exact = micros(Qn[qi] @ rmat[idx].T)
        rows.append(pd.DataFrame({
            "query_id": np.full(len(ids_q), int(q), dtype=np.int64),
            "vec_id": ids_q.astype(np.int64),
            "cos_micros": exact.astype(np.int64),
        }))
    out = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        columns=["query_id", "vec_id", "cos_micros"]
    )
    return _rank_and_cut(out, k)
