"""Similarity search over an embedding column (list<float>).

* brute_force_cosine_topk — EXACT top-k per query: the (small) query matrix
  is ray.put ONCE; every map task computes one float64 matmul block and
  emits only its local top-k candidates; the driver merges k·#blocks rows.
  SQL-oracled (DuckDB list_cosine_similarity + row_number).
* lsh_cosine_topk — random-hyperplane LSH variant: vectors are bucketed by
  sign bits (a map_batches + groupby-free bucket assignment); each query
  probes only buckets within ``probe_hamming`` of its own signature.
  Approximate (recall < 1) — the scale path when a full scan is off the
  table; rows-only driver check, recall asserted against brute force in
  tests.

Tie-breaking is (score_micros DESC, vec_id ASC) on both the Ray and SQL
sides, with scores fixed-pointed to micros BEFORE ranking so float summation
order cannot flip ranks across engines.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from oboyu_ray.fixedpoint import micros
from oboyu_ray.functions.arrowvec import matrix_to_fixed_list, vec_matrix

DEFAULT_QUERY_IDS = (0, 1, 2, 3, 4)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def load_query_matrix(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch the query vectors by id.

    With ``source_path`` (the parquet file/dir the dataset was read from —
    the caller's assertion that ``ds`` is an untransformed read of it) the
    fetch is a row-group-pushdown ``pq.read_table(filters=...)``: only row
    groups whose min/max stats cover a query id leave storage.  Without it,
    a vectorized ``pc.is_in`` scan inside ``map_batches`` — still a full
    pass, but Arrow-kernel speed, never the per-row Python filter path.
    """
    qlist = sorted({int(q) for q in query_ids})
    if source_path is not None:
        t = pq.read_table(
            source_path, columns=[id_col, vec_col], filters=[(id_col, "in", qlist)]
        )
    else:
        value_set = pa.array(qlist, type=pa.int64())

        def pick(b: pa.Table) -> pa.Table:
            mask = pc.is_in(b.column(id_col).cast(pa.int64()), value_set=value_set)
            return b.select([id_col, vec_col]).filter(mask)

        refs = ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        t = pa.concat_tables(ray.get(refs))
    order = pc.sort_indices(t.column(id_col))
    t = t.take(order)
    ids = t.column(id_col).to_numpy().astype(np.int64)
    M = vec_matrix(t.column(vec_col))
    return ids, M


def brute_force_cosine_topk(
    ds: "ray.data.Dataset",
    k: int = 10,
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> pd.DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, vec_id, cos_micros, rank) with rank 1..k by
    (cos_micros DESC, vec_id ASC); self-matches included (rank 1, ~1.0).
    """
    qids, Q = load_query_matrix(ds, query_ids, id_col, vec_col, source_path)
    Qn = _normalize_rows(Q)
    ref = ray.put((qids, Qn))

    def block_topk(batch: pa.Table) -> pa.Table:
        q_ids, qn = ray.get(ref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        S = qn @ bm.T  # (num_q, batch)
        su = micros(S)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[int] = []
        kk = min(k, S.shape[1])
        for qi in range(S.shape[0]):
            # local top-k candidates by (score desc, id asc)
            order = np.lexsort((bids, -su[qi]))[:kk]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(bids[order].tolist())
            out_s.extend(su[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_micros": pa.array(out_s, type=pa.int64()),
            }
        )

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return _rank_and_cut(cand, k)


def _rank_and_cut(cand: pd.DataFrame, k: int) -> pd.DataFrame:
    if cand.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                "vec_id": pd.Series(dtype=np.int64),
                "cos_micros": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
            }
        )
    cand = cand.sort_values(
        ["query_id", "cos_micros", "vec_id"], ascending=[True, False, True]
    )
    cand["rank"] = cand.groupby("query_id").cumcount() + 1
    out = cand[cand["rank"] <= k].reset_index(drop=True)
    return out.astype(
        {"query_id": np.int64, "vec_id": np.int64, "cos_micros": np.int64, "rank": np.int64}
    )


# ---------------------------------------------------------------- IVF variant

IVF_CELLS = 16
IVF_ITERS = 3
IVF_NPROBE = 4


def ivf_train(
    ds: "ray.data.Dataset",
    n_cells: int = IVF_CELLS,
    iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed k-means (Lloyd) over normalized vectors —
    the IVF coarse quantizer.  Each iteration: broadcast centroids, one
    map_batches pass emits per-batch partial (sum, count) per cell, driver
    combines.  Initialization = the first ``n_cells`` rows in input order,
    sorted by id (seedless, reproducible, and id-agnostic — callers may
    key vectors by arbitrary int64 ids, e.g. hashed entity ids)."""
    # drop the zero-row zero-column blocks Ray aggregates can emit — they
    # carry an empty schema that breaks concat
    init = pa.concat_tables(
        t for t in ray.get(ds.limit(n_cells).to_arrow_refs()) if t.num_columns
    )
    init = init.take(pc.sort_indices(init.column(id_col)))
    C = _normalize_rows(vec_matrix(init.column(vec_col)))

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            cen = ray.get(ref)
            bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
            cell = np.argmax(bm @ cen.T, axis=1)
            sums = np.zeros_like(cen)
            np.add.at(sums, cell, bm)
            counts = np.bincount(cell, minlength=len(cen)).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(np.arange(len(cen)), type=pa.int64()),
                    "sum": matrix_to_fixed_list(sums),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        for cell, sm, ct in parts.itertuples(index=False):
            sums[int(cell)] += np.asarray(sm)
            counts[int(cell)] += int(ct)
        nonzero = counts > 0
        C[nonzero] = _normalize_rows(sums[nonzero] / counts[nonzero, None])
    return C


def ivf_cosine_topk(
    ds: "ray.data.Dataset",
    k: int = 10,
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> pd.DataFrame:
    """IVF approximate top-k: vectors are assigned to their nearest centroid
    cell; a query scores only vectors in its ``n_probe`` closest cells —
    the n_probe/n_cells fraction of the corpus instead of all of it.  At
    scale the cell id becomes the parquet partition key so probes read only
    matching files.  Same output schema as brute force; recall pinned in
    tests."""
    C = ivf_train(ds, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    qids, Q = load_query_matrix(ds, query_ids, id_col, vec_col, source_path)
    Qn = _normalize_rows(Q)
    qcells = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, Qn, C, qcells))

    def block_topk(batch: pa.Table) -> pa.Table:
        q_ids, qn, cen, q_cells = ray.get(ref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        cell = np.argmax(bm @ cen.T, axis=1)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[int] = []
        for qi in range(qn.shape[0]):
            sel = np.flatnonzero(np.isin(cell, q_cells[qi]))
            if len(sel) == 0:
                continue
            S = qn[qi] @ bm[sel].T
            su = micros(S)
            order = np.lexsort((bids[sel], -su))[: min(k, len(sel))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(bids[sel][order].tolist())
            out_s.extend(su[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_micros": pa.array(out_s, type=pa.int64()),
            }
        )

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return _rank_and_cut(cand, k)


# ---------------------------------------------------------------- LSH variant

LSH_BITS = 8


def _hyperplanes(dim: int, bits: int = LSH_BITS, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_cosine_topk(
    ds: "ray.data.Dataset",
    k: int = 10,
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    probe_hamming: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> pd.DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures; a map task
    scores a vector only if its signature is within ``probe_hamming`` bits
    of the query's (multi-probe LSH).  Same output schema as brute force;
    recall measured in tests.  At scale the signature becomes the partition
    key of a bucketed parquet layout so probes touch only matching files."""
    qids, Q = load_query_matrix(ds, query_ids, id_col, vec_col, source_path)
    Qn = _normalize_rows(Q)
    dim = Qn.shape[1]
    planes = _hyperplanes(dim)
    qsig = _signatures(Qn, planes)
    ref = ray.put((qids, Qn, qsig, planes))

    def block_topk(batch: pa.Table) -> pa.Table:
        q_ids, qn, q_sig, pl = ray.get(ref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        bsig = _signatures(bm, pl)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[int] = []
        from oboyu_ray.stages.dedup import _popcount64

        for qi in range(qn.shape[0]):
            ham = _popcount64((bsig ^ q_sig[qi]).astype(np.uint64))
            sel = np.flatnonzero(ham <= probe_hamming)
            if len(sel) == 0:
                continue
            S = qn[qi] @ bm[sel].T
            su = micros(S)
            order = np.lexsort((bids[sel], -su))[: min(k, len(sel))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(bids[sel][order].tolist())
            out_s.extend(su[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_micros": pa.array(out_s, type=pa.int64()),
            }
        )

    cand = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return _rank_and_cut(cand, k)


# ---------------------------------------------------------------- kNN classify

KNN_K = 10


def knn_classify(
    ds: "ray.data.Dataset",
    k: int = KNN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    ref: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
) -> "ray.data.Dataset":
    """kNN label classification (auto-labeling): each vector gets the
    majority label of its ``k`` nearest reference vectors by cosine
    (self-matches excluded), ties broken (count DESC, label ASC); neighbor
    selection ties break (cos_micros DESC, ref id ASC).

    The labeled REFERENCE set is the broadcast small side (``ray.put``
    once, read per task — auto-labeling streams through a bounded labeled
    set; here the embeddings table classifies itself).  Beyond
    memory-sized references, route through the persisted IVF index
    (state/vector_index.py) instead — this operator is the broadcast-exact
    tier.  Output: (vec_id, predicted_label, n_votes), SQL-oracled.
    """
    from oboyu_ray.stages.relational import _topk_mask

    if ref is None:
        t = pa.concat_tables(
            b for b in ray.get(
                ds.select_columns([id_col, vec_col, label_col]).to_arrow_refs()
            )
            if b.num_columns
        )
        rid = t.column(id_col).to_numpy().astype(np.int64)
        rmat = _normalize_rows(vec_matrix(t.column(vec_col)))
        rlab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        rid, rmat, rlab = ref
    # factorize labels once: sorted uniques make "label ASC" the same as
    # "code ASC", and votes index a dense (n, n_labels) matrix regardless
    # of the label values themselves
    ulab, lcode = np.unique(rlab, return_inverse=True)
    rref = ray.put((rid, rmat, ulab, lcode.astype(np.int64)))

    def classify(batch: pa.Table) -> pa.Table:
        r_id, r_mat, u_lab, l_code = ray.get(rref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        n, m = len(bids), len(r_id)
        S = micros(bm @ r_mat.T)  # (n, m)
        # exclude self-matches by id.  Sentinel is min+1, NOT int64 min:
        # _topk_mask ranks by np.lexsort on -val, and -int64.min silently
        # overflows back to int64.min — which would rank the excluded entry
        # FIRST instead of last
        S[bids[:, None] == r_id[None, :]] = np.iinfo(np.int64).min + 1
        # deterministic per-row top-k: reuse the grouped top-k mask with
        # grp = row index (ties → smaller ref id)
        grp = np.repeat(np.arange(n, dtype=np.int64), m)
        key = np.tile(r_id, n)
        mask = _topk_mask(grp, key, S.ravel(), k).reshape(n, m)
        # majority vote over label codes; winner by (count DESC, label ASC)
        L = len(u_lab)
        counts = np.zeros((n, L), dtype=np.int64)
        rows, cols = np.nonzero(mask)
        np.add.at(counts, (rows, l_code[cols]), 1)
        score = counts * np.int64(L + 1) + (np.int64(L) - np.arange(L, dtype=np.int64))
        score[counts == 0] = np.iinfo(np.int64).min
        win = np.argmax(score, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(bids, type=pa.int64()),
                "predicted_label": pa.array(u_lab[win].astype(np.int64), type=pa.int64()),
                "n_votes": pa.array(
                    counts[np.arange(n), win].astype(np.int64), type=pa.int64()
                ),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        classify, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- MMR

MMR_LAMBDA_MICROS = 700_000  # λ = 0.7: relevance weight vs diversity
MMR_POOL = 50


def mmr_topk(
    ds: "ray.data.Dataset",
    k: int = 10,
    query_ids: Sequence[int] = DEFAULT_QUERY_IDS,
    pool: int = MMR_POOL,
    lambda_micros: int = MMR_LAMBDA_MICROS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: Optional[str] = None,
) -> pd.DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    1998, public method): the EXACT top-``pool`` candidates come from the
    distributed brute-force scan; the greedy selection — k steps over a
    pool × pool similarity matrix — is inherently sequential and runs on
    the driver over the BOUNDED pool (k- and pool-sized work, never
    corpus-sized; candidate vectors arrive via one pushdown point-read).

    Score: mmr = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), all in integer
    micros (λ = ``lambda_micros``/1e6); first pick is pure relevance; ties
    break (score DESC, vec_id ASC).  Output (query_id, vec_id, mmr_micros,
    rank) — rows-only driver check (greedy selection is not SQL-
    expressible); pinned against a scalar reference in pytest.
    """
    cand = brute_force_cosine_topk(
        ds, k=pool, query_ids=query_ids, id_col=id_col, vec_col=vec_col,
        source_path=source_path,
    )
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

    lam = np.int64(lambda_micros)
    one_minus = np.int64(1_000_000 - lambda_micros)
    rows = []
    for q in sorted(cand["query_id"].unique()):
        sub = cand[cand["query_id"] == q]
        ids_q = sub["vec_id"].to_numpy(dtype=np.int64)
        rel = sub["cos_micros"].to_numpy(dtype=np.int64)
        idx = np.fromiter((pos[int(v)] for v in ids_q), dtype=np.int64,
                          count=len(ids_q))
        # pairwise candidate similarity, fixed-pointed once
        S = micros(rmat[idx] @ rmat[idx].T)
        n = len(ids_q)
        picked: List[int] = []
        maxsim = np.zeros(n, dtype=np.int64)
        avail = np.ones(n, dtype=bool)
        for step in range(min(k, n)):
            score = lam * rel - (one_minus * maxsim if picked else 0)
            # rank only the AVAILABLE candidates — a -int64.min sentinel
            # would overflow under lexsort's negation and rank FIRST
            pool = np.flatnonzero(avail)
            best = pool[np.lexsort((ids_q[pool], -score[pool]))[0]]
            picked.append(best)
            avail[best] = False
            maxsim = np.maximum(maxsim, S[best])
            rows.append(
                (int(q), int(ids_q[best]), int(score[best] // 1_000_000),
                 step + 1)
            )
    return pd.DataFrame(
        rows, columns=["query_id", "vec_id", "mmr_micros", "rank"]
    ).astype(np.int64)


def kmeans_cluster_summary(
    ds: "ray.data.Dataset",
    k: int = IVF_CELLS,
    iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """First-class embedding clustering: deterministic distributed k-means
    (``ivf_train`` — broadcast centroids, per-batch partial (sum, count)
    reduces per iteration) followed by one assignment pass that reports a
    per-cluster summary: member count and mean cosine-to-centroid
    (cohesion), both as map-side partials so the final groupby moves at
    most #batches × k rows.

    Iterative + float — not SQL-expressible; determinism and agreement
    with a single-process scalar reference are pinned in pytest."""
    from oboyu_ray.fixedpoint import micros as _micros

    C = ivf_train(ds, n_cells=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(C)

    def partial(batch: pa.Table) -> pa.Table:
        cen = ray.get(ref)
        bm = _normalize_rows(vec_matrix(batch.column(vec_col)))
        sims = bm @ cen.T
        cell = np.argmax(sims, axis=1)
        cos_micros = _micros(sims[np.arange(len(cell)), cell]).astype(np.int64)
        counts = np.bincount(cell, minlength=len(cen)).astype(np.int64)
        sums = np.bincount(cell, weights=cos_micros, minlength=len(cen)).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cluster": pa.array(nz, type=pa.int64()),
                "n": pa.array(counts[nz], type=pa.int64()),
                "cos_sum": pa.array(sums[nz], type=pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("sum(cos_sum)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cluster": b.column("cluster"),
                "n_vecs": pa.array(n, type=pa.int64()),
                "mean_cos_micros": pa.array(s // np.maximum(n, 1), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .sum(["n", "cos_sum"])
        .map_batches(finish, batch_format="pyarrow")
    )
