"""Distributed connected components — near-dup pairs → dedup clusters.

The missing last step of every dedup family: pairwise matches (doc_a,
doc_b) must become CLUSTERS (transitive closure) before "keep one copy per
cluster" can run.  A driver-side union-find is the textbook answer and
exactly the kind of driver-resident state this engine avoids; instead this
is iterative **min-label propagation** expressed purely as bucketed Ray
Data reduces:

    labels  : (node, label) — initialized label = node
    step    : every node sends its current label along its edges; each node
              takes the min of (own label, incoming labels)
    stop    : when a round changes no label (each reduce task counts its
              own changes; a tiny aggregate sums them)

Each round is two bucketed groupbys over (edges + labels) — the same
B-bucket cogroup shape as dedup verification, so group counts stay bounded
and hot nodes amortize inside their bucket.  Plain propagation needs
O(diameter) rounds; every round here is followed by a **pointer-doubling
shortcut** (label[v] ← min(label[v], label[label[v]]), one more bucketed
cogroup keyed by the label), which squares the covered distance per round
— O(log diameter) rounds total, so even pathological chains converge well
inside ``max_iters``.  If the loop still exhausts ``max_iters`` without a
fixpoint it RAISES rather than return unconverged labels (an unconverged
result would silently mis-canonicalize downstream dedup).

Oracled: DuckDB computes the same fixpoint with a recursive CTE
(reachability closure → min reachable id per node), so `dedup_clusters`
is a value-checked driver query, not rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

CC_BUCKETS = 64
CC_MAX_ITERS = 50


def connected_components_ds(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_buckets: int = CC_BUCKETS,
    max_iters: int = CC_MAX_ITERS,
    _stats: dict | None = None,
) -> "ray.data.Dataset":
    """(doc_a, doc_b) edge Dataset → (doc_id, component) Dataset with
    component = min node id of the connected component.  Nodes are the edge
    endpoints (singletons are their own trivial component and need no row).
    The labels never land on the driver — consumers that need a driver
    frame use ``connected_components``; Dataset-native flows (EDC entity
    dedup) cogroup against this result directly."""
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "component": pa.array([], type=pa.int64()),
                }
            )
        )
    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy().astype(np.int64)
        b = t.column(b_col).to_numpy().astype(np.int64)
        if len(a) and (a.min() < 0 or b.min() < 0):
            # negative ids collide with the sentinel encoding below
            raise ValueError("connected_components requires non-negative node ids")
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "other": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    # labels init: every endpoint labels itself (duplicates collapse in the
    # first min-reduce)
    labels = edges.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "label": t.column("node"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def bucket_of(col: np.ndarray) -> np.ndarray:
        return (col.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)

    def add_dbucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "db", pa.array(bucket_of(t.column("dest").to_numpy()), type=pa.int64())
        )

    def shortcut_round(labels):
        """Pointer doubling: label[v] ← min(label[v], label[label[v]]).
        One bucketed cogroup keyed by the label value: each node asks the
        bucket owning its label for that label's own label."""
        ask = labels.map_batches(
            lambda t: pa.table(
                {
                    "dest": t.column("label"),
                    "asker": t.column("node"),
                    "cur": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        lookup = labels.map_batches(
            lambda t: pa.table(
                {
                    "dest": t.column("node"),
                    "asker": pa.array(
                        np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64()
                    ),
                    "cur": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )

        def do_shortcut(g: pd.DataFrame) -> pd.DataFrame:
            is_lookup = g["asker"].to_numpy() < 0
            lab = dict(
                zip(
                    g.loc[is_lookup, "dest"].to_numpy(dtype=np.int64),
                    g.loc[is_lookup, "cur"].to_numpy(dtype=np.int64),
                )
            )
            a = g.loc[~is_lookup]
            dests = a["dest"].to_numpy(dtype=np.int64)
            cur = a["cur"].to_numpy(dtype=np.int64)
            short = np.fromiter(
                (lab.get(d, d) for d in dests), dtype=np.int64, count=len(dests)
            )
            new = np.minimum(cur, short)
            out = pd.DataFrame(
                {"node": a["asker"].to_numpy(dtype=np.int64), "label": new}
            )
            out["changed"] = np.int64(0)
            if len(out):
                out.loc[out.index[0], "changed"] = np.int64(int((new != cur).sum()))
            return out

        res = (
            ask.union(lookup)
            .map_batches(add_dbucket, batch_format="pyarrow")
            .groupby("db")
            .map_groups(do_shortcut, batch_format="pandas")
            .materialize()
        )
        n = int(res.sum("changed") or 0)
        # union doubles the upstream block count every round — without this
        # repartition the label set fragments into 2^iters tiny blocks and
        # per-round task overhead grows exponentially (measured: 21 s/round
        # by round 9 on a 300-node chain).  One bounded repartition per
        # iteration keeps rounds O(1) blocks.
        out = (
            res.drop_columns(["changed"]).repartition(n_buckets).materialize()
        )
        return out, n

    converged = False
    iters = 0
    for _ in range(max_iters):
        iters += 1
        # phase 1 (by sender): attach each node's label to its outgoing
        # edges → messages keyed by the RECEIVER; labels pass through as a
        # message-to-self so the receiver min includes its own label
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "other": pa.array(
                        np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64()
                    ),
                    "label": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = edges.map_batches(
            lambda t: t.append_column(
                "label", pa.array(np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64())
            ),
            batch_format="pyarrow",
        )

        def send(g: pd.DataFrame) -> pd.DataFrame:
            is_lab = g["other"].to_numpy() < 0
            lab = dict(
                zip(
                    g.loc[is_lab, "node"].to_numpy(dtype=np.int64),
                    g.loc[is_lab, "label"].to_numpy(dtype=np.int64),
                )
            )
            e = g.loc[~is_lab]
            senders = e["node"].to_numpy(dtype=np.int64)
            dests = e["other"].to_numpy(dtype=np.int64)
            sent = np.fromiter((lab[s] for s in senders), dtype=np.int64, count=len(senders))
            own_nodes = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
            own_labels = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
            return pd.DataFrame(
                {
                    "dest": np.concatenate([dests, own_nodes]),
                    # own label rides along marked (old) so the receiver can
                    # count changes
                    "msg": np.concatenate([sent, own_labels]),
                    "is_old": np.concatenate(
                        [np.zeros(len(dests), dtype=np.int64), np.ones(len(lab), dtype=np.int64)]
                    ),
                }
            )

        def add_nbucket(t: pa.Table) -> pa.Table:
            return t.append_column(
                "nb", pa.array(bucket_of(t.column("node").to_numpy()), type=pa.int64())
            )

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("dest", sort=False)["msg"].min()
            # every dest has an own-label pass-through row (labels were
            # initialized from ALL edge endpoints), so old is total
            old = g[g["is_old"] == 1].groupby("dest", sort=False)["msg"].min()
            changed = int((new != old.reindex(new.index)).sum())
            out = new.reset_index().rename(columns={"dest": "node", "msg": "label"})
            out["changed"] = np.int64(0)
            if len(out):
                out.loc[out.index[0], "changed"] = np.int64(changed)
            return out

        new_labels = (
            lab_rows.union(edge_rows)
            .map_batches(add_nbucket, batch_format="pyarrow")
            .groupby("nb")
            .map_groups(send, batch_format="pandas")
            .map_batches(add_dbucket, batch_format="pyarrow")
            .groupby("db")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        n_prop = int(new_labels.sum("changed") or 0)
        labels = new_labels.drop_columns(["changed"]).materialize()
        if n_prop == 0:
            converged = True
            break
        # pointer-doubling shortcut — squares the propagated distance, so
        # total rounds are O(log diameter) instead of O(diameter)
        labels, _ = shortcut_round(labels)

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters}; "
            "labels would be wrong — raise max_iters (round count is "
            "O(log diameter) with pointer doubling, so this indicates a "
            "pathological input or a bug)"
        )
    if _stats is not None:
        _stats["iters"] = iters

    return labels.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("node").cast(pa.int64()),
                "component": t.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_buckets: int = CC_BUCKETS,
    max_iters: int = CC_MAX_ITERS,
    _stats: dict | None = None,
) -> pd.DataFrame:
    """Driver-frame wrapper over ``connected_components_ds`` (labels are
    |nodes-with-edges|-sized — small relative to the corpus for near-dup
    graphs, so a driver frame is the convenient query-result shape)."""
    out = connected_components_ds(
        pairs, a_col, b_col, n_buckets, max_iters, _stats
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "component": pd.Series(dtype=np.int64)}
        )
    out = out.drop_duplicates("doc_id").sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": np.int64, "component": np.int64})


def dedup_clusters(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> pd.DataFrame:
    """Pairs → (doc_id, component, is_canonical): canonical = the min doc_id
    of each cluster (the keep-one-per-cluster rule of exact_dedup, applied
    transitively)."""
    cc = connected_components(pairs, a_col, b_col)
    cc["is_canonical"] = (cc["doc_id"] == cc["component"]).astype(np.int64)
    return cc


# ------------------------------------------------------------------ PageRank

PR_SCALE = 1_000_000_000_000  # rank mass carried as int64 * 1e12
PR_DAMP_NUM = 85              # damping d = 0.85 as the exact rational 85/100
PR_ITERS = 3


def pagerank(
    pairs: "ray.data.Dataset",
    a_col: str = "src",
    b_col: str = "dst",
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    n_buckets: int = CC_BUCKETS,
) -> "ray.data.Dataset":
    """Integer-exact PageRank over the UNDIRECTED graph of ``pairs``.

    The iterative-algorithm template on Ray Data: per round, one bucketed
    hash join (ranks onto the degree-annotated edge list) plus one groupby
    sum — rank state never lands on the driver.  All arithmetic is int64
    with floor division (``r // deg``, ``(85 * s) // 100``), so the result
    is bit-identical regardless of summation order and block boundaries —
    the property that lets a DuckDB chained-CTE oracle value-check a
    floating-point-free power iteration.  Fixed ``iters`` rounds (PageRank
    is contraction-convergent; a fixed small round count is the standard
    web-scale practice, and each extra round costs exactly two shuffles of
    |edges| / |nodes| rows).

    Input edges are directed rows; the graph is symmetrized and
    deduplicated here (UNION-distinct semantics), so every node has
    out-degree >= 1 and dangling-mass redistribution never arises.
    """
    from oboyu_ray.stages.relational import hash_join

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(a_col)
        b = t.column(b_col)
        both = pa.concat_tables(
            [pa.table({"src": a, "dst": b}), pa.table({"src": b, "dst": a})]
        ).combine_chunks()
        # map-side pre-distinct (empty aggregate = distinct rows) shrinks
        # what the UNION-distinct shuffle moves
        return both.group_by(["src", "dst"]).aggregate([])

    edges = (
        pairs.map_batches(sym, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    # size downstream parallelism to the GRAPH, not the corpus: the edge
    # list is usually orders of magnitude smaller than the input that
    # produced it, but the distinct shuffle hands back one block per reduce
    # task — and every later round is an all-to-all whose task count scales
    # with block count, so a 90-edge graph inheriting 64 corpus blocks pays
    # ~100 scheduler round-trips per round for nothing
    n_edges = edges.count()
    nparts = int(max(1, min(n_buckets, n_edges // 200_000 + 1)))
    if edges.num_blocks() > nparts * 2:
        edges = edges.repartition(nparts).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("src").aggregate([("dst", "count")])
        return pa.table(
            {
                "node": g.column("src"),
                "n": g.column("dst_count").cast(pa.int64()),
            }
        )

    def deg_finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t.column("node"), "d": t.column("sum(n)").cast(pa.int64())}
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .sum("n")
        .map_batches(deg_finish, batch_format="pyarrow")
        .materialize()
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "r": pa.array([], pa.int64())})
        )
    base = (15 * scale) // (100 * n_nodes)

    # degree annotated onto each edge ONCE — every iteration then needs only
    # (node -> r), never a second degree join
    edges_deg = hash_join(edges, deg, "src", "node", n_buckets).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "r": pa.array(
                    np.full(t.num_rows, scale // n_nodes, dtype=np.int64)
                ),
            }
        )

    # ranks stays LAZY through the rounds: each intermediate is consumed
    # exactly once, so the whole iteration chain executes as ONE streaming
    # plan when the caller consumes the result (materializing per round
    # just adds driver round-trips; only the multiply-consumed edges/deg/
    # edges_deg tables above are pinned)
    ranks = deg.map_batches(init_ranks, batch_format="pyarrow")

    left_schema = pa.schema(
        [("dst", pa.string()), ("esrc", pa.string()), ("d", pa.int64())]
    )
    ranks_schema = pa.schema([("node", pa.string()), ("r", pa.int64())])

    for _ in range(iters):
        joined = hash_join(
            edges_deg.map_batches(
                lambda df: df[["dst", "src", "d"]].rename(columns={"src": "esrc"}),
                batch_format="pandas",
            ),
            ranks,
            "esrc",
            "node",
            n_buckets,
            left_schema=left_schema,
            right_schema=ranks_schema,
        )

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            c = df["r"].to_numpy(dtype=np.int64) // df["d"].to_numpy(dtype=np.int64)
            out = pd.DataFrame({"dst": df["dst"], "c": c})
            return out.groupby("dst", as_index=False, sort=False).sum()

        def next_rank(t: pa.Table) -> pa.Table:
            s = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": t.column("dst"),
                    "r": pa.array(base + (PR_DAMP_NUM * s) // 100),
                }
            )

        ranks = (
            joined.map_batches(contrib, batch_format="pandas")
            .groupby("dst")
            .sum("c")
            .map_batches(next_rank, batch_format="pyarrow")
        )

    return ranks
