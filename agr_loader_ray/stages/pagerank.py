"""Fixed-iteration integer PageRank over an edge Dataset.

All arithmetic is integer (scaled by ``SCALE``, floor division), so
the result is exactly reproducible — a SQL oracle chains the same
per-iteration CTEs and the driver's typed value hash gates an
iterative graph algorithm bit-for-bit.  (Float PageRank is a
nondeterministically-ordered reduction; exactness is why the integer
form exists here.)

Execution shape: the rank/degree STATE lives in bounded driver numpy
arrays (8 B per node) while the EDGES only ever stream — each
iteration is one ``map_batches`` pass emitting per-batch partial
destination sums (bincount over the broadcast contribution vector)
folded by one bounded groupby-sum exchange.  Edges are materialized
once and never shuffled.  This is the right shape while node state
fits a worker (~2^31 nodes = 16 GB); beyond that the documented
fallback is the join-per-round form (same shape as
``closure_path_doubling``'s exchange loop, stages/closure.py).

Reference analogue: the reference's global ontology-graph passes
(closure_etl) are the same "iterate a small state over a big edge
set" class; PageRank is its weighted generalization for corpus/link
analysis at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


SCALE = 1_000_000_000  # initial rank per node (pr is rank · SCALE)
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank_integer(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    dedup: bool = False,
    dedup_parts: int = 32,
) -> pa.Table:
    """Return (node, pr) after ``iterations`` exact integer rounds.

    ``edges`` must already contain BOTH directions for an undirected
    graph (callers union the reverse).  Every node must have outdegree
    ≥ 1 (guaranteed when both directions are present).

    ``dedup=True`` collapses a multigraph to a simple graph in ONE
    src-hash partition exchange whose kernel also emits each edge's
    source degree — fusing the DISTINCT and the degree aggregation
    that would otherwise be two exchanges (exact: all rows of a src
    land in one partition).
    """
    import pandas as pd

    from .partition import int_key_part_col

    if dedup:
        def prep(t: pa.Table) -> pa.Table:
            return int_key_part_col(
                pa.table({src_col: t[src_col], dst_col: t[dst_col]}),
                src_col, dedup_parts)

        def kern(g: pd.DataFrame) -> pd.DataFrame:
            g = g[[src_col, dst_col]].drop_duplicates()
            g["deg"] = g.groupby(src_col, sort=False)[dst_col].transform(
                "size").astype(np.int64)
            return g

        from .exchange import exchange_map_groups

        edges = exchange_map_groups(
            edges.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True),
            "gpart", lambda g: kern(g.to_pandas()), dedup_parts,
            drop_part_col=True)

    edges = edges.materialize()  # streamed 1 + iterations times, never shuffled

    def deg_partial(t: pa.Table) -> pa.Table:
        if "deg" in t.column_names:  # dedup kernel already counted
            return (pa.table({"node": t[src_col], "deg": t["deg"]})
                    .group_by(["node", "deg"]).aggregate([]))
        g = t.group_by(src_col).aggregate([(src_col, "count")])
        return pa.table({"node": g[src_col],
                         "deg": g[f"{src_col}_count"].cast(pa.int64())})

    # per-batch partials are ≤ |nodes| rows; folding them on the driver
    # (one small pull, no shuffle) beats a groupby exchange by its fixed
    # ~2-4 s cost — state is driver-resident by design (module docstring),
    # so the pull is O(batches·nodes), bounded by the same assumption
    deg_df = (edges.map_batches(deg_partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
    if dedup:
        deg_tbl = deg_df.drop_duplicates()  # (node, deg) already final
    else:
        deg_tbl = deg_df.groupby("node", as_index=False)["deg"].sum()
    nodes = deg_tbl["node"].to_numpy().astype(np.int64)
    order = np.argsort(nodes, kind="mergesort")
    nodes = nodes[order]
    deg = deg_tbl["deg"].to_numpy().astype(np.int64)[order]
    pr = np.full(len(nodes), SCALE, dtype=np.int64)

    for _ in range(iterations):
        contrib_ref = ray.put(pr // deg)  # broadcast once per round
        nodes_ref = ray.put(nodes)

        def sum_partial(t: pa.Table, *, _c=contrib_ref, _n=nodes_ref):
            contrib, node_ids = ray.get(_c), ray.get(_n)
            src = t[src_col].to_numpy(zero_copy_only=False)
            dst = t[dst_col].to_numpy(zero_copy_only=False)
            si = np.searchsorted(node_ids, src)
            di = np.searchsorted(node_ids, dst)
            # float64 bincount is exact here: every addend < 2^30·SCALE
            # and every per-batch partial < 2^53
            s = np.bincount(di, weights=contrib[si].astype(np.float64),
                            minlength=len(node_ids))
            nz = np.flatnonzero(s)
            return pa.table({"node": pa.array(node_ids[nz]),
                             "s": pa.array(s[nz].astype(np.int64))})

        sums = (edges.map_batches(sum_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
                ).to_pandas()  # ≤ batches·nodes partial rows — no exchange
        s_vec = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s_vec, np.searchsorted(nodes, sums["node"].to_numpy()),
                  sums["s"].to_numpy())
        pr = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN + (
            DAMP_NUM * s_vec) // DAMP_DEN

    return pa.table({"node": pa.array(nodes),
                     "pr": pa.array(pr.astype(np.int64))})
