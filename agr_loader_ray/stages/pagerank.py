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
from ray.data.aggregate import Sum

SCALE = 1_000_000_000  # initial rank per node (pr is rank · SCALE)
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank_integer(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
) -> pa.Table:
    """Return (node, pr) after ``iterations`` exact integer rounds.

    ``edges`` must already contain BOTH directions for an undirected
    graph (callers union the reverse).  Every node must have outdegree
    ≥ 1 (guaranteed when both directions are present).
    """
    edges = edges.materialize()  # streamed 1 + iterations times, never shuffled

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(src_col).aggregate([(src_col, "count")])
        return pa.table({"node": g[src_col],
                         "deg": g[f"{src_col}_count"].cast(pa.int64())})

    deg_tbl = (edges.map_batches(deg_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby("node").aggregate(Sum("deg", alias_name="deg"))
               ).to_pandas()  # bounded: one row per NODE, not per edge
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
                .groupby("node").aggregate(Sum("s", alias_name="s"))
                ).to_pandas()
        s_vec = np.zeros(len(nodes), dtype=np.int64)
        idx = np.searchsorted(nodes, sums["node"].to_numpy())
        s_vec[idx] = sums["s"].to_numpy()
        pr = ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN + (
            DAMP_NUM * s_vec) // DAMP_DEN

    return pa.table({"node": pa.array(nodes),
                     "pr": pa.array(pr.astype(np.int64))})
