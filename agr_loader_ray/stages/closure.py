"""Transitive closure over an explicit DAG edge table (SURVEY A7).

The reference materializes IS_A_PART_OF_CLOSURE pairs for every ontology
term via a Cypher variable-length path match
(/root/reference/src/etl/closure_etl.py:28-30): given an edge list
``(child_id, parent_id)`` it emits every DISTINCT ``(child, ancestor)``
pair reachable over is_a/part_of edges.  Two Ray-Data-first strategies:

``closure_path_doubling``
    Distributed: iterated hash ``Dataset.join`` with path doubling —
    R_{i+1} = distinct(R_i ∪ R_i∘R_i) — so a depth-D DAG closes in
    ⌈log2 D⌉ exchanges instead of D.  Each round materializes the
    (bounded-by-output) reachability set; every join/distinct is a
    hash-partitioned shuffle, nothing is driver-side.  This is the
    100 TB path for edge tables too large to broadcast.

``closure_broadcast_bfs``
    Broadcast: collect the edge list once (``ray.put``), then each task
    BFSes its node batch against the shared in-memory parent map.  The
    right call when the graph is ontology-sized (the reference's
    ontologies are ≤ a few hundred thousand terms) while the node set
    being closed is huge.  Partitioning assumption: the EDGE LIST fits
    in one object-store object; the node stream is unbounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _distinct_pairs(ds: ray.data.Dataset, packable: bool = False) -> ray.data.Dataset:
    """Distinct (node, ancestor) via per-batch dedup partial + one exchange
    (groupby-count, not per-group Python — many tiny groups).

    ``packable=True``: both ids are known < 2^31 (caller-guaranteed, e.g.
    derived from bounded keys), so the pair packs losslessly into one
    int64 — a single-column exchange sorts markedly faster than a
    two-column one.  Each batch still asserts the range.
    """
    from ray.data.aggregate import Count

    if packable:
        def pack(t: pa.Table) -> pa.Table:
            n = t["node"].to_numpy(zero_copy_only=False)
            a = t["ancestor"].to_numpy(zero_copy_only=False)
            assert (len(n) == 0) or (
                n.min() >= 0 and a.min() >= 0
                and n.max() < (1 << 31) and a.max() < (1 << 31)
            ), "packable distinct requires ids in [0, 2^31)"
            key = (n.astype(np.int64) << np.int64(31)) | a.astype(np.int64)
            return pa.table({"pk": pa.array(np.unique(key))})

        agg = (
            ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pk").aggregate(Count(alias_name="_c"))
        )

        def unpack(t: pa.Table) -> pa.Table:
            k = t["pk"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": pa.array(k >> np.int64(31)),
                "ancestor": pa.array(k & np.int64((1 << 31) - 1)),
            })

        return agg.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)

    pre = ds.map_batches(
        lambda t: t.group_by(["node", "ancestor"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    agg = pre.groupby(["node", "ancestor"]).aggregate(Count(alias_name="_c"))
    return agg.map_batches(lambda t: t.select(["node", "ancestor"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def closure_path_doubling(
    edges: ray.data.Dataset,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 20,
    num_partitions: int | None = None,
    packable: bool = False,
) -> ray.data.Dataset:
    """Full (node, ancestor) reachability closure by distributed path doubling.

    ``packable``: pass True when ids fit [0, 2^31) — single-column
    distinct exchanges (see ``_distinct_pairs``).
    """
    from ..functions.pools import join_parts

    nparts = num_partitions or join_parts()

    r = edges.map_batches(
        lambda t: pa.table({"node": t[child_col], "ancestor": t[parent_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    r = _distinct_pairs(r, packable=packable).materialize()
    n = r.count()
    for _ in range(max_rounds):
        # R ∘ R: (node, mid) ⋈ (mid, ancestor) — doubles max path length
        left = r.map_batches(
            lambda t: pa.table({"node": t["node"], "mid": t["ancestor"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        right = r.map_batches(
            lambda t: pa.table({"mid2": t["node"], "ancestor": t["ancestor"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        stepped = left.join(right, join_type="inner", num_partitions=nparts,
                            on=("mid",), right_on=("mid2",)).map_batches(
            lambda t: pa.table({"node": t["node"], "ancestor": t["ancestor"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        r2 = _distinct_pairs(r.union(stepped), packable=packable).materialize()
        n2 = r2.count()
        r = r2
        if n2 == n:  # fixpoint
            break
        n = n2
    return r


#: edge-count threshold for the auto dispatcher: below it the edge list
#: broadcasts (~16 B/edge → ≤ 80 MB object) and BFS runs exchange-free;
#: above it the join-based doubling path runs.  Measured at sf0.1 (27 k
#: edges → 500 k closure pairs): BFS ≈ 3.5 s, doubling ≈ 90 s — the
#: doubling rounds pay Ray's per-exchange fixed cost plus path-multiplied
#: join fan-out, which is only worth it when the edges cannot broadcast.
BROADCAST_EDGE_LIMIT = 5_000_000


def closure_auto(
    edges: ray.data.Dataset,
    child_col: str = "child",
    parent_col: str = "parent",
    **doubling_kwargs,
) -> ray.data.Dataset:
    """Size-dispatched closure: broadcast BFS for ontology-sized edge
    lists, distributed path doubling beyond ``BROADCAST_EDGE_LIMIT``."""
    import pyarrow.compute as pc

    pruned = edges.map_batches(
        lambda t: t.select([child_col, parent_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    if pruned.count() <= BROADCAST_EDGE_LIMIT:
        tbl = pa.concat_tables(
            pruned.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        # globally-distinct start nodes, derived from the already-collected
        # edge table (free — no extra exchange)
        nodes = ray.data.from_arrow(
            pa.table({"node": pc.unique(tbl[child_col].combine_chunks())})
        )
        return closure_broadcast_bfs(nodes, tbl, child_col=child_col,
                                     parent_col=parent_col)
    return closure_path_doubling(pruned, child_col=child_col,
                                 parent_col=parent_col, **doubling_kwargs)


def closure_broadcast_bfs(
    nodes: ray.data.Dataset,
    edges_table: pa.Table,
    node_col: str = "node",
    child_col: str = "child",
    parent_col: str = "parent",
) -> ray.data.Dataset:
    """(node, ancestor) pairs for each node in ``nodes``, BFS over a
    broadcast edge list.  Edge list must be the small side (ontology-sized)."""
    parent_map: dict[int, list[int]] = {}
    for c, p in zip(edges_table[child_col].to_pylist(), edges_table[parent_col].to_pylist()):
        parent_map.setdefault(c, []).append(p)
    ref = ray.put(parent_map)

    class Bfs:
        def __init__(self, ref):
            self.parents = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            parents = self.parents
            out_node: list[int] = []
            out_anc: list[int] = []
            for node in t[node_col].to_pylist():
                seen: set[int] = set()
                frontier = parents.get(node, ())
                stack = list(frontier)
                while stack:
                    a = stack.pop()
                    if a in seen:
                        continue
                    seen.add(a)
                    stack.extend(parents.get(a, ()))
                out_node.extend([node] * len(seen))
                out_anc.extend(seen)
            return pa.table({"node": pa.array(out_node, pa.int64()),
                             "ancestor": pa.array(out_anc, pa.int64())})

    from ..functions.pools import pool

    return nodes.map_batches(Bfs, fn_constructor_args=(ref,),
                             batch_format="pyarrow", zero_copy_batch=True,
                             concurrency=pool())
