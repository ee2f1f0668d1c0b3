"""Transitive closure over an explicit DAG edge table (SURVEY A7).

The reference materializes IS_A_PART_OF_CLOSURE pairs for every ontology
term via a Cypher variable-length path match
(/root/reference/src/etl/closure_etl.py:28-30): given an edge list
``(child_id, parent_id)`` it emits every DISTINCT ``(child, ancestor)``
pair reachable over is_a/part_of edges.  Two Ray-Data-first strategies:

``closure_path_doubling``
    Distributed: SEMI-NAIVE path doubling — each round composes only last
    round's delta D against R (D∘R ∪ R∘D), so a depth-D DAG closes in
    ⌈log2 D⌉ rounds WITHOUT re-deriving the known closure each round.
    The per-round compose is hybrid: a delta under
    ``BROADCAST_DELTA_LIMIT`` broadcasts and composes map-side (one
    exchange per round — the min-tag merge); a larger delta goes through
    one tagged hash join (two exchanges).  Nothing is driver-side beyond
    the bounded broadcast object.  This is the 100 TB path for edge
    tables too large to broadcast.

``closure_broadcast_bfs``
    Broadcast: collect the edge list once into CSR arrays (``ray.put``),
    then each task runs a level-synchronized, fully vectorized frontier
    BFS for its whole node batch.  The right call when the graph is
    ontology-sized (the reference's ontologies are ≤ a few hundred
    thousand terms) while the node set being closed is huge.
    Partitioning assumption: the EDGE LIST fits in one object-store
    object; the node stream is unbounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _distinct_pairs(ds: ray.data.Dataset, packable: bool = False,
                    nparts: int = 0) -> ray.data.Dataset:
    """Distinct (node, ancestor) via per-batch dedup partial + ONE
    hash-partitioned exchange with a vectorized per-partition dedup kernel
    (``_min_merge`` with every row tagged 0 — never per-pair aggregation
    over many tiny groups).

    ``packable=True``: both ids are known < 2^31 (caller-guaranteed, e.g.
    derived from bounded keys), so the pair packs losslessly into one
    int64 — a single-column exchange sorts markedly faster than a
    two-column one.  Each batch still asserts the range.
    """
    if packable:
        def pack(t: pa.Table) -> pa.Table:
            packed = _pack_pairs(t)
            pk = np.unique(packed["pk"].to_numpy(zero_copy_only=False))
            return pa.table({
                "pk": pa.array(pk),
                "tag": pa.array(np.zeros(len(pk), np.int8)),
            })

        pre = ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    else:
        def local_distinct(t: pa.Table) -> pa.Table:
            u = t.select(["node", "ancestor"]).group_by(
                ["node", "ancestor"]).aggregate([])
            return u.append_column("tag", pa.array(np.zeros(u.num_rows, np.int8)))

        pre = ds.map_batches(local_distinct, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _min_merge(pre, packable=packable, nparts=nparts).map_batches(
        lambda t: t.select(["node", "ancestor"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _pack_pairs(t: pa.Table, extra: dict | None = None) -> pa.Table:
    """(node, ancestor) → single int64 ``pk`` (ids caller-asserted < 2^31)."""
    n = t["node"].to_numpy(zero_copy_only=False)
    a = t["ancestor"].to_numpy(zero_copy_only=False)
    assert (len(n) == 0) or (
        n.min() >= 0 and a.min() >= 0
        and n.max() < (1 << 31) and a.max() < (1 << 31)
    ), "packable closure requires ids in [0, 2^31)"
    cols = {"pk": pa.array((n.astype(np.int64) << np.int64(31)) | a.astype(np.int64))}
    cols.update(extra or {})
    return pa.table(cols)


def _min_merge(tagged: ray.data.Dataset, packable: bool,
               nparts: int = 0) -> ray.data.Dataset:
    """Finish a tagged-pair stream: ONE exchange keeping min(tag) per pair
    — rows with ``mn == 1`` were first derived this round.  ``tagged``
    carries ("pk", "tag") when packable else ("node", "ancestor", "tag").

    The exchange is ``groupby(part).map_groups`` over ``nparts`` hash
    partitions with a vectorized lexsort-dedup kernel per partition —
    NOT ``groupby(pair).aggregate``: per-pair aggregation over hundreds of
    thousands of groups measured 25–40 s where this shape runs in ~2 s
    (the engine's merge-apply exchange, ``engine.py:511``, is the same
    few-groups/vector-kernel design)."""
    from ..functions.pools import join_parts

    nparts = nparts or join_parts()
    mult = np.uint64(0x9E3779B97F4A7C15)

    if packable:
        def add_part(t: pa.Table) -> pa.Table:
            pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                part = ((pk * mult) >> np.uint64(33)) % np.uint64(nparts)
            return t.append_column("part", pa.array(part.astype(np.int32)))

        def merge_part(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "ancestor": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.int8())})
            pk = g["pk"].to_numpy(zero_copy_only=False)
            tag = g["tag"].to_numpy(zero_copy_only=False)
            order = np.lexsort((tag, pk))
            pk_s, tag_s = pk[order], tag[order]
            first = np.concatenate([[True], pk_s[1:] != pk_s[:-1]])
            k = pk_s[first]
            return pa.table({
                "node": pa.array(k >> np.int64(31)),
                "ancestor": pa.array(k & np.int64((1 << 31) - 1)),
                "mn": pa.array(tag_s[first]),
            })

        from .exchange import exchange_map_groups

        return exchange_map_groups(
            tagged.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True),
            "part", merge_part, nparts, drop_part_col=True)

    def add_part2(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        a = t["ancestor"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = (((n * mult) ^ a) * mult >> np.uint64(33)) % np.uint64(nparts)
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def merge_part2(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "ancestor": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int8())})
        n = g["node"].to_numpy(zero_copy_only=False)
        a = g["ancestor"].to_numpy(zero_copy_only=False)
        tag = g["tag"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, a, n))
        n_s, a_s, tag_s = n[order], a[order], tag[order]
        first = np.concatenate(
            [[True], (n_s[1:] != n_s[:-1]) | (a_s[1:] != a_s[:-1])])
        return pa.table({
            "node": pa.array(n_s[first]),
            "ancestor": pa.array(a_s[first]),
            "mn": pa.array(tag_s[first]),
        })

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        tagged.map_batches(add_part2, batch_format="pyarrow",
                           zero_copy_batch=True),
        "part", merge_part2, nparts, drop_part_col=True)


def _tagged_min_merge(r: ray.data.Dataset, stepped: ray.data.Dataset,
                      packable: bool) -> ray.data.Dataset:
    """One exchange that yields BOTH the merged closure and the round's
    delta: union R (tag 0) with the stepped pairs (tag 1), group by pair,
    keep min(tag).  Per-batch partial dedup runs before the exchange (each
    pre-union block has a uniform tag, so local distinct preserves the min)."""
    if packable:
        def pack_tagged(tag):
            def fn(t: pa.Table) -> pa.Table:
                packed = _pack_pairs(t)
                pk = np.unique(packed["pk"].to_numpy(zero_copy_only=False))
                return pa.table({
                    "pk": pa.array(pk),
                    "tag": pa.array(np.full(len(pk), tag, dtype=np.int8)),
                })
            return fn

        tagged = r.map_batches(pack_tagged(0), batch_format="pyarrow",
                               zero_copy_batch=True).union(
            stepped.map_batches(pack_tagged(1), batch_format="pyarrow",
                                zero_copy_batch=True))
        return _min_merge(tagged, packable=True)

    def tag_batch(tag):
        def fn(t: pa.Table) -> pa.Table:
            u = t.select(["node", "ancestor"]).group_by(
                ["node", "ancestor"]).aggregate([])
            return u.append_column(
                "tag", pa.array(np.full(u.num_rows, tag, dtype=np.int8)))
        return fn

    tagged = r.map_batches(tag_batch(0), batch_format="pyarrow",
                           zero_copy_batch=True).union(
        stepped.map_batches(tag_batch(1), batch_format="pyarrow",
                            zero_copy_batch=True))
    return _min_merge(tagged, packable=False)


#: per-round delta row bound for the map-side compose: below it the round's
#: delta broadcasts (~16 B/pair → ≤ 80 MB object) and the D∘R ∪ R∘D step
#: runs as vectorized searchsorted lookups inside map_batches over R — the
#: round then costs ONE exchange (the min-tag groupby).  Above it the
#: distributed tagged join runs.  Same hybrid contract as the decontam
#: membership stage: bounded broadcast state, never unbounded driver memory.
BROADCAST_DELTA_LIMIT = 5_000_000


class _ComposeBroadcastDelta:
    """Actor-pool stage: stream R batches, emit tagged (pair, tag) rows for
    the min-tag merge — R itself re-tagged 0 plus the round's composed
    pairs D∘R ∪ R∘D tagged 1, derived against the BROADCAST delta via two
    sorted-key searchsorted lookups (multi-match expansion by np.repeat
    offset math; no join exchange)."""

    def __init__(self, ref, packable: bool, lazy: bool = False):
        # (anc_sorted, anc_src, node_sorted, node_dst): delta indexed both
        # ways, built once on the driver.  ``lazy=True`` defers the
        # ray.get to first use so the instance can ship inside a TASK
        # closure (plasma read is zero-copy — per-task fetch is free,
        # and tasks avoid per-round actor-pool startup).
        self._ref = ref
        self.packable = packable
        self._idx = None if lazy else ray.get(ref)

    @property
    def _index(self):
        if self._idx is None:
            self._idx = ray.get(self._ref)
        return self._idx

    @staticmethod
    def _expand(keys_sorted, payload, probe):
        """All matches of each ``probe`` value in ``keys_sorted`` →
        (probe_row_idx, payload_match) arrays."""
        lo = np.searchsorted(keys_sorted, probe, side="left")
        hi = np.searchsorted(keys_sorted, probe, side="right")
        counts = hi - lo
        nz = counts > 0
        lo, counts = lo[nz], counts[nz]
        rows = np.nonzero(nz)[0]
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        rep = np.repeat(np.arange(len(counts)), counts)
        within = np.arange(total, dtype=np.int64) - np.concatenate(
            ([0], np.cumsum(counts)[:-1]))[rep]
        return rows[rep], payload[lo[rep] + within]

    def __call__(self, t: pa.Table) -> pa.Table:
        anc_sorted, anc_src, node_sorted, node_dst = self._index
        rn = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ra = t["ancestor"].to_numpy(zero_copy_only=False).astype(np.int64)
        # D∘R: d.ancestor == r.node → (d.node, r.ancestor)
        i1, dn = self._expand(anc_sorted, anc_src, rn)
        # R∘D: r.ancestor == d.node → (r.node, d.ancestor)
        i2, da = self._expand(node_sorted, node_dst, ra)
        new_n = np.concatenate([dn, rn[i2]])
        new_a = np.concatenate([ra[i1], da])
        if self.packable:
            pk0 = (rn << np.int64(31)) | ra  # R rows are already distinct
            pk1 = np.unique((new_n << np.int64(31)) | new_a)
            # local partial: pairs already present in this R batch keep tag 0
            pk1 = pk1[~np.isin(pk1, pk0, assume_unique=True)]
            return pa.table({
                "pk": pa.array(np.concatenate([pk0, pk1])),
                "tag": pa.array(np.concatenate([
                    np.zeros(len(pk0), np.int8), np.ones(len(pk1), np.int8)])),
            })
        comp = pa.table({"node": pa.array(new_n), "ancestor": pa.array(new_a)})
        comp = comp.group_by(["node", "ancestor"]).aggregate([])
        return pa.table({
            "node": pa.concat_arrays([t["node"].combine_chunks(), comp["node"].combine_chunks()]),
            "ancestor": pa.concat_arrays([t["ancestor"].combine_chunks(), comp["ancestor"].combine_chunks()]),
            "tag": pa.array(np.concatenate([
                np.zeros(t.num_rows, np.int8), np.ones(comp.num_rows, np.int8)])),
        })


def _broadcast_delta_ref(d_table: pa.Table):
    """Driver-side: index the round's delta both ways, ``ray.put`` once."""
    dn = d_table["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    da = d_table["ancestor"].to_numpy(zero_copy_only=False).astype(np.int64)
    o1 = np.argsort(da, kind="stable")
    o2 = np.argsort(dn, kind="stable")
    return ray.put((da[o1], dn[o1], dn[o2], da[o2]))


def closure_path_doubling(
    edges: ray.data.Dataset,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 20,
    num_partitions: int | None = None,
    packable: bool = False,
    broadcast_delta_limit: int = BROADCAST_DELTA_LIMIT,
) -> ray.data.Dataset:
    """Full (node, ancestor) reachability closure by SEMI-NAIVE distributed
    path doubling.

    Naive doubling (R ∘ R each round) re-derives every already-known pair
    every round — join fan-out proportional to the FULL closure.  Semi-naive
    observes that a pair first reachable in round i+1 (shortest length in
    (2^i, 2^{i+1}]) splits at its midpoint into two halves of length ≤ 2^i,
    of which at least one has length > 2^{i-1} — i.e. is in last round's
    delta D.  So the step is D∘R ∪ R∘D — and each round's compose is
    dispatched on |D| (hybrid, bounded-broadcast contract):

    - |D| ≤ ``broadcast_delta_limit``: D broadcasts (``ray.put`` once,
      fetched once per actor) and the compose runs map-side inside
      ``map_batches`` over R via sorted-key searchsorted lookups — the
      round costs ONE exchange (the min-tag groupby that merges R with the
      composed pairs and extracts the next delta in the same pass).
    - above the limit: ONE distributed join by tagging a side column —
      left = D(s=0) ∪ R(s=1), right = R(s=0) ∪ D(s=1) on the composite
      key (mid, s) — then the min-tag groupby (two exchanges).

    ``packable``: pass True when ids fit [0, 2^31) — single-column
    exchanges (see ``_distinct_pairs`` / ``_pack_pairs``).
    """
    from ..functions.pools import join_parts, pool

    nparts = num_partitions or join_parts()

    r = edges.map_batches(
        lambda t: pa.table({"node": t[child_col], "ancestor": t[parent_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    r = _distinct_pairs(r, packable=packable).materialize()
    d = r  # round 1: every pair is new

    def as_left(ds, s):
        return ds.map_batches(
            lambda t, s=s: pa.table({
                "node": t["node"], "mid": t["ancestor"],
                "s": pa.array(np.full(t.num_rows, s, dtype=np.int8)),
            }),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def as_right(ds, s):
        return ds.map_batches(
            lambda t, s=s: pa.table({
                "mid2": t["node"], "ancestor2": t["ancestor"],
                "s2": pa.array(np.full(t.num_rows, s, dtype=np.int8)),
            }),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    nd = r.count()
    for rnd in range(max_rounds):
        if nd <= broadcast_delta_limit:
            d_tbl = pa.concat_tables(
                d.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
            ref = _broadcast_delta_ref(d_tbl)
            # task closure, not an actor pool: the delta index lives in
            # plasma, so per-task ray.get is a zero-copy map — while a
            # fresh pool PER ROUND pays seconds of actor startup
            compose = _ComposeBroadcastDelta(ref, packable, lazy=True)
            tagged = r.map_batches(
                compose, batch_format="pyarrow", zero_copy_batch=True,
            )
            merged = _min_merge(tagged, packable=packable, nparts=nparts).materialize()
        else:
            if rnd == 0:  # D == R: D∘R alone is R∘R
                left, right = as_left(d, 0), as_right(r, 0)
            else:
                left = as_left(d, 0).union(as_left(r, 1))
                right = as_right(r, 0).union(as_right(d, 1))
            stepped = left.join(
                right, join_type="inner", num_partitions=nparts,
                on=("mid", "s"), right_on=("mid2", "s2")).map_batches(
                lambda t: pa.table({"node": t["node"], "ancestor": t["ancestor2"]}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            merged = _tagged_min_merge(r, stepped, packable=packable).materialize()
        r = merged.map_batches(
            lambda t: t.select(["node", "ancestor"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        d = merged.map_batches(
            lambda t: t.filter(pc.equal(t["mn"], 1)).select(["node", "ancestor"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        nd = d.count()
        if nd == 0:  # fixpoint
            break
    return r


#: edge-count threshold for the auto dispatcher: below it the edge list
#: broadcasts (~16 B/edge → ≤ 80 MB object) and BFS runs exchange-free;
#: above it the semi-naive doubling path runs.  Measured at sf0.1 (27 k
#: edges → 500 k closure pairs): BFS ≈ 2.6 s, doubling ≈ 16 s (was 90 s
#: naive — semi-naive deltas + the map_groups min-merge kernel removed
#: the re-derivation fan-out and the per-pair aggregate) — doubling is
#: only worth it when the edges cannot broadcast.
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
    """(node, ancestor) pairs for each node in ``nodes``, level-synchronized
    frontier BFS over a broadcast CSR edge array.  Edge list must be the
    small side (ontology-sized); the node stream is the unbounded side.

    Fully vectorized: each level expands the WHOLE batch's frontier at once
    with np.repeat offset math against the CSR (indptr, parents) arrays,
    and dedups (origin, ancestor) states with sorted packed int64 keys —
    no per-node Python loop, so the per-batch cost is O(levels) numpy
    kernels rather than O(nodes × edges) interpreter work."""
    c = edges_table[child_col].to_numpy(zero_copy_only=False).astype(np.int64)
    p = edges_table[parent_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.unique(np.concatenate([c, p])) if len(c) else np.empty(0, np.int64)
    ci = np.searchsorted(vocab, c)
    order = np.argsort(ci, kind="stable")
    indptr = np.searchsorted(ci[order], np.arange(len(vocab) + 1)).astype(np.int64)
    flat_parents = np.searchsorted(vocab, p).astype(np.int64)[order]
    ref = ray.put((vocab, indptr, flat_parents))

    class Bfs:
        def __init__(self, ref):
            self.vocab, self.indptr, self.flat = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            vocab, indptr, flat = self.vocab, self.indptr, self.flat
            nv = np.int64(len(vocab))
            nodes_np = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "ancestor": pa.array([], pa.int64())})
            if nv == 0 or len(nodes_np) == 0:
                return empty
            # batch-local origin row → compact vocab id (rows absent from
            # the vocab have no parents: dropped up front)
            pos = np.minimum(np.searchsorted(vocab, nodes_np), nv - 1)
            rows = np.nonzero(vocab[pos] == nodes_np)[0].astype(np.int64)
            # packed state key: origin_row * |vocab| + compact_node
            frontier = rows * nv + pos[rows]
            visited = np.empty(0, np.int64)  # sorted packed keys
            while len(frontier):
                cur = frontier % nv
                counts = indptr[cur + 1] - indptr[cur]
                nz = counts > 0
                origin, cur, counts = frontier[nz] // nv, cur[nz], counts[nz]
                total = int(counts.sum())
                if total == 0:
                    break
                rep = np.repeat(np.arange(len(counts)), counts)
                within = np.arange(total, dtype=np.int64) - np.concatenate(
                    ([0], np.cumsum(counts)[:-1]))[rep]
                nxt = flat[indptr[cur][rep] + within]
                keys = np.unique(origin[rep] * nv + nxt)
                if len(visited):  # drop already-reached states
                    loc = np.minimum(np.searchsorted(visited, keys),
                                     len(visited) - 1)
                    keys = keys[visited[loc] != keys]
                if not len(keys):
                    break
                visited = np.union1d(visited, keys)
                frontier = keys
            if not len(visited):
                return empty
            return pa.table({
                "node": pa.array(nodes_np[visited // nv], pa.int64()),
                "ancestor": pa.array(vocab[visited % nv], pa.int64()),
            })

    from ..functions.pools import pool

    return nodes.map_batches(Bfs, fn_constructor_args=(ref,),
                             batch_format="pyarrow", zero_copy_batch=True,
                             concurrency=pool())
