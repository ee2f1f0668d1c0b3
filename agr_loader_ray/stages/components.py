"""Generic connected components over an edge Dataset.

The reference resolves record-identity groups transitively (gene ↔
cross-reference chains folded to one primary id, e.g. the resolver
chain in src/etl/helpers/resolver_helper.py and the closure walk in
src/etl/closure_etl.py:28-81); the near-dup family in
``stages/dedup.py`` needs the same primitive over candidate pairs.
This module is the reusable, scale-first version:

- ``connected_components_pointer_doubling``: distributed CC in
  O(log diameter) rounds — each round is one min-propagation over the
  edge set (hook) followed by one pointer jump
  ``label(v) <- label(label(v))`` (compress).  Plain one-hop min-label
  propagation (``dedup.resolve_duplicate_groups_distributed``) needs
  ``diameter`` rounds, which on a 100 TB boilerplate-chain graph is
  unbounded; doubling converges in ~log2(diameter) exchanges.
- ``connected_components_auto``: hybrid dispatch — driver union-find
  below ``pair_limit`` edges (exact, no exchanges), pointer doubling
  above — the same broadcast-vs-distributed pattern as the dedup and
  closure families.

Edge Dataset contract: integer columns ``id_a``/``id_b`` (same as the
dedup pair contract).  Output: Dataset of ``{node, component}`` where
``component`` is the component-minimum node id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.pools import join_parts


def _min_label_per_node(ds: "ray.data.Dataset", nparts: int) -> "ray.data.Dataset":
    """Min label per node: per-batch arrow combiner then the native
    hash aggregate.  Arrow blocks end to end — a pandas ``map_groups``
    kernel here emits schema-less empty blocks that break the
    downstream join finalize (measured: ArrowInvalid "no match for key
    field" in the compress join)."""

    def combine(t: pa.Table) -> pa.Table:
        return (t.select(["node", "label"]).group_by("node")
                .aggregate([("label", "min")])
                .rename_columns(["node", "label"]))

    from ray.data.aggregate import Min

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )


def connected_components_pointer_doubling(
    edges: "ray.data.Dataset", max_rounds: int = 20
) -> "ray.data.Dataset":
    """Distributed connected components in O(log diameter) rounds."""
    nparts = join_parts()

    def symmetrize(t: pa.Table) -> pa.Table:
        a = pc.cast(t["id_a"], pa.int64()).combine_chunks()
        b = pc.cast(t["id_b"], pa.int64()).combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        t2 = pa.table({"node": t["u"],
                       "label": pc.min_element_wise(t["u"], t["v"])})
        return (t2.group_by("node").aggregate([("label", "min")])
                .rename_columns(["node", "label"]))

    labels = _min_label_per_node(
        sym.map_batches(init_labels, batch_format="pyarrow",
                        zero_copy_batch=True),
        nparts,
    ).materialize()

    def label_sum(ls) -> int:
        return ls.map_batches(
            lambda t: pa.table(
                {"s": pa.array([pc.sum(t["label"]).as_py() or 0])}),
            batch_format="pyarrow",
        ).sum("s")

    prev = label_sum(labels)
    for _ in range(max_rounds):
        # hook: label(u) <- min(label(u), label(v)) over edges (u, v)
        lab_v = labels.map_batches(
            lambda t: pa.table({"v2": t["node"], "vlabel": t["label"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        prop = sym.join(lab_v, join_type="inner", num_partitions=nparts,
                        on=("v",), right_on=("v2",)).map_batches(
            lambda t: pa.table({"node": t["u"], "label": t["vlabel"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        hooked = _min_label_per_node(labels.union(prop), nparts).materialize()

        # compress: label(v) <- label(label(v)) — the doubling step.
        # Every label value is a node id present in the label table, so
        # the inner join is total.
        as_map = hooked.map_batches(
            lambda t: pa.table({"node2": t["node"], "label2": t["label"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        labels = hooked.join(as_map, join_type="inner",
                             num_partitions=nparts,
                             on=("label",), right_on=("node2",)).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label2"]}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

        cur = label_sum(labels)
        if cur == prev:  # labels monotone nonincreasing -> fixpoint
            return labels.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "component": t["label"]}),
                batch_format="pyarrow")
        prev = cur
    raise RuntimeError(
        f"pointer-doubling CC did not converge in {max_rounds} rounds "
        f"(log2(diameter) exceeds the cap — raise max_rounds)")


def connected_components_auto(
    edges: "ray.data.Dataset", pair_limit: int = 2_000_000
) -> "ray.data.Dataset":
    """Hybrid: exact driver union-find below ``pair_limit`` edges (no
    exchanges), distributed pointer doubling above."""
    n_edges = edges.count()
    if n_edges > pair_limit:
        return connected_components_pointer_doubling(edges)

    from .dedup import resolve_duplicate_groups

    pairs_tbl = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
        or [pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})]
    )
    a = pairs_tbl["id_a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["id_b"].to_numpy(zero_copy_only=False)
    groups = resolve_duplicate_groups(list(zip(a.tolist(), b.tolist())))
    nodes = np.fromiter(groups.keys(), dtype=np.int64, count=len(groups))
    comps = np.fromiter(groups.values(), dtype=np.int64, count=len(groups))
    order = np.argsort(nodes, kind="mergesort")
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[order], pa.int64()),
        "component": pa.array(comps[order], pa.int64()),
    }))
