"""Generic task-based partition exchange for query pipelines.

``exchange_map_groups(ds, part_col, kernel, nparts)`` computes the same
result as ``ds.groupby(part_col).map_groups(kernel)`` when ``part_col``
is a materialized partition id in ``[0, nparts)`` (the repo's
``int_key_part_col`` / ``str_key_part_col`` convention), but as raw Ray
tasks: one bucketing split per input block (``num_returns=nparts`` so a
reduce task fetches ONLY its partition's bytes — per-slice transfers,
the multi-node shuffle shape) and one reduce per partition that
concatenates its slices and runs the kernel.

Why: Ray Data's groupby is a comparison SORT of the full payload with a
boundary-sampling pass; the partition id is already materialized, so
the exchange only needs bucketing.  This is the query-side
generalization of the engine's task exchange
(``pipelines/engine.py:_task_exchange_apply``, measured 2.7 s → 1.0 s
on the 16 M-event replay exchange); on the ppjoin sf0.1 attach stream
(~12 M rows) the sort leg read 20.5 s vs ~4 s through this path.

Contract differences from ``groupby().map_groups`` (both deliberate):
- the kernel receives one pa.Table per PARTITION (= one part value,
  same as today's gpart usage) and MUST return a typed result for a
  zero-row input (Ray skips empty groups; the reduce task does not);
- input block order is preserved within a partition (stable argsort +
  block-order concat), matching the sort shuffle's stable order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote
def _split_by_part(block, part_col: str, nparts: int):
    t = _as_arrow(block)
    if nparts == 1:
        # num_returns=1 does not unpack a returned tuple
        return t
    if part_col not in t.column_names:
        # a GLOBALLY empty union side yields a schema-less zero-row
        # block; route an empty slice everywhere
        empty = t.slice(0, 0)
        return tuple(empty for _ in range(nparts))
    part = t[part_col].to_numpy(zero_copy_only=False)
    if len(part):
        pmin, pmax = part.min(), part.max()
        if pmin < 0 or pmax >= nparts:
            # keep the drop-in contract LOUD: the groupby this replaces
            # would surface an out-of-range part as an extra group, so a
            # miscomputed partition column must not silently vanish here
            raise ValueError(
                f"exchange part column '{part_col}' out of range: "
                f"[{pmin}, {pmax}] not within [0, {nparts})")
    if len(part) and not (part[1:] >= part[:-1]).all():
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        part = part[order]
    bounds = np.searchsorted(part, np.arange(nparts + 1))
    return tuple(
        t.slice(bounds[s], bounds[s + 1] - bounds[s]) for s in range(nparts)
    )


@ray.remote
def _reduce_kernel(kernel, part_col: str | None, *slices: pa.Table) -> pa.Table:
    tabs = [s for s in slices if s.num_rows]
    if not tabs:
        # all-empty partition: keep the widest schema (schema-less
        # empties come from globally-empty union sides)
        tabs = [max(slices, key=lambda s: s.num_columns)]
    t = pa.concat_tables(tabs).combine_chunks()
    if part_col is not None and part_col in t.column_names:
        t = t.drop_columns([part_col])
    if t.num_rows == 0:
        # parity with Ray's groupby (which never materializes empty
        # groups): prefer the kernel's own typed empty, but degrade to
        # the 0-column empty Ray itself emits for empty streams when a
        # kernel assumes non-empty input
        try:
            out = kernel(t)
        except Exception:
            return pa.table({})
    else:
        out = kernel(t)
    if isinstance(out, pd.DataFrame):
        out = pa.Table.from_pandas(out, preserve_index=False)
    return out


def _iter_block_refs(ds: "ray.data.Dataset"):
    """Yield block refs AS the streaming executor produces them.

    ``iter_internal_ref_bundles`` drives ``execute_to_iterator`` — no
    materialization barrier: the consumer sees each upstream block the
    moment it lands, so split tasks overlap upstream execution instead
    of waiting behind a full ``materialize()`` (the r4 Known limit #1).
    Falls back to materialize on Ray versions without the API.
    """
    if hasattr(ds, "iter_internal_ref_bundles"):
        for b in ds.iter_internal_ref_bundles():
            yield from b.block_refs
    else:  # pragma: no cover - older Ray
        yield from ds.materialize().get_internal_block_refs()


def exchange_map_groups(ds: "ray.data.Dataset", part_col: str, kernel,
                        nparts: int,
                        drop_part_col: bool = False) -> "ray.data.Dataset":
    """``ds.groupby(part_col).map_groups(kernel)`` as a task exchange.

    ``part_col`` must hold ints in ``[0, nparts)``.  ``kernel`` takes a
    pa.Table (one partition, part column included unless
    ``drop_part_col``) and returns a pa.Table or pd.DataFrame, and must
    return a typed empty result for a zero-row input.

    Streaming: split tasks launch per upstream block as the block is
    produced (no barrier); only the reduce fan-in waits for all splits,
    which is inherent to an all-to-all exchange.
    """
    split = _split_by_part.options(num_returns=nparts)
    per_block = []
    for r in _iter_block_refs(ds):
        pb = split.remote(r, part_col, nparts)
        per_block.append([pb] if nparts == 1 else pb)
    if not per_block:
        raise ValueError("exchange over an empty (zero-block) dataset")
    kref = ray.put(kernel)
    drop = part_col if drop_part_col else None
    outs = [
        _reduce_kernel.remote(kref, drop, *[pb[s] for pb in per_block])
        for s in range(nparts)
    ]
    return ray.data.from_arrow_refs(outs)
