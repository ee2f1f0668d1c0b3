"""Exact distributed multi-quantile (order statistics) per group.

Generalizes the exact-median histogram-refine design
(``pipelines/queries.median_value_per_type``) to ANY set of ranks per
group, on an int64 key column: no task ever holds a full group (the
group key is low-cardinality, so per-group ``map_groups`` would
concentrate ~1/|groups| of the dataset in one task at 100 TB).

    pass 1: per-batch (group, count, min, max) partials → tiny stats
    pass 2..k: per-batch histograms over each (group, rank)'s active
      range → bucket counts; the bucket holding the rank defines the
      next (``buckets``× narrower) range — ≤6 rounds collapse 2^64 keys
    final: pull only values inside resolved ranges (≤ boundary_limit
      per (group, rank)) and take the exact order statistic.

Rank convention for DuckDB ``quantile_disc(v, q)`` parity:
``rank = ceil(q·n) - 1`` (verified empirically; exact integer math via
``(n·num + den - 1) // den - 1``).

Interpolated (PERCENTILE_CONT) quantiles need the TWO order statistics
bracketing ``h = (n-1)·q``: pass ``(num, den, "lo")`` for
``floor(h) = (n-1)·num // den`` and ``(num, den, "hi")`` for
``min(floor(h)+1, n-1)``; the caller interpolates
``lo + (hi-lo)·frac`` with ``frac = ((n-1)·num mod den)/den``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_BUCKETS = 4096
_BOUNDARY_LIMIT = 262_144
_TREE_FANIN = 65_536


def _collect_tree(parts, combine, fanin_rows: int = _TREE_FANIN,
                  empty: "pa.Table | None" = None) -> pa.Table:
    """Collapse a dataset of small partial-aggregate rows to one driver
    table WITHOUT an all-to-all exchange.

    ``ds.groupby().aggregate().take_all()`` on statistics-sized partials
    pays the full sort-shuffle fixed cost (~2 s per round at bench
    scale) to merge a few thousand rows; since every partial table here
    is a per-batch aggregate with a bounded key space (|groups| or
    |groups|·|quantiles|·buckets rows), an associative combine tree is
    equivalent and exchange-free: ONE coalescing ``map_batches`` level
    (Ray bundles ~``fanin_rows`` partial rows per task; each task
    re-combines them back down to the key-space bound) then a final
    driver-side combine over the level's outputs.

    Driver intake is (partial_rows / fanin_rows) · key_space rows — at
    65k fan-in and a ~20k key space that stays driver-sized past 10^10
    input batches; inputs beyond that would add a second coalescing
    level, not a shuffle.
    """
    folded = parts.map_batches(combine, batch_format="pyarrow",
                               batch_size=fanin_rows, zero_copy_batch=True)
    all_tbls = ray.get(folded.to_arrow_refs())
    tbls = [t for t in all_tbls if t.num_rows]
    if not tbls:
        # Ray SKIPS map fns on empty input blocks and substitutes
        # zero-COLUMN empties, so an all-empty stream reaches here
        # schema-less; prefer any typed block, else the caller-supplied
        # typed empty (states the combine's output schema), else fail
        # loudly rather than crash inside combine
        typed = [t for t in all_tbls if t.num_columns]
        if typed:
            return combine(typed[0])
        if empty is not None:
            return empty
        raise ValueError(
            "_collect_tree: all-empty schema-less input — pass a typed "
            "`empty` table for streams that can be globally empty")
    return combine(pa.concat_tables(tbls, promote_options="default"))


def _width(lo: int, hi: int) -> int:
    return max(1, -((lo - hi - 1) // _BUCKETS))  # ceil-div, ≥1


def quantile_disc_rank(q_num: int, q_den: int, n: int) -> int:
    """0-based rank of DuckDB ``quantile_disc(v, q_num/q_den)``."""
    return max(0, (n * q_num + q_den - 1) // q_den - 1)


def quantile_rank(spec: tuple, n: int) -> int:
    """Rank for a quantile spec: ``(num, den)`` → disc convention;
    ``(num, den, "lo"/"hi")`` → the PERCENTILE_CONT bracketing ranks."""
    if len(spec) == 2:
        return quantile_disc_rank(spec[0], spec[1], n)
    num, den, mode = spec
    lo = (n - 1) * num // den
    return lo if mode == "lo" else min(lo + 1, n - 1)


def exact_group_quantiles(ds, group_col: str, key_col: str,
                          quantiles=((1, 4), (1, 2), (3, 4)),
                          pool=None, materialize: bool = True) -> dict:
    """→ {group: {q_idx: key_value}, "_n": {group: n}} — exact int64
    order statistics per group for each (num, den) quantile fraction.

    ``ds`` must already expose ``group_col`` (string) and ``key_col``
    (int64) columns; ``pool`` is the actor-pool bound for the histogram
    stages.

    The algorithm scans its input 3+ times (stats pass, each histogram
    refinement round, boundary pull).  With ``materialize=True`` the
    (group, key) projection is pinned in the object store ONCE so the
    later passes re-read blocks instead of re-running the upstream
    parquet read + transform per pass (measured ~2x on the MAD/quantile
    family at bench scale).  The pinned payload is two columns
    (string group + int64 key) — ~16 B/row, object-store-spillable —
    the same bytes each re-execution would otherwise re-materialize
    per pass anyway; pass ``materialize=False`` for inputs where even
    the projection must stream from storage.
    """
    if materialize and not isinstance(ds, ray.data.dataset.MaterializedDataset):
        ds = ds.materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({group_col: t[group_col], "k": t[key_col]})
        g = t2.group_by(group_col).aggregate(
            [("k", "count"), ("k", "min"), ("k", "max")]
        )
        return pa.table({group_col: g[group_col],
                         "n": g["k_count"].cast(pa.int64()),
                         "lo": g["k_min"], "hi": g["k_max"]})

    def stats_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate(
            [("n", "sum"), ("lo", "min"), ("hi", "max")])
        return pa.table({group_col: g[group_col], "n": g["n_sum"],
                         "lo": g["lo_min"], "hi": g["hi_max"]})

    # combine tree, not groupby: the partials are one row per
    # (batch, group) — statistics-sized — so a sort exchange here is
    # pure fixed cost (~2 s/round at bench scale, see _collect_tree)
    stats = _collect_tree(
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        stats_combine,
    ).to_pylist()  # one tiny row per group

    counts: dict[str, int] = {}
    # (group, qi) -> [lo, hi, rank, below]
    state: dict[tuple, list] = {}
    for r in stats:
        g, n = r[group_col], int(r["n"])
        counts[g] = n
        for qi, spec in enumerate(quantiles):
            state[(g, qi)] = [int(r["lo"]), int(r["hi"]),
                              quantile_rank(spec, n), 0]

    def hist_round(ranges: dict):
        """ranges: (group, qi) -> (lo, hi, width) → bucket-count rows.

        Runs as TASK closures, not an actor pool: the ranges dict is
        groups×quantiles tuples (statistics-sized), and a fresh pool
        per refinement round pays seconds of actor startup — the same
        per-round-pool fix as the closure/k-means stages."""

        class Hist:
            def __init__(self, ranges):
                self.ranges = ranges

            def __call__(self, t: pa.Table) -> pa.Table:
                gs_, qs_, bs_, cs_ = [], [], [], []
                et = t[group_col].to_numpy(zero_copy_only=False)
                keys = t[key_col].to_numpy(zero_copy_only=False)
                for (g, qi), (lo, hi, width) in self.ranges.items():
                    v = keys[(et == g) & (keys >= lo) & (keys <= hi)]
                    if not len(v):
                        continue
                    diff = v.astype(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
                    bc = np.bincount((diff // np.uint64(width)).astype(np.int64),
                                     minlength=_BUCKETS)
                    nz = np.nonzero(bc)[0]
                    gs_.append(np.full(len(nz), g, dtype=object))
                    qs_.append(np.full(len(nz), qi, dtype=np.int64))
                    bs_.append(nz)
                    cs_.append(bc[nz])
                if not gs_:
                    return pa.table({group_col: pa.array([], pa.string()),
                                     "qi": pa.array([], pa.int64()),
                                     "bucket": pa.array([], pa.int64()),
                                     "cnt": pa.array([], pa.int64())})
                return pa.table({
                    group_col: pa.array(np.concatenate(gs_), pa.string()),
                    "qi": pa.array(np.concatenate(qs_), pa.int64()),
                    "bucket": pa.array(np.concatenate(bs_), pa.int64()),
                    "cnt": pa.array(np.concatenate(cs_).astype(np.int64), pa.int64()),
                })

        def hist_combine(t: pa.Table) -> pa.Table:
            g = t.group_by([group_col, "qi", "bucket"]).aggregate(
                [("cnt", "sum")])
            return pa.table({group_col: g[group_col], "qi": g["qi"],
                             "bucket": g["bucket"], "cnt": g["cnt_sum"]})

        return _collect_tree(
            ds.map_batches(Hist(ranges),
                           batch_format="pyarrow", zero_copy_batch=True),
            hist_combine,
        ).to_pylist()  # ≤ |groups|·|quantiles|·_BUCKETS tiny rows

    pending = {gq: (s[0], s[1], _width(s[0], s[1])) for gq, s in state.items()
               if counts[gq[0]] > _BOUNDARY_LIMIT and s[1] > s[0]}
    for _ in range(8):
        if not pending:
            break
        rows = hist_round(pending)
        hists = {gq: np.zeros(_BUCKETS, dtype=np.int64) for gq in pending}
        for r in rows:
            hists[(r[group_col], int(r["qi"]))][r["bucket"]] = r["cnt"]
        nxt = {}
        for gq, h in hists.items():
            lo, hi, rank, below = state[gq]
            width = pending[gq][2]
            cum = np.concatenate(([0], np.cumsum(h)))
            b = int(np.searchsorted(cum, rank - below, side="right")) - 1
            new_lo = lo + b * width
            new_hi = min(hi, lo + (b + 1) * width - 1)
            state[gq] = [new_lo, new_hi, rank, below + int(cum[b])]
            span = int(cum[b + 1] - cum[b])
            if span > _BOUNDARY_LIMIT and new_hi > new_lo:
                nxt[gq] = (new_lo, new_hi, _width(new_lo, new_hi))
        pending = nxt

    resolved: dict[tuple, int] = {}
    for gq in list(state):
        if state[gq][0] == state[gq][1]:
            resolved[gq] = state[gq][0]
            del state[gq]

    if state:
        fref = ray.put({gq: (s[0], s[1]) for gq, s in state.items()})

        def boundary_vals(t: pa.Table) -> pa.Table:
            rngs = ray.get(fref)
            et = t[group_col].to_numpy(zero_copy_only=False)
            keys = t[key_col].to_numpy(zero_copy_only=False)
            gs_, qs_, ks_ = [], [], []
            for (g, qi), (lo, hi) in rngs.items():
                v = keys[(et == g) & (keys >= lo) & (keys <= hi)]
                gs_.append(np.full(len(v), g, dtype=object))
                qs_.append(np.full(len(v), qi, dtype=np.int64))
                ks_.append(v)
            return pa.table({group_col: pa.array(np.concatenate(gs_), pa.string()),
                             "qi": pa.array(np.concatenate(qs_), pa.int64()),
                             "k": pa.array(np.concatenate(ks_), pa.int64())})

        pulled = ds.map_batches(boundary_vals, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        by_gq: dict[tuple, list[int]] = {}
        for r in pulled:
            by_gq.setdefault((r[group_col], int(r["qi"])), []).append(int(r["k"]))
        for gq, s in state.items():
            _, _, rank, below = s
            v = np.sort(np.asarray(by_gq[gq], dtype=np.int64), kind="stable")
            resolved[gq] = int(v[rank - below])

    out: dict = {"_n": counts}
    for (g, qi), val in resolved.items():
        out.setdefault(g, {})[qi] = val
    return out
