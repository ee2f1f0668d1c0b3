"""Vectorized last-writer-wins fold kernels (pure Arrow + numpy).

The LWW fold — keep, per primary key, the event with the greatest
``(ts, offset)`` — is an associative, commutative reduction, so it runs
in two phases exactly like a combiner:

1. **pre-fold** inside ``map_batches`` (no shuffle): collapse duplicate
   keys within each WAL block before the partition shuffle.  This is
   the skew absorber — a hot key with 10^6 updates in an epoch ships at
   most one survivor per input block across the wire.
2. **final fold** inside the per-partition merge-apply, over
   (previous partition state ∪ pre-folded events).

Reference analogue: ``MERGE ... ON CREATE SET`` first-writer-wins
idempotency (``/root/reference/src/etl/bgi_etl.py:99-116``) generalized
to last-writer-wins on ``(ts, offset)`` per the north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def lww_winner_indices(tbl: pa.Table, key_cols: list[str],
                       order_cols: list[str]) -> "np.ndarray | None":
    """Row indices of the per-key LWW winners, in key-code order — the
    fast path of :func:`lww_last_per_key` WITHOUT the payload take, so a
    caller can compose its own gather (e.g. the engine prefold orders
    winners by partition id first and pays ONE take instead of two).
    Returns ``None`` when the index-only path can't run (nulls in a sort
    column, string order column, non-numeric survivor) — callers must
    fall back to :func:`lww_last_per_key`."""
    n = tbl.num_rows
    import pyarrow.compute as pc

    cols: list[np.ndarray] = []
    for i, c in enumerate([*key_cols, *order_cols]):
        col = tbl[c]
        if col.null_count:
            return None
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            if i >= len(key_cols):
                # dictionary codes are first-appearance order, NOT
                # lexical — exact for KEY equality-grouping, wrong as a
                # sort ORDER.  A string order column must take the
                # sort_by fallback (no current engine caller hits this:
                # order cols are always ts/offset/event_id).
                return None
            col = pc.dictionary_encode(col).indices
        elif pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        elif pa.types.is_boolean(col.type):
            col = col.cast(pa.int8())
        try:
            arr = col.to_numpy(zero_copy_only=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None
        if arr.dtype == object:  # non-numeric survivor → fallback
            return None
        cols.append(np.ascontiguousarray(arr))
    order = np.lexsort(tuple(reversed(cols)))
    kn = len(key_cols)
    change = np.zeros(n, dtype=bool)
    change[-1] = True
    diff: "np.ndarray | None" = None
    for a in cols[:kn]:
        s = a[order]
        ne = s[1:] != s[:-1]
        diff = ne if diff is None else (diff | ne)
    change[: n - 1] = diff
    return order[change]


def lww_last_per_key(tbl: pa.Table, key_cols: list[str], order_cols: list[str]) -> pa.Table:
    """Keep the last row per key under ascending ``key_cols + order_cols``.

    Fully vectorized, two strategies:

    - **fast path** (all sort columns non-null): string keys are
      factorized to integer codes (``pc.dictionary_encode`` — a
      bijection of the values, so equality grouping is exact), the sort
      runs as ``np.lexsort`` over numeric arrays producing INDICES
      only, and the payload moves ONCE (a single ``take`` of the
      winners).  The old path sorted the full payload (wide text
      columns) and then filtered — two full-table gathers plus string
      comparisons inside the sort; this cut the prefold's CPU share
      measurably at bench scale.  Output ROW ORDER is
      first-appearance-code order, not lexical — the winner SET is
      identical, and every consumer (the partition exchange, the merge
      fold, sorted export) imposes its own order downstream.
    - fallback (nulls present in any sort column): the original
      ``Table.sort_by`` + adjacency-filter path, which inherits Arrow's
      null ordering.

    Key columns must be non-null (engine contract: structurally-invalid
    events are quarantined before any fold).
    """
    n = tbl.num_rows
    if n <= 1:
        return tbl
    import pyarrow.compute as pc

    idx = lww_winner_indices(tbl, key_cols, order_cols)
    if idx is not None:
        return tbl.take(pa.array(idx))

    t = tbl.sort_by([(c, "ascending") for c in [*key_cols, *order_cols]])
    mask = np.zeros(n, dtype=bool)
    mask[-1] = True
    diff = None
    for c in key_cols:
        col = t[c].combine_chunks()
        ne = pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        ne = np.asarray(ne, dtype=bool)
        diff = ne if diff is None else (diff | ne)
    mask[: n - 1] = diff
    return t.filter(pa.array(mask))
