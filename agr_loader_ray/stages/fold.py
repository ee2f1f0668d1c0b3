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


def lww_last_per_key(tbl: pa.Table, key_cols: list[str], order_cols: list[str]) -> pa.Table:
    """Keep the last row per key under ascending ``key_cols + order_cols``.

    Sort-based: O(n log n) single pass, fully vectorized (arrow sort +
    numpy adjacency diff).  Key columns must be non-null.
    """
    n = tbl.num_rows
    if n <= 1:
        return tbl
    t = tbl.sort_by([(c, "ascending") for c in [*key_cols, *order_cols]])
    mask = np.zeros(n, dtype=bool)
    mask[-1] = True
    diff: np.ndarray | None = None
    for c in key_cols:
        col = t[c].combine_chunks()
        import pyarrow.compute as pc

        ne = pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        ne = np.asarray(ne, dtype=bool)
        diff = ne if diff is None else (diff | ne)
    mask[: n - 1] = diff
    return t.filter(pa.array(mask))
