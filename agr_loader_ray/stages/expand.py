"""Cartesian list×list expansion — SURVEY J3.

The reference expands every resolved interactor-A id against every
resolved interactor-B id per MITAB row
(``/root/reference/src/etl/molecular_interaction_etl.py:599-613``:
``itertools.product(a_resolved_no_dupes, b_resolved_no_dupes)``).  Here
the product is a fully vectorized flat-map over Arrow list columns — no
Python loop per row: output index arithmetic (row, a_local, b_local)
is pure numpy, values are gathered with ``pa.Array.take``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_layout(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(counts, starts, flat values) of a ListArray (offset-normalized)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    return counts, offsets[:-1], arr.values


def cartesian_product_lists(
    t: pa.Table,
    list_a: str,
    list_b: str,
    out_a: str = "a",
    out_b: str = "b",
) -> pa.Table:
    """Per-row cartesian product of two list columns.

    Every scalar column of ``t`` is replicated ``len(A_i) × len(B_i)``
    times for row i; rows where either list is empty produce no output
    (the reference's unresolved-drop semantics).
    """
    ca, sa, va = _list_layout(t[list_a])
    cb, sb, vb = _list_layout(t[list_b])
    sizes = ca * cb
    total = int(sizes.sum())
    row_out = np.repeat(np.arange(len(t), dtype=np.int64), sizes)
    # local output index within each row's product block
    block_start = np.cumsum(sizes) - sizes
    local = np.arange(total, dtype=np.int64) - block_start[row_out]
    a_idx = sa[row_out] + local // cb[row_out]
    b_idx = sb[row_out] + local % cb[row_out]

    cols = {}
    for name in t.column_names:
        if name in (list_a, list_b):
            continue
        cols[name] = t[name].combine_chunks().take(pa.array(row_out))
    cols[out_a] = va.take(pa.array(a_idx))
    cols[out_b] = vb.take(pa.array(b_idx))
    return pa.table(cols)


def dedup_list_values(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row distinct of a list<string> column, preserving first-seen
    order (the reference's ``list(set(...))`` minus its nondeterminism)."""
    import pandas as pd

    counts, starts, flat = _list_layout(arr)
    n = len(counts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    df = pd.DataFrame({"r": row_idx, "v": flat.to_numpy(zero_copy_only=False)})
    kept = df.drop_duplicates()  # vectorized C path
    new_counts = np.bincount(kept["r"].to_numpy(), minlength=n).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(new_counts)))
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(kept["v"].to_numpy(), pa.string())
    )
