"""Stable hash partitioning of change events.

The reference avoids write conflicts by scheduling (shuffling provider
pairs so no two concurrent writers touch the same gene nodes,
``/root/reference/src/etl/orthology_etl.py:142-153,197-225``).  We
replace scheduling with ownership: every record key ``(conv_id,
turn_idx)`` hashes to exactly one partition, and one apply task owns a
partition per epoch — no locks, no conflicts, stable across epochs.

Hashing is on the FULL primary key (per BASELINE.json north_star), so a
hot conversation's turns spread over all partitions; residual skew
(a single hot key receiving many updates) is absorbed by the per-batch
LWW pre-fold (a combiner: at most one surviving event per key per input
batch reaches the shuffle).  ``skew_stats`` exposes per-conversation
change counts for monitoring (SURVEY §2.5 A8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PART_COL = "part"
_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant (Fibonacci hashing)


def stable_hash_strings(arr: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Deterministic (cross-process, cross-run) uint64 hash of strings.

    ``pandas.util.hash_array`` uses SipHash-1-3 with a fixed key — stable
    across interpreter sessions, unlike builtin ``hash``.
    """
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=True)


def key_hash(conv_id, turn_idx) -> np.ndarray:
    """uint64 hash of the composite PK (conv_id, turn_idx)."""
    h = stable_hash_strings(conv_id)
    if isinstance(turn_idx, (pa.ChunkedArray, pa.Array)):
        turn_idx = turn_idx.to_numpy(zero_copy_only=False)
    t = np.asarray(turn_idx)
    t = np.where(np.isnan(t), -1, t) if t.dtype.kind == "f" else t
    return h ^ (t.astype(np.uint64) + np.uint64(1)) * _MIX


def add_partition_column(batch: pa.Table, n_partitions: int,
                         conv_col: str = "conv_id", turn_col: str = "turn_idx") -> pa.Table:
    """Append ``part = H(conv_id, turn_idx) % n_partitions`` (int32)."""
    part = (key_hash(batch[conv_col], batch[turn_col]) % np.uint64(n_partitions)).astype(np.int32)
    return batch.append_column(PART_COL, pa.array(part, pa.int32()))


def int_key_part_col(t: pa.Table, key_col: str, n_partitions: int,
                     out: str = "gpart") -> pa.Table:
    """Append a bounded hash-partition column derived from an integer key.

    The exchange key for the ``groupby(part).map_groups`` + vectorized
    per-partition kernel pattern: per-key ``map_groups`` pays a Python
    call per group (data-scaled), per-key ``aggregate`` measured 25-40 s
    on ~500 k groups — this shape pays ``n_partitions`` calls and keeps
    each kernel a handful of numpy/pandas C operations."""
    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        part = ((k * _MIX) >> np.uint64(33)) % np.uint64(n_partitions)
    return t.append_column(out, pa.array(part.astype(np.int32)))


def str_key_part_col(t: pa.Table, key_col: str, n_partitions: int,
                     out: str = "gpart") -> pa.Table:
    """``int_key_part_col`` for string keys (stable SipHash first)."""
    h = stable_hash_strings(t[key_col])
    part = (h % np.uint64(n_partitions)).astype(np.int32)
    return t.append_column(out, pa.array(part, pa.int32()))


def skew_stats(ds, conv_col: str = "conv_id", top_k: int = 20) -> pd.DataFrame:
    """Per-conversation change counts (partial-aggregated) → top-k hot keys.

    Pre-aggregates inside ``map_batches`` so the shuffle sees one row per
    (batch, conv) instead of one per event.
    """
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.group_by(conv_col).aggregate([(conv_col, "count")]).rename_columns(
            [conv_col, "n"]
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(conv_col).aggregate(
        Sum("n", alias_name="changes")
    )
    return agg.sort("changes", descending=True).limit(top_k).to_pandas()


def salted_topk_per_key(ds, key: str, sort_cols: list[str], ascending: list[bool],
                        k: int, hot_keys, n_salt: int = 8):
    """Per-key top-k with HOT-KEY SALTING (the north-star's explicit skew
    mechanism: per-key change counts → hot keys → salted sub-partitions
    before the shuffle).

    Top-k is combinable — ``topk(concat(topk(salted parts))) == topk`` —
    so hot keys fan out to ``n_salt`` sub-groups for the first exchange
    (no single task holds a hot key's full row set), then a second tiny
    exchange over ≤ n_salt × k rows per hot key finishes.  Cold keys take
    salt 0 and skip straight through the same two stages.

    Both exchanges run the partition-kernel shape (bounded ``gpart``
    hash-partition column → one vectorized pandas kernel per partition)
    rather than per-key ``map_groups`` — a Python call per (key, salt)
    group is data-scaled at 100 TB; a sort + ``groupby(...).head(k)``
    per partition is C-speed.

    ``hot_keys``: iterable of hot key values (from ``skew_stats``).
    """
    import pyarrow as pa
    import ray

    from ..functions.pools import join_parts, task_stage

    hot_ref = ray.put(np.asarray(list(hot_keys)))
    nparts = join_parts()

    def _key_u64(keys: np.ndarray) -> np.ndarray:
        if np.issubdtype(keys.dtype, np.integer):
            with np.errstate(over="ignore"):
                return (keys.astype(np.uint64) * _MIX) >> np.uint64(17)
        return stable_hash_strings(keys)

    class Salt:
        def __init__(self, ref):
            self.hot = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t[key].to_numpy(zero_copy_only=False)
            is_hot = np.isin(keys, self.hot)
            # deterministic row salt: spread a hot key's rows over n_salt
            salt = np.where(
                is_hot,
                (np.arange(len(keys), dtype=np.int64) + keys) % n_salt,
                0,
            ).astype(np.int64)
            # first-exchange partition mixes the salt so a hot key's
            # rows land on n_salt distinct aggregators
            h = _key_u64(keys)
            gpart = ((h ^ (salt.astype(np.uint64) + np.uint64(1)) * _MIX)
                     % np.uint64(nparts)).astype(np.int32)
            return t.append_column("_salt", pa.array(salt)).append_column(
                "gpart", pa.array(gpart, pa.int32()))

    def local_topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        out = g.groupby([key, "_salt"], sort=False).head(k)
        keys = out[key].to_numpy()
        out = out.drop(columns=["gpart"]).copy()
        out["gpart"] = (_key_u64(keys) % np.uint64(nparts)).astype(np.int32)
        return out

    def final_topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return (g.groupby(key, sort=False).head(k)
                .drop(columns=["_salt", "gpart"]))

    from .exchange import exchange_map_groups

    salted = ds.map_batches(task_stage(Salt, hot_ref),
                            batch_format="pyarrow", zero_copy_batch=True)
    # local_topk rewrites gpart (salt removed) for the second exchange,
    # so the first exchange must keep the column (no drop_part_col)
    pre = exchange_map_groups(
        salted, "gpart", lambda g: local_topk_part(g.to_pandas()), nparts)
    return exchange_map_groups(
        pre, "gpart", lambda g: final_topk_part(g.to_pandas()), nparts)
