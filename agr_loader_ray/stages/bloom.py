"""Distributed Bloom-filter semi-join prefilter.

The scale problem: a big×big semi-join ships the ENTIRE probe side
through an all-to-all exchange even when almost none of it survives.
A Bloom filter built over the (much smaller, but too big to broadcast
exactly) build side lets every probe task drop non-matching rows
BEFORE the exchange, shrinking the join input to survivors + a bounded
false-positive residue; an exact distributed ``left_semi`` join over
the survivors then removes the false positives, so results stay exact.

Build is fully distributed and bounded: per-batch sparse ``(word,
bits)`` partials → one bounded exchange keyed on ``word % n_buckets``
(OR-merge kernel per bucket) → the driver assembles the dense bitmap
(size = ``m_bits/8`` bytes, a CONFIGURED constant independent of input
size) and broadcasts it once with ``ray.put``.

Reference analogue: the reference prunes big scans with an
in-memory id set before its per-row resolution pass
(src/etl/helpers/etl_helper.py primary-id lookups); this is the
bounded-memory, broadcast-once distributed version.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash_k(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(k, n) Bloom bit positions via double hashing h1 + i·h2
    (Kirsch–Mitzenmacher construction) over an int64/uint64 key."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (x * _MIX1) ^ (x >> np.uint64(29))
        h2 = ((x ^ (x >> np.uint64(33))) * _MIX2) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def _sparse_words(keys: np.ndarray, k: int, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (word_idx int64, word_bits uint64) sparse OR-partial for keys."""
    idx = _hash_k(np.unique(keys), k, m_bits).ravel()
    order = np.argsort(idx >> np.uint64(6), kind="stable")
    sw = (idx >> np.uint64(6))[order]
    bits = np.uint64(1) << (idx & np.uint64(63))[order]
    starts = np.nonzero(np.concatenate(([True], sw[1:] != sw[:-1])))[0]
    return sw[starts].astype(np.int64), np.bitwise_or.reduceat(bits, starts)


def build_bloom(ds, key_col: str, m_bits: int = 1 << 20, k: int = 5,
                n_buckets: int = 64):
    """Build a Bloom bitmap over ``ds[key_col]`` (integer keys)
    distributedly; → ``(object_ref_to_bitmap, m_bits, k)``.

    Driver state is ≤ ``m_bits/64`` words regardless of input rows.
    """
    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({"w": pa.array([], pa.int64()),
                             "v": pa.array([], pa.uint64())})
        w, v = _sparse_words(keys, k, m_bits)
        return pa.table({"w": pa.array(w, pa.int64()),
                         "v": pa.array(v, pa.uint64())})

    def or_merge(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(w, kind="stable")
        sw, sv = w[order], v[order]
        starts = np.nonzero(np.concatenate(([True], sw[1:] != sw[:-1])))[0]
        return pa.table({"w": pa.array(sw[starts], pa.int64()),
                         "v": pa.array(np.bitwise_or.reduceat(sv, starts),
                                       pa.uint64())})

    sparse = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: t.append_column(
            "b", pa.array((t["w"].to_numpy(zero_copy_only=False)
                           % n_buckets).astype(np.int32))),
            batch_format="pyarrow")
        .groupby("b")
        .map_groups(lambda t: or_merge(t.drop_columns(["b"])),
                    batch_format="pyarrow")
    ).take_all()  # ≤ m_bits/64 rows — bounded by the filter size, not input

    bitmap = np.zeros(m_bits >> 6, dtype=np.uint64)
    for r in sparse:
        bitmap[r["w"]] |= np.uint64(r["v"])
    return ray.put(bitmap), m_bits, k


class BloomProbe:
    """Actor-pool ``map_batches`` stage: keep rows whose key MAY be in
    the filter (no false negatives; false positives removed by the
    exact confirm join downstream).  Bitmap fetched once per actor."""

    def __init__(self, bitmap_ref, key_col: str, m_bits: int, k: int):
        self.bitmap = ray.get(bitmap_ref)
        self.key_col, self.m_bits, self.k = key_col, m_bits, k

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t[self.key_col].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return t
        idx = _hash_k(keys, self.k, self.m_bits)
        words = self.bitmap[(idx >> np.uint64(6)).astype(np.int64)]
        hit = ((words >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
        return t.filter(pa.array(hit.all(axis=0)))


# ---- serialized micro-blooms (manifest data skipping) ----------------------
# The lake manifest stores one small Bloom per DELTA file over the
# file's (conv_id, turn_idx) key hashes, so a point lookup can skip
# deltas that cannot contain the key (Delta-Lake-style file stats,
# adapted to hash-partitioned keys where min/max on random keys prunes
# nothing).  Bases are always read — the bloom pays off on the
# merge-on-read delta chain.

FILE_BLOOM_M_BITS = 1 << 14  # 2 KiB per delta file in the manifest
FILE_BLOOM_K = 4


def bloom_hex_from_hashes(h: np.ndarray, m_bits: int = FILE_BLOOM_M_BITS,
                          k: int = FILE_BLOOM_K) -> str:
    """Dense bitmap hex over pre-hashed uint64 keys (double-hashed again
    per position — uniform even for structured inputs)."""
    bm = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(h):
        w, v = _sparse_words(h.astype(np.int64, copy=False), k, m_bits)
        bm[w] |= v
    return bm.tobytes().hex()


def bloom_hex_maybe_contains(hex_bits: str, h: np.uint64,
                             m_bits: int = FILE_BLOOM_M_BITS,
                             k: int = FILE_BLOOM_K) -> bool:
    """Membership probe of one pre-hashed key against a hex bitmap."""
    bm = np.frombuffer(bytes.fromhex(hex_bits), dtype=np.uint64)
    idx = _hash_k(np.asarray([h], dtype=np.uint64), k, m_bits).ravel()
    words = bm[(idx >> np.uint64(6)).astype(np.int64)]
    return bool((((words >> (idx & np.uint64(63))) & np.uint64(1)) == 1).all())
