"""Bloom-filter semi-join stage: no false negatives ever; false-positive
rate bounded near the theoretical (1 - e^{-kn/m})^k for the configured
geometry; distributed build ≡ single-pass reference bitmap."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from agr_loader_ray.stages.bloom import BloomProbe, _hash_k, _sparse_words, build_bloom


def _dense_from_keys(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    bm = np.zeros(m_bits >> 6, dtype=np.uint64)
    w, v = _sparse_words(keys, k, m_bits)
    bm[w] |= v
    return bm


def test_build_matches_reference_bitmap():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=5_000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    ref, m_bits, k = build_bloom(ds, "k", m_bits=1 << 16, k=4, n_buckets=8)
    got = ray.get(ref)
    want = _dense_from_keys(keys, 4, 1 << 16)
    assert np.array_equal(got, want)


def test_probe_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(11)
    members = rng.choice(1 << 30, size=2_000, replace=False).astype(np.int64)
    non_members = np.setdiff1d(
        rng.choice(1 << 30, size=20_000, replace=False).astype(np.int64), members)
    m_bits, k = 1 << 16, 5
    bm_ref = ray.put(_dense_from_keys(members, k, m_bits))
    probe = BloomProbe(bm_ref, "k", m_bits, k)

    t_mem = pa.table({"k": pa.array(members, pa.int64())})
    assert probe(t_mem).num_rows == len(members)  # zero false negatives

    t_non = pa.table({"k": pa.array(non_members, pa.int64())})
    fp = probe(t_non).num_rows / len(non_members)
    n, m = len(members), m_bits
    theory = (1 - np.exp(-k * n / m)) ** k
    assert fp <= max(3 * theory, 0.02), (fp, theory)


def test_hash_positions_in_range_and_spread():
    keys = np.arange(10_000, dtype=np.int64)
    idx = _hash_k(keys, 3, 1 << 12)
    assert idx.shape == (3, 10_000)
    assert idx.max() < (1 << 12)
    # occupancy sanity: 30k draws over 4096 bins should touch most bins
    assert len(np.unique(idx)) > 3_500


def test_empty_build_side():
    ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    ref, m_bits, k = build_bloom(ds, "k", m_bits=1 << 12, k=3, n_buckets=4)
    bm = ray.get(ref)
    assert not bm.any()
    probe = BloomProbe(ref, "k", m_bits, k)
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    assert probe(t).num_rows == 0  # empty filter admits nothing
