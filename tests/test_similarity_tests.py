"""Similarity-search tests: brute-force exactness vs numpy oracle, LSH recall."""

import numpy as np
import pyarrow as pa

import ray.data

from agr_loader_ray.stages.similarity import (
    brute_force_topk,
    cosine_scores,
    knn_recall,
    lsh_bucketed_topk,
)


def _embeddings(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    flat = pa.array(mat.reshape(-1), pa.float32())
    col = pa.FixedSizeListArray.from_arrays(flat, d).cast(pa.list_(pa.float32()))
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)), "embedding": col}), mat


def test_brute_force_matches_numpy_oracle():
    tbl, mat = _embeddings()
    q = mat[0].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    got = brute_force_topk(ds, q, k=10).to_pandas()
    sims = np.round(cosine_scores(mat.astype(np.float64), q), 6)
    order = np.lexsort((np.arange(len(sims)), -sims))[:10]
    assert got["vec_id"].tolist() == order.tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), sims[order], atol=1e-9)


def test_lsh_topk_recall():
    tbl, mat = _embeddings(n=500)
    q = mat[1].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    approx = lsh_bucketed_topk(ds, q, k=10, n_planes=6, probe_hamming=2).to_pandas()
    assert knn_recall(approx, exact) >= 0.5  # probed ~22% of buckets


def test_ivf_topk_recall_and_self_hit():
    from agr_loader_ray.stages.similarity import ivf_topk

    tbl, mat = _embeddings(n=500)
    q = mat[2].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    approx = ivf_topk(ds, q, k=10, n_cells=16, n_probe=6).to_pandas()
    # the query vector itself lives in some cell; probing its own cell
    # must return it with sim 1.0 at rank 1
    assert approx["vec_id"].iloc[0] == 2 and approx["sim"].iloc[0] == 1.0
    assert knn_recall(approx, exact) >= 0.5  # probed 6/16 cells


def test_ivf_index_assign_consistency():
    from agr_loader_ray.stages.similarity import IVFIndex

    rng = np.random.default_rng(5)
    sample = rng.standard_normal((300, 8))
    idx = IVFIndex(sample, n_cells=8, seed=7)
    a1 = idx.assign(sample[:50])
    a2 = idx.assign(sample[:50])
    assert (a1 == a2).all() and a1.min() >= 0 and a1.max() < 8
    # probe order: nearest centroid first
    q = sample[0]
    cells = idx.probe_cells(q, 3)
    d2 = ((idx.centroids - q[None, :]) ** 2).sum(axis=1)
    assert d2[cells[0]] == d2.min()


def test_multi_query_topk_matches_per_query_brute_force():
    """One-scan batched scoring must equal Q independent brute-force
    top-k runs (self-match excluded on both sides)."""
    from agr_loader_ray.stages.similarity import multi_query_topk, round_half_away

    tbl, mat = _embeddings(n=150, d=8, seed=9)
    qids = np.array([3, 7, 11], dtype=np.int64)
    qmat = mat[qids].astype(np.float64)
    got = multi_query_topk(ray.data.from_arrow(tbl), qids, qmat,
                           k=5).reset_index(drop=True)
    m64 = mat.astype(np.float64)
    for qi, qv in zip(qids, qmat):
        sims = round_half_away(cosine_scores(m64, qv), 6)
        ids = np.arange(len(m64))
        mask = ids != qi
        order = np.lexsort((ids[mask], -sims[mask]))[:5]
        want_ids = ids[mask][order]
        want_sims = sims[mask][order]
        sub = got[got["query_id"] == qi].reset_index(drop=True)
        assert sub["vec_id"].tolist() == want_ids.tolist()
        np.testing.assert_allclose(sub["sim"].to_numpy(), want_sims)


def test_quantized_rerank_shortlist_and_exactness():
    """Stage-2 re-rank must equal exact brute-force top-k whenever the
    quantized shortlist contains the true top-k (it does here: int8
    max-abs error is far below this corpus's score gaps), and the
    approximate score must be the dequantized cosine."""
    from agr_loader_ray.stages.similarity import quantized_rerank_topk, round_half_away

    tbl, mat = _embeddings(n=150, d=8, seed=5)
    q = mat[0].astype(np.float64)
    got = quantized_rerank_topk(ray.data.from_arrow(tbl), q, k=10, shortlist=50)
    m64 = mat.astype(np.float64)
    sims = round_half_away(cosine_scores(m64, q), 6)
    ids = np.arange(len(m64))
    order = np.lexsort((ids, -sims))[:10]
    assert got["vec_id"].tolist() == ids[order].tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), sims[order])
    # asim is the dequantized-cosine (mirrored op order (code*m)/127)
    mm = np.abs(m64).max(axis=1)
    ms = np.where(mm == 0, 1.0, mm)
    scaled = m64 / ms[:, None] * 127.0
    dq = (np.trunc(scaled + np.sign(scaled) * 0.5) * ms[:, None]) / 127.0
    asims = round_half_away(cosine_scores(dq, q), 6)
    lookup = dict(zip(ids.tolist(), asims.tolist()))
    np.testing.assert_allclose(
        got["asim"].to_numpy(), [lookup[i] for i in got["vec_id"]])
