"""Sketch-family properties beyond the oracle gate: HLL estimator
accuracy at real cardinality, CMS one-sided error, EWMA exact dyadic
representability, z-score outliers vs a pure-pandas reference."""

import numpy as np
import pandas as pd
import pytest

import agr_loader_ray.pipelines.sketch_queries as sq

SF_DIR = "/root/testdata/sf0.001"


def _pdf(result):
    return result.to_pandas() if hasattr(result, "to_pandas") else result


def test_hll_accuracy_at_scale(ray_session, tmp_path):
    # 5000 true distinct keys — well above the raw-HLL bias regime
    # (n >> 2.5·m with m=64); standard error ≈ 1.04/√64 = 13 %
    rng = np.random.default_rng(7)
    uid = rng.integers(0, 5_000, size=40_000)
    uid = np.concatenate([uid, np.arange(5_000)])  # force exact n=5000
    df = pd.DataFrame({"user_id": uid, "event_type": "click"})
    df.to_parquet(tmp_path / "events.parquet")
    out = _pdf(sq.hll_distinct_estimate(str(tmp_path)))
    est = int(out["n_distinct_est"].iloc[0])
    assert abs(est - 5_000) / 5_000 < 0.40, est  # 3σ of the 1.04/√64 SE


def test_hll_deterministic(ray_session):
    a = _pdf(sq.hll_distinct_estimate(SF_DIR)).sort_values("event_type")
    b = _pdf(sq.hll_distinct_estimate(SF_DIR)).sort_values("event_type")
    assert (a["n_distinct_est"].to_numpy()
            == b["n_distinct_est"].to_numpy()).all()


def test_cms_one_sided_error(ray_session):
    est = _pdf(sq.cms_user_freq_estimate(SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    exact = ev.groupby("user_id").size()
    merged = est.set_index("user_id")["est_n"]
    assert set(merged.index) == set(exact.index)
    # CMS never underestimates
    assert (merged.reindex(exact.index) >= exact).all()


def test_ewma_exact_dyadic(ray_session):
    out = _pdf(sq.ewma_recent_score_per_user(SF_DIR))
    # every score is a dyadic rational with denominator ≤ 2^16:
    # score · 2^16 must be an exact integer (no rounding happened)
    scaled = out["ewma_score"].to_numpy() * (1 << sq._EWMA_W)
    assert np.array_equal(scaled, np.round(scaled))
    # reference recomputation per user (sequential, trusted-slow)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "value", "ts", "event_id"])
    ev = ev.sort_values(["ts", "event_id"], ascending=False)
    ref = {}
    for uid, g in ev.groupby("user_id"):
        c = np.round(g["value"].to_numpy()[:sq._EWMA_W] * 100)
        ref[uid] = float(sum(x / (1 << (i + 1)) for i, x in enumerate(c)))
    got = dict(zip(out["user_id"], out["ewma_score"]))
    assert got == ref


def test_zscore_outliers_vs_pandas(ray_session):
    out = _pdf(sq.zscore_outliers_per_type(SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "value"])
    c = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ref = {}
    for et, g in pd.DataFrame({"t": ev["event_type"], "c": c}).groupby("t"):
        n, s, q = len(g), int(g["c"].sum()), int((g["c"] ** 2).sum())
        mean = float(s) / float(n)
        sd = np.sqrt(float(n * q - s * s) / (float(n) * float(n)))
        k = int((np.abs(g["c"].to_numpy().astype(np.float64) - mean)
                 > 2.0 * sd).sum())
        if k:
            ref[et] = k
    got = dict(zip(out["event_type"], out["n_outliers"]))
    assert got == ref


def test_cube_internal_consistency(ray_session):
    out = sq.cube_order_counts(SF_DIR)
    finest = out[out["o_orderstatus"].notna()
                 & out["o_orderpriority"].notna()]
    grand = out[out["o_orderstatus"].isna() & out["o_orderpriority"].isna()]
    by_status = out[out["o_orderstatus"].notna()
                    & out["o_orderpriority"].isna()]
    by_prio = out[out["o_orderstatus"].isna()
                  & out["o_orderpriority"].notna()]
    assert len(grand) == 1
    for lvl in (by_status, by_prio, grand):
        assert lvl["n_orders"].sum() == finest["n_orders"].sum()
        assert lvl["rev_c"].sum() == finest["rev_c"].sum()


def test_full_outer_covers_both_sides(ray_session):
    out = _pdf(sq.full_outer_clicks_purchases(SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type"])
    clickers = set(ev[ev["event_type"] == "click"]["user_id"])
    buyers = set(ev[ev["event_type"] == "purchase"]["user_id"])
    assert set(out["user_id"]) == clickers | buyers
    assert (out["n_clicks"] >= 0).all() and (out["n_purchases"] >= 0).all()
    only_click = out[out["user_id"].isin(clickers - buyers)]
    assert (only_click["n_purchases"] == 0).all()


def test_pagerank_matches_sequential_reference(ray_session):
    import ray.data
    from agr_loader_ray.stages.pagerank import (DAMP_DEN, DAMP_NUM, SCALE,
                                                pagerank_integer)

    # tiny undirected triangle + pendant: 1-2, 2-3, 3-1, 3-4
    und = [(1, 2), (2, 3), (3, 1), (3, 4)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    got = pagerank_integer(ds, iterations=3).to_pandas()
    # sequential exact-integer reference
    import collections
    deg = collections.Counter(a for a, _ in edges)
    pr = {n: SCALE for n in deg}
    for _ in range(3):
        s = collections.Counter()
        for a, b in edges:
            s[b] += pr[a] // deg[a]
        pr = {n: ((DAMP_DEN - DAMP_NUM) * SCALE) // DAMP_DEN
              + (DAMP_NUM * s[n]) // DAMP_DEN for n in deg}
    assert dict(zip(got["node"], got["pr"])) == pr
    # hub (node 3, degree 3) outranks the pendant and the others
    assert pr[3] == max(pr.values()) and pr[4] == min(pr.values())


def test_histogram_quantile_brackets_exact(ray_session):
    out = _pdf(sq.histogram_quantile_per_type(SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "value"])
    c = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for _, row in out.iterrows():
        vals = np.sort(c[ev["event_type"].to_numpy() == row["event_type"]])
        for q, col in ((0.5, "p50_bin_c"), (0.9, "p90_bin_c")):
            exact = int(vals[int(np.ceil(q * len(vals))) - 1])
            lo = int(row[col])
            assert lo <= exact < lo + sq._HQ_BIN_C, (row["event_type"], q)


def test_weighted_sample_is_exact_topk(ray_session):
    out = _pdf(sq.weighted_sample_orders(SF_DIR))
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    key = orders["o_orderkey"].to_numpy()
    price_c = np.round(orders["o_totalprice"].to_numpy() * 100
                       ).astype(np.int64)
    prio = (sq._splitmix64_np(key).astype(np.float64)
            / price_c.astype(np.float64))
    want = np.lexsort((key, prio))[:sq._WS_K]
    assert list(out["o_orderkey"]) == list(key[want])
    # weighting bias: the sample's mean price exceeds the population's
    assert price_c[want].mean() > price_c.mean()
