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
