"""Typed-hash gate pins + kernel properties for the time-series batch
(gap-fill resample, weighted median, rolling z-score, debounce)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

PINNED = [
    "gap_fill_hourly",
    "weighted_median_price",
    "rolling_zscore_outliers",
    "debounce_dedup_events",
    "last_touch_attribution",
    "daily_revenue_growth",
    "data_quality_audit",
    "time_to_conversion",
    "ma_crossover_signals",
    "multimodal_image_augment",
    "benford_leading_digit",
    "chi2_type_weekday",
    "winsorized_stats_per_flag",
    "cep_pattern_counts",
    "entity_resolution_clusters",
    "sliding_distinct_types",
    "rolling_median9_per_user",
    "ab_test_stats_price",
    "lag1_autocorrelation",
    "churn_labels_weekly",
    "multimodal_audio_windows",
    "bounce_rate_daily",
    "frequent_part_pairs",
    "association_rules",
    "top_journey_prefixes",
    "new_vs_returning_daily",
    "centroid_distance_matrix",
    "gini_per_priority",
    "kaplan_meier_risk_table",
    "naive_forecast_backtest",
    "purchase_streaks",
    "data_mix_quota_sample",
    "abc_classification",
    "dag_depth_levels",
    "roc_points_value",
    "cohort_ltv_matrix",
    "funnel_steps_table",
    "corr_matrix_lineitem",
    "inter_event_gap_quantiles",
    "hhi_supplier_concentration",
    "twap_value_per_user",
    "frequency_moments_users",
    "decile_lift_value",
    "running_balance_floor_per_user",
    "calibration_bins_value",
    "welch_t_purchase_vs_view",
    "cdc_chunk_dedup_stats",
]


def _typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", PINNED)
def test_timeseries_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def test_gap_fill_densify_properties():
    """Every user's series is a contiguous hourly grid from their first
    to their last event hour; filled hours sum to the input totals."""
    df = entry.queries()["gap_fill_hourly"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    for uid, g in df.groupby("user_id"):
        hrs = g["hour"].sort_values().to_numpy()
        assert hrs[0] == ev.loc[ev.user_id == uid, "hour"].min()
        assert hrs[-1] == ev.loc[ev.user_id == uid, "hour"].max()
        diffs = np.diff(hrs.astype("datetime64[us]").astype(np.int64))
        assert (diffs == 3_600_000_000).all()
    assert df["n_events"].sum() == len(ev)
    assert df["cents"].sum() == int(np.round(ev["value"] * 100).sum())


def test_weighted_median_definition():
    """Lower weighted median: smallest v with cum weight >= ceil(W/2),
    checked against an explicit expansion (repeat each value qty times)."""
    df = entry.queries()["weighted_median_price"](SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["cents"] = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    li["qty"] = li["l_quantity"].astype(np.int64)
    for _, row in df.iterrows():
        sub = li[li["l_returnflag"] == row["l_returnflag"]]
        expanded = np.sort(np.repeat(sub["cents"].to_numpy(),
                                     sub["qty"].to_numpy()))
        w = len(expanded)
        assert row["total_qty"] == w
        assert row["wmedian_cents"] == expanded[(w + 1) // 2 - 1]


def test_rolling_zscore_matches_sequential_reference():
    """The vectorized cumsum-difference kernel == a plain per-user
    sequential evaluation of the integer test."""
    df = entry.queries()["rolling_zscore_outliers"](SF).to_pandas() \
        .set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in ev.groupby("user_id"):
        x = g["cents"].to_numpy()
        nw = no = 0
        for i in range(8, len(x)):
            win = x[i - 8:i]
            s, q = int(win.sum()), int((win * win).sum())
            nw += 1
            if (8 * int(x[i]) - s) ** 2 > 4 * (8 * q - s * s):
                no += 1
        assert df.loc[uid, "n_windows"] == nw
        assert df.loc[uid, "n_outliers"] == no


def test_mann_whitney_u_matches_brute_force():
    """U2 == 2·Σ_{a,r} [a>r] + Σ [a==r] by direct pair enumeration."""
    import numpy as np

    res = entry.queries()["ab_test_stats_price"](SF)
    row = (res.to_pandas() if hasattr(res, "to_pandas") else res).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cents = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    a = cents[li["l_returnflag"] == "A"].to_numpy()
    r = cents[li["l_returnflag"] == "R"].to_numpy()
    gt = (a[:, None] > r[None, :]).sum()
    eq = (a[:, None] == r[None, :]).sum()
    assert row["u2"] == 2 * gt + eq
    assert row["n_a"] == len(a) and row["n_r"] == len(r)
    # KS numerator via brute force over the merged domain
    dom = np.unique(np.r_[a, r])
    cum_a = np.searchsorted(np.sort(a), dom, side="right")
    cum_r = np.searchsorted(np.sort(r), dom, side="right")
    assert row["ks_num"] == np.abs(
        cum_a * len(r) - cum_r * len(a)).max()
