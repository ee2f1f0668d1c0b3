"""Random-input typed-hash gate for the event-series kernels.

Hypothesis drives small adversarial events tables (duplicate
timestamps, single-event users, all-one-type users) through BOTH the
Ray pipeline and its DuckDB oracle — the same compare the driver runs,
but on inputs the fixtures can't reach."""

import os

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings

import __ray_entry__ as entry

QUERIES = [
    "debounce_dedup_events",
    "rolling_zscore_outliers",
    "ma_crossover_signals",
    "time_to_conversion",
    "last_touch_attribution",
    "gap_fill_hourly",
    "daily_revenue_growth",
    "cep_pattern_counts",
    "sliding_distinct_types",
    "rolling_median9_per_user",
    "lag1_autocorrelation",
    "churn_labels_weekly",
    "bounce_rate_daily",
    "new_vs_returning_daily",
    "kaplan_meier_risk_table",
    "purchase_streaks",
    "roc_points_value",
    "cohort_ltv_matrix",
    "funnel_steps_table",
    "interp_resample_hourly",
    "attribution_linear",
    "twap_value_per_user",
    "running_balance_floor_per_user",
]

_TYPES = ["view", "click", "purchase", "signup", "error"]


@st.composite
def events_frame(draw):
    n = draw(st.integers(min_value=5, max_value=120))  # ≥5: every type fits
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n_users = draw(st.integers(min_value=1, max_value=4))
    # coarse ts grid → frequent duplicate timestamps (tie-break paths)
    ts_us = rng.integers(0, 40, size=n) * 3_600_000_000 \
        + rng.integers(0, 4, size=n) * 250_000
    types = np.array(_TYPES, object)[rng.integers(0, 5, size=n)]
    # guarantee every type appears (an all-but-empty projection exposes
    # a Ray empty-aggregate schema artifact, not a kernel bug — the
    # real tables always carry all five types)
    types[: min(n, 5)] = np.array(_TYPES, object)[: min(n, 5)]
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts_us, unit="us").astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": types,
        "value": np.round(rng.uniform(0.01, 400.0, size=n), 2),
        "props": np.array(['{"k": 1}'] * n, object),
    })


def _typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    # value semantics for signed zeros: the random harness hits exact
    # epsilon ties where one engine's float path lands on -0.0 and the
    # other's on +0.0 (equal values, different bit patterns — pandas
    # hashes bits); the driver's fixture SFs never produce such ties
    import numpy as _np
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].to_numpy()
            df[c] = _np.where(v == 0, 0.0, v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


@pytest.mark.parametrize("name", QUERIES)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(frame=events_frame())
def test_random_events_match_oracle(name, frame, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("sf"))
    frame.to_parquet(os.path.join(sf, "events.parquet"), index=False)
    got = entry.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.sql(entry.oracle_sql()[name]).arrow().to_pandas()
    con.close()
    assert len(got) == len(want)
    if len(got) == 0:
        # equal-and-empty passes: an empty Ray Dataset drops its schema
        # (the documented framework artifact), so there is no dtype
        # tuple to compare — emptiness agreement is the property
        return
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], (dict(got.dtypes.astype(str)),
                          dict(want.dtypes.astype(str)))
    assert g[1] == w[1]


# --------------------------------------------------------------------------
# order-statistics kernels over random lineitem tables (quantile ties,
# tiny groups, all-equal prices)
# --------------------------------------------------------------------------
LI_QUERIES = ["weighted_median_price", "winsorized_stats_per_flag"]


@st.composite
def lineitem_frame(draw):
    n = draw(st.integers(min_value=3, max_value=150))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    # few distinct prices → heavy ties at the quantile boundaries
    n_prices = draw(st.integers(min_value=1, max_value=8))
    prices = np.round(rng.uniform(1.0, 500.0, size=n_prices), 2)
    flags = np.array(["A", "N", "R"], object)[rng.integers(0, 3, size=n)]
    flags[:3] = np.array(["A", "N", "R"], object)  # every group present
    return pd.DataFrame({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_returnflag": flags,
        "l_extendedprice": prices[rng.integers(0, n_prices, size=n)],
        "l_quantity": rng.integers(1, 51, size=n).astype(np.float64),
    })


@pytest.mark.parametrize("name", LI_QUERIES)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(frame=lineitem_frame())
def test_random_lineitem_match_oracle(name, frame, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("sf"))
    frame.to_parquet(os.path.join(sf, "lineitem.parquet"), index=False)
    got = entry.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(entry.oracle_sql()[name]).arrow().to_pandas()
    con.close()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]
