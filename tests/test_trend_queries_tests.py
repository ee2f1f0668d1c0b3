"""Rank/trend operators: typed-hash gate parity (the driver's compare)
plus independent numerical sanity checks (scipy-style Spearman,
brute-force Mann-Kendall / Theil-Sen)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


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


@pytest.mark.parametrize("name", ["spearman_corr_per_flag",
                                  "mann_kendall_theil_sen",
                                  "degree_assortativity",
                                  "iso_week_revenue",
                                  "rfm_segment_counts"])
def test_trend_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def test_spearman_matches_rank_pearson_reference():
    """Closed-form rank moments vs a direct pandas average-rank Pearson."""
    qs = entry.queries()
    res = qs["spearman_corr_per_flag"](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    raw = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    y = raw["l_extendedprice"].to_numpy()
    raw = raw.assign(x=raw["l_quantity"].astype(np.int64),
                     y=np.trunc(y + np.sign(y) * 0.5).astype(np.int64))
    for _, row in got.iterrows():
        g = raw[raw["l_returnflag"] == row["l_returnflag"]]
        rx = g["x"].rank(method="average").to_numpy()
        ry = g["y"].rank(method="average").to_numpy()
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(row["spearman_qp"] - ref) < 1e-9
        assert row["n"] == len(g)


def test_mann_kendall_brute_force_reference():
    """Vectorized pair kernel vs an O(d²) loop per user on raw data."""
    qs = entry.queries()
    got = qs["mann_kendall_theil_sen"](SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.assign(day=ev["ts"].astype("datetime64[us]").astype(np.int64)
                   // 86_400_000_000, x=cents)
    daily = ev.groupby(["user_id", "day"], as_index=False)["x"].sum()
    seen = 0
    for uid, g in daily.groupby("user_id"):
        g = g.sort_values("day")
        d, x = g["day"].to_numpy(), g["x"].to_numpy()
        s, slopes = 0, []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                s += int(np.sign(x[j] - x[i]))
                slopes.append((x[j] - x[i]) / (d[j] - d[i]))
        if not slopes:
            assert uid not in got.index
            continue
        seen += 1
        row = got.loc[uid]
        assert row["n_pairs"] == len(slopes)
        assert row["s_stat"] == s
        slopes.sort()
        assert row["sen_slope"] == slopes[(len(slopes) - 1) // 2]
    assert seen == len(got)


def test_degree_assortativity_reference():
    qs = entry.queries()
    res = qs["degree_assortativity"](SF)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    e = li.drop_duplicates()
    dp = e.groupby("l_partkey").size()
    dsup = e.groupby("l_suppkey").size()
    x = dp.loc[e["l_partkey"]].to_numpy(np.float64)
    y = dsup.loc[e["l_suppkey"]].to_numpy(np.float64)
    assert got["n"] == len(e)
    assert abs(got["assortativity"] - np.corrcoef(x, y)[0, 1]) < 1e-9


def test_iso_week_boundary_days():
    """ISO-week grouping puts early-January orders in the prior ISO year
    when they fall in week 52/53 — verify against pandas isocalendar."""
    qs = entry.queries()
    got = qs["iso_week_revenue"](SF).to_pandas()
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    iso = o["o_orderdate"].dt.isocalendar()
    ref = (o.assign(iso_year=iso["year"].astype(np.int64),
                    iso_week=iso["week"].astype(np.int64),
                    cents=np.round(o["o_totalprice"].to_numpy() * 100)
                    .astype(np.int64))
           .groupby(["iso_year", "iso_week"], as_index=False)
           .agg(n_orders=("cents", "size"), revenue_cents=("cents", "sum")))
    m = got.merge(ref, on=["iso_year", "iso_week"], suffixes=("", "_ref"))
    assert len(m) == len(got) == len(ref)
    assert (m["n_orders"] == m["n_orders_ref"]).all()
    assert (m["revenue_cents"] == m["revenue_cents_ref"]).all()
    # the dataset spans New-Year boundaries: assert at least one order's
    # iso_year differs from its calendar year
    assert (iso["year"].to_numpy() != o["o_orderdate"].dt.year.to_numpy()).any()
