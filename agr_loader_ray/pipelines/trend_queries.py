"""Rank/trend statistics operators (SURVEY §2.7 aggregate-family
extensions): Spearman rank correlation, Mann-Kendall trend + Theil-Sen
slope, graph degree assortativity, ISO-week calendar aggregation.

Same contract as ``stats_queries.py``: every aggregation is exact
integer (counts, rank sums, sign sums); the only float arithmetic is a
closed-form evaluation once per output row, mirrored op-for-op in the
DuckDB oracle so typed value-hashes match bit-for-bit.

Reference provenance: the reference's grouped QC summaries
(src/etl/summary_etl.py) and resolver tie-break ordering
(src/etl/helpers/resolver_helper.py) are the operator family these
rank-based diagnostics extend in a training-data setting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.tables import read_table
from ..stages.partition import int_key_part_col
from .queries import _cents, _join_parts, query

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# spearman_corr_per_flag — grouped Spearman rank correlation (quantity vs
# whole-dollar price per returnflag) with AVERAGE ranks for ties.  The
# scale path avoids any global per-flag sort: ranks are derived from a
# per-(flag, value) histogram (one small exchange — distinct quantities
# ≤ ~50, distinct whole-dollar prices bounded), the avg-rank maps are
# broadcast, and a second streaming pass emits exact int64 moment sums
# over DOUBLED average ranks (2·avg is always integer: 2·rank_min +
# tie_count − 1).  One float evaluation per flag, mirrored in SQL.
# Σ(2r)² ≤ 4n³ stays in int64 through sf0.1 bench scale; beyond that the
# corr_matrix limb-split applies (stats_queries._limb_cols).
# ---------------------------------------------------------------------------
@query(
    "spearman_corr_per_flag",
    """
    WITH v AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem),
    r AS (
      SELECT l_returnflag,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
                  + count(*) OVER (PARTITION BY l_returnflag, x) - 1
                  AS BIGINT) AS rx,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
                  + count(*) OVER (PARTITION BY l_returnflag, y) - 1
                  AS BIGINT) AS ry
      FROM v),
    m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy
      FROM r GROUP BY l_returnflag)
    SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS spearman_qp
    FROM m ORDER BY l_returnflag
    """,
)
def spearman_corr_per_flag(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _xy(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        yf = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        y = np.trunc(yf + np.sign(yf) * 0.5).astype(np.int64)
        return flag, x, y

    # pass 1: per-(flag, col, value) partial counts — ONE small exchange
    def hist_partial(t: pa.Table) -> pa.Table:
        flag, x, y = _xy(t)
        fx = pd.DataFrame({"flag": flag, "col": "x", "v": x})
        fy = pd.DataFrame({"flag": flag, "col": "y", "v": y})
        g = (pd.concat([fx, fy])
             .groupby(["flag", "col", "v"], as_index=False, sort=False)
             .size().rename(columns={"size": "c"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    # driver fold of the per-batch partials: the rank maps are built on
    # the driver regardless, so a Ray groupby exchange before the pull
    # is pure overhead (~2 s of sort at sf0.1 — the partial rows are
    # the same |flags| × (|distinct qty| + |distinct $|) envelope)
    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["flag", "col", "v"], as_index=False)["c"].sum()
        .rename(columns={"c": "sum(c)"})
    )
    from ..functions.bounds import assert_bounded
    assert_bounded(len(hist), "spearman rank histogram")

    # doubled average rank per (flag, col, value):  2·cumbefore + c + 1
    rank_maps: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
    for (fl, col), g in hist.groupby(["flag", "col"]):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        c = g["sum(c)"].to_numpy(np.int64)
        before = np.concatenate(([0], np.cumsum(c)[:-1]))
        rank_maps[(fl, col)] = (v, 2 * before + c + 1)
    maps_ref = ray.put(rank_maps)

    # pass 2: exact int64 moment partials over doubled avg ranks
    def moments(t: pa.Table) -> pa.Table:
        maps = ray.get(maps_ref)
        flag, x, y = _xy(t)
        rx = np.empty(len(x), np.int64)
        ry = np.empty(len(y), np.int64)
        for fl in np.unique(flag):
            m = flag == fl
            vx, dx = maps[(fl, "x")]
            vy, dy = maps[(fl, "y")]
            rx[m] = dx[np.searchsorted(vx, x[m])]
            ry[m] = dy[np.searchsorted(vy, y[m])]
        part = pa.table({
            "l_returnflag": pa.array(flag),
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(rx), "sy": pa.array(ry),
            "sxy": pa.array(rx * ry), "sxx": pa.array(rx * rx),
            "syy": pa.array(ry * ry),
        })
        return part.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])

    def mom_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("l_returnflag").aggregate(
            [(f"{c}_sum", "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         **{f"{c}_sum": g[f"{c}_sum_sum"].cast(pa.int64())
                            for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}})

    def finish(t: pa.Table) -> pa.Table:
        cols = {c: t[f"{c}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
        n, sx, sy = cols["n"], cols["sx"], cols["sy"]
        sxy, sxx, syy = cols["sxy"], cols["sxx"], cols["syy"]
        sp = (n.astype(np.float64) * sxy.astype(np.float64)
              - sx.astype(np.float64) * sy.astype(np.float64)) \
            / (np.sqrt(n.astype(np.float64) * sxx.astype(np.float64)
                       - sx.astype(np.float64) * sx.astype(np.float64))
               * np.sqrt(n.astype(np.float64) * syy.astype(np.float64)
                         - sy.astype(np.float64) * sy.astype(np.float64)))
        return pa.table({"l_returnflag": t["l_returnflag"],
                         **{k: pa.array(v) for k, v in cols.items()},
                         "spearman_qp": pa.array(sp)})

    # |flags| moment rows: combine tree + one driver finish, no shuffle
    from ..stages.quantiles import _collect_tree

    out = finish(_collect_tree(
        ds.map_batches(moments, batch_format="pyarrow",
                       zero_copy_batch=True),
        mom_combine)).to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ---------------------------------------------------------------------------
# mann_kendall_theil_sen — per-user monotonic-trend diagnostics over the
# DAILY value series: Mann-Kendall S = Σ_{i<j} sign(x_j − x_i) (exact
# integer) and the Theil-Sen slope = the quantile_disc-median of all
# pairwise slopes (an ELEMENT of the slope set — each slope is ONE IEEE
# division of exact integers, so selection is bit-stable; no float sums
# anywhere).  Daily pre-aggregation bounds each user's series (≤ days in
# the window), so the O(d²) pair expansion is per-group-tiny while the
# user dimension streams through a single hash exchange.  Pair expansion
# is offset-math vectorized — no per-row Python.
# ---------------------------------------------------------------------------
@query(
    "mann_kendall_theil_sen",
    f"""
    WITH d AS (
      SELECT user_id,
             CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.user_id,
             CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
             CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM d a JOIN d b ON a.user_id = b.user_id AND b.day > a.day)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(sgn) AS BIGINT) AS s_stat,
           quantile_disc(slope, 0.5) AS sen_slope
    FROM p GROUP BY user_id ORDER BY user_id
    """,
)
def mann_kendall_theil_sen(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    nparts = _join_parts()

    def daily_partial(t: pa.Table) -> pa.Table:
        part = pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "x": _cents(t["value"]),
        })
        return part.group_by(["user_id", "day"]).aggregate([("x", "sum")])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        n = len(g)
        # group starts → all (i < j) index pairs within each user
        new = np.ones(n, bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        cnt = np.arange(n) - starts          # left-partners per right row j
        j_idx = np.repeat(np.arange(n), cnt)
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame({"user_id": uid[:0],
                                 "n_pairs": np.empty(0, np.int64),
                                 "s_stat": np.empty(0, np.int64),
                                 "sen_slope": np.empty(0, np.float64)})
        i_idx = (np.arange(total)
                 - np.repeat(np.cumsum(cnt) - cnt, cnt)
                 + np.repeat(starts, cnt))
        dx = x[j_idx] - x[i_idx]
        slope = dx.astype(np.float64) / (day[j_idx] - day[i_idx]).astype(np.float64)
        pairs = pd.DataFrame({"user_id": uid[j_idx],
                              "sgn": np.sign(dx).astype(np.int64),
                              "slope": slope})
        # quantile_disc(0.5): element at floor((n−1)/2) of the sorted set
        pairs = pairs.sort_values(["user_id", "slope"], kind="mergesort")
        u = pairs["user_id"].to_numpy()
        gnew = np.ones(len(u), bool)
        gnew[1:] = u[1:] != u[:-1]
        gstart = np.flatnonzero(gnew)
        gcnt = np.diff(np.append(gstart, len(u)))
        med = pairs["slope"].to_numpy()[gstart + (gcnt - 1) // 2]
        s = pairs.groupby("user_id", sort=True)["sgn"].sum().to_numpy(np.int64)
        return pd.DataFrame({"user_id": u[gstart], "n_pairs": gcnt.astype(np.int64),
                             "s_stat": s, "sen_slope": med})

    return (
        ds.map_batches(daily_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"]).sum("x_sum")
        .map_batches(lambda t: int_key_part_col(
            t.rename_columns(["user_id", "day", "x"]), "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True)  # sum(x_sum) → x
        .groupby("gpart")
        .map_groups(kernel, batch_format="pandas")
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# degree_assortativity — Pearson correlation of endpoint degrees across
# the DISTINCT part–supplier edge set (do high-degree parts source from
# high-degree suppliers?).  One edge-keyed exchange builds the distinct
# edge set (materialized once, reused by three consumers); both degree
# tables are small and broadcast via ray.put; moments are exact int64.
# ---------------------------------------------------------------------------
@query(
    "degree_assortativity",
    """
    WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    dp AS (SELECT p, CAST(count(*) AS BIGINT) AS dp FROM e GROUP BY p),
    dsup AS (SELECT s, CAST(count(*) AS BIGINT) AS ds FROM e GROUP BY s),
    j AS (SELECT dp.dp AS x, dsup.ds AS y
          FROM e JOIN dp USING (p) JOIN dsup USING (s)),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM j)
    SELECT n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS assortativity
    FROM m
    """,
)
def degree_assortativity(sf_dir: str):
    from ..stages.exchange import exchange_map_groups

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    nparts = _join_parts()

    # ONE task exchange on the packed edge key replaces the former four
    # sort shuffles (distinct-edge groupby + two per-endpoint degree
    # groupbys + the single-group moment sum): per-batch distinct
    # combiner, bucketing exchange, in-partition unique; degrees and
    # moments fold driver-side (endpoint domains are catalog-bounded).
    def batch_distinct(t: pa.Table) -> pa.Table:
        from ..functions.bounds import checked_pack

        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(checked_pack(p, s, 31, "degree_assortativity edge key"))
        return pa.table({
            "key": pa.array(key),
            "gpart": pa.array((key % nparts).astype(np.int32)),
        })

    def distinct_part(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy(zero_copy_only=False)) \
            if g.num_rows else np.empty(0, np.int64)
        return pa.table({
            "l_partkey": pa.array(key >> np.int64(31)),
            "l_suppkey": pa.array(key & np.int64((1 << 31) - 1)),
        })

    edges = exchange_map_groups(
        ds.map_batches(batch_distinct, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", distinct_part, nparts, drop_part_col=True,
    ).materialize()  # ≤ |distinct pairs|, reused by 2 consumers

    def deg_partial(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        kp, cp = np.unique(p, return_counts=True)
        ks, cs = np.unique(s, return_counts=True)
        return pa.table({
            "side": pa.array(np.r_[np.zeros(len(kp), np.int8),
                                   np.ones(len(ks), np.int8)]),
            "k": pa.array(np.r_[kp, ks]),
            "c": pa.array(np.r_[cp, cs].astype(np.int64)),
        })

    degs = edges.map_batches(deg_partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas() \
        .groupby(["side", "k"], as_index=False)["c"].sum()  # catalog-bounded
    from ..functions.bounds import assert_bounded
    assert_bounded(len(degs), "assortativity degree table")

    def _side(side: int) -> tuple[np.ndarray, np.ndarray]:
        d = degs[degs["side"] == side].sort_values("k")
        return d["k"].to_numpy(np.int64), d["c"].to_numpy(np.int64)

    deg_ref = ray.put({"p": _side(0), "s": _side(1)})

    def moments(t: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp, dp = deg["p"]
        ks, dsv = deg["s"]
        x = dp[np.searchsorted(kp, p)]
        y = dsv[np.searchsorted(ks, s)]
        return pa.table({
            "n": pa.array([np.int64(len(x))]),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxy": pa.array([(x * y).sum()]),
            "sxx": pa.array([(x * x).sum()]), "syy": pa.array([(y * y).sum()]),
        })

    m = edges.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas().sum()
    n, sx, sy = (np.int64(m["n"]), np.int64(m["sx"]), np.int64(m["sy"]))
    sxy, sxx, syy = (np.int64(m["sxy"]), np.int64(m["sxx"]),
                     np.int64(m["syy"]))
    r = (np.float64(n) * np.float64(sxy) - np.float64(sx) * np.float64(sy)) \
        / (np.sqrt(np.float64(n) * np.float64(sxx)
                   - np.float64(sx) * np.float64(sx))
           * np.sqrt(np.float64(n) * np.float64(syy)
                     - np.float64(sy) * np.float64(sy)))
    return pd.DataFrame({"n": [n], "sx": [sx], "sy": [sy], "sxy": [sxy],
                         "sxx": [sxx], "syy": [syy],
                         "assortativity": [np.float64(r)]})


# ---------------------------------------------------------------------------
# iso_week_revenue — calendar-correct ISO-8601 (year, week) aggregation
# of order revenue: the year boundary weeks land in the NEIGHBORING iso
# year (e.g. 1995-01-01 is 1994-W52), which naive year(date)/week math
# gets wrong.  Per-batch partials compute the ISO calendar once per
# DISTINCT day (np.unique then take-back), so the vectorized cost is
# bounded by the date span, not the row count.
# ---------------------------------------------------------------------------
@query(
    "iso_week_revenue",
    """
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def iso_week_revenue(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
               // _DAY_US)
        uday, inv = np.unique(day, return_inverse=True)
        iso = pd.to_datetime(uday, unit="D").isocalendar()
        part = pa.table({
            "iso_year": pa.array(iso["year"].to_numpy(np.int64)[inv]),
            "iso_week": pa.array(iso["week"].to_numpy(np.int64)[inv]),
            "n_orders": pa.array(np.ones(len(day), np.int64)),
            "revenue_cents": _cents(t["o_totalprice"]),
        })
        return part.group_by(["iso_year", "iso_week"]).aggregate(
            [("n_orders", "sum"), ("revenue_cents", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "iso_year": t["iso_year"], "iso_week": t["iso_week"],
            "n_orders": pc.cast(t["sum(n_orders_sum)"], pa.int64()),
            "revenue_cents": pc.cast(t["sum(revenue_cents_sum)"], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["iso_year", "iso_week"])
        .sum(["n_orders_sum", "revenue_cents_sum"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["iso_year", "iso_week"])
    )


# ---------------------------------------------------------------------------
# rfm_segment_counts — RFM customer segmentation (the classic marketing /
# training-label featurization): per customer Recency (days from last
# order to the corpus anchor), Frequency (orders), Monetary (exact
# cents), each cut into tertiles at the EXACT quantile_disc elements,
# segment code = R·100 + F·10 + M, output segment sizes + revenue.
# Shape: one customer-keyed exchange builds the bounded per-customer
# table (materialized once, three consumers); tertile thresholds come
# from ONE value-histogram pass (distinct counts bounded by the customer
# dimension — beyond driver memory the histogram-refine machinery in
# stages/quantiles.py computes the same ranks without the pull);
# segment scoring is a broadcast-threshold streaming pass.
# DuckDB quantile_disc rank = ceil(q·n) − 1 (stages/quantiles.py).
# ---------------------------------------------------------------------------
@query(
    "rfm_segment_counts",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST((SELECT epoch_us(max(o_orderdate)) // 86400000000
                   FROM orders)
                  - epoch_us(max(o_orderdate)) // 86400000000 AS BIGINT)
               AS r_days,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m
      FROM orders GROUP BY o_custkey),
    q AS (SELECT quantile_disc(r_days, 1.0/3) AS r1,
                 quantile_disc(r_days, 2.0/3) AS r2,
                 quantile_disc(f, 1.0/3) AS f1,
                 quantile_disc(f, 2.0/3) AS f2,
                 quantile_disc(m, 1.0/3) AS m1,
                 quantile_disc(m, 2.0/3) AS m2
          FROM cust)
    SELECT CAST((CASE WHEN r_days <= r1 THEN 3
                      WHEN r_days <= r2 THEN 2 ELSE 1 END) * 100
              + (CASE WHEN f <= f1 THEN 1
                      WHEN f <= f2 THEN 2 ELSE 3 END) * 10
              + (CASE WHEN m <= m1 THEN 1
                      WHEN m <= m2 THEN 2 ELSE 3 END) AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m) AS BIGINT) AS total_cents
    FROM cust, q GROUP BY 1 ORDER BY 1
    """,
)
def rfm_segment_counts(sf_dir: str):
    from ..stages.quantiles import quantile_disc_rank

    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        part = pa.table({
            "o_custkey": t["o_custkey"],
            "f": pa.array(np.ones(t.num_rows, np.int64)),
            "m": _cents(t["o_totalprice"]),
            "last_day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                                  _DAY_US),
        })
        return part.group_by("o_custkey").aggregate(
            [("f", "sum"), ("m", "sum"), ("last_day", "max")])

    from ray.data.aggregate import Max, Sum
    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("f_sum", alias_name="f"),
                   Sum("m_sum", alias_name="m"),
                   Max("last_day_max", alias_name="last_day"))
        .materialize()  # bounded by the customer dimension; 3 consumers
    )
    anchor = int(per_cust.max("last_day"))

    def rfm_cols(t: pa.Table) -> pa.Table:
        return pa.table({
            "r_days": pc.subtract(anchor, t["last_day"]),
            "f": t["f"], "m": t["m"],
        })

    rfm = per_cust.map_batches(rfm_cols, batch_format="pyarrow",
                               zero_copy_batch=True)

    # ONE histogram pass → exact quantile_disc elements for all 3 dims
    def hist_partial(t: pa.Table) -> pa.Table:
        frames = [pd.DataFrame({"col": c, "v": t[c].to_numpy(zero_copy_only=False)})
                  for c in ("r_days", "f", "m")]
        g = (pd.concat(frames).groupby(["col", "v"], as_index=False, sort=False)
             .size().rename(columns={"size": "c"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    # value histograms are bounded (dates × order-counts × customer
    # totals) — combine tree, not a sort exchange (fixed-cost cut, same
    # as quartile_bin_counts)
    from ..stages.quantiles import _collect_tree

    def hist_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["col", "v"]).aggregate([("c", "sum")])
        return pa.table({"col": g["col"], "v": g["v"],
                         "c": g["c_sum"].cast(pa.int64())})

    hist = _collect_tree(
        rfm.map_batches(hist_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        hist_combine).to_pandas()

    thr: dict[str, tuple[int, int]] = {}
    for col, g in hist.groupby("col"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        pick = lambda num, den: int(v[np.searchsorted(
            cum, quantile_disc_rank(num, den, n) + 1)])
        thr[col] = (pick(1, 3), pick(2, 3))

    (r1, r2), (f1, f2), (m1, m2) = thr["r_days"], thr["f"], thr["m"]

    def segment(t: pa.Table) -> pa.Table:
        r = t["r_days"].to_numpy(zero_copy_only=False)
        f = t["f"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        rs = np.where(r <= r1, 3, np.where(r <= r2, 2, 1))
        fs = np.where(f <= f1, 1, np.where(f <= f2, 2, 3))
        ms = np.where(m <= m1, 1, np.where(m <= m2, 2, 3))
        part = pa.table({
            "segment": pa.array((rs * 100 + fs * 10 + ms).astype(np.int64)),
            "n_customers": pa.array(np.ones(len(r), np.int64)),
            "total_cents": pa.array(m.astype(np.int64)),
        })
        g = part.group_by("segment").aggregate(
            [("n_customers", "sum"), ("total_cents", "sum")])
        return pa.table({"segment": g["segment"],
                         "n_customers": g["n_customers_sum"].cast(pa.int64()),
                         "total_cents": g["total_cents_sum"].cast(pa.int64())})

    def seg_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("segment").aggregate(
            [("n_customers", "sum"), ("total_cents", "sum")])
        return pa.table({"segment": g["segment"],
                         "n_customers": g["n_customers_sum"].cast(pa.int64()),
                         "total_cents": g["total_cents_sum"].cast(pa.int64())})

    # ≤ 27 segment rows: combine tree + driver sort
    out = _collect_tree(
        rfm.map_batches(segment, batch_format="pyarrow",
                        zero_copy_batch=True),
        seg_combine).to_pandas()
    return out.sort_values("segment").reset_index(drop=True)
