"""Time-series / windowed-statistics operator batch (round 3).

Same contract as ``queries.py``: every entry pairs a Ray-Data-first
pipeline with a DuckDB oracle mirrored operation-for-operation (exact
integer cents, integer rank arithmetic) so typed value hashes match.

Reference provenance: the reference's expression pipelines resample
and densify sparse per-entity measurements before export
(src/etl/expression_etl.py stage ordering + the per-entity grouped
assembly in SURVEY §2.5 O1/O2); the gap-fill here is that densify
step as a distributed generator, the weighted median extends the
exact order-statistics family (A2/quantiles), and the rolling z-score
is the windowed QC analogue of its per-batch sanity counters
(SURVEY A1/A5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.pools import join_parts as _join_parts
from ..stages.partition import int_key_part_col
from ..stages.exchange import exchange_map_groups as _exg
from .queries import _cents, query

_HOUR_US = 3_600_000_000

# Invariant used by every user-keyed window kernel below: the gpart
# exchange co-locates ALL of a user's rows in one partition, so a
# kernel that aggregates per user emits FINAL rows — no second global
# groupby is needed (one exchange total per query).


# ---------------------------------------------------------------------------
# gap_fill_hourly — per-user hourly resample (densify): every hour
# between a user's first and last event appears exactly once, missing
# hours zero-filled.  A GENERATOR op (output rows > input rows), so the
# scale design matters: users are hash-partitioned once (all of a
# user's rows land in one partition), and the grid is built inside the
# partition kernel with offset math (np.repeat over per-user spans +
# grid-cumcount) — no per-user Python loop, no driver-side series.  At
# 100 TB the output is ∝ Σ per-user spans and streams out per
# partition; nothing materializes globally.
# ---------------------------------------------------------------------------
@query(
    "gap_fill_hourly",
    """
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds),
    agg AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2)
    SELECT g.user_id, g.hour,
           coalesce(a.cents, 0) AS cents,
           coalesce(a.n_events, 0) AS n_events
    FROM grid g LEFT JOIN agg a USING (user_id, hour)
    """,
)
def gap_fill_hourly(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        # pre-aggregate to (user, hour) partials per batch: the exchange
        # ships at most |distinct (user, hour)| rows per block
        hour = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), _HOUR_US),
            pa.scalar(_HOUR_US, pa.int64()),
        )
        part = pa.table({
            "user_id": t["user_id"],
            "hour_us": hour,
            "cents": _cents(t["value"]),
            "n_events": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["user_id", "hour_us"]).aggregate(
            [("cents", "sum"), ("n_events", "sum")])
        part = part.rename_columns(["user_id", "hour_us", "cents", "n_events"])
        return int_key_part_col(part, "user_id", nparts)

    def densify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "hour_us"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        hr = g["hour_us"].to_numpy()
        cents = g["cents"].to_numpy()
        nev = g["n_events"].to_numpy()
        # per-user [h0, h1] spans via boundary masks (rows are sorted by
        # (user, hour) so first/last row per user carry min/max)
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(g)] - 1
        h0, h1 = hr[starts], hr[ends]
        spans = (h1 - h0) // _HOUR_US + 1
        # grid: user repeated span times, hour = h0 + cumcount·1h
        offsets = np.r_[0, np.cumsum(spans)]
        total = int(offsets[-1])
        gu = np.repeat(uid[starts], spans)
        cum = np.arange(total) - np.repeat(offsets[:-1], spans)
        gh = np.repeat(h0, spans) + cum * _HOUR_US
        # scatter-ADD the sparse aggregates into their grid slots (the
        # same (user, hour) may arrive as partials from several input
        # batches, so accumulate rather than assign)
        run = np.searchsorted(uid[starts], uid)
        slot = offsets[run] + (hr - hr[starts[run]]) // _HOUR_US
        gc = np.zeros(total, np.int64)
        gn = np.zeros(total, np.int64)
        np.add.at(gc, slot, cents)
        np.add.at(gn, slot, nev)
        return pd.DataFrame({
            "user_id": gu, "hour_us": gh, "cents": gc, "n_events": gn})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "hour": pc.cast(t["hour_us"], pa.timestamp("us")),
            "cents": t["cents"],
            "n_events": t["n_events"],
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: densify(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# weighted_median_price — exact WEIGHTED lower median per group:
# smallest price v whose cumulative quantity reaches ceil(W/2).
# Scale design: per-batch (flag, cents)→Σqty partials bound the
# exchange by the PRICE DOMAIN (distinct cent values), not the row
# count — the same domain-bounded-partials trick as the grouped
# histogram; the per-flag kernel is a sort + one cumsum + one
# searchsorted over that bounded set.
# ---------------------------------------------------------------------------
@query(
    "weighted_median_price",
    """
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT l_returnflag, cents, qty,
             sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(qty) OVER (PARTITION BY l_returnflag) AS total
      FROM w)
    SELECT l_returnflag,
           CAST(min(cents) AS BIGINT) AS wmedian_cents,
           CAST(min(total) AS BIGINT) AS total_qty
    FROM c WHERE cum >= (total + 1) // 2
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def weighted_median_price(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partials(t: pa.Table) -> pa.Table:
        part = pa.table({
            "l_returnflag": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
            "qty": pc.cast(t["l_quantity"], pa.int64()),
        }).group_by(["l_returnflag", "cents"]).aggregate([("qty", "sum")])
        return part.rename_columns(["l_returnflag", "cents", "qty"])

    def wmedian(g: pd.DataFrame) -> pd.DataFrame:
        flag = g["l_returnflag"].iloc[0]
        g = g.groupby("cents", as_index=False)["qty"].sum() \
            .sort_values("cents", kind="mergesort")
        cum = g["qty"].to_numpy().cumsum()
        total = int(cum[-1])
        idx = int(np.searchsorted(cum, (total + 1) // 2))
        return pd.DataFrame({
            "l_returnflag": [flag],
            "wmedian_cents": np.array([g["cents"].iloc[idx]], np.int64),
            "total_qty": np.array([total], np.int64),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(wmedian, batch_format="pandas")
        .sort("l_returnflag")
    )


# ---------------------------------------------------------------------------
# rolling_zscore_outliers — per-user rolling anomaly flag: an event is
# an outlier when its value deviates from the mean of the user's 8
# PRECEDING events by more than 2 standard deviations (full windows
# only).  The |x−μ|>2σ test is evaluated in EXACT integer arithmetic —
# (n·x − S)² > 4·(n·Q − S²) with S=Σcents, Q=Σcents² over the window —
# so there is no float-order sensitivity to mirror; the SQL oracle
# runs the identical integer comparison.  One hash-partition exchange
# on user; rolling sums are two cumsum-difference passes.
# ---------------------------------------------------------------------------
_ZW = 8  # window length (preceding rows)


@query(
    "rolling_zscore_outliers",
    f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    w AS (
      SELECT user_id, cents,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(sum(cents) OVER win AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER win AS BIGINT) AS q
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_ZW} PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           CAST(sum(CASE WHEN n = {_ZW} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_windows,
           CAST(sum(CASE WHEN n = {_ZW}
                          AND ({_ZW} * cents - s) * ({_ZW} * cents - s)
                              > 4 * ({_ZW} * q - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def rolling_zscore_outliers(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        x = g["cents"].to_numpy()
        n = len(g)
        # rolling sums over the 8 preceding rows via cumsum differences
        cs = np.r_[0, np.cumsum(x)]
        cq = np.r_[0, np.cumsum(x * x)]
        lo = np.maximum(np.arange(n) - _ZW, 0)
        s = cs[np.arange(n)] - cs[lo]
        q = cq[np.arange(n)] - cq[lo]
        # user boundaries: a window is full only when the 8th-preceding
        # row exists AND belongs to the same user
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        full = (np.arange(n) - start) >= _ZW
        # exact integer test (n·x − S)² > 4·(n·Q − S²)
        d = _ZW * x - s
        out_mask = full & (d * d > 4 * (_ZW * q - s * s))
        res = pd.DataFrame({
            "user_id": uid,
            "n_windows": full.astype(np.int64),
            "n_outliers": out_mask.astype(np.int64),
        })
        return res.groupby("user_id", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# last_touch_attribution — marketing-attribution join: each purchase is
# credited to the user's most recent PRECEDING non-purchase event
# (last-touch).  One hash-partition exchange on user; the credit lookup
# is a vectorized forward-fill (maximum.accumulate over source indices
# with user-boundary masking), never a per-row scan-back.
# ---------------------------------------------------------------------------
@query(
    "last_touch_attribution",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed
      FROM events)
    SELECT coalesce(attributed, '(none)') AS attributed_type,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def last_touch_attribution(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(g)
        idx = np.arange(n)
        is_p = et == "purchase"
        # forward-fill index of the last non-purchase row
        ffill = np.maximum.accumulate(np.where(~is_p, idx, -1))
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        user_start = np.maximum.accumulate(np.where(first, idx, 0))
        valid = ffill >= user_start
        credit = np.where(valid & is_p, et[np.maximum(ffill, 0)], "(none)")
        res = pd.DataFrame({"attributed_type": credit[is_p]})
        res = res.groupby("attributed_type", as_index=False).size() \
            .rename(columns={"size": "n_purchases"})
        res["n_purchases"] = res["n_purchases"].astype(np.int64)
        return res

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("attributed_type")
        .aggregate(Sum("n_purchases", alias_name="n_purchases"))
        .sort("attributed_type")
    )


# ---------------------------------------------------------------------------
# daily_revenue_growth — period-over-period analytics: per event type,
# the daily cents total plus LAG deltas vs the previous observed day.
# The wide input collapses to (type, day) integer partials per batch
# (exchange bounded by types × calendar days); the LAG itself runs on
# that bounded series inside a per-type kernel.  First-day rows carry
# real NULLs, mirrored by the SQL LAG.
# ---------------------------------------------------------------------------
_DAY_US = 86_400_000_000


@query(
    "daily_revenue_growth",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, cents,
           lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev_cents,
           cents - lag(cents) OVER (PARTITION BY event_type ORDER BY day)
             AS delta_cents
    FROM d ORDER BY event_type, day
    """,
)
def daily_revenue_growth(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            pa.scalar(_DAY_US, pa.int64()),
        )
        part = pa.table({
            "event_type": t["event_type"],
            "day_us": day,
            "cents": _cents(t["value"]),
        }).group_by(["event_type", "day_us"]).aggregate([("cents", "sum")])
        return part.rename_columns(["event_type", "day_us", "cents"])

    def lag_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "day_us"], as_index=False)["cents"].sum() \
            .sort_values("day_us", kind="mergesort")
        cents = g["cents"].to_numpy()
        prev = np.empty(len(g), np.float64)
        prev[0] = np.nan
        prev[1:] = cents[:-1]
        g["prev_f"] = prev
        return g

    def finish(t: pa.Table) -> pa.Table:
        if pa.types.is_null(t["prev_f"].type):
            # a single-day type's block is all-NaN → Arrow null type
            prev = pa.nulls(t.num_rows, pa.int64())
        else:
            nanmask = pc.is_nan(t["prev_f"])
            prev = pc.if_else(
                nanmask, pa.scalar(None, pa.int64()),
                pc.cast(pc.fill_null(pc.if_else(nanmask, 0.0, t["prev_f"]),
                                     0.0), pa.int64()))
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.cast(t["day_us"], pa.timestamp("us")),
            "cents": t["cents"],
            "prev_cents": prev,
            "delta_cents": pc.subtract(t["cents"], prev),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(lag_kernel, batch_format="pandas")
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["event_type", "day"])
    )


# ---------------------------------------------------------------------------
# time_to_conversion — per user, each 'view' event's delay to that
# user's NEXT 'purchase' (strictly after; unconverted views counted
# separately).  The forward lookup is a vectorized BACKWARD-fill
# (reversed minimum.accumulate of purchase timestamps with
# user-boundary masking) — the mirror image of last-touch's
# forward-fill; one hash-partition exchange.  Delay aggregates stay
# exact int64 microseconds; the mean is one mirrored float division.
# ---------------------------------------------------------------------------
@query(
    "time_to_conversion",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
      FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_views,
           CAST(count(next_purchase) AS BIGINT) AS n_converted,
           CAST(coalesce(sum(epoch_us(next_purchase) - epoch_us(ts)), 0)
                AS BIGINT) AS total_delay_us,
           CASE WHEN count(next_purchase) > 0
                THEN CAST(sum(epoch_us(next_purchase) - epoch_us(ts))
                          AS DOUBLE) / count(next_purchase)
                END AS mean_delay_us
    FROM seq WHERE event_type = 'view'
    GROUP BY user_id ORDER BY user_id
    """,
)
def time_to_conversion(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    _SENT = np.iinfo(np.int64).max

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        # next purchase STRICTLY AFTER row i: reversed cummin over
        # purchase timestamps shifted by one
        src = np.where(et == "purchase", ts, _SENT)
        nxt = np.empty(n, np.int64)
        nxt[:-1] = np.minimum.accumulate(src[::-1])[::-1][1:]
        nxt[-1] = _SENT
        # user boundary: the lookahead must stay within the same user —
        # invalidate where the LAST row of the user's run is before it
        last = np.empty(n, bool)
        last[-1] = True
        last[:-1] = uid[1:] != uid[:-1]
        # reversed max-accumulate of run-end indices gives each row its
        # user-run end; nxt is valid only if some purchase exists at or
        # before that end — equivalently recompute nxt per user segment:
        # reset the reversed scan at user boundaries via segment trick
        idx = np.arange(n)
        run_end = np.flip(np.minimum.accumulate(
            np.flip(np.where(last, idx, np.iinfo(np.int64).max))))
        # positions of purchases; for validity compare nxt against the
        # max ts within the user run — simpler: recompute via per-user
        # reversed scan by masking cross-user carries:
        # a carried value from a LATER user has index > run_end; encode
        # (ts, idx) jointly to detect it
        src2 = np.where(et == "purchase", idx, n)
        nxt_idx = np.empty(n, np.int64)
        nxt_idx[:-1] = np.minimum.accumulate(src2[::-1])[::-1][1:]
        nxt_idx[-1] = n
        valid = nxt_idx <= run_end
        is_v = et == "view"
        conv = is_v & valid
        delay = np.where(conv, ts[np.minimum(nxt_idx, n - 1)] - ts, 0)
        res = pd.DataFrame({
            "user_id": uid[is_v],
            "n_views": np.ones(int(is_v.sum()), np.int64),
            "n_converted": conv[is_v].astype(np.int64),
            "total_delay_us": delay[is_v].astype(np.int64),
        })
        return res.groupby("user_id", as_index=False).sum()

    def finish(t: pa.Table) -> pa.Table:
        conv = t["n_converted"]
        mean = pc.if_else(
            pc.greater(conv, 0),
            pc.divide(pc.cast(t["total_delay_us"], pa.float64()),
                      pc.cast(conv, pa.float64())),
            pa.scalar(None, pa.float64()))
        return pa.table({
            "user_id": t["user_id"], "n_views": t["n_views"],
            "n_converted": conv, "total_delay_us": t["total_delay_us"],
            "mean_delay_us": mean,
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# ma_crossover_signals — golden-cross detection per user: count rows
# where the 4-event short mean crosses ABOVE the 16-event long mean
# (both over preceding rows, full windows only).  Means are never
# materialized: the comparison S4·16 > S16·4 (and its negation at the
# previous row) is exact int64, so the SQL oracle mirrors bit-for-bit
# with no float rounding anywhere.
# ---------------------------------------------------------------------------
_MA_S, _MA_L = 4, 16


@query(
    "ma_crossover_signals",
    f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    w0 AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER wl AS BIGINT) AS nl,
             CAST(sum(cents) OVER ws AS BIGINT) AS s4,
             CAST(sum(cents) OVER wl AS BIGINT) AS s16
      FROM v
      WINDOW ws AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {_MA_S - 1} PRECEDING AND CURRENT ROW),
             wl AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {_MA_L - 1} PRECEDING AND CURRENT ROW)),
    w AS (
      SELECT user_id, nl, s4, s16,
             lag(s4)  OVER wp AS p4,
             lag(s16) OVER wp AS p16,
             lag(nl)  OVER wp AS pnl
      FROM w0
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CAST(sum(CASE WHEN nl = {_MA_L} AND pnl = {_MA_L}
                          AND s4 * {_MA_L} > s16 * {_MA_S}
                          AND p4 * {_MA_L} <= p16 * {_MA_S}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_golden_crosses,
           CAST(sum(CASE WHEN nl = {_MA_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_windows
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def ma_crossover_signals(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        x = g["cents"].to_numpy()
        n = len(g)
        idx = np.arange(n)
        cs = np.r_[0, np.cumsum(x)]
        s4 = cs[idx + 1] - cs[np.maximum(idx + 1 - _MA_S, 0)]
        s16 = cs[idx + 1] - cs[np.maximum(idx + 1 - _MA_L, 0)]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        full = (idx - start) >= (_MA_L - 1)          # nl == 16
        above = s4 * _MA_L > s16 * _MA_S
        prev_full = np.zeros(n, bool)
        prev_above = np.zeros(n, bool)
        prev_full[1:] = full[:-1] & ~first[1:]
        prev_above[1:] = above[:-1]
        cross = full & prev_full & above & ~prev_above
        res = pd.DataFrame({
            "user_id": uid,
            "n_golden_crosses": cross.astype(np.int64),
            "n_full_windows": full.astype(np.int64),
        })
        return res.groupby("user_id", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# multimodal_image_augment — the data-AUGMENTATION member of the media
# family (flip / center-crop / brightness): REAL PNG decode on an actor
# pool, then one stacked numpy expression per batch; every transform is
# proven byte-exact against the SQL mirror of the generative pixel
# formula (same contract as multimodal_image_resize).
# ---------------------------------------------------------------------------
from ..functions.pools import pool as _pool  # noqa: E402
from .sketch_sql import multimodal_augment_sql  # noqa: E402


@query("multimodal_image_augment",
       multimodal_augment_sql(n=128, seed=42, size=16, brightness=40))
def multimodal_image_augment(sf_dir: str):
    import ray.data as _rd

    from ..stages.multimodal import AugmentImage, synth_media_table

    media = _rd.from_arrow(synth_media_table(n=128, seed=42, size=16))
    return media.map_batches(
        AugmentImage, fn_constructor_kwargs={"brightness": 40},
        batch_format="pyarrow", batch_size=32, concurrency=_pool(),
    )


# ---------------------------------------------------------------------------
# benford_leading_digit — fraud/anomaly audit: leading-digit histogram
# of order totals (Benford's-law check).  The digit extraction is a
# fixed 19-step vectorized halving loop (int64 has ≤19 decimal digits)
# — exact integer, no string conversion, no log10 rounding edge.
# ---------------------------------------------------------------------------
@query(
    "benford_leading_digit",
    """
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def benford_leading_digit(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partials(t: pa.Table) -> pa.Table:
        d = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False).copy()
        for _ in range(19):           # int64 ⇒ ≤ 19 decimal digits
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        digit, cnt = np.unique(d, return_counts=True)
        return pa.table({
            "digit": pa.array(digit, pa.int64()),
            "n_orders": pa.array(cnt.astype(np.int64)),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("digit")
    )


# ---------------------------------------------------------------------------
# chi2_type_weekday — chi-square independence contributions for the
# event-type × weekday contingency table.  Each cell's statistic is
# evaluated as ONE float division of two EXACT integer products —
# contribution = (n·N − r·c)² / (N·r·c) — so no float sum order exists
# to mirror (the 35 cells are emitted as rows, not summed).  Counts
# fold as per-batch integer partials; magnitudes hold to ~10^5-row
# groups per cell (diff² < 2^63), the documented envelope.
# ---------------------------------------------------------------------------
@query(
    "chi2_type_weekday",
    """
    WITH cell AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS weekday,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, weekday, n,
             sum(n) OVER (PARTITION BY event_type) AS r,
             sum(n) OVER (PARTITION BY weekday) AS c,
             sum(n) OVER () AS ntot
      FROM cell)
    SELECT event_type, weekday, n,
           CAST((n * ntot - r * c) * (n * ntot - r * c) AS DOUBLE)
             / CAST(ntot * r * c AS DOUBLE) AS contribution
    FROM tot ORDER BY event_type, weekday
    """,
)
def chi2_type_weekday(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])
    _DAY_US_ = 86_400_000_000

    def partials(t: pa.Table) -> pa.Table:
        # DuckDB dayofweek: 0=Sunday; epoch day 0 (1970-01-01) was a
        # Thursday ⇒ weekday = (days + 4) % 7
        days = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) \
            // _DAY_US_
        wd = pa.array((days + 4) % 7, pa.int64())
        part = pa.table({
            "event_type": t["event_type"],
            "weekday": wd,
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["event_type", "weekday"]).aggregate([("n", "sum")])
        return part.rename_columns(["event_type", "weekday", "n"])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # the contingency table is bounded (types × 7): one kernel
        g = g.groupby(["event_type", "weekday"], as_index=False)["n"].sum()
        n = g["n"].to_numpy()
        r = g.groupby("event_type")["n"].transform("sum").to_numpy()
        c = g.groupby("weekday")["n"].transform("sum").to_numpy()
        N = n.sum()
        diff = n * N - r * c                       # exact int64
        g["contribution"] = (diff * diff).astype(np.float64) \
            / (N * r * c).astype(np.float64)
        return g.sort_values(["event_type", "weekday"], kind="mergesort")

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # bounded: ≤ types × 7 partial rows per block
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .sort(["event_type", "weekday"])
    )


# ---------------------------------------------------------------------------
# winsorized_stats_per_flag — robust statistics: clip prices at the
# exact p05/p95 order statistics per group, then recompute the mean
# over the clipped values.  One domain-bounded (flag, cents, count)
# partial exchange feeds a per-flag kernel that finds both thresholds
# AND the clipped sum in a single cumsum pass — the thresholds never
# round-trip to the driver.  quantile_disc rank convention
# (ceil(q·n) − 1); the mean is the only float op, mirrored exactly.
# ---------------------------------------------------------------------------
@query(
    "winsorized_stats_per_flag",
    """
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    q AS (
      SELECT l_returnflag,
             quantile_disc(cents, 0.05) AS lo,
             quantile_disc(cents, 0.95) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM w GROUP BY 1)
    SELECT w.l_returnflag,
           CAST(min(q.lo) AS BIGINT) AS p05_cents,
           CAST(min(q.hi) AS BIGINT) AS p95_cents,
           CAST(min(q.n) AS BIGINT) AS n,
           CAST(sum(least(greatest(w.cents, q.lo), q.hi)) AS BIGINT)
             AS winsorized_sum,
           CAST(sum(least(greatest(w.cents, q.lo), q.hi)) AS DOUBLE)
             / CAST(min(q.n) AS DOUBLE) AS winsorized_mean
    FROM w JOIN q USING (l_returnflag)
    GROUP BY w.l_returnflag ORDER BY w.l_returnflag
    """,
)
def winsorized_stats_per_flag(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        part = pa.table({
            "l_returnflag": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
            "cnt": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["l_returnflag", "cents"]).aggregate([("cnt", "sum")])
        return part.rename_columns(["l_returnflag", "cents", "cnt"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        flag = g["l_returnflag"].iloc[0]
        g = g.groupby("cents", as_index=False)["cnt"].sum() \
            .sort_values("cents", kind="mergesort")
        v = g["cents"].to_numpy()
        c = g["cnt"].to_numpy()
        cum = c.cumsum()
        n = int(cum[-1])
        # quantile_disc: value at rank ceil(q·n) − 1 (0-based) — the
        # smallest v with cum ≥ ceil(q·n)
        lo = v[np.searchsorted(cum, -(-5 * n // 100))]
        hi = v[np.searchsorted(cum, -(-95 * n // 100))]
        wsum = int((np.clip(v, lo, hi) * c).sum())
        return pd.DataFrame({
            "l_returnflag": [flag],
            "p05_cents": np.array([lo], np.int64),
            "p95_cents": np.array([hi], np.int64),
            "n": np.array([n], np.int64),
            "winsorized_sum": np.array([wsum], np.int64),
            "winsorized_mean": np.array([wsum / n], np.float64),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(kernel, batch_format="pandas")
        .sort("l_returnflag")
    )


# ---------------------------------------------------------------------------
# cep_pattern_counts — MATCH_RECOGNIZE-lite complex-event processing:
# count non-overlapping occurrences of the behavioral pattern
# view (click)+ purchase inside each user's ordered event sequence.
# Each user's sequence is compacted to a one-char-per-event string in
# the partition kernel (same ordered-assembly shape as the dialogue
# builder), and the pattern runs as ONE RE2 count over all sequences —
# both sides are RE2 (pyarrow and DuckDB), so non-overlapping
# leftmost-match semantics agree exactly.
# ---------------------------------------------------------------------------
_CEP_CODE = {"view": "v", "click": "c", "purchase": "p",
             "signup": "s", "error": "e"}
_CEP_PATTERN = "vc+p"


@query(
    "cep_pattern_counts",
    f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          ELSE 'e' END, '' ORDER BY ts, event_id) AS sig
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(sig) AS BIGINT) AS n_events,
           CAST(length(regexp_extract_all(sig, '{_CEP_PATTERN}'))
                AS BIGINT) AS n_matches
    FROM seq ORDER BY user_id
    """,
)
def cep_pattern_counts(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        codes = g["event_type"].map(_CEP_CODE).to_numpy()
        uid = g["user_id"].to_numpy()
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        # per-user signature strings via one join per user run (the
        # string assembly is the output payload, not a row loop over
        # events — same shape as conversation_text)
        sigs = ["".join(codes[s:e]) for s, e in
                zip(starts, np.r_[starts[1:], len(g)])]
        sig_arr = pa.array(sigs, pa.string())
        matches = pc.count_substring_regex(sig_arr, _CEP_PATTERN)
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_events": pc.utf8_length(sig_arr).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_matches": matches.to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# sliding_distinct_types — sliding-window COUNT(DISTINCT): distinct
# event types among each event's 10-row window (9 preceding + current,
# full windows within the user only).  The type domain is 5, so the
# window fold is a bitmask OR of 10 shifted one-hot arrays + a 32-entry
# popcount table — exact integers end-to-end, no per-window set.
# ---------------------------------------------------------------------------
_SD_W = 10


@query(
    "sliding_distinct_types",
    f"""
    WITH w AS (
      SELECT user_id,
             count(*) OVER win AS nw,
             count(DISTINCT event_type) OVER win AS nd
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_SD_W - 1} PRECEDING AND CURRENT ROW))
    SELECT user_id,
           CAST(sum(CASE WHEN nw = {_SD_W} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_windows,
           CAST(sum(CASE WHEN nw = {_SD_W} THEN nd ELSE 0 END) AS BIGINT)
             AS distinct_sum
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def sliding_distinct_types(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()
    code = {"view": 1, "click": 2, "purchase": 4, "signup": 8, "error": 16}
    popcnt = np.array([bin(i).count("1") for i in range(32)], np.int64)

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        bits = g["event_type"].map(code).to_numpy().astype(np.int64)
        n = len(g)
        idx = np.arange(n)
        acc = bits.copy()
        for s in range(1, _SD_W):            # OR of the 10-row window
            acc[s:] |= bits[:-s]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        full = (idx - start) >= (_SD_W - 1)
        nd = popcnt[acc]
        res = pd.DataFrame({
            "user_id": uid,
            "n_windows": full.astype(np.int64),
            "distinct_sum": np.where(full, nd, 0),
        })
        return res.groupby("user_id", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# rolling_median9_per_user — rolling-median smoother: exact median of
# each event's 9 most recent values (full windows only).  Window is ODD
# so every median is an exact integer; their per-user float64 sum is
# therefore order-independent (integer-valued doubles ≪ 2^53), making
# the aggregate safely distributable; CAST back to BIGINT both sides.
# ---------------------------------------------------------------------------
_RM_W = 9


@query(
    "rolling_median9_per_user",
    f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    w AS (
      SELECT user_id,
             count(*) OVER win AS nw,
             median(cents) OVER win AS med
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_RM_W - 1} PRECEDING AND CURRENT ROW))
    SELECT user_id,
           CAST(sum(CASE WHEN nw = {_RM_W} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_windows,
           CAST(sum(CASE WHEN nw = {_RM_W} THEN med ELSE 0 END) AS BIGINT)
             AS median_sum
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def rolling_median9_per_user(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "cents": _cents(t["value"]),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        x = g["cents"].to_numpy()
        n = len(g)
        idx = np.arange(n)
        # Cython rolling median over the concatenation; cross-user
        # windows are masked out below (full-window-within-user only)
        med = pd.Series(x).rolling(_RM_W).median().to_numpy()
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        full = (idx - start) >= (_RM_W - 1)
        res = pd.DataFrame({
            "user_id": uid,
            "n_windows": full.astype(np.int64),
            "median_sum": np.where(full, med, 0.0),
        })
        out = res.groupby("user_id", as_index=False).sum()
        out["median_sum"] = out["median_sum"].astype(np.int64)
        return out

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# ab_test_stats_price — exact A/B-test statistics between two groups
# (returnflag A vs R prices): Mann-Whitney U (doubled: U2 = 2U keeps
# rank ties integer) and the Kolmogorov-Smirnov distance as its integer
# numerator max|cumA·nR − cumR·nA| over the merged value domain.  One
# domain-bounded (flag, cents, count) partial exchange; the kernel is
# two cumsums over the merged domain — never a rank sort of raw rows.
# ---------------------------------------------------------------------------
@query(
    "ab_test_stats_price",
    """
    WITH w AS (
      SELECT l_returnflag AS f,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1, 2),
    m AS (
      SELECT cents,
             CAST(sum(CASE WHEN f = 'A' THEN cnt ELSE 0 END) AS BIGINT) AS ac,
             CAST(sum(CASE WHEN f = 'R' THEN cnt ELSE 0 END) AS BIGINT) AS rc
      FROM w GROUP BY cents),
    c AS (
      SELECT cents, ac, rc,
             sum(rc) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - rc
               AS r_less,
             sum(ac) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(rc) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum_r,
             sum(ac) OVER () AS na, sum(rc) OVER () AS nr
      FROM m)
    SELECT CAST(min(na) AS BIGINT) AS n_a,
           CAST(min(nr) AS BIGINT) AS n_r,
           CAST(sum(ac * (2 * r_less + rc)) AS BIGINT) AS u2,
           CAST(max(abs(cum_a * nr - cum_r * na)) AS BIGINT) AS ks_num
    FROM c
    """,
)
def ab_test_stats_price(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["l_returnflag"], value_set=pa.array(["A", "R"]))
        t = t.filter(keep)
        part = pa.table({
            "f": t["l_returnflag"],
            "cents": _cents(t["l_extendedprice"]),
            "cnt": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["f", "cents"]).aggregate([("cnt", "sum")])
        return part.rename_columns(["f", "cents", "cnt"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["f", "cents"], as_index=False)["cnt"].sum()
        piv = g.pivot_table(index="cents", columns="f", values="cnt",
                            aggfunc="sum", fill_value=0).sort_index()
        ac = piv.get("A", pd.Series(0, index=piv.index)).to_numpy(np.int64)
        rc = piv.get("R", pd.Series(0, index=piv.index)).to_numpy(np.int64)
        cum_a, cum_r = ac.cumsum(), rc.cumsum()
        na, nr = int(cum_a[-1]), int(cum_r[-1])
        r_less = cum_r - rc
        u2 = int((ac * (2 * r_less + rc)).sum())
        ks = int(np.abs(cum_a * nr - cum_r * na).max())
        return pd.DataFrame({
            "n_a": np.array([na], np.int64),
            "n_r": np.array([nr], np.int64),
            "u2": np.array([u2], np.int64),
            "ks_num": np.array([ks], np.int64),
        })

    # bounded: ≤ |price domain| partial rows — combine tree to the
    # driver (no repartition round), one closed-form kernel evaluation
    from ..stages.quantiles import _collect_tree

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["f", "cents"]).aggregate([("cnt", "sum")])
        return pa.table({"f": g["f"], "cents": g["cents"],
                         "cnt": g["cnt_sum"].cast(pa.int64())})

    tbl = _collect_tree(
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        combine)
    return kernel(tbl.to_pandas())


# ---------------------------------------------------------------------------
# lag1_autocorrelation — ACF(1) per user: Pearson correlation between
# consecutive event values, computed from exact int64 moment sums over
# the (x_{i-1}, x_i) pair stream (shift products with user-boundary
# masking) and ONE closed-form float evaluation per user mirrored
# op-for-op in SQL — the time-series diagnostic sibling of the grouped
# correlation operator.
# ---------------------------------------------------------------------------
@query(
    "lag1_autocorrelation",
    """
    WITH v AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS x,
             lag(CAST(round(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS px
      FROM events),
    p AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sy,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(x * px) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS syy,
             CAST(sum(px * px) AS BIGINT) AS sxx
      FROM v WHERE px IS NOT NULL GROUP BY user_id)
    SELECT user_id, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
                END AS acf1
    FROM p ORDER BY user_id
    """,
)
def lag1_autocorrelation(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "x": _cents(t["value"]),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        x = g["x"].to_numpy()
        n = len(g)
        pair = np.zeros(n, bool)
        if n > 1:
            pair[1:] = uid[1:] == uid[:-1]
        px = np.r_[0, x[:-1]]
        res = pd.DataFrame({
            "user_id": uid[pair],
            "n": np.ones(int(pair.sum()), np.int64),
            "sy": x[pair], "sx": px[pair],
            "sxy": (x * px)[pair],
            "syy": (x * x)[pair], "sxx": (px * px)[pair],
        })
        return res.groupby("user_id", as_index=False).sum()

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (vx > 0) & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            acf = (n.astype(np.float64) * sxy
                   - sx.astype(np.float64) * sy) \
                / np.sqrt(vx.astype(np.float64) * vy.astype(np.float64))
        return pa.table({
            "user_id": t["user_id"],
            "n": pa.array(n),
            "acf1": pa.array(np.where(ok, acf, np.nan), pa.float64(),
                             mask=~ok),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# churn_labels_weekly — training-label generation (target engineering):
# one row per (user, week) with activity features and the SUPERVISED
# LABEL "did this user purchase in the FOLLOWING week".  The label is a
# shifted per-user weekly join built with one exchange; weeks with no
# events produce no row (the model's feature grid), and the last
# observed week per user carries a NULL label (future unknown) —
# exactly what a leakage-safe training snapshot needs.
# ---------------------------------------------------------------------------
_WEEK_US = 7 * 86_400_000_000


@query(
    "churn_labels_weekly",
    f"""
    WITH w AS (
      SELECT user_id,
             (epoch_us(ts) // {_WEEK_US}) AS week,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      FROM events GROUP BY 1, 2),
    lbl AS (
      SELECT a.user_id, a.week, a.n_events, a.n_purchases,
             CASE WHEN b.week IS NULL THEN NULL
                  WHEN b.n_purchases > 0 THEN 1 ELSE 0 END AS next_week_buy,
             CASE WHEN a.week = max(a.week) OVER (PARTITION BY a.user_id)
                  THEN TRUE ELSE FALSE END AS is_last
      FROM w a LEFT JOIN w b
        ON a.user_id = b.user_id AND b.week = a.week + 1)
    SELECT user_id, CAST(week AS BIGINT) AS week, n_events, n_purchases,
           CAST(CASE WHEN is_last THEN NULL
                     ELSE coalesce(next_week_buy, 0) END AS BIGINT)
             AS label_next_week_buy
    FROM lbl ORDER BY user_id, week
    """,
)
def churn_labels_weekly(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        week = pc.divide(pc.cast(t["ts"], pa.int64()), _WEEK_US)
        part = pa.table({
            "user_id": t["user_id"],
            "week": week,
            "n_events": pa.array(np.ones(t.num_rows, np.int64)),
            "n_purchases": pc.cast(
                pc.equal(t["event_type"], "purchase"), pa.int64()),
        }).group_by(["user_id", "week"]).aggregate(
            [("n_events", "sum"), ("n_purchases", "sum")])
        part = part.rename_columns(
            ["user_id", "week", "n_events", "n_purchases"])
        return int_key_part_col(part, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "week"], as_index=False)[
            ["n_events", "n_purchases"]].sum() \
            .sort_values(["user_id", "week"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        wk = g["week"].to_numpy()
        np_ = g["n_purchases"].to_numpy()
        n = len(g)
        nxt_buy = np.zeros(n, np.float64)
        last = np.empty(n, bool)
        last[-1] = True
        last[:-1] = uid[1:] != uid[:-1]
        # next row is the following week of the same user?
        adj = np.zeros(n, bool)
        if n > 1:
            adj[:-1] = (~last[:-1]) & (wk[1:] == wk[:-1] + 1)
        nxt_buy[adj] = (np_[np.r_[1:n, 0]][adj] > 0).astype(np.float64)
        nxt_buy[last] = np.nan              # future unknown
        g["label_f"] = nxt_buy
        return g

    def finish(t: pa.Table) -> pa.Table:
        col = t["label_f"]
        if pa.types.is_null(col.type):
            # a block whose every label is NaN converts from pandas as
            # Arrow null type — treat as all-unknown
            lf = np.zeros(t.num_rows, np.float64)
            isnan = np.ones(t.num_rows, bool)
        else:
            lf = col.to_numpy(zero_copy_only=False)
            isnan = np.isnan(lf)
        return pa.table({
            "user_id": t["user_id"],
            "week": pc.cast(t["week"], pa.int64()),
            "n_events": t["n_events"],
            "n_purchases": t["n_purchases"],
            "label_next_week_buy": pa.array(
                np.where(isnan, 0, lf).astype(np.int64), pa.int64(),
                mask=isnan),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["user_id", "week"])
    )


# ---------------------------------------------------------------------------
# multimodal_audio_windows — streaming-audio chunking: fixed 1024-sample
# analysis windows with exact integer energy/peak per window (the
# framing stage every audio feature pipeline starts with).  One stacked
# frombuffer+reshape per batch; SQL mirror recomputes from the
# generative sample formula.
# ---------------------------------------------------------------------------
from .sketch_sql import multimodal_audio_windows_sql  # noqa: E402


@query("multimodal_audio_windows",
       multimodal_audio_windows_sql(n=64, samples=8000, win=1024))
def multimodal_audio_windows(sf_dir: str):
    import ray.data as _rd

    from ..stages.multimodal import FrameAudioWindows, synth_audio_hash_table

    audio = _rd.from_arrow(synth_audio_hash_table(n=64, samples=8000))
    return audio.map_batches(
        FrameAudioWindows, fn_constructor_kwargs={"win": 1024},
        batch_format="pyarrow", batch_size=16, concurrency=_pool(),
    ).sort(["media_id", "window_idx"])


# ---------------------------------------------------------------------------
# bounce_rate_daily — session-level business metric: sessions start
# after a 30-minute inactivity gap; a session is a BOUNCE when it has
# exactly one event.  Sessions are derived per user in the partition
# kernel (cumsum of gap breaks — no session state object), rolled up to
# the day of the session's first event; the rate is one mirrored float
# division per day.
# ---------------------------------------------------------------------------
_SESS_GAP_US = 30 * 60 * 1_000_000
_DAY_US2 = 86_400_000_000


@query(
    "bounce_rate_daily",
    f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq),
    per_sess AS (
      SELECT user_id, sid,
             (epoch_us(min(ts)) // {_DAY_US2}) AS day,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid)
    SELECT CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM per_sess GROUP BY day ORDER BY day
    """,
)
def bounce_rate_daily(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        brk = np.ones(n, np.int64)
        if n > 1:
            same = uid[1:] == uid[:-1]
            brk[1:] = np.where(same & (ts[1:] - ts[:-1] <= _SESS_GAP_US),
                               0, 1)
        # global session key: (user, per-user running break count)
        sid = np.cumsum(brk)          # strictly increasing at breaks →
        # unique per session across users within this partition
        res = pd.DataFrame({"sid": sid, "ts_us": ts})
        per = res.groupby("sid").agg(first_ts=("ts_us", "min"),
                                     n_events=("ts_us", "size"))
        day = per["first_ts"].to_numpy() // _DAY_US2
        bounce = (per["n_events"].to_numpy() == 1)
        out = pd.DataFrame({
            "day": day,
            "n_sessions": np.ones(len(per), np.int64),
            "n_bounces": bounce.astype(np.int64),
        })
        return out.groupby("day", as_index=False).sum()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": t["day"],
            "n_sessions": t["n_sessions"],
            "n_bounces": t["n_bounces"],
            "bounce_rate": pc.divide(
                pc.cast(t["n_bounces"], pa.float64()),
                pc.cast(t["n_sessions"], pa.float64())),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("day")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                   Sum("n_bounces", alias_name="n_bounces"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("day")
    )


# ---------------------------------------------------------------------------
# top_journey_prefixes — product-analytics "top user journeys": the
# most common first-5-event type sequences across users (count DESC,
# journey ASC, top 10).  Prefix assembly happens in the user-keyed
# kernel (first 5 codes per user via boundary offsets); the journey
# histogram is a tiny (≤ 5^5) second aggregate.
# ---------------------------------------------------------------------------
@query(
    "top_journey_prefixes",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events),
    j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY rn) AS journey
      FROM seq WHERE rn <= 5 GROUP BY user_id)
    SELECT journey, CAST(count(*) AS BIGINT) AS n_users
    FROM j GROUP BY journey
    ORDER BY n_users DESC, journey LIMIT 10
    """,
)
def top_journey_prefixes(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        codes = g["event_type"].str[0].to_numpy()
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], n]
        journeys = ["".join(codes[s:min(s + 5, e)])
                    for s, e in zip(starts, ends)]
        res = pd.DataFrame({"journey": journeys})
        out = res.groupby("journey", as_index=False).size() \
            .rename(columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("journey")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort([("n_users"), ("journey")], descending=[True, False])
        .limit(10)
    )


# ---------------------------------------------------------------------------
# new_vs_returning_daily — per-day active users split into NEW (first
# ever activity that day) vs RETURNING.  (user, day) de-duplicates and
# each user's first day resolves inside the user-keyed kernel; the
# daily rollup is a bounded calendar-sized exchange.
# ---------------------------------------------------------------------------
@query(
    "new_vs_returning_daily",
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id, (epoch_us(ts) // {_DAY_US2}) AS day
      FROM events),
    f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
    SELECT CAST(ud.day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN ud.day = f.first_day THEN 0 ELSE 1 END)
                AS BIGINT) AS n_returning
    FROM ud JOIN f USING (user_id)
    GROUP BY ud.day ORDER BY ud.day
    """,
)
def new_vs_returning_daily(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()),
                        pa.scalar(_DAY_US2, pa.int64()))
        part = pa.table({"user_id": t["user_id"], "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        return int_key_part_col(part, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id")["day"].transform("min")
        new = (g["day"].to_numpy() == first.to_numpy())
        out = pd.DataFrame({
            "day": g["day"].to_numpy(),
            "n_active": np.ones(len(g), np.int64),
            "n_new": new.astype(np.int64),
            "n_returning": (~new).astype(np.int64),
        })
        return out.groupby("day", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("day")
        .aggregate(Sum("n_active", alias_name="n_active"),
                   Sum("n_new", alias_name="n_new"),
                   Sum("n_returning", alias_name="n_returning"))
        .sort("day")
    )


# ---------------------------------------------------------------------------
# centroid_distance_matrix — inter-class geometry of the embedding
# space: squared euclidean distance between every pair of label
# centroids, carried EXACTLY as the integer cross-term
# Σ_d (sa_d·nb − sb_d·na)²  ( = dist²·(na·nb)² on the round(x·1000)
# grid) so no float vector sum exists to mirror.  Per-(label, dim)
# integer sums fold as bounded partials (10×64 rows for any input
# size); the 45-pair matrix assembles in one driver-side block.
# Envelope: |Σx_d|·n < 2^31.5 per class (≈10^5-row classes on the
# ±1-float grid) keeps the cross-term in int64.
# ---------------------------------------------------------------------------
@query(
    "centroid_distance_matrix",
    """
    WITH vd AS (
      SELECT label, i,
             CAST(round(CAST(CAST(embedding AS DOUBLE[])[i] AS DOUBLE)
                        * 1000) AS BIGINT) AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    s AS (
      SELECT label, i, CAST(sum(x) AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS n
      FROM vd GROUP BY label, i)
    SELECT CAST(a.label AS BIGINT) AS label_a,
           CAST(b.label AS BIGINT) AS label_b,
           CAST(min(a.n) AS BIGINT) AS n_a, CAST(min(b.n) AS BIGINT) AS n_b,
           CAST(sum((a.sx * b.n - b.sx * a.n)
                    * (a.sx * b.n - b.sx * a.n)) AS BIGINT) AS dist2_num
    FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label ORDER BY a.label, b.label
    """,
)
def centroid_distance_matrix(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])
    dim, sc = 64, 1000

    def partials(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["embedding"].combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64) * sc
        x = np.trunc(flat + np.sign(flat) * 0.5).astype(np.int64) \
            .reshape(-1, dim)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s, x_s = lab[order], x[order]
        uniq, starts = np.unique(lab_s, return_index=True)
        sums = np.add.reduceat(x_s, starts, axis=0)
        cnts = np.r_[starts[1:], len(lab_s)] - starts
        L = len(uniq)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim)),
            "i": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), L)),
            "sx": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnts.astype(np.int64), dim)),
        })

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "i"])
        .aggregate(Sum("sx", alias_name="sx"), Sum("n", alias_name="n"))
    ).to_pandas()  # ≤ labels×dim rows — statistics-sized

    agg = agg.sort_values(["label", "i"], kind="mergesort")
    labels = np.sort(agg["label"].unique()).astype(np.int64)
    S = agg["sx"].to_numpy().reshape(len(labels), dim)
    N = agg["n"].to_numpy().reshape(len(labels), dim)[:, 0]
    rows = []
    for ai in range(len(labels)):
        for bi in range(ai + 1, len(labels)):
            cross = S[ai] * N[bi] - S[bi] * N[ai]
            rows.append((int(labels[ai]), int(labels[bi]),
                         int(N[ai]), int(N[bi]),
                         int((cross * cross).sum())))
    return pd.DataFrame(rows, columns=[
        "label_a", "label_b", "n_a", "n_b", "dist2_num"]).astype(np.int64)


# ---------------------------------------------------------------------------
# gini_per_priority — inequality measure: the Gini coefficient of order
# totals per priority, computed EXACTLY from domain-bounded
# (priority, cents, count) partials.  Duplicate-value rank sums are the
# closed form cnt·c_before + cnt(cnt+1)/2 over the value histogram, so
# Σ rank·x, the numerator 2Σrank·x − (n+1)Σx, and the denominator n·Σx
# are all int64 — one mirrored float division total.  Envelope:
# n²·x̄/2 < 2^63 (≈10^7 rows at 10^5-cent means).
# ---------------------------------------------------------------------------
@query(
    "gini_per_priority",
    """
    WITH w AS (
      SELECT o_orderpriority AS prio,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2),
    c AS (
      SELECT prio, cents, cnt,
             sum(cnt) OVER (PARTITION BY prio ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - cnt AS c_before
      FROM w),
    s AS (
      SELECT prio,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cents * cnt) AS BIGINT) AS sx,
             CAST(sum(cents * (cnt * c_before + cnt * (cnt + 1) // 2))
                  AS BIGINT) AS srx
      FROM c GROUP BY prio)
    SELECT prio, n, sx,
           CAST(2 * srx - (n + 1) * sx AS BIGINT) AS gini_num,
           CAST(2 * srx - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE) AS gini
    FROM s ORDER BY prio
    """,
)
def gini_per_priority(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_totalprice"])

    def partials(t: pa.Table) -> pa.Table:
        part = pa.table({
            "prio": t["o_orderpriority"],
            "cents": _cents(t["o_totalprice"]),
            "cnt": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["prio", "cents"]).aggregate([("cnt", "sum")])
        return part.rename_columns(["prio", "cents", "cnt"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        prio = g["prio"].iloc[0]
        g = g.groupby("cents", as_index=False)["cnt"].sum() \
            .sort_values("cents", kind="mergesort")
        v = g["cents"].to_numpy()
        c = g["cnt"].to_numpy()
        cb = np.r_[0, np.cumsum(c)[:-1]]
        n = int(c.sum())
        sx = int((v * c).sum())
        srx = int((v * (c * cb + c * (c + 1) // 2)).sum())
        num = 2 * srx - (n + 1) * sx
        # mirror the oracle's CAST-then-divide exactly: n·sx exceeds
        # 2^53 at bench scale, so rounding the OPERANDS to double first
        # (as SQL does) differs from exact-int division in the last ulp
        gini = np.float64(num) / np.float64(n * sx)
        return pd.DataFrame({
            "prio": [prio],
            "n": np.array([n], np.int64),
            "sx": np.array([sx], np.int64),
            "gini_num": np.array([num], np.int64),
            "gini": np.array([gini], np.float64),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prio")
        .map_groups(kernel, batch_format="pandas")
        .sort("prio")
    )


# ---------------------------------------------------------------------------
# kaplan_meier_risk_table — survival analysis with censoring: each
# 'view' is an observation whose duration runs to the user's next
# purchase (event=1) or to the user's last event (censored, event=0).
# The deliverable is the exact INTEGER risk table — (t, deaths,
# n_at_risk) at every event time — from which S(t)=Π(1−d/n) follows;
# the product itself is deliberately left to the caller (float Π has
# no canonical order to mirror).  Durations derive in the user-keyed
# kernel (same backward-fill as time_to_conversion + censor fill);
# n_at_risk is a reverse cumulative over the bounded (duration,
# deaths, censored) histogram.
# ---------------------------------------------------------------------------
@query(
    "kaplan_meier_risk_table",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase,
             max(ts) OVER (PARTITION BY user_id) AS last_ts
      FROM events),
    obs AS (
      SELECT CASE WHEN next_purchase IS NOT NULL
                  THEN epoch_us(next_purchase) - epoch_us(ts)
                  ELSE epoch_us(last_ts) - epoch_us(ts) END AS t_us,
             CASE WHEN next_purchase IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM seq WHERE event_type = 'view'),
    h AS (
      SELECT t_us, CAST(sum(ev) AS BIGINT) AS deaths,
             CAST(count(*) AS BIGINT) AS total
      FROM obs GROUP BY t_us),
    r AS (
      SELECT t_us, deaths,
             sum(total) OVER (ORDER BY t_us DESC
                              ROWS UNBOUNDED PRECEDING) AS n_at_risk
      FROM h)
    SELECT CAST(t_us AS BIGINT) AS t_us, deaths,
           CAST(n_at_risk AS BIGINT) AS n_at_risk
    FROM r WHERE deaths > 0 ORDER BY t_us
    """,
)
def kaplan_meier_risk_table(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    _SENT = np.iinfo(np.int64).max

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        idx = np.arange(n)
        last = np.empty(n, bool)
        last[-1] = True
        last[:-1] = uid[1:] != uid[:-1]
        run_end = np.flip(np.minimum.accumulate(
            np.flip(np.where(last, idx, _SENT))))
        # next purchase strictly after, same user (index-encoded carry)
        src2 = np.where(et == "purchase", idx, n)
        nxt_idx = np.empty(n, np.int64)
        nxt_idx[:-1] = np.minimum.accumulate(src2[::-1])[::-1][1:]
        nxt_idx[-1] = n
        valid = nxt_idx <= run_end
        is_v = et == "view"
        dur = np.where(valid, ts[np.minimum(nxt_idx, n - 1)] - ts,
                       ts[np.minimum(run_end, n - 1)] - ts)
        res = pd.DataFrame({
            "t_us": dur[is_v],
            "deaths": valid[is_v].astype(np.int64),
            "total": np.ones(int(is_v.sum()), np.int64),
        })
        return res.groupby("t_us", as_index=False).sum()

    def risk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("t_us", as_index=False)[["deaths", "total"]].sum() \
            .sort_values("t_us", ascending=False, kind="mergesort")
        g["n_at_risk"] = g["total"].cumsum()
        g = g[g["deaths"] > 0].sort_values("t_us", kind="mergesort")
        return g[["t_us", "deaths", "n_at_risk"]].reset_index(drop=True)

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .repartition(1)  # bounded by distinct durations (output-sized);
        # the two-pass global-rank pattern takes over at larger scales
        .map_batches(risk, batch_format="pandas", batch_size=None)
        .sort("t_us")
    )


# ---------------------------------------------------------------------------
# naive_forecast_backtest — forecast-evaluation metric: score the
# naive "tomorrow = today" forecaster on daily per-type revenue.
# Absolute errors stay exact int64 (|cents_d − cents_{d−1}| over
# OBSERVED-day pairs); MAE is one mirrored division.  The backtest
# shape every forecasting pipeline needs before anything fancier.
# ---------------------------------------------------------------------------
@query(
    "naive_forecast_backtest",
    """
    WITH d AS (
      SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT event_type, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM d)
    SELECT event_type,
           CAST(count(prev) AS BIGINT) AS n_forecasts,
           CAST(sum(abs(cents - prev)) AS BIGINT) AS abs_err_sum,
           CAST(sum(abs(cents - prev)) AS DOUBLE) / count(prev) AS mae_cents
    FROM p WHERE prev IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def naive_forecast_backtest(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()),
                        pa.scalar(_DAY_US2, pa.int64()))
        part = pa.table({
            "event_type": t["event_type"],
            "day": day,
            "cents": _cents(t["value"]),
        }).group_by(["event_type", "day"]).aggregate([("cents", "sum")])
        return part.rename_columns(["event_type", "day", "cents"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].iloc[0]
        g = g.groupby("day", as_index=False)["cents"].sum() \
            .sort_values("day", kind="mergesort")
        c = g["cents"].to_numpy()
        if len(c) < 2:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_forecasts": pd.Series([], dtype=np.int64),
                "abs_err_sum": pd.Series([], dtype=np.int64),
                "mae_cents": pd.Series([], dtype=np.float64)})
        err = np.abs(c[1:] - c[:-1])
        return pd.DataFrame({
            "event_type": [et],
            "n_forecasts": np.array([len(err)], np.int64),
            "abs_err_sum": np.array([int(err.sum())], np.int64),
            "mae_cents": np.array([err.sum() / len(err)], np.float64),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(kernel, batch_format="pandas")
        .sort("event_type")
    )


# ---------------------------------------------------------------------------
# purchase_streaks — run-length encoding: each user's LONGEST run of
# consecutive purchase events (and their run count) in event order.
# Runs resolve with two boundary masks in the user-keyed kernel; the
# SQL oracle is the classic rn-difference gaps-and-islands.
# ---------------------------------------------------------------------------
@query(
    "purchase_streaks",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events),
    runs AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS run_len
      FROM seq WHERE event_type = 'purchase'
      GROUP BY user_id, rn - rnt)
    SELECT user_id,
           CAST(max(run_len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def purchase_streaks(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        isp = (g["event_type"].to_numpy() == "purchase")
        n = len(g)
        newu = np.empty(n, bool)
        newu[0] = True
        newu[1:] = uid[1:] != uid[:-1]
        # a purchase run STARTS where is_p and (new user or prev not p)
        start = isp & (newu | ~np.r_[False, isp[:-1]])
        run_id = np.cumsum(start)             # 0 before any run
        res = pd.DataFrame({"user_id": uid[isp], "run": run_id[isp]})
        runs = res.groupby(["user_id", "run"], as_index=False).size()
        out = runs.groupby("user_id", as_index=False).agg(
            longest_streak=("size", "max"), n_streaks=("size", "size"))
        out["longest_streak"] = out["longest_streak"].astype(np.int64)
        out["n_streaks"] = out["n_streaks"].astype(np.int64)
        return out

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# data_mix_quota_sample — dataset-mixing QUOTA sampler: a fixed budget
# per source (not a rate), selected deterministically by Knuth-hash
# order so the SQL oracle picks the IDENTICAL documents — reweighting
# a training mix as a reproducible operator, the per-stratum-cap
# sibling of stratified_sample_events.  Sources are hash-partitioned;
# each kernel ranks its complete sources locally (one exchange).
# ---------------------------------------------------------------------------
_QUOTA = 10


@query(
    "data_mix_quota_sample",
    f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM r WHERE rn <= {_QUOTA}
    GROUP BY source ORDER BY source
    """,
)
def data_mix_quota_sample(sf_dir: str):
    from ..functions.tables import read_table
    from ..stages.partition import str_key_part_col

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        return str_key_part_col(t, "source", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy().astype(np.uint64)
        g = g.assign(h=(did * np.uint64(2654435761)) % np.uint64(4294967296))
        g = g.sort_values(["source", "h", "doc_id"], kind="mergesort")
        rank = g.groupby("source").cumcount()
        sel = g[rank < _QUOTA]
        out = sel.groupby("source", as_index=False).agg(
            n_selected=("doc_id", "size"), id_sum=("doc_id", "sum"))
        out["n_selected"] = out["n_selected"].astype(np.int64)
        out["id_sum"] = out["id_sum"].astype(np.int64)
        return out

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("source")
    )


# ---------------------------------------------------------------------------
# abc_classification — inventory ABC analysis: parts ranked by revenue,
# classified A/B/C at 80% / 95% cumulative-revenue cuts.  The class
# test is pure integer arithmetic (cum·100 ≤ 80·total, evaluated on the
# PREVIOUS row's cumulative so every class is non-empty by
# construction); per-part revenue folds as partials bounded by the part
# domain, the classify kernel is one sort+cumsum over that bounded set.
# ---------------------------------------------------------------------------
@query(
    "abc_classification",
    """
    WITH pr AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1),
    c AS (
      SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) - rev AS cum_before,
             sum(rev) OVER () AS total
      FROM pr)
    SELECT CASE WHEN cum_before * 100 < 80 * total THEN 'A'
                WHEN cum_before * 100 < 95 * total THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS class_rev
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def abc_classification(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        part = pa.table({
            "l_partkey": t["l_partkey"],
            "rev": _cents(t["l_extendedprice"]),
        }).group_by("l_partkey").aggregate([("rev", "sum")])
        return part.rename_columns(["l_partkey", "rev"])

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("l_partkey", as_index=False)["rev"].sum() \
            .sort_values(["rev", "l_partkey"], ascending=[False, True],
                         kind="mergesort")
        rev = g["rev"].to_numpy()
        cum_before = np.r_[0, np.cumsum(rev)[:-1]]
        total = int(rev.sum())
        cls = np.where(cum_before * 100 < 80 * total, "A",
                       np.where(cum_before * 100 < 95 * total, "B", "C"))
        out = pd.DataFrame({"abc_class": cls, "rev": rev})
        res = out.groupby("abc_class", as_index=False).agg(
            n_parts=("rev", "size"), class_rev=("rev", "sum"))
        res["n_parts"] = res["n_parts"].astype(np.int64)
        res["class_rev"] = res["class_rev"].astype(np.int64)
        return res

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # bounded by the part domain
        .map_batches(classify, batch_format="pandas", batch_size=None)
        .sort("abc_class")
    )


# ---------------------------------------------------------------------------
# dag_depth_levels — shortest-path LEVELS over the multi-parent DAG
# (k→k//2, and k→k//3 when 3|k): each node's minimum edge distance to
# the root (1).  The edge table is the ontology-sized side, so levels
# derive once on the driver via a level-synchronized numpy frontier BFS
# over the REVERSED CSR adjacency (no per-node Python) and broadcast;
# the unbounded node stream gathers its level with one searchsorted per
# batch — the same small-edges/big-nodes contract as
# closure_broadcast_bfs.  WITH RECURSIVE min-steps oracle.
# ---------------------------------------------------------------------------
@query(
    "dag_depth_levels",
    """
    WITH RECURSIVE walk(node, cur, steps) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey >= 1
      UNION
      SELECT w.node,
             CASE WHEN w.cur % 3 = 0 AND f = 3 THEN w.cur // 3
                  ELSE w.cur // 2 END,
             w.steps + 1
      FROM walk w CROSS JOIN (SELECT unnest([2, 3]) AS f) fs
      WHERE w.cur >= 2 AND (f = 2 OR (f = 3 AND w.cur % 3 = 0))
    )
    SELECT node, CAST(min(steps) AS BIGINT) AS level
    FROM walk WHERE cur = 1 GROUP BY node ORDER BY node
    """,
)
def dag_depth_levels(sf_dir: str,
                     driver_node_limit: int = 5_000_000):
    import ray
    import ray.data  # noqa: F401
    from ..functions.tables import read_small, read_table

    # Above the node limit the level derivation routes through the
    # sharded BFS (stages/bfs.py): node state hash-sharded across
    # actors, frontier-sized point-to-point rounds, levels assembled
    # via from_arrow_refs — nothing node-scale on the driver (VERDICT
    # r3 item 4).  The driver path below stays for ontology-sized
    # inputs (reference closure inputs are <100k edges).
    ds0 = read_table(sf_dir, "part", columns=["p_partkey"])
    if ds0.count() > driver_node_limit:
        return _dag_levels_sharded(ds0)

    keys = read_small(sf_dir, "part", columns=["p_partkey"])["p_partkey"] \
        .to_numpy().astype(np.int64)
    keys = keys[keys >= 1]
    # edge table child→parent (consumed as data)
    child2 = keys[keys >= 2]
    e_child = np.r_[child2, keys[(keys >= 3) & (keys % 3 == 0)]]
    e_parent = np.r_[child2 // 2, keys[(keys >= 3) & (keys % 3 == 0)] // 3]

    # driver-side frontier BFS from the root over REVERSED edges
    # (parent→child CSR), level-synchronized — O(E) total
    order = np.argsort(e_parent, kind="stable")
    p_sorted, c_sorted = e_parent[order], e_child[order]
    nodes_sorted = np.unique(np.r_[keys, e_parent])
    level = np.full(len(nodes_sorted), -1, np.int64)
    root = np.searchsorted(nodes_sorted, 1)
    if root < len(nodes_sorted) and nodes_sorted[root] == 1:
        level[root] = 0
        frontier = np.array([1], np.int64)
        lv = 0
        while len(frontier):
            lv += 1
            lo = np.searchsorted(p_sorted, frontier, side="left")
            hi = np.searchsorted(p_sorted, frontier, side="right")
            counts = hi - lo
            rep = np.repeat(np.arange(len(frontier)), counts)
            within = np.arange(int(counts.sum())) - np.repeat(
                np.r_[0, np.cumsum(counts)[:-1]], counts)
            kids = np.unique(c_sorted[lo[rep] + within]) \
                if counts.sum() else np.array([], np.int64)
            ki = np.searchsorted(nodes_sorted, kids)
            fresh = level[ki] < 0
            level[ki[fresh]] = lv
            frontier = kids[fresh]
    lvl_ref = ray.put((nodes_sorted, level))

    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def gather(t: pa.Table) -> pa.Table:
        ns, lv = ray.get(lvl_ref)
        node = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = node[node >= 1]
        li = np.searchsorted(ns, node)
        out_l = lv[np.minimum(li, len(ns) - 1)]
        keep = out_l >= 0
        return pa.table({
            "node": pa.array(node[keep]),
            "level": pa.array(out_l[keep]),
        })

    return ds.map_batches(gather, batch_format="pyarrow",
                          zero_copy_batch=True).sort("node")


def _dag_children(fresh: "np.ndarray") -> "np.ndarray":
    """Reverse-DAG children of fresh nodes p: keys k with k//2 == p
    ({2p, 2p+1}) or (3|k and k//3 == p) (= {3p})."""
    return np.unique(np.concatenate([2 * fresh, 2 * fresh + 1, 3 * fresh]))


def _dag_levels_sharded(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    from ..stages.bfs import sharded_levels

    return sharded_levels(
        ds, "p_partkey", _dag_children,
        seed_nodes=np.array([1], np.int64),
        # children of the (possibly virtual) root 1, forced at level 1
        # — matches the driver BFS whose node space is keys ∪ parents
        seed_children=np.array([2, 3], np.int64),
    ).sort("node")


# ---------------------------------------------------------------------------
# roc_points_value — ML-evaluation operator: exact confusion-matrix
# points for the threshold classifier "predict purchase when value ≥
# t", at 40 integer thresholds (t = 1000..40000 cents).  The sweep
# costs ONE pass: (label, 1000-cent bin) integer partials (bounded
# 2×41 rows), then reverse-cumulative histograms give tp/fp per
# threshold in a single kernel — never 40 scans.
# ---------------------------------------------------------------------------
@query(
    "roc_points_value",
    """
    WITH b AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             least(CAST(round(value * 100) AS BIGINT) // 1000, 40) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    t AS (SELECT unnest(generate_series(1, 40)) AS thr)
    SELECT CAST(thr * 1000 AS BIGINT) AS threshold_cents,
           CAST(sum(CASE WHEN pos = 1 AND bin >= thr THEN n ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pos = 0 AND bin >= thr THEN n ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN pos = 1 AND bin < thr THEN n ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(sum(CASE WHEN pos = 0 AND bin < thr THEN n ELSE 0 END)
                AS BIGINT) AS tn
    FROM t CROSS JOIN b GROUP BY thr ORDER BY threshold_cents
    """,
)
def roc_points_value(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        bins = np.minimum(cents // 1000, 40)
        pos = (t["event_type"].to_numpy(zero_copy_only=False)
               == "purchase").astype(np.int64)
        part = pa.table({
            "pos": pa.array(pos),
            "bin": pa.array(bins.astype(np.int64)),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["pos", "bin"]).aggregate([("n", "sum")])
        return part.rename_columns(["pos", "bin", "n"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["pos", "bin"], as_index=False)["n"].sum()
        hp = np.zeros(41, np.int64)
        hn = np.zeros(41, np.int64)
        for _, r in g.iterrows():              # ≤ 82 bounded rows
            (hp if r["pos"] == 1 else hn)[int(r["bin"])] += int(r["n"])
        # reverse cumulative: count(bin >= thr)
        cp = np.cumsum(hp[::-1])[::-1]
        cn = np.cumsum(hn[::-1])[::-1]
        P, N = int(hp.sum()), int(hn.sum())
        thr = np.arange(1, 41, dtype=np.int64)
        tp = cp[thr]
        fp = cn[thr]
        return pd.DataFrame({
            "threshold_cents": thr * 1000,
            "tp": tp, "fp": fp, "fn": P - tp, "tn": N - fp,
        }).astype(np.int64)

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # bounded: ≤ 2×41 partial rows
        .map_batches(sweep, batch_format="pandas", batch_size=None)
        .sort("threshold_cents")
    )


# ---------------------------------------------------------------------------
# cohort_ltv_matrix — growth analytics: revenue by signup cohort ×
# weeks-since-signup (the LTV triangle).  Each user's cohort (first
# active week) resolves inside the user-keyed kernel; the matrix rollup
# is a calendar²-bounded exchange of exact integer cents + distinct-
# user counts.
# ---------------------------------------------------------------------------
@query(
    "cohort_ltv_matrix",
    f"""
    WITH uw AS (
      SELECT user_id, (epoch_us(ts) // {_WEEK_US}) AS week,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    c AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id)
    SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
           CAST(uw.week - c.cohort AS BIGINT) AS age_weeks,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(uw.cents) AS BIGINT) AS cents
    FROM uw JOIN c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_ltv_matrix(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        week = pc.divide(pc.cast(t["ts"], pa.int64()),
                         pa.scalar(_WEEK_US, pa.int64()))
        part = pa.table({
            "user_id": t["user_id"],
            "week": week,
            "cents": _cents(t["value"]),
        }).group_by(["user_id", "week"]).aggregate([("cents", "sum")])
        return int_key_part_col(
            part.rename_columns(["user_id", "week", "cents"]),
            "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "week"], as_index=False)["cents"].sum()
        cohort = g.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame({
            "cohort_week": cohort.to_numpy(),
            "age_weeks": g["week"].to_numpy() - cohort.to_numpy(),
            "n_users": np.ones(len(g), np.int64),
            "cents": g["cents"].to_numpy(),
        })
        return out.groupby(["cohort_week", "age_weeks"],
                           as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby(["cohort_week", "age_weeks"])
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("cents", alias_name="cents"))
        .sort(["cohort_week", "age_weeks"])
    )


# ---------------------------------------------------------------------------
# funnel_steps_table — the classic funnel drop-off table: how many
# users reach each ordered stage signup → view → click → purchase
# (stages may be separated by arbitrary other events).  Stage
# containment is an ordered-subsequence regex over the per-user
# signature (RE2 both sides); all four stages evaluate on one pass of
# the assembled sequences.
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = [("signup", "s"), ("view", "s.*v"),
                 ("click", "s.*v.*c"), ("purchase", "s.*v.*c.*p")]


@query(
    "funnel_steps_table",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          ELSE 'e' END, '' ORDER BY ts, event_id) AS sig
      FROM events GROUP BY user_id)
    SELECT step, CAST(n_users AS BIGINT) AS n_users FROM (
      SELECT 1 AS ord, 'signup' AS step,
             count(*) FILTER (regexp_matches(sig, 's')) AS n_users FROM seq
      UNION ALL
      SELECT 2, 'view',
             count(*) FILTER (regexp_matches(sig, 's.*v')) FROM seq
      UNION ALL
      SELECT 3, 'click',
             count(*) FILTER (regexp_matches(sig, 's.*v.*c')) FROM seq
      UNION ALL
      SELECT 4, 'purchase',
             count(*) FILTER (regexp_matches(sig, 's.*v.*c.*p')) FROM seq
    ) ORDER BY ord
    """,
)
def funnel_steps_table(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        codes = g["event_type"].map(_CEP_CODE).to_numpy()
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        sigs = pa.array(["".join(codes[s:e]) for s, e in
                         zip(starts, np.r_[starts[1:], n])], pa.string())
        rows = []
        for step, pat in _FUNNEL_STEPS:
            hit = pc.sum(pc.match_substring_regex(sigs, pat)).as_py() or 0
            rows.append((step, int(hit)))
        return pd.DataFrame(rows, columns=["step", "n_users"]) \
            .astype({"n_users": np.int64})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("step", as_index=False)["n_users"].sum()
        order = {s: i for i, (s, _) in enumerate(_FUNNEL_STEPS)}
        g["ord"] = g["step"].map(order)
        return g.sort_values("ord").drop(columns="ord").reset_index(drop=True)

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .repartition(1)  # bounded: 4 rows per partition
        .map_batches(finish, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------
# corr_matrix_lineitem — full Pearson correlation MATRIX over the four
# lineitem numerics (quantity, price, discount, tax) from ONE pass of
# shared exact integer moment sums (4 first moments, 4 second moments,
# 6 cross moments, one n — 15 partials total); each of the 6 pairwise
# correlations is one closed-form IEEE evaluation mirrored op-for-op.
# ---------------------------------------------------------------------------
_CM_VARS = [
    ("qty", "CAST(l_quantity AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"),
]


def _corr_matrix_sql() -> str:
    names = [n for n, _ in _CM_VARS]
    sel = ",\n             ".join(f"{e} AS {n}" for n, e in _CM_VARS)
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for n, _ in _CM_VARS:
        sums.append(f"CAST(sum({n}) AS BIGINT) AS s_{n}")
        # second/cross moments stay HUGEINT: Σ price² exceeds int64
        # well below bench scale
        sums.append(f"sum(CAST({n} AS HUGEINT) * {n}) AS q_{n}")
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    for a, b in pairs:
        sums.append(f"sum(CAST({a} AS HUGEINT) * {b}) AS x_{a}_{b}")
    rows = []
    for a, b in pairs:
        rows.append(f"""
      SELECT '{a}' AS var_a, '{b}' AS var_b,
             (CAST(n AS DOUBLE) * x_{a}_{b}
              - CAST(s_{a} AS DOUBLE) * s_{b})
             / sqrt(CAST(CAST(n AS HUGEINT) * q_{a}
                         - CAST(s_{a} AS HUGEINT) * s_{a} AS DOUBLE)
                    * CAST(CAST(n AS HUGEINT) * q_{b}
                           - CAST(s_{b} AS HUGEINT) * s_{b} AS DOUBLE))
               AS corr
      FROM m""")
    return f"""
    WITH v AS (
      SELECT {sel}
      FROM lineitem),
    m AS (SELECT {', '.join(sums)} FROM v)
    SELECT * FROM ({' UNION ALL '.join(rows)}) ORDER BY var_a, var_b
    """


@query("corr_matrix_lineitem", _corr_matrix_sql())
def corr_matrix_lineitem(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_extendedprice",
                             "l_discount", "l_tax"])
    names = [n for n, _ in _CM_VARS]
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    def _exact_dot(a: np.ndarray, b: np.ndarray) -> int:
        # chunked exact Σ a·b: per-chunk int64 is safe (65536 × 10¹⁴
        # < 2⁶³), chunk totals accumulate as Python ints (unbounded)
        tot = 0
        for i in range(0, len(a), 65536):
            tot += int((a[i:i + 65536] * b[i:i + 65536]).sum())
        return tot

    def partials(t: pa.Table) -> pa.Table:
        cols = {
            "qty": pc.cast(t["l_quantity"], pa.int64())
            .to_numpy(zero_copy_only=False),
            "price": _cents(t["l_extendedprice"])
            .to_numpy(zero_copy_only=False),
            "disc": _cents(t["l_discount"]).to_numpy(zero_copy_only=False),
            "tax": _cents(t["l_tax"]).to_numpy(zero_copy_only=False),
        }
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for n in names:
            out[f"s_{n}"] = pa.array([int(cols[n].sum())], pa.int64())
            q = _exact_dot(cols[n], cols[n])
            # limb split: a per-block second moment can exceed int64,
            # and the cross-block Sum certainly can
            out[f"q_{n}_hi"] = pa.array([q >> 32], pa.int64())
            out[f"q_{n}_lo"] = pa.array([q & 0xFFFFFFFF], pa.int64())
        for a, b in pairs:
            x = _exact_dot(cols[a], cols[b])
            out[f"x_{a}_{b}_hi"] = pa.array([x >> 32], pa.int64())
            out[f"x_{a}_{b}_lo"] = pa.array([x & 0xFFFFFFFF], pa.int64())
        return pa.table(out)

    agg = ds.map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas().sum()

    def limb(name: str) -> int:
        return int(agg[f"{name}_hi"]) * (1 << 32) + int(agg[f"{name}_lo"])

    n_int = int(agg["n"])
    n = float(n_int)
    rows = []
    for a, b in pairs:
        num = n * float(limb(f"x_{a}_{b}")) \
            - float(agg[f"s_{a}"]) * float(agg[f"s_{b}"])
        va = float(n_int * limb(f"q_{a}") - int(agg[f"s_{a}"]) ** 2)
        vb = float(n_int * limb(f"q_{b}") - int(agg[f"s_{b}"]) ** 2)
        rows.append((a, b, num / np.sqrt(va * vb)))
    return pd.DataFrame(rows, columns=["var_a", "var_b", "corr"]) \
        .sort_values(["var_a", "var_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# inter_event_gap_quantiles — latency-distribution analytics: exact
# p50/p90 of the gap (µs) between a user's consecutive events, per
# event type of the LATER event.  Gaps derive in the user-keyed kernel
# (one shift with boundary masking); the quantiles run through the
# generalized histogram-refine order statistics (arbitrary int64
# domain, no task ever holds a full group) — composing the two scale
# primitives.  quantile_disc rank convention both sides.
# ---------------------------------------------------------------------------
@query(
    "inter_event_gap_quantiles",
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           quantile_disc(gap_us, 0.5) AS p50_us,
           quantile_disc(gap_us, 0.9) AS p90_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def inter_event_gap_quantiles(sf_dir: str):
    import ray.data as _rd

    from ..functions.tables import read_table
    from ..stages.quantiles import exact_group_quantiles

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        pair = np.zeros(n, bool)
        if n > 1:
            pair[1:] = uid[1:] == uid[:-1]
        gap = np.empty(n, np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy()[pair],
            "gap_us": gap[pair],
        })

    gap_ds = (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: gaps(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(lambda t: t.select(["event_type", "gap_us"]),
                     batch_format="pyarrow")
        .materialize()  # two consumers: refine rounds re-scan it
    )
    res = exact_group_quantiles(gap_ds, "event_type", "gap_us",
                                quantiles=((1, 2), (9, 10)))
    ns = res.pop("_n")
    rows = [(et, int(ns[et]), int(q[0]), int(q[1]))
            for et, q in sorted(res.items())]
    return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                       "p50_us", "p90_us"]) \
        .astype({"n_gaps": np.int64, "p50_us": np.int64, "p90_us": np.int64})


# ---------------------------------------------------------------------------
# hhi_supplier_concentration — market-concentration analytics: the
# Herfindahl–Hirschman index of supplier quantity share per part,
# carried as the exact integer pair (Σq_s², (Σq)²) with ONE mirrored
# division — plus the supplier count.  (part, supplier) partials bound
# the exchange by the catalog, the per-part kernel is a groupby-sum.
# ---------------------------------------------------------------------------
@query(
    "hhi_supplier_concentration",
    """
    WITH sq AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2)
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(q * q) AS BIGINT) AS sq2,
           CAST(sum(q) AS BIGINT) AS qt,
           CAST(sum(q * q) AS DOUBLE)
             / (CAST(sum(q) AS DOUBLE) * CAST(sum(q) AS DOUBLE)) AS hhi
    FROM sq GROUP BY l_partkey ORDER BY l_partkey
    """,
)
def hhi_supplier_concentration(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        part = pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "q": pc.cast(t["l_quantity"], pa.int64()),
        }).group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return int_key_part_col(
            part.rename_columns(["l_partkey", "l_suppkey", "q"]),
            "l_partkey", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_partkey", "l_suppkey"], as_index=False)["q"].sum()
        q = g["q"].to_numpy()
        g = g.assign(q2=q * q, one=np.int64(1))
        out = g.groupby("l_partkey", as_index=False).agg(
            n_suppliers=("one", "sum"), sq2=("q2", "sum"), qt=("q", "sum"))
        qt = out["qt"].to_numpy().astype(np.float64)
        out["hhi"] = out["sq2"].to_numpy().astype(np.float64) / (qt * qt)
        for c in ("n_suppliers", "sq2", "qt"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("l_partkey")
    )


# ---------------------------------------------------------------------------
# covered_time_per_user — interval-union length (the classic islands
# merge): each event spans [ts, ts + value seconds); per user, the
# number of merged islands and total covered microseconds.  One gpart
# exchange; the kernel is fully vectorized — per-user segments get
# disjoint offset bands so ONE np.maximum.accumulate computes every
# user's running max (band-monotone ⇒ the scan "resets" at user
# boundaries without a loop), islands close with reduceat.  All-integer
# endpoints (epoch µs + exact cent-seconds), so the oracle's window
# formulation hashes identically.
# ---------------------------------------------------------------------------
@query(
    "covered_time_per_user",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 10000 AS e_us
      FROM events),
    w AS (
      SELECT user_id, s_us, e_us,
             max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
      FROM iv),
    g AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN prev_max IS NULL OR s_us > prev_max
                  THEN 1 ELSE 0 END AS brk
      FROM w),
    i AS (
      SELECT user_id, s_us, e_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM g),
    isl AS (
      SELECT user_id, island, max(e_us) - min(s_us) AS len
      FROM i GROUP BY user_id, island)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len) AS BIGINT) AS covered_us
    FROM isl GROUP BY user_id
    """,
)
def covered_time_per_user(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        s = pc.cast(t["ts"], pa.int64())
        vc = _cents(t["value"])
        e = pc.add(s, pc.multiply(vc, pa.scalar(10000, pa.int64())))
        out = pa.table({"user_id": t["user_id"], "s_us": s, "e_us": e})
        return int_key_part_col(out, "user_id", nparts)

    def union_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_islands": pd.Series([], dtype=np.int64),
                                 "covered_us": pd.Series([], dtype=np.int64)})
        uid = g["user_id"].to_numpy().astype(np.int64)
        s = g["s_us"].to_numpy().astype(np.int64)
        e = g["e_us"].to_numpy().astype(np.int64)
        order = np.lexsort((e, s, uid))
        uid, s, e = uid[order], s[order], e[order]
        n = len(uid)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        # disjoint offset bands per user → one global running max scan
        base = int(s.min())
        span = int(max(e.max() - base, 1)) + 1
        seg = np.cumsum(first) - 1  # dense user rank within partition
        shifted_e = (e - base) + seg * span
        runmax = np.maximum.accumulate(shifted_e)
        prev_max = np.empty(n, np.int64)
        prev_max[0] = -1
        prev_max[1:] = runmax[:-1]
        brk = first | (((s - base) + seg * span) > prev_max)
        isl_start = np.flatnonzero(brk)
        # per-island extent: s at island start (sorted ⇒ min), max e inside
        isl_len = (np.maximum.reduceat(e, isl_start)
                   - s[isl_start])
        isl_uid = uid[isl_start]
        # islands are user-contiguous: reduceat over user boundaries
        u_start = np.flatnonzero(
            np.r_[True, isl_uid[1:] != isl_uid[:-1]])
        covered = np.add.reduceat(isl_len, u_start)
        counts = np.r_[u_start[1:], len(isl_uid)] - u_start
        return pd.DataFrame({
            "user_id": isl_uid[u_start],
            "n_islands": counts.astype(np.int64),
            "covered_us": covered.astype(np.int64),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: union_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# twap_value_per_user — EXACT time-weighted average price (TWAP): each
# observation's cents are weighted by the µs it remains current (until
# the user's next event), ÷ the user's observed span.  The standard
# irregular-time-series integral (telemetry/finance) the plain mean
# gets wrong under bursty sampling.  One user-keyed exchange; the
# kernel lexsorts (user, ts, event_id), masks user boundaries, and
# emits FINAL per-user rows (gpart invariant above).  Σ cents·dur_us
# stays far inside int64 (max |cents| ≈ 1e5 × span ≈ 1e13 µs ≈ 1e18);
# the single float per row is the mirrored IEEE division.  Same-ts
# ties get zero duration, so tie order cannot change the sum.
# ---------------------------------------------------------------------------
@query(
    "twap_value_per_user",
    """
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT user_id, c, t,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nt
      FROM o)
    SELECT user_id,
           CAST(sum(c * (nt - t)) AS BIGINT)       AS wsum_c_us,
           CAST(max(t) - min(t) AS BIGINT)         AS span_us,
           CAST(count(*) AS BIGINT)                AS n,
           CAST(CAST(sum(c * (nt - t)) AS BIGINT) AS DOUBLE)
             / CAST(max(t) - min(t) AS DOUBLE)     AS twap_c
    FROM w GROUP BY user_id
    HAVING count(*) >= 2 AND max(t) > min(t)
    """,
)
def twap_value_per_user(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "c": _cents(t["value"]),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        c = g["c"].to_numpy()
        n = len(g)
        same = np.zeros(n, bool)  # row i+1 has the same user as row i
        if n > 1:
            same[1:] = uid[1:] == uid[:-1]
        # duration each observation stays current: next ts − ts, valid
        # only where the next row belongs to the same user
        dur = np.zeros(n, np.int64)
        if n > 1:
            dur[:-1] = np.where(same[1:], t[1:] - t[:-1], 0)
        res = pd.DataFrame({
            "user_id": uid,
            "wsum": c * dur,
            "tmin": t, "tmax": t,
            "n": np.ones(n, np.int64),
        })
        agg = res.groupby("user_id", as_index=False).agg(
            wsum=("wsum", "sum"), tmin=("tmin", "min"),
            tmax=("tmax", "max"), n=("n", "sum"))
        return agg[(agg["n"] >= 2) & (agg["tmax"] > agg["tmin"])]

    def finish(t: pa.Table) -> pa.Table:
        wsum = t["wsum"].to_numpy(zero_copy_only=False).astype(np.int64)
        span = (t["tmax"].to_numpy(zero_copy_only=False)
                - t["tmin"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "wsum_c_us": pa.array(wsum, pa.int64()),
            "span_us": pa.array(span, pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
            "twap_c": pa.array(wsum.astype(np.float64)
                               / span.astype(np.float64), pa.float64()),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# running_balance_floor_per_user — wallet/inventory balance with a floor
# at zero: deposits (purchase/signup cents) and withdrawals (other
# events) apply in (ts, event_id) order, but the balance never goes
# negative — the NONLINEAR reset recurrence b_i = max(b_{i-1} + x_i, 0).
# Closed form makes it vectorizable AND window-expressible on both
# sides:  b_i = s_i − min(0, min_{j≤i} s_j)  with s the plain cumsum
# (a reflected random walk).  One user-keyed exchange; per-user
# segments reset via offset-band cumsum/minimum.accumulate — no Python
# recurrence loop; all arithmetic exact int64 cents.
# ---------------------------------------------------------------------------
@query(
    "running_balance_floor_per_user",
    """
    WITH x AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS amt
      FROM events),
    s1 AS (
      SELECT user_id, event_id, ts, amt,
             sum(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM x),
    s AS (
      SELECT user_id, event_id, cum,
             min(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS runmin
      FROM s1)
    SELECT user_id, event_id,
           CAST(cum - least(CAST(0 AS BIGINT), runmin) AS BIGINT) AS balance_c
    FROM s
    """,
)
def running_balance_floor_per_user(sf_dir: str):
    from ..functions.tables import read_table

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        dep = pc.is_in(t["event_type"],
                       value_set=pa.array(["purchase", "signup"])).to_numpy(
            zero_copy_only=False)
        out = pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "amt": pa.array(np.where(dep, c, -c).astype(np.int64)),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "event_id": pd.Series([], dtype=np.int64),
                                 "balance_c": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        amt = g["amt"].to_numpy()
        n = len(g)
        start = np.zeros(n, bool)
        start[0] = True
        if n > 1:
            start[1:] = uid[1:] != uid[:-1]
        # per-user cumsum via global cumsum minus each segment's carry-in
        # (carry propagated by LATEST-start index, not value max)
        cs = np.cumsum(amt)
        carry = cs - amt  # value of cs just before each row
        last_start = np.maximum.accumulate(
            np.where(start, np.arange(n, dtype=np.int64), 0))
        s = cs - carry[last_start]
        # per-user running min of s, restarted at segment starts: shift
        # each segment into a strictly DECREASING band so an earlier
        # segment's minimum can never leak into a later one
        seg_id = np.cumsum(start) - 1
        k = (np.abs(s).max() + 1) * 2 if n else 1
        band = -seg_id * k
        runmin = np.minimum.accumulate(s + band) - band
        bal = s - np.minimum(0, runmin)
        return pd.DataFrame({"user_id": uid, "event_id": g["event_id"].to_numpy(),
                             "balance_c": bal.astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)
