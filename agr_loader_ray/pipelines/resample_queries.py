"""Resampling / matching / attribution operator batch:

- linear-interpolation resample to an hourly grid (the continuous
  counterpart of gap_fill_hourly's zero-fill densify)
- FIFO lot consumption in closed interval form (cumulative-quantity
  intervals instead of iterative matching — the classic trick that
  turns an order-dependent stateful match into window arithmetic)
- linear multi-touch attribution (equal credit across pre-conversion
  touchpoints, integer-floor credit units)

Exactness contract: integers end to end; the ONE float per interp row
is the mirrored IEEE expression c_prev + (Δc·Δt)/T evaluated in the
same operation order on both sides (±·/ are exactly rounded, so
deterministic across numpy and DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.tables import read_table
from ..stages.partition import int_key_part_col
from .queries import _cents, _join_parts, query

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# interp_resample_hourly — per-user hourly resample with LINEAR
# interpolation between the surrounding events (ties at equal ts broken
# by event_id: the LAST event at-or-before the gridpoint is the left
# anchor, the first event strictly after is the right anchor).  A
# generator op like gap_fill_hourly: one user-keyed exchange, grid built
# in-kernel with offset math, anchors found with ONE vectorized
# searchsorted over a composite (user-rank, ts) key — no per-user loop.
# Reference analogue: the reference's expression-curve normalization
# resamples stage-series onto a common grid (wherever a downstream
# consumer needs aligned timestamps).
# ---------------------------------------------------------------------------
@query(
    "interp_resample_hourly",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS c, event_id
      FROM events),
    b AS (SELECT user_id,
                 ((min(t) + 3599999999) // 3600000000) * 3600000000 AS g0,
                 (max(t) // 3600000000) * 3600000000 AS g1
          FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(g0, g1, 3600000000)) AS t
      FROM b WHERE g0 <= g1),
    u AS (
      SELECT user_id, t, c, event_id, 0 AS is_grid FROM e
      UNION ALL
      SELECT user_id, t, NULL AS c, NULL AS event_id, 1 AS is_grid FROM grid),
    w AS (
      SELECT user_id, t, is_grid,
             last_value(c IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid, event_id
                ROWS UNBOUNDED PRECEDING) AS c_prev,
             last_value(CASE WHEN c IS NOT NULL THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid, event_id
                ROWS UNBOUNDED PRECEDING) AS t_prev,
             first_value(c IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS c_next,
             first_value(CASE WHEN c IS NOT NULL THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, is_grid, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS t_next
      FROM u)
    SELECT user_id, make_timestamp(t) AS hour,
           CASE WHEN t = t_prev THEN CAST(c_prev AS DOUBLE)
                ELSE CAST(c_prev AS DOUBLE)
                     + (CAST(c_next - c_prev AS DOUBLE)
                        * CAST(t - t_prev AS DOUBLE))
                       / CAST(t_next - t_prev AS DOUBLE)
           END AS v_interp
    FROM w WHERE is_grid = 1
    """,
)
def interp_resample_hourly(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value", "event_id"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        part = pa.table({
            "user_id": t["user_id"],
            "t": pc.cast(t["ts"], pa.int64()),
            "c": _cents(t["value"]),
            "event_id": t["event_id"],
        })
        return int_key_part_col(part, "user_id", nparts)

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        tv = g["t"].to_numpy()
        cv = g["c"].to_numpy()
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(g)] - 1
        g0 = -(-tv[starts] // _HOUR_US) * _HOUR_US  # ceil to hour
        g1 = (tv[ends] // _HOUR_US) * _HOUR_US       # floor to hour
        spans = np.maximum((g1 - g0) // _HOUR_US + 1, 0)
        offsets = np.r_[0, np.cumsum(spans)]
        total = int(offsets[-1])
        if total == 0:
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "hour_us": np.array([], np.int64),
                                 "v_interp": np.array([], np.float64)})
        gu = np.repeat(uid[starts], spans)
        cum = np.arange(total) - np.repeat(offsets[:-1], spans)
        gt = np.repeat(g0, spans) + cum * _HOUR_US
        # composite (user-rank, ts-offset) keys make ONE searchsorted
        # resolve both anchors across every user band at once
        tmin = int(tv.min())
        span_max = int(tv.max()) - tmin + _HOUR_US + 1
        urank = np.cumsum(first) - 1  # dense 0..n_users-1, sorted order
        ev_key = urank * span_max + (tv - tmin)
        gd_key = np.repeat(np.arange(len(starts)), spans) * span_max + (gt - tmin)
        nxt = np.searchsorted(ev_key, gd_key, side="right")
        prv = nxt - 1  # last event with ts <= grid (max event_id via sort)
        t_prev = tv[prv]
        c_prev = cv[prv]
        at_event = gt == t_prev
        # right anchor exists unless the gridpoint sits on the user's
        # last event (gt == g1 == t_prev) — guarded by at_event
        nxt_c = np.minimum(nxt, len(tv) - 1)
        dc = (cv[nxt_c] - c_prev).astype(np.float64)
        dt = (gt - t_prev).astype(np.float64)
        tt = (tv[nxt_c] - t_prev).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = c_prev.astype(np.float64) + (dc * dt) / np.where(tt == 0, 1, tt)
        v = np.where(at_event, c_prev.astype(np.float64), v)
        return pd.DataFrame({"user_id": gu, "hour_us": gt, "v_interp": v})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "hour": pc.cast(t["hour_us"], pa.timestamp("us")),
            "v_interp": t["v_interp"],
        })

    return (ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("gpart")
            .map_groups(interp, batch_format="pandas")
            .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True))


# ---------------------------------------------------------------------------
# fifo_lot_consumption — FIFO matching in closed interval form: per
# part, sells (returnflag 'R') consume buy lots (other flags) in
# (shipdate, orderkey, linenumber) order.  The iterative match collapses
# to window arithmetic: lot i with cumulative-quantity interval
# [cumq_prev_i, cumq_prev_i + q_i) is consumed by
# clamp(S − cumq_prev_i, 0, q_i) where S is the part's total sell
# quantity — order-dependent state becomes ONE prefix sum.  Output per
# part: sell/buy totals, matched quantity, and the exact realized value
# Σ consumed_i · lot_cents_i (quantity-weighted lot prices).  One
# part-keyed exchange; partkey%8 sample bounds the output.
# ---------------------------------------------------------------------------
@query(
    "fifo_lot_consumption",
    """
    WITH f AS (
      SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_returnflag = 'R' AS is_sell
      FROM lineitem WHERE l_partkey % 8 = 0),
    s AS (SELECT l_partkey, CAST(COALESCE(sum(CASE WHEN is_sell THEN q END), 0)
                                 AS BIGINT) AS sell_q
          FROM f GROUP BY l_partkey),
    b AS (
      SELECT l_partkey, q, cents,
             CAST(sum(q) OVER (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) - q AS BIGINT)
               AS cumq_prev
      FROM f WHERE NOT is_sell),
    c AS (
      SELECT b.l_partkey, b.q, b.cents,
             least(greatest(s.sell_q - b.cumq_prev, 0), b.q) AS consumed
      FROM b JOIN s USING (l_partkey))
    SELECT s.l_partkey, s.sell_q,
           CAST(COALESCE(sum(c.q), 0) AS BIGINT) AS buy_q,
           CAST(COALESCE(sum(c.consumed), 0) AS BIGINT) AS matched_q,
           CAST(COALESCE(sum(c.consumed * c.cents), 0) AS BIGINT)
             AS realized_value
    FROM s LEFT JOIN c USING (l_partkey)
    GROUP BY s.l_partkey, s.sell_q
    """,
)
def fifo_lot_consumption(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_shipdate", "l_orderkey",
                             "l_linenumber", "l_quantity", "l_extendedprice",
                             "l_returnflag"])
    nparts = 64

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["l_partkey"], 7), 0))
        part = pa.table({
            "l_partkey": t["l_partkey"],
            "sd": pc.cast(t["l_shipdate"], pa.int64()),
            "ok": t["l_orderkey"],
            "ln": pc.cast(t["l_linenumber"], pa.int64()),
            "q": pc.cast(t["l_quantity"], pa.int64()),
            "cents": _cents(t["l_extendedprice"]),
            "is_sell": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int8()),
        })
        return int_key_part_col(part, "l_partkey", nparts)

    def fifo_kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["ln"].to_numpy(), g["ok"].to_numpy(),
                            g["sd"].to_numpy(), g["l_partkey"].to_numpy()))
        pk = g["l_partkey"].to_numpy()[order]
        q = g["q"].to_numpy()[order]
        cents = g["cents"].to_numpy()[order]
        sell = g["is_sell"].to_numpy()[order] == 1
        first = np.empty(len(pk), bool)
        first[0] = True
        first[1:] = pk[1:] != pk[:-1]
        gid = np.cumsum(first) - 1
        n_parts = int(gid[-1]) + 1
        sell_q = np.bincount(gid, weights=np.where(sell, q, 0),
                             minlength=n_parts).astype(np.int64)
        buy_q_tot = np.bincount(gid, weights=np.where(sell, 0, q),
                                minlength=n_parts).astype(np.int64)
        # buy-lot cumulative intervals: prefix sum of buy q within part
        bq = np.where(sell, 0, q)
        cum = np.cumsum(bq)
        starts = np.flatnonzero(first)
        cum_prev = cum - bq - np.repeat((cum - bq)[starts], np.diff(
            np.r_[starts, len(pk)]))
        consumed = np.clip(sell_q[gid] - cum_prev, 0, bq)
        matched = np.bincount(gid, weights=consumed,
                              minlength=n_parts).astype(np.int64)
        realized = np.bincount(gid, weights=consumed * cents,
                               minlength=n_parts).astype(np.int64)
        return pd.DataFrame({
            "l_partkey": pk[starts],
            "sell_q": sell_q,
            "buy_q": buy_q_tot,
            "matched_q": matched,
            "realized_value": realized,
        })

    return (ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("gpart")
            .map_groups(fifo_kernel, batch_format="pandas"))


# ---------------------------------------------------------------------------
# attribution_linear — linear multi-touch attribution: each user's
# view/click touches strictly before their FIRST purchase (ts, then
# event_id) share the conversion credit equally, in integer micro-units
# (1e6 // n_touches — floor semantics documented, so sums are exact
# ints).  Complements last_touch_attribution.  ONE user-keyed exchange;
# the kernel emits per-type partials, a 2-row final aggregate follows.
# ---------------------------------------------------------------------------
@query(
    "attribution_linear",
    """
    WITH fp AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1),
    t AS (
      SELECT e.user_id, e.event_type
      FROM events e JOIN fp USING (user_id)
      WHERE e.event_type IN ('view', 'click')
        AND (e.ts < fp.ts OR (e.ts = fp.ts AND e.event_id < fp.event_id))),
    n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM t
          GROUP BY user_id),
    c AS (SELECT t.event_type, 1000000 // n.n AS credit
          FROM t JOIN n USING (user_id))
    SELECT event_type, CAST(count(*) AS BIGINT) AS touches,
           CAST(sum(credit) AS BIGINT) AS credit_sum
    FROM c GROUP BY event_type
    """,
)
def attribution_linear(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type",
                                               "event_id"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view", "click"]))
        t = t.filter(keep)
        part = pa.table({
            "user_id": t["user_id"],
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })
        return int_key_part_col(part, "user_id", nparts)

    def credit_kernel(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(object)
        is_p = et == "purchase"
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        pos = np.arange(len(g), dtype=np.int64)
        # first purchase position per user (len(g) if none)
        pp = np.where(is_p, pos, len(g))
        fpp = np.minimum.reduceat(pp, starts)
        has_p = fpp < np.r_[starts[1:], len(g)]
        touch = ~is_p & (pos < fpp[gid]) & has_p[gid]
        n = np.bincount(gid, weights=touch, minlength=len(starts)).astype(np.int64)
        credit = np.where(n > 0, 1_000_000 // np.maximum(n, 1), 0)
        out = pd.DataFrame({"event_type": et[touch],
                            "credit": credit[gid][touch],
                            "touches": np.ones(int(touch.sum()), np.int64)})
        agg = out.groupby("event_type", as_index=False).agg(
            touches=("touches", "sum"), credit_sum=("credit", "sum"))
        return pa.table({
            "event_type": pa.array(agg["event_type"].to_numpy(object),
                                   pa.string()),
            "touches": pa.array(agg["touches"].to_numpy(np.int64)),
            "credit_sum": pa.array(agg["credit_sum"].to_numpy(np.int64)),
        })

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "touches": pc.cast(t["sum(touches)"], pa.int64()),
            "credit_sum": pc.cast(t["sum(credit_sum)"], pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("gpart")
            .map_groups(credit_kernel, batch_format="pandas")
            .groupby("event_type").aggregate(Sum("touches"), Sum("credit_sum"))
            .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True))
