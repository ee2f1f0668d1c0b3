"""Financial-allocation + distribution-shape operator batch:

- largest-remainder proration (allocate an order's total cents across
  its lineitems by quantity so the parts sum EXACTLY to the total)
- distributed geometric mean (scaled-integer log-sum representation)
- cohort enrichment (log-fold over/under-representation of event types
  among heavy users vs the full population — the GO-term-enrichment
  shape from the reference's annotation domain, reference
  src/etl/disease_etl.py's per-term annotation rollups)
- Lorenz-curve revenue deciles (cumulative spend share by exact
  customer rank — complements gini_per_priority)

Exactness contract as everywhere in this package: integer math end to
end; ``ln`` is rounded to 6 dp half-away-from-zero on BOTH sides before
any sum (numpy SIMD log vs DuckDB libm log differ at the ulp — the
measured gotcha from the zipf/curation batch); the only floats in any
output are single mirrored IEEE divisions (exactly rounded, so
deterministic across implementations).
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


def _ln6(v: np.ndarray) -> np.ndarray:
    """ln of positive ints, scaled 1e6, rounded half-away (ln ≥ 0 here)."""
    return np.floor(np.log(v.astype(np.float64)) * 1e6 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# prorate_totalprice_lineitems — largest-remainder allocation: split each
# order's total cents across its lineitems proportional to quantity, with
# the remainder pennies going to the largest fractional shares (ties by
# linenumber) so per-order allocations sum EXACTLY to the order total.
# The invoice/GL-allocation operator every billing pipeline needs; exact
# integer arithmetic end to end.  Shape: column-pruned reads → tagged
# UNION of both sides → ONE orderkey-partition exchange whose kernel
# merges order totals onto lineitems in-partition and does all the
# segment math (reduceat sums, lexsort ranks), emitting FINAL rows.
# Deliberately NOT Dataset.join: Ray 2.49's hash-join finalize builds a
# schema-less empty table for any partition one side leaves empty and
# Acero errors ("No match for key field") — with a selective %16 filter
# an asymmetric-sparse partition is routine (caught by the hypothesis
# harness).  The tagged-union exchange is also one shuffle cheaper and
# its map side partitions with vectorized numpy instead of the join's
# per-row Python hash loop (transform_pyarrow.hash_partition).
# Orderkey%16 sample bounds the output; the kernels are rate-independent.
# ---------------------------------------------------------------------------
@query(
    "prorate_totalprice_lineitems",
    """
    WITH li AS (
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln_no,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_orderkey % 16 = 0),
    o AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS t
      FROM orders WHERE o_orderkey % 16 = 0),
    j AS (
      SELECT l_orderkey, ln_no, q, t,
             CAST(sum(q) OVER (PARTITION BY l_orderkey) AS BIGINT) AS s
      FROM li JOIN o ON l_orderkey = o_orderkey),
    b AS (
      SELECT l_orderkey, ln_no, (t * q) // s AS base, (t * q) % s AS frac, t,
             CAST(sum((t * q) // s) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS sb
      FROM j),
    r AS (
      SELECT l_orderkey, ln_no, base, t - sb AS rem,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY frac DESC, ln_no) AS rk
      FROM b)
    SELECT l_orderkey, ln_no AS l_linenumber,
           CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r
    """,
)
def prorate_totalprice_lineitems(sf_dir: str):
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    nparts = 64

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["l_orderkey"], 15), 0))
        out = pa.table({
            "l_orderkey": t["l_orderkey"],
            "ln_no": pc.cast(t["l_linenumber"], pa.int64()),
            "q": pc.cast(t["l_quantity"], pa.int64()),
            "t": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_o": pa.array(np.zeros(t.num_rows, np.int8)),
        })
        return int_key_part_col(out, "l_orderkey", nparts)

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["o_orderkey"], 15), 0))
        out = pa.table({
            "l_orderkey": t["o_orderkey"],
            "ln_no": pa.array(np.zeros(t.num_rows, np.int64)),
            "q": pa.array(np.zeros(t.num_rows, np.int64)),
            "t": _cents(t["o_totalprice"]),
            "is_o": pa.array(np.ones(t.num_rows, np.int8)),
        })
        return int_key_part_col(out, "l_orderkey", nparts)

    j = (li.map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True)
         .union(orders.map_batches(o_prep, batch_format="pyarrow",
                                   zero_copy_batch=True)))

    def alloc_kernel(g: pd.DataFrame) -> pd.DataFrame:
        iso = g["is_o"].to_numpy() == 1
        tot = pd.Series(g["t"].to_numpy()[iso],
                        index=g["l_orderkey"].to_numpy()[iso])
        li_ok = g["l_orderkey"].to_numpy()[~iso]
        tv = tot.reindex(li_ok).to_numpy(np.float64)
        keep = ~np.isnan(tv)  # drop orphan lineitems (no matching order)
        if not keep.any():
            return pd.DataFrame({"l_orderkey": np.array([], np.int64),
                                 "l_linenumber": np.array([], np.int64),
                                 "alloc_cents": np.array([], np.int64)})
        ok0 = li_ok[keep]
        ln0 = g["ln_no"].to_numpy()[~iso][keep]
        q0 = g["q"].to_numpy()[~iso][keep]
        t0 = tv[keep].astype(np.int64)  # cents ≤ ~5e8: exact in float64
        # sort once so orders are contiguous
        order = np.lexsort((ln0, ok0))
        ok = ok0[order]
        ln_no = ln0[order]
        q = q0[order]
        t = t0[order]
        starts = np.flatnonzero(np.concatenate(([True], ok[1:] != ok[:-1])))
        gid = np.cumsum(np.concatenate(([0], (ok[1:] != ok[:-1]).astype(np.int64))))
        s = np.add.reduceat(q, starts)[gid]
        tq = t * q
        base = tq // s
        frac = tq % s
        rem = (t[starts] - np.add.reduceat(base, starts))[gid]
        # rank within order by (frac DESC, ln_no ASC): global lexsort then
        # position-minus-group-start (groups stay contiguous under the
        # stable composite key (ok, -frac, ln_no))
        rk_order = np.lexsort((ln_no, -frac, ok))
        rank = np.empty(len(ok), np.int64)
        pos = np.arange(len(ok), dtype=np.int64)
        grp_start = starts[gid]  # first index of each order's run
        rank[rk_order] = pos - grp_start[rk_order] + 1
        # grp_start must be recomputed in rk_order space: under the
        # (ok, -frac, ln_no) sort the order runs occupy the SAME index
        # ranges as under (ok, ln_no), so starts/gid carry over.
        alloc = base + (rank <= rem).astype(np.int64)
        return pd.DataFrame({"l_orderkey": ok, "l_linenumber": ln_no,
                             "alloc_cents": alloc})

    # kernel emits exactly the final projection — no trailing select (an
    # all-orphan partition emits a typed empty frame; a schema-less Ray
    # empty block would break any downstream column reference)
    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        j, "gpart", lambda g: alloc_kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# geomean_price_per_priority — distributed geometric mean per order
# priority in the scaled-log-sum representation: Σ round6(ln cents) as
# int64 partials (the only distributable exact form), count, and the
# mirrored IEEE division chain for the log-mean.  The geometric mean
# itself is exp(log_geomean) — left to the consumer because exp is NOT
# exactly rounded and would ulp-flip the hash (measured, see module doc).
# ---------------------------------------------------------------------------
@query(
    "geomean_price_per_priority",
    """
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CAST(round(ln(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                               AS DOUBLE)) * 1000000) AS BIGINT) AS lnv
      FROM orders),
    s AS (SELECT priority, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(lnv) AS BIGINT) AS ln_sum_6dp
          FROM c GROUP BY priority)
    SELECT priority, n, ln_sum_6dp,
           CAST(ln_sum_6dp AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             AS log_geomean
    FROM s
    """,
)
def geomean_price_per_priority(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        part = pa.table({
            "priority": t["o_orderpriority"],
            "lnv": pa.array(_ln6(cents)),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        })
        return part.group_by("priority").aggregate([("lnv", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum(lnv_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["sum(n_sum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "priority": t["priority"],
            "n": pa.array(n),
            "ln_sum_6dp": pa.array(s),
            "log_geomean": pa.array(s.astype(np.float64) / n.astype(np.float64)
                                    / 1e6),
        })

    return (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("priority").aggregate(Sum("lnv_sum"), Sum("n_sum"))
            .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True))


# ---------------------------------------------------------------------------
# type_enrichment_heavy_users — enrichment analysis: which event types
# are over/under-represented among HEAVY users (strictly above the mean
# events-per-user) vs the whole population — the GO-term-enrichment
# shape (reference's per-term annotation rollups) expressed as an exact
# log2-fold in the round-ln-first scaled-int representation:
# lnfold = ln6(k_coh) + ln6(n_all) − ln6(k_all) − ln6(n_coh).
# Shape: per-(user,type) partial counts → ONE user-keyed exchange whose
# kernel emits per-user rows; the (user,type) matrix is bounded
# (|users| × 5 types), so the cohort threshold + fold math runs on the
# bounded aggregate (the kcore/mutual_topk bounded-set precedent; the
# unbounded-user scale path is the rfm two-pass broadcast-threshold).
# ---------------------------------------------------------------------------
@query(
    "type_enrichment_heavy_users",
    """
    WITH pc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY user_id),
    coh AS (SELECT user_id FROM pc
            WHERE c * (SELECT count(*) FROM pc)
                  > (SELECT CAST(sum(c) AS BIGINT) FROM pc)),
    ck AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k_coh
           FROM events WHERE user_id IN (SELECT user_id FROM coh)
           GROUP BY event_type),
    ak AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k_all
           FROM events GROUP BY event_type),
    tot AS (SELECT (SELECT CAST(COALESCE(sum(k_coh), 0) AS BIGINT) FROM ck)
                     AS n_coh,
                   (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_all)
    SELECT ak.event_type, CAST(COALESCE(ck.k_coh, 0) AS BIGINT) AS k_coh,
           ak.k_all, tot.n_coh, tot.n_all,
           CASE WHEN COALESCE(ck.k_coh, 0) > 0 THEN
             CAST(round(ln(CAST(ck.k_coh AS DOUBLE)) * 1000000) AS BIGINT)
             + CAST(round(ln(CAST(tot.n_all AS DOUBLE)) * 1000000) AS BIGINT)
             - CAST(round(ln(CAST(ak.k_all AS DOUBLE)) * 1000000) AS BIGINT)
             - CAST(round(ln(CAST(tot.n_coh AS DOUBLE)) * 1000000) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS lnfold_6dp
    FROM ak LEFT JOIN ck USING (event_type) CROSS JOIN tot
    """,
)
def type_enrichment_heavy_users(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        part = pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "c": pa.array(np.ones(t.num_rows, np.int64))})
        return part.group_by(["user_id", "event_type"]).aggregate([("c", "sum")])

    # bounded: |users| × |types| rows after the one exchange
    ut = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
          .groupby(["user_id", "event_type"]).sum("c_sum")
          .to_pandas())
    per_user = ut.groupby("user_id", as_index=False)["sum(c_sum)"].sum()
    n_users = len(per_user)
    total = int(per_user["sum(c_sum)"].sum())
    heavy = set(per_user.loc[
        per_user["sum(c_sum)"].to_numpy() * n_users > total, "user_id"])
    ut["in_coh"] = ut["user_id"].isin(heavy)
    ak = ut.groupby("event_type", as_index=False)["sum(c_sum)"].sum() \
           .rename(columns={"sum(c_sum)": "k_all"}).sort_values("event_type")
    ck = (ut[ut["in_coh"]].groupby("event_type", as_index=False)["sum(c_sum)"]
          .sum().rename(columns={"sum(c_sum)": "k_coh"}))
    m = ak.merge(ck, on="event_type", how="left")
    k_coh = m["k_coh"].fillna(0).to_numpy(np.int64)
    k_all = m["k_all"].to_numpy(np.int64)
    n_coh = int(k_coh.sum())
    lnfold = np.where(
        k_coh > 0,
        _ln6(np.maximum(k_coh, 1)) + _ln6(np.array([total], np.int64))
        - _ln6(k_all) - _ln6(np.array([max(n_coh, 1)], np.int64)),
        0).astype(np.int64)
    return pa.table({
        "event_type": pa.array(m["event_type"].to_numpy(object), pa.string()),
        "k_coh": pa.array(k_coh),
        "k_all": pa.array(k_all),
        "n_coh": pa.array(np.full(len(m), n_coh, np.int64)),
        "n_all": pa.array(np.full(len(m), total, np.int64)),
        "lnfold_6dp": pa.array(lnfold),
    })


# ---------------------------------------------------------------------------
# lorenz_decile_revenue — Lorenz-curve points: customers ranked by total
# spend (ties by custkey), split into exact rank deciles
# (⌊(rank−1)·10/n⌋), each decile's customer count, cents, cumulative
# cents and cumulative share.  Fully distributed exact ranking via the
# two-pass row_number (equal-width cents buckets from a bounded min/max
# aggregate → per-bucket counts prefix-sum into offsets → per-bucket
# sort adds the offset), the global_rank_documents pattern over a
# DERIVED key.  The only float is the mirrored cum/total division.
# ---------------------------------------------------------------------------
@query(
    "lorenz_decile_revenue",
    """
    WITH s AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS c
      FROM orders GROUP BY o_custkey),
    r AS (SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS rk FROM s),
    d AS (SELECT c, CAST(((rk - 1) * 10) // (SELECT count(*) FROM s)
                         AS BIGINT) AS decile FROM r),
    g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(c) AS BIGINT) AS cents
          FROM d GROUP BY decile)
    SELECT decile, n_customers, cents,
           CAST(sum(cents) OVER (ORDER BY decile) AS BIGINT) AS cum_cents,
           CAST(CAST(sum(cents) OVER (ORDER BY decile) AS BIGINT) AS DOUBLE)
             / CAST((SELECT CAST(sum(c) AS BIGINT) FROM s) AS DOUBLE)
             AS cum_share
    FROM g
    """,
)
def lorenz_decile_revenue(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    n_buckets = 32

    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    nparts = _join_parts()

    def partial(t: pa.Table) -> pa.Table:
        part = pa.table({"o_custkey": t["o_custkey"],
                         "c": _cents(t["o_totalprice"])})
        g = part.group_by("o_custkey").aggregate([("c", "sum")])
        return int_key_part_col(
            pa.table({"o_custkey": g["o_custkey"],
                      "c": g["c_sum"].cast(pa.int64())}),
            "o_custkey", nparts)

    def spend_part(g: pa.Table) -> pa.Table:
        gg = g.group_by("o_custkey").aggregate([("c", "sum")])
        return pa.table({"o_custkey": gg["o_custkey"],
                         "c": gg["c_sum"].cast(pa.int64())})

    # one row per customer; narrow, object-store resident, reused 3×
    spend = exchange_map_groups(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "gpart", spend_part, nparts, drop_part_col=True).materialize()

    mm = (spend.map_batches(
        lambda t: pa.table({"lo": pa.array([pc.min(t["c"]).as_py() or 0]),
                            "hi": pa.array([pc.max(t["c"]).as_py() or 0])}),
        batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas())
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max()) + 1
    width = max(1, (hi - lo + n_buckets - 1) // n_buckets)

    def bucketize(t: pa.Table) -> pa.Table:
        b = ((t["c"].to_numpy(zero_copy_only=False) - lo) // width).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = spend.map_batches(bucketize, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    def bcount_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("n", "sum")])
        return pa.table({"bucket": g["bucket"],
                         "n": g["n_sum"].cast(pa.int64())})

    counts = _collect_tree(
        bucketed.map_batches(
            lambda t: (lambda g: pa.table({
                "bucket": g["bucket"],
                "n": g["bucket_count"].cast(pa.int64())}))(
                t.select(["bucket"]).group_by("bucket")
                 .aggregate([("bucket", "count")])),
            batch_format="pyarrow", zero_copy_batch=True),
        bcount_combine).to_pandas().sort_values("bucket")
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    np.add.at(offs, counts["bucket"].to_numpy() + 1, counts["n"].to_numpy())
    offsets = dict(zip(range(n_buckets), np.cumsum(offs)[:n_buckets]))
    n_cust = int(counts["n"].sum())

    # bucket ids ARE partition ids in [0, n_buckets): the exchange routes
    # each bucket to its reduce task directly (no sampling sort), and the
    # 10-row decile final folds through the combine tree
    def decile_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "n_customers": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        base = offsets[int(g["bucket"][0].as_py())]
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cust, c))
        c = c[order]
        rk = base + 1 + np.arange(len(c), dtype=np.int64)
        dec = ((rk - 1) * 10) // n_cust  # ascending along rk
        first = np.r_[True, dec[1:] != dec[:-1]]
        starts = np.flatnonzero(first)
        return pa.table({
            "decile": pa.array(dec[first]),
            "c": pa.array(np.add.reduceat(c, starts).astype(np.int64)),
            "n_customers": pa.array(
                (np.r_[starts[1:], len(c)] - starts).astype(np.int64)),
        })

    from ..stages.exchange import exchange_map_groups as _exg

    def dec_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("decile").aggregate(
            [("c", "sum"), ("n_customers", "sum")])
        return pa.table({"decile": g["decile"],
                         "c": g["c_sum"].cast(pa.int64()),
                         "n_customers": g["n_customers_sum"].cast(pa.int64())})

    dec = _collect_tree(
        _exg(bucketed, "bucket", decile_part, n_buckets),
        dec_combine).to_pandas().sort_values("decile")
    cents = dec["c"].to_numpy(np.int64)
    cum = np.cumsum(cents)
    total = int(cum[-1])
    return pa.table({
        "decile": pa.array(dec["decile"].to_numpy(np.int64)),
        "n_customers": pa.array(dec["n_customers"].to_numpy(np.int64)),
        "cents": pa.array(cents),
        "cum_cents": pa.array(cum),
        "cum_share": pa.array(cum.astype(np.float64) / np.float64(total)),
    })
