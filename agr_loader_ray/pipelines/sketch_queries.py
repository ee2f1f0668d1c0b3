"""Mergeable-sketch and grouping/join extension operators.

Second sketch family next to the KMV estimator in ``queries.py``:
HyperLogLog-style distinct counting and Count-Min frequency
estimation, both designed the same way — the sketch state is a small
MERGEABLE table of integer partials (registers / counters) folded
through ``map_batches`` combiners and ONE bounded exchange, and the
estimator itself is exact integer arithmetic so the DuckDB oracle
recomputes the IDENTICAL estimate and the driver's typed value hash
gates an *approximate* algorithm exactly.

Also here: the remaining SQL grouping/join surface — GROUP BY CUBE
(all four grouping sets from one distributed finest-level pass) and a
FULL OUTER join — plus the ordered exponentially-weighted recency
score and the two-pass z-score outlier counter (exact integer moments
→ one closed-form IEEE evaluation mirrored op-for-op in SQL).

Reference provenance: the reference's QC/summary counting passes
(src/etl/summary_etl.py) motivate cheap cardinality/frequency
estimates at 100 TB where exact COUNT DISTINCT per key would shuffle
everything; its resolver "best candidate" passes motivate the
outlier/score shapes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Sum

from ..functions.pools import join_parts
from ..functions.tables import read_table
from ..stages.partition import int_key_part_col
from .queries import _cents, query

# ---------------------------------------------------------------------------
# hll_distinct_estimate — HyperLogLog-style distinct-user sketch per
# event type.  m = 64 registers; the register is the top-6 hash bits
# and the rank is the trailing-zero count of the remaining 58 bits + 1
# (the Flajolet–Martin geometric observable — identically distributed
# to HLL's leading-zero rank, but exactly computable in BOTH numpy
# ((w & -w) via frexp) and DuckDB (bit_count((w & -w) - 1))).
# The hash MUST be a real bit mixer: an affine LCG is a 2-adic isometry
# (tz(A·u+B) = v₂(u − u₀)), which makes trailing-zero ranks reflect the
# key layout, not uniform bits — measured 1.9× overestimate on dense
# ids.  splitmix64's finalizer is used instead; the oracle reproduces
# its 64-bit wrapping multiplies in HUGEINT via a 32-bit-split mulmod
# (a·b mod 2^64 = (a_lo·b + ((a_hi·b) mod 2^32)·2^32) mod 2^64 — the
# full product would overflow int128).
# Registers fold as MAX partials — per batch ≤ |types|·64 rows — so the
# exchange is bounded regardless of input size; the harmonic-mean
# estimator runs in exact integer math (Σ 2^(59−M) as a Python
# int / HUGEINT, one integer division) so the oracle's estimate is
# bit-identical.  Raw-HLL variant: no linear-counting branch (ln()
# differs by 1 ulp between libms — measured; see entropy note in
# stats_queries) — documented bias below n ≈ 2.5·m.
# ---------------------------------------------------------------------------
_HLL_M = 64  # registers (top 6 hash bits)
_HLL_GAMMA = 0x9E3779B97F4A7C15  # splitmix64 increment
_HLL_C1 = 0xBF58476D1CE4E5B9
_HLL_C2 = 0x94D049BB133111EB
_HLL_WBITS = 58  # rank bits; rank ∈ [1, 59], 59 ⇔ w == 0
_HLL_ALPHA_NUM, _HLL_ALPHA_DEN = 709, 1000  # alpha_64 ≈ 0.709
_POW64 = 1 << 64


def _sql_mulmod64(z_expr: str, c: int) -> str:
    """(z·c) mod 2^64 in HUGEINT without int128 overflow."""
    return (f"((({z_expr}) % 4294967296::HUGEINT) * {c}::HUGEINT"
            f" + (((({z_expr}) // 4294967296::HUGEINT) * {c}::HUGEINT)"
            f" % 4294967296::HUGEINT) * 4294967296::HUGEINT)"
            f" % {_POW64}::HUGEINT")


def _splitmix64_np(u: np.ndarray) -> np.ndarray:
    z = u.astype(np.uint64) + np.uint64(_HLL_GAMMA)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_HLL_C1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_HLL_C2)
    return z ^ (z >> np.uint64(31))


@query(
    "hll_distinct_estimate",
    f"""
    WITH z0 AS (
      SELECT DISTINCT event_type,
             (user_id::HUGEINT + {_HLL_GAMMA}::HUGEINT)
              % {_POW64}::HUGEINT AS z
      FROM events),
    z1 AS (SELECT event_type,
                  {_sql_mulmod64('xor(z, z >> 30)', _HLL_C1)} AS z FROM z0),
    z2 AS (SELECT event_type,
                  {_sql_mulmod64('xor(z, z >> 27)', _HLL_C2)} AS z FROM z1),
    h AS (SELECT event_type, xor(z, z >> 31) AS hv FROM z2),
    r AS (
      SELECT event_type,
             CAST(hv // {1 << _HLL_WBITS}::HUGEINT AS BIGINT) AS reg,
             CAST(hv % {1 << _HLL_WBITS}::HUGEINT AS BIGINT) AS w
      FROM h),
    rk AS (
      SELECT event_type, reg,
             CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE bit_count(((w & -w) - 1)::BIGINT) + 1 END AS rank
      FROM r),
    m AS (SELECT event_type, reg, max(rank) AS mr
          FROM rk GROUP BY event_type, reg),
    s AS (SELECT event_type,
                 CAST(sum((1::BIGINT << ({_HLL_WBITS + 1} - mr))::HUGEINT)
                      AS HUGEINT)
                 + ({_HLL_M} - count(*))::HUGEINT
                   * (1::BIGINT << {_HLL_WBITS + 1})::HUGEINT AS big_s
          FROM m GROUP BY event_type)
    SELECT event_type,
           CAST(({_HLL_M * _HLL_M}::HUGEINT * {_HLL_ALPHA_NUM}::HUGEINT
                 * (1::BIGINT << {_HLL_WBITS + 1})::HUGEINT)
                // ({_HLL_ALPHA_DEN}::HUGEINT * big_s) AS BIGINT)
             AS n_distinct_est
    FROM s
    """,
)
def hll_distinct_estimate(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        hv = _splitmix64_np(uid)
        reg = (hv >> np.uint64(_HLL_WBITS)).astype(np.int64)
        w = hv & np.uint64((1 << _HLL_WBITS) - 1)
        # rank = trailing zeros + 1: isolate the low bit, frexp exponent
        # IS tz+1 exactly (powers of two are exact in float64)
        low = w & (~w + np.uint64(1))
        _, expo = np.frexp(low.astype(np.float64))
        rank = np.where(w == 0, _HLL_WBITS + 1, expo).astype(np.int64)
        df = (pd.DataFrame({"event_type": t["event_type"].to_numpy(
                                zero_copy_only=False),
                            "reg": reg, "rank": rank})
              .groupby(["event_type", "reg"], sort=False, as_index=False)
              .max())  # ≤ |types|·64 rows per batch
        return pa.table({"event_type": pa.array(df["event_type"]),
                         "reg": pa.array(df["reg"].to_numpy(), pa.int64()),
                         "rank": pa.array(df["rank"].to_numpy(), pa.int64())})

    regs = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "reg"])
            .aggregate(Max("rank", alias_name="rank")))

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        # Python ints: Σ 2^(59−M) needs 66 bits at m=64 (oracle: HUGEINT)
        big_s = sum(1 << (_HLL_WBITS + 1 - int(r)) for r in g["rank"])
        big_s += (_HLL_M - len(g)) * (1 << (_HLL_WBITS + 1))
        est = (_HLL_M * _HLL_M * _HLL_ALPHA_NUM
               * (1 << (_HLL_WBITS + 1))) // (_HLL_ALPHA_DEN * big_s)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_distinct_est": np.array([est], dtype=np.int64)})

    # |event types| groups — bounded merge, same contract as KMV
    return regs.groupby("event_type").map_groups(
        estimate, batch_format="pandas")


# ---------------------------------------------------------------------------
# cms_user_freq_estimate — Count-Min sketch point queries: estimated
# per-user event counts from a d=2 × w=512 counter grid.  Build: per
# batch, each row increments counter[j][h_j(uid)] — partials are ≤ 1024
# (row, col, cnt) rows per batch folded by ONE bounded groupby-sum; the
# 4 KiB grid then broadcasts into the probe pass (the sketch never
# re-ships per batch).  Probe: est(u) = min_j counter[j][h_j(u)] over
# the distinct-user stream.  All-integer (no estimator float), so the
# oracle recomputes identical estimates; est ≥ exact count always
# (one-sided error — asserted in tests).
# ---------------------------------------------------------------------------
_CMS_W_BITS = 9  # 512 columns
_CMS_A1, _CMS_B1 = 6364136223846793005, 1442695040888963407
_CMS_A2, _CMS_B2 = 3935559000370003845, 2691343689449507681


def _cms_sql_col(a: int, b: int) -> str:
    return (f"CAST((({a}::HUGEINT * user_id::HUGEINT + {b}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)"
            f" // {1 << (64 - _CMS_W_BITS)}::HUGEINT AS BIGINT)")


@query(
    "cms_user_freq_estimate",
    f"""
    WITH h AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             {_cms_sql_col(_CMS_A1, _CMS_B1)} AS c1,
             {_cms_sql_col(_CMS_A2, _CMS_B2)} AS c2
      FROM events GROUP BY user_id),
    s1 AS (SELECT c1 AS col, CAST(sum(n) AS BIGINT) AS cnt
           FROM h GROUP BY c1),
    s2 AS (SELECT c2 AS col, CAST(sum(n) AS BIGINT) AS cnt
           FROM h GROUP BY c2)
    SELECT h.user_id, CAST(least(s1.cnt, s2.cnt) AS BIGINT) AS est_n
    FROM h JOIN s1 ON h.c1 = s1.col JOIN s2 ON h.c2 = s2.col
    """,
)
def cms_user_freq_estimate(sf_dir: str):
    import ray as _ray

    ds = read_table(sf_dir, "events", columns=["user_id"])
    w = 1 << _CMS_W_BITS

    def _cols(uid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = uid.astype(np.uint64)
        with np.errstate(over="ignore"):
            h1 = np.uint64(_CMS_A1) * u + np.uint64(_CMS_B1)
            h2 = np.uint64(_CMS_A2) * u + np.uint64(_CMS_B2)
        sh = np.uint64(64 - _CMS_W_BITS)
        return (h1 >> sh).astype(np.int64), (h2 >> sh).astype(np.int64)

    def build_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        c1, c2 = _cols(uid)
        g1 = np.bincount(c1, minlength=w)
        g2 = np.bincount(c2, minlength=w)
        cnt = np.concatenate([g1, g2])
        nz = np.flatnonzero(cnt)
        return pa.table({
            "row": pa.array((nz >= w).astype(np.int64)),
            "col": pa.array(np.where(nz >= w, nz - w, nz).astype(np.int64)),
            "cnt": pa.array(cnt[nz].astype(np.int64))})

    from ..functions.pools import task_stage
    from ..stages.exchange import exchange_map_groups
    from ..stages.partition import int_key_part_col
    from ..stages.quantiles import _collect_tree

    def grid_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["row", "col"]).aggregate([("cnt", "sum")])
        return pa.table({"row": g["row"], "col": g["col"],
                         "cnt": g["cnt_sum"].cast(pa.int64())})

    # ≤ d·w = 1024 rows — bounded sketch state: combine tree, no shuffle
    grid_tbl = _collect_tree(
        ds.map_batches(build_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        grid_combine)
    grid = np.zeros((2, w), dtype=np.int64)
    grid[grid_tbl["row"].to_numpy(zero_copy_only=False),
         grid_tbl["col"].to_numpy(zero_copy_only=False)] = \
        grid_tbl["cnt"].to_numpy(zero_copy_only=False)
    grid_ref = _ray.put(grid)  # broadcast once, read per task

    class Probe:
        def __init__(self, ref):
            self.grid = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            c1, c2 = _cols(uid)
            est = np.minimum(self.grid[0][c1], self.grid[1][c2])
            return pa.table({"user_id": t["user_id"],
                             "est_n": pa.array(est, pa.int64())})

    nparts = join_parts()

    def uniq_partial(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        return int_key_part_col(
            pa.table({"user_id": pa.array(u, pa.int64())}),
            "user_id", nparts)

    def uniq_part(g: pa.Table) -> pa.Table:
        u = np.unique(g["user_id"].to_numpy(zero_copy_only=False)) \
            if g.num_rows else np.empty(0, np.int64)
        return pa.table({"user_id": pa.array(u, pa.int64())})

    distinct = exchange_map_groups(
        ds.map_batches(uniq_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", uniq_part, nparts, drop_part_col=True)
    return distinct.map_batches(task_stage(Probe, grid_ref),
                                batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# ewma_recent_score_per_user — exponentially-weighted recency score:
# over each user's 16 MOST RECENT events (by ts, event_id desc), score
# = Σ cents_i · 2^−i.  Dyadic weights over integer cents keep every
# term AND the sum exactly representable in float64 (≤ 36 mantissa
# bits), so the vectorized kernel and SQL's per-row division by
# 1 << rn agree bit-for-bit with NO op-order sensitivity — the
# windowed form of the EWMA fold (an unbounded ewma is a sequential
# IEEE recurrence that cannot be vectorized reproducibly).  One
# partition-kernel exchange, same shape as lag/rolling windows.
# ---------------------------------------------------------------------------
_EWMA_W = 16


@query(
    "ewma_recent_score_per_user",
    f"""
    WITH r AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id,
           CAST(sum(CAST(c AS DOUBLE)
                    / CAST(1::BIGINT << rn AS DOUBLE)) AS DOUBLE)
             AS ewma_score,
           CAST(count(*) AS BIGINT) AS n_recent
    FROM r WHERE rn <= {_EWMA_W} GROUP BY user_id
    """,
)
def ewma_recent_score_per_user(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "value", "ts", "event_id"])
    nparts = join_parts()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False], kind="mergesort")
        rn0 = g.groupby("user_id", sort=False).cumcount().to_numpy()
        keep = rn0 < _EWMA_W
        uid = g["user_id"].to_numpy()[keep]
        cents = np.round(g["value"].to_numpy()[keep] * 100).astype(np.int64)
        term = np.ldexp(cents.astype(np.float64), -(rn0[keep] + 1))
        out = (pd.DataFrame({"user_id": uid, "ewma_score": term})
               .groupby("user_id", as_index=False)
               .agg(ewma_score=("ewma_score", "sum"),
                    n_recent=("ewma_score", "size")))
        out["n_recent"] = out["n_recent"].astype(np.int64)
        return out

    return (
        ds.map_batches(lambda t: int_key_part_col(t, "user_id", nparts),
                       batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# zscore_outliers_per_type — two-pass anomaly counter: per event type,
# count events with |cents − mean| > 2·stddev.  Pass 1 folds EXACT
# integer moments (n, Σc, Σc²) through the combiner; mean/sd are
# evaluated ONCE per type in the same textual op order as the SQL
# (HUGEINT-exact n·q − s² → one double cast → one sqrt), so the
# per-event float comparison is against bit-identical thresholds.
# Pass 2 filters against the broadcast 5-entry threshold table.
# Σc² stays in int64 up to ~sf100 of 2-dp values ≤ 10^4 (same bound as
# the corr/covar moments — documented there).
# ---------------------------------------------------------------------------
@query(
    "zscore_outliers_per_type",
    """
    WITH m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
      FROM events GROUP BY event_type),
    p AS (
      SELECT event_type,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
             sqrt(CAST(n::HUGEINT * q::HUGEINT - s::HUGEINT * s::HUGEINT
                       AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sd_c
      FROM m)
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers
    FROM events e JOIN p ON e.event_type = p.event_type
    WHERE abs(CAST(CAST(round(e.value * 100) AS BIGINT) AS DOUBLE)
              - p.mean_c) > 2.0 * p.sd_c
    GROUP BY e.event_type
    """,
)
def zscore_outliers_per_type(sf_dir: str):
    import math

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        t2 = pa.table({"event_type": t["event_type"], "c": c,
                       "q": pc.multiply(c, c), "n": pa.array(
                           np.ones(t.num_rows, np.int64))})
        g = t2.group_by("event_type").aggregate(
            [("c", "sum"), ("q", "sum"), ("n", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "s": pc.cast(g["c_sum"], pa.int64()),
                         "q": pc.cast(g["q_sum"], pa.int64()),
                         "n": pc.cast(g["n_sum"], pa.int64())})

    mom = (ds.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("s", alias_name="s"), Sum("q", alias_name="q"),
                      Sum("n", alias_name="n"))
           ).take_all()  # |event types| rows — grading-key bounded
    thresholds = {}
    for r in mom:
        n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
        mean_c = float(s) / float(n)
        # float(huge Python int) and DuckDB HUGEINT→DOUBLE both round
        # to nearest — identical doubles
        sd_c = math.sqrt(float(n * q - s * s) / (float(n) * float(n)))
        thresholds[r["event_type"]] = (mean_c, sd_c)

    def count_outliers(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100
                     ).astype(np.int64).astype(np.float64)
        types, inv = np.unique(et, return_inverse=True)
        mean = np.array([thresholds[x][0] for x in types])
        sd = np.array([thresholds[x][1] for x in types])
        hit = np.abs(c - mean[inv]) > 2.0 * sd[inv]
        cnt = np.bincount(inv[hit], minlength=len(types)).astype(np.int64)
        nz = cnt > 0
        return pa.table({"event_type": pa.array(types[nz]),
                         "n_outliers": pa.array(cnt[nz])})

    return (ds.map_batches(count_outliers, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("n_outliers", alias_name="n_outliers")))


# ---------------------------------------------------------------------------
# cube_order_counts — GROUP BY CUBE (status, priority): all FOUR
# grouping sets from ONE distributed finest-level pass; the three
# rolled-up levels are derived from the bounded finest result
# (≤ |status|·|priority| rows), zero extra input passes — the
# grouping-sets generalization of rollup_order_counts.
# ---------------------------------------------------------------------------
@query(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_c
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"o_orderstatus": t["o_orderstatus"],
                       "o_orderpriority": t["o_orderpriority"],
                       "rev_c": _cents(t["o_totalprice"])})
        g = t2.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("rev_c", "sum"), ("rev_c", "count")])
        return pa.table({
            "o_orderstatus": g["o_orderstatus"],
            "o_orderpriority": g["o_orderpriority"],
            "rev_c": pc.cast(g["rev_c_sum"], pa.int64()),
            "n_orders": pc.cast(g["rev_c_count"], pa.int64())})

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("rev_c", alias_name="rev_c"),
                   Sum("n_orders", alias_name="n_orders"))
    ).to_pandas()  # bounded by |status|·|priority|

    cols = ["o_orderstatus", "o_orderpriority", "n_orders", "rev_c"]
    by_status = (finest.groupby("o_orderstatus", as_index=False)
                 [["n_orders", "rev_c"]].sum())
    by_status.insert(1, "o_orderpriority", None)
    by_prio = (finest.groupby("o_orderpriority", as_index=False)
               [["n_orders", "rev_c"]].sum())
    by_prio.insert(0, "o_orderstatus", None)
    grand = pd.DataFrame({"o_orderstatus": [None], "o_orderpriority": [None],
                          "n_orders": [finest["n_orders"].sum()],
                          "rev_c": [finest["rev_c"].sum()]})
    out = pd.concat([finest[cols], by_status[cols], by_prio[cols],
                     grand[cols]], ignore_index=True)
    for c in ("n_orders", "rev_c"):
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# full_outer_clicks_purchases — FULL OUTER join of two grouped
# aggregates (per-user click counts × per-user purchase counts), nulls
# coalesced to 0.  Completes the repo's join-type surface (inner /
# left+right outer via this / semi / anti / asof / interval /
# broadcast / cartesian).  A full outer of AGGREGATES over the same
# key needs no join operator at all: one per-batch partial counts both
# event types per user, ONE user-keyed exchange sums them, and the
# null-coalesce is the post-filter — shuffle-minimal (1 exchange vs
# 2 groupbys + a join) and identical semantics.
# ---------------------------------------------------------------------------
@query(
    "full_outer_clicks_purchases",
    """
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
               FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
)
def full_outer_clicks_purchases(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.equal(t["event_type"], "click"), pa.int64())
        p = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        g = (pa.table({"user_id": t["user_id"], "n_clicks": c,
                       "n_purchases": p})
             .group_by("user_id")
             .aggregate([("n_clicks", "sum"), ("n_purchases", "sum")]))
        return g.rename_columns(["user_id", "n_clicks", "n_purchases"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .aggregate(Sum("n_clicks", alias_name="n_clicks"),
                      Sum("n_purchases", alias_name="n_purchases")))

    def coalesce(t: pa.Table) -> pa.Table:
        nc = pc.cast(t["n_clicks"], pa.int64())
        np_ = pc.cast(t["n_purchases"], pa.int64())
        # users with neither side are outside the FULL OUTER's domain
        keep = pc.greater(pc.add(nc, np_), 0)
        return pa.table({"user_id": t["user_id"], "n_clicks": nc,
                         "n_purchases": np_}).filter(keep)

    return agg.map_batches(coalesce, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# pagerank_part_supplier — fixed-iteration INTEGER PageRank over the
# part↔supplier bipartite graph from lineitem (both directions, so
# every node has degree ≥ 1).  stages/pagerank.py streams the edges
# once per round against broadcast rank state; all arithmetic is
# scaled-integer floor ops, so the chained-CTE oracle recomputes the
# ranks bit-for-bit — an ITERATIVE distributed graph algorithm under
# the typed-hash gate.  Node encoding: part → 2·key, supplier → 2·key+1.
# ---------------------------------------------------------------------------
def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f"""
    c{cur} AS (
      SELECT e.dst AS node, sum(p{prev}.pr // d.deg) AS s
      FROM e JOIN p{prev} ON e.src = p{prev}.node JOIN d ON e.src = d.node
      GROUP BY e.dst),
    p{cur} AS (
      SELECT node,
             CAST((15::HUGEINT * 1000000000) // 100
                  + (85::HUGEINT * s) // 100 AS BIGINT) AS pr
      FROM c{cur})"""


@query(
    "pagerank_part_supplier",
    f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    d AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
          FROM e GROUP BY src),
    p0 AS (SELECT node, 1000000000::BIGINT AS pr FROM d),
    {_pagerank_iter_sql('0', '1')},
    {_pagerank_iter_sql('1', '2')},
    {_pagerank_iter_sql('2', '3')}
    SELECT node, pr FROM p3
    """,
)
def pagerank_part_supplier(sf_dir: str):
    from ..stages.pagerank import pagerank_integer

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def to_edges(t: pa.Table) -> pa.Table:
        # per-batch distinct (the global distinct happens in the
        # degree/contribution arithmetic only if exact edges matter —
        # here duplicates MUST be removed globally, see below)
        src = pc.add(pc.multiply(t["l_partkey"], 2), 0)
        dst = pc.add(pc.multiply(t["l_suppkey"], 2), 1)
        both = pa.table({
            "src": pa.concat_arrays(
                [c for c in pc.cast(src, pa.int64()).chunks]
                + [c for c in pc.cast(dst, pa.int64()).chunks]),
            "dst": pa.concat_arrays(
                [c for c in pc.cast(dst, pa.int64()).chunks]
                + [c for c in pc.cast(src, pa.int64()).chunks])})
        return both

    # the multigraph → simple-graph DISTINCT and the degree count fuse
    # into pagerank_integer's single src-partition exchange (dedup=True)
    edges = ds.map_batches(to_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    return pagerank_integer(edges, iterations=3, dedup=True)


# ---------------------------------------------------------------------------
# histogram_quantile_per_type — APPROXIMATE p50/p90 from a fixed-width
# 25-cent histogram: the bounded-exchange scale path next to the exact
# refine passes (quartiles_value_per_type).  Partial bin counts fold
# through the combiner — the exchange is ≤ |types|·|bins| rows for any
# input size — and the estimate (lower edge of the bin where the
# cumulative count first reaches ceil(q·n)) is pure integer
# arithmetic, so the oracle recomputes it identically.
# ---------------------------------------------------------------------------
_HQ_BIN_C = 25


@query(
    "histogram_quantile_per_type",
    f"""
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) // {_HQ_BIN_C} AS bin
      FROM events),
    c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
    r AS (
      SELECT event_type, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM c)
    SELECT event_type,
           CAST(min(CASE WHEN 2 * cum >= n THEN bin END) * {_HQ_BIN_C}
                AS BIGINT) AS p50_bin_c,
           CAST(min(CASE WHEN 10 * cum >= 9 * n THEN bin END) * {_HQ_BIN_C}
                AS BIGINT) AS p90_bin_c
    FROM r GROUP BY event_type
    """,
)
def histogram_quantile_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        bins = pc.divide(c, _HQ_BIN_C)  # ints ≥ 0: trunc ≡ floor
        t2 = pa.table({"event_type": t["event_type"], "bin": bins,
                       "cnt": pa.array(np.ones(t.num_rows, np.int64))})
        g = t2.group_by(["event_type", "bin"]).aggregate([("cnt", "sum")])
        return pa.table({"event_type": g["event_type"], "bin": g["bin"],
                         "cnt": pc.cast(g["cnt_sum"], pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "bin"])
            .aggregate(Sum("cnt", alias_name="cnt")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin", kind="mergesort")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        bins = g["bin"].to_numpy()
        p50 = int(bins[np.flatnonzero(2 * cum >= n)[0]]) * _HQ_BIN_C
        p90 = int(bins[np.flatnonzero(10 * cum >= 9 * n)[0]]) * _HQ_BIN_C
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "p50_bin_c": np.array([p50], np.int64),
                             "p90_bin_c": np.array([p90], np.int64)})

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# weighted_sample_orders — deterministic weight-proportional sampling
# (priority sampling / A-ES with a seed-derived uniform): priority =
# hash(key) / weight, keep the k smallest — heavier orders get smaller
# priorities, so selection probability rises with o_totalprice, and
# BOTH sides compute the identical IEEE division (hash and weight are
# exact in float64), making the sample itself hash-gated.  Local
# per-batch top-k prune → global sort + limit: only k rows per batch
# ever reach the final merge.
# ---------------------------------------------------------------------------
_WS_K = 20


@query(
    "weighted_sample_orders",
    f"""
    WITH z0 AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             (o_orderkey::HUGEINT + {_HLL_GAMMA}::HUGEINT)
               % {_POW64}::HUGEINT AS z
      FROM orders),
    z1 AS (SELECT o_orderkey, price_c,
                  {_sql_mulmod64('xor(z, z >> 30)', _HLL_C1)} AS z FROM z0),
    z2 AS (SELECT o_orderkey, price_c,
                  {_sql_mulmod64('xor(z, z >> 27)', _HLL_C2)} AS z FROM z1),
    h AS (SELECT o_orderkey, price_c,
                 CAST(xor(z, z >> 31) AS DOUBLE)
                   / CAST(price_c AS DOUBLE) AS priority
          FROM z2)
    SELECT o_orderkey, price_c, priority
    FROM h ORDER BY priority, o_orderkey LIMIT {_WS_K}
    """,
)
def weighted_sample_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        price_c = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        hv = _splitmix64_np(key)
        prio = hv.astype(np.float64) / price_c.astype(np.float64)
        order = np.lexsort((key, prio))[:_WS_K]
        return pa.table({"o_orderkey": pa.array(key[order]),
                         "price_c": pa.array(price_c[order]),
                         "priority": pa.array(prio[order], pa.float64())})

    return (ds.map_batches(local_topk, batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort(["priority", "o_orderkey"])
            .limit(_WS_K))


# ---------------------------------------------------------------------------
# substring_containment_pairs — char-exact containment dedup: every pair
# where one document's FULL text occurs verbatim inside another's (the
# "drop documents wholly contained in a longer one" training-data rule;
# exact duplicates count once via id order).  Scale shape: containers
# emit the DISTINCT 64-bit polynomial hashes of every 16-char window
# (vectorized sliding_window_view; windows never cross doc boundaries);
# contained docs emit their first-16-char hash.  If text A occurs inside
# B, A's first 16 chars are one of B's windows — the hash join is a
# complete candidate generator (collisions only ADD candidates), and an
# exact char-compare verify prunes them.  Docs shorter than 16 chars
# (none in this corpus, handled for completeness) are broadcast and
# brute-verified against every container batch.
# ---------------------------------------------------------------------------
_CONTAIN_W = 16
_POLY = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _window_pow() -> np.ndarray:
    with np.errstate(over="ignore"):
        return np.cumprod(np.full(_CONTAIN_W, _POLY, np.uint64))[::-1].copy()


def _flat_bytes(texts: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, per-row offsets) for a string column."""
    arr = pc.cast(texts, pa.large_binary()).combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=len(arr) + 1) + arr.offset
    buf = np.frombuffer(arr.buffers()[2], np.uint8, count=int(offs[-1]))
    return buf, offs


def _window_hashes_batch(t: pa.Table) -> pa.Table:
    """(container_id, h) for DISTINCT 16-char window hashes per doc."""
    buf, offs = _flat_bytes(t["text"])
    if len(buf) < _CONTAIN_W:
        return pa.table({"container_id": pa.array([], pa.int64()),
                         "h": pa.array([], pa.uint64())})
    win = np.lib.stride_tricks.sliding_window_view(buf, _CONTAIN_W)
    with np.errstate(over="ignore"):
        h = win.astype(np.uint64) @ _window_pow()
    starts = np.arange(len(h), dtype=np.int64)
    row = np.searchsorted(offs, starts, side="right") - 1
    ok = starts + _CONTAIN_W <= offs[row + 1]  # window inside one doc
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = pd.DataFrame({"container_id": ids[row[ok]], "h": h[ok]})
    out = out.drop_duplicates()
    return pa.table({"container_id": pa.array(out["container_id"].to_numpy()),
                     "h": pa.array(out["h"].to_numpy(np.uint64))})


def _first_hash_batch(t: pa.Table) -> pa.Table:
    buf, offs = _flat_bytes(t["text"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    ok = lens >= _CONTAIN_W
    idx = offs[:-1][ok][:, None] + np.arange(_CONTAIN_W)
    with np.errstate(over="ignore"):
        h = buf[idx].astype(np.uint64) @ _window_pow() if ok.any() \
            else np.empty(0, np.uint64)
    return pa.table({"contained_id": pa.array(ids[ok]),
                     "h": pa.array(h, pa.uint64())})


@query(
    "substring_containment_pairs",
    """
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id
    FROM documents a JOIN documents b
      ON a.doc_id <> b.doc_id
     AND strpos(b.text, a.text) > 0
     AND (length(a.text) < length(b.text)
          OR (a.text = b.text AND a.doc_id < b.doc_id))
    ORDER BY 1, 2
    """,
)
def substring_containment_pairs(sf_dir: str, mode: str = "auto"):
    from ..functions.pools import join_parts as _jp
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    nparts = _jp()

    # ONE tagged-union hash exchange on h replaces the former
    # Dataset.join + global pair-distinct groupby: the join hash-
    # partitioned the full window stream with Ray's per-row Python
    # loop (measured 16.7 s at sf0.1; this path ~4 s), and since a
    # (contained, container) pair can only arise under the contained
    # doc's single first-window hash, pair dedup is complete
    # WITHIN each h-partition — no second exchange needed.
    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            col = "contained_id" if side == 0 else "container_id"
            h = t["h"].to_numpy(zero_copy_only=False)
            return pa.table({
                "h": t["h"],
                "id": t[col],
                "side": pa.array(np.full(len(t), side, np.int8)),
                "hpart": pa.array((h % np.uint64(nparts)).astype(np.int32)),
            })
        return _t

    windows = docs.map_batches(_window_hashes_batch, batch_format="pyarrow",
                               zero_copy_batch=True).map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True)
    firsts = docs.map_batches(_first_hash_batch, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True)

    def pair_kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({"contained_id": pa.array([], pa.int64()),
                          "container_id": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        h = g["h"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, h))
        h, ids, side = h[order], ids[order], side[order]
        new_seg = np.concatenate([[True], h[1:] != h[:-1]])
        seg = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        sizes = np.r_[starts[1:], len(h)] - starts
        n0 = np.bincount(seg[side == 0], minlength=len(starts))
        n1 = sizes - n0
        npair = n0 * n1
        total = int(npair.sum())
        if total == 0:
            return empty
        pseg = np.repeat(np.arange(len(starts)), npair)
        within = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(npair)[:-1]], npair)
        n1s = n1[pseg]
        i_idx = within // n1s
        j_idx = within % n1s
        from ..functions.bounds import checked_pack

        contained = ids[starts[pseg] + i_idx]
        container = ids[starts[pseg] + n0[pseg] + j_idx]
        key = checked_pack(contained, container, 32,
                           "substring_containment pair key")
        uk = np.unique(key)
        contained = uk >> np.int64(32)
        container = uk & np.int64((1 << 32) - 1)
        keep = contained != container
        return pa.table({"contained_id": pa.array(contained[keep]),
                         "container_id": pa.array(container[keep])})

    from ..stages.exchange import exchange_map_groups

    cand = exchange_map_groups(
        windows.union(firsts), "hpart", pair_kernel, nparts).materialize()

    def _verify_rows(ta, tb, la, lb, ca, cb) -> np.ndarray:
        inside = np.fromiter((a in b for a, b in zip(ta, tb)), bool, len(ta))
        return inside & ((la < lb) | ((ta == tb) & (ca < cb)))

    # verify: bring each candidate pair's two texts together.  Hybrid
    # (the decontam 2M-threshold precedent): below the bound, broadcast
    # the candidate PAIR INDEX and stream docs once, shipping only the
    # texts some pair references through ONE pair-keyed exchange — the
    # two exchange_attach passes above moved the FULL docs table twice
    # (measured 12.6 s at 32 CPUs for the whole query; this path ~5 s).
    n_cand = cand.count()
    if mode == "broadcast" or (mode == "auto" and n_cand <= 2_000_000):
        pairs = cand.to_pandas()  # bounded by the dispatch threshold
        ca = pairs["contained_id"].to_numpy(np.int64)
        cb = pairs["container_id"].to_numpy(np.int64)
        oa, ob = np.argsort(ca, kind="stable"), np.argsort(cb, kind="stable")
        idx_ref = ray.put((ca[oa], oa.astype(np.int64),
                           cb[ob], ob.astype(np.int64)))

        def emit_needed(t: pa.Table) -> pa.Table:
            sa, pa_idx, sb, pb_idx = ray.get(idx_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            out_p, out_r, out_row = [], [], []
            for side, (s, pidx) in ((0, (sa, pa_idx)), (1, (sb, pb_idx))):
                lo = np.searchsorted(s, ids, side="left")
                hi = np.searchsorted(s, ids, side="right")
                n = hi - lo
                rows = np.repeat(np.arange(len(ids)), n)
                spans = np.arange(int(n.sum())) - np.repeat(
                    np.r_[0, np.cumsum(n)[:-1]], n) + lo[rows]
                out_p.append(pidx[spans])
                out_r.append(np.full(len(rows), side, np.int8))
                out_row.append(rows)
            pix = np.concatenate(out_p)
            rows = np.concatenate(out_row)
            return pa.table({
                "pidx": pa.array(pix),
                "role": pa.array(np.concatenate(out_r)),
                "text": t["text"].take(pa.array(rows)),
                "vpart": pa.array((pix % nparts).astype(np.int32)),
            })

        def merge_verify(g: pa.Table) -> pa.Table:
            empty = pa.table({"contained_id": pa.array([], pa.int64()),
                              "container_id": pa.array([], pa.int64())})
            if g.num_rows == 0:
                return empty
            pix = g["pidx"].to_numpy(zero_copy_only=False)
            role = g["role"].to_numpy(zero_copy_only=False)
            txt = g["text"].to_numpy(zero_copy_only=False)
            order = np.lexsort((role, pix))
            pix, role, txt = pix[order], role[order], txt[order]
            # every pair has exactly one role-0 and one role-1 row here
            ta, tb = txt[role == 0], txt[role == 1]
            pids = pix[role == 0]
            la = np.fromiter((len(x) for x in ta), np.int64, len(ta))
            lb = np.fromiter((len(x) for x in tb), np.int64, len(tb))
            keep = _verify_rows(ta, tb, la, lb, ca[pids], cb[pids])
            return pa.table({
                "contained_id": pa.array(ca[pids[keep]]),
                "container_id": pa.array(cb[pids[keep]]),
            })

        return (docs.map_batches(emit_needed, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("vpart")
                .map_groups(merge_verify, batch_format="pyarrow"))

    # scale path: candidate set itself too large to broadcast — attach
    # both texts through the keyed exchange (stages/attach.py has the
    # Dataset.join-vs-exchange rationale)
    from ..stages.attach import exchange_attach

    texts_a = docs.map_batches(
        lambda t: t.rename_columns(["contained_id", "text_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    texts_b = docs.map_batches(
        lambda t: t.rename_columns(["container_id", "text_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cand = exchange_attach(cand, texts_a, "contained_id", nparts=_jp())
    cand = exchange_attach(cand, texts_b, "container_id", nparts=_jp())

    def verify(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ta, tb = df["text_a"].to_numpy(object), df["text_b"].to_numpy(object)
        la = np.fromiter((len(x) for x in ta), np.int64, len(ta))
        lb = np.fromiter((len(x) for x in tb), np.int64, len(tb))
        keep = _verify_rows(ta, tb, la, lb,
                            df["contained_id"].to_numpy(),
                            df["container_id"].to_numpy())
        out = df.loc[keep, ["contained_id", "container_id"]]
        return pa.table({
            "contained_id": pa.array(out["contained_id"].to_numpy(np.int64)),
            "container_id": pa.array(out["container_id"].to_numpy(np.int64)),
        })

    # no final sort: the gate compare is order-insensitive and the
    # sort is a whole extra exchange (~4.6 s of this query's sf0.1 wall)
    return cand.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cdc_chunk_dedup_stats — content-defined chunking (CDC) storage dedup:
# split every document at data-dependent breakpoints (an 8-char rolling
# polynomial hash ≡ 0 mod 64, so identical passages break identically
# regardless of their byte offset — the property fixed-size blocks
# lack), then measure corpus-level chunk-store dedup: chunk count,
# distinct chunks (EXACT, keyed by the chunk bytes — no hash identity),
# total vs unique chars, dedup ratio.  The storage-side sibling of the
# document-level MinHash/containment family, and the mechanism a
# transcript lake's text store would dedup revisions with.
# Scale shape: chunks TILE each document, so the chunk keys are a
# zero-copy large_binary view over the batch's UTF-32 buffer (offsets
# only — no per-chunk materialization); one chunk-keyed exchange of
# per-batch distinct partials; 1-row rollup.  Windows slide over UTF-32
# code units so equality ≡ SQL char-window equality on any text.
# ---------------------------------------------------------------------------
def _cdc_chunk_sql(w: int = 8, div: int = 64) -> str:
    from .sketch_sql import _MASK, _fpows

    pows = _fpows(w)
    terms = " + ".join(
        f"unicode(substring(text, i + {j}, 1))::HUGEINT * {pows[j]}"
        for j in range(w)
    )
    return f"""
    WITH docs AS (
      -- empty documents contribute no chunks (mirrors the engine)
      SELECT doc_id, text FROM documents WHERE length(text) > 0),
    shp AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - {w - 1}, 0))) AS i
      FROM docs),
    shh AS MATERIALIZED (
      SELECT doc_id, i, (({terms}) & {_MASK}) AS h FROM shp),
    st AS (
      SELECT doc_id, 1 AS s FROM docs
      UNION ALL
      SELECT doc_id, i FROM shh WHERE h % {div} = 0 AND i > 1),
    ch AS (
      SELECT st.doc_id,
             substr(d.text, s,
                    COALESCE(lead(s) OVER (PARTITION BY st.doc_id ORDER BY s),
                             length(d.text) + 1) - s) AS chunk
      FROM st JOIN docs d USING (doc_id)),
    cl AS (SELECT chunk, length(chunk) AS ln FROM ch)
    SELECT CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk) AS BIGINT) AS n_distinct,
           CAST(sum(ln) AS BIGINT) AS chars_total,
           CAST((SELECT sum(length(chunk))
                 FROM (SELECT DISTINCT chunk FROM cl)) AS BIGINT)
             AS chars_unique,
           CAST((SELECT sum(length(chunk))
                 FROM (SELECT DISTINCT chunk FROM cl)) AS DOUBLE)
             / CAST(sum(ln) AS DOUBLE) AS dedup_ratio
    FROM cl
    """


@query("cdc_chunk_dedup_stats", _cdc_chunk_sql())
def cdc_chunk_dedup_stats(sf_dir: str, w: int = 8, div: int = 64):
    from .sketch_sql import _fpows

    ds = read_table(sf_dir, "documents", columns=["text"])
    nparts = join_parts()
    pows = np.array(_fpows(w), dtype=np.uint64)

    def chunk_partial(t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks().to_pylist()
        bufs = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
        lens = np.array([len(b) // 4 for b in bufs], dtype=np.int64)
        keep = lens > 0
        bufs = [b for b, k in zip(bufs, keep) if k]
        lens = lens[keep]
        if not len(lens):
            return pa.table({"chunk": pa.array([], pa.large_binary()),
                             "ln": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "gpart": pa.array([], pa.int32())})
        flat = b"".join(bufs)
        all_c = np.frombuffer(flat, dtype=np.uint32)
        doc_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_end = np.cumsum(lens)
        nwin = np.maximum(lens - (w - 1), 0)
        # rolling window hashes at every global char position that has
        # a full in-doc window (SQL i = local + 1)
        bp_abs = np.empty(0, np.int64)
        total_win = int(nwin.sum())
        if total_win:
            wstarts = np.concatenate(([0], np.cumsum(nwin)[:-1]))
            row_idx = np.repeat(np.arange(len(lens)), nwin)
            local = np.arange(total_win, dtype=np.int64) - wstarts[row_idx]
            gpos = doc_start[row_idx] + local
            win = np.lib.stride_tricks.sliding_window_view(all_c, w)[gpos]
            with np.errstate(over="ignore"):
                h = win.astype(np.uint64) @ pows
            # boundary: h % div == 0 at local position > 0 (SQL i > 1)
            bmask = (h % np.uint64(div) == 0) & (local > 0)
            bp_abs = gpos[bmask]
        # chunk starts: every doc start + every breakpoint → chunks
        # tile the flat buffer exactly (offsets-only chunk array)
        starts = np.union1d(doc_start, bp_abs)
        ends = np.concatenate([starts[1:], [len(all_c)]])
        # doc ends must also close chunks: a doc's last chunk ends at
        # doc_end, and the next doc's first chunk starts at its start —
        # guaranteed because every doc_start is in `starts`
        offsets = np.concatenate([starts, [len(all_c)]]) * 4
        chunks = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(starts),
            [None, pa.py_buffer(offsets.astype(np.int64)),
             pa.py_buffer(flat)])
        ln = (ends - starts).astype(np.int64)
        tbl = pa.table({"chunk": chunks, "ln": pa.array(ln),
                        "cnt": pa.array(np.ones(len(starts), np.int64))})
        part = tbl.group_by(["chunk", "ln"]).aggregate([("cnt", "sum")])
        carr = part["chunk"].combine_chunks()
        # partition key from each chunk's head 8 bytes, gathered with
        # offset math (equality still decided on full bytes in the
        # kernel); chunks are ≥ 1 UTF-32 unit = 4 bytes, zero-padded
        # a sliced array's offsets buffer is read starting at element
        # carr.offset (byte offset = carr.offset * 8) — NOT by adding
        # the element count to the byte-offset VALUES
        voff = np.frombuffer(carr.buffers()[1], np.int64,
                             count=len(carr) + 1, offset=carr.offset * 8)
        vbuf = np.frombuffer(carr.buffers()[2], np.uint8)
        idx = voff[:-1, None] + np.arange(8)
        pad = idx >= voff[1:, None]
        head = vbuf[np.minimum(idx, len(vbuf) - 1)]
        head[pad] = 0
        hh = head.view(np.uint64).ravel()
        with np.errstate(over="ignore"):
            hh = hh * np.uint64(0x9E3779B97F4A7C15)
        gp = (hh % np.uint64(nparts)).astype(np.int32)
        return part.append_column("gpart", pa.array(gp))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("chunk", sort=False).agg(
            ln=("ln", "first"), cnt=("cnt_sum", "sum"))
        return pd.DataFrame({
            "n_chunks": [int(agg["cnt"].sum())],
            "n_distinct": [len(agg)],
            "chars_total": [int((agg["ln"] * agg["cnt"]).sum())],
            "chars_unique": [int(agg["ln"].sum())],
        })

    def finish(t: pa.Table) -> pa.Table:
        nc = int(pc.sum(t["n_chunks"]).as_py() or 0)
        nd = int(pc.sum(t["n_distinct"]).as_py() or 0)
        ct = int(pc.sum(t["chars_total"]).as_py() or 0)
        cu = int(pc.sum(t["chars_unique"]).as_py() or 0)
        return pa.table({
            "n_chunks": pa.array([nc], pa.int64()),
            "n_distinct": pa.array([nd], pa.int64()),
            "chars_total": pa.array([ct], pa.int64()),
            "chars_unique": pa.array([cu], pa.int64()),
            "dedup_ratio": pa.array([float(cu) / float(ct)], pa.float64()),
        })

    return (
        ds.map_batches(chunk_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(per_part, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )
