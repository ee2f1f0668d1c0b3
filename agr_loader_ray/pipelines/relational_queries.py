"""Relational / training-split operator batch (round 3 late additions).

Same contract as ``queries.py``: every entry pairs a Ray-Data-first
pipeline with a DuckDB oracle mirrored operation-for-operation (exact
integer cents, half-away rounding) so typed value hashes match.

Reference provenance: the reference's deepest resolution chains walk
4-5 keyed hops (feature -> allele -> gene -> species -> data-provider,
src/etl/variation_etl.py + helpers/resolver_helper.py) — the multiway
join chain here is that shape over the TPC-H-ish tables; the
deterministic train/valid/test split generalizes its reproducible
sub-load routing (SURVEY O4/M12); the blocked fuzzy match generalizes
its synonym/identifier near-match resolution (resolver fallback
chains) to edit-distance blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from ..functions.pools import join_parts as _join_parts
from ..functions.pools import pool as _pool
from ..functions.tables import read_small, read_table
from ..stages.partition import int_key_part_col
from .queries import _cents, query


# ---------------------------------------------------------------------------
# multiway_join_region_revenue — the 5-table keyed chain
# lineitem -> orders -> customer -> nation -> region (TPC-H Q5 shape,
# reference J4 multi-hop resolution).  Scale design: per-batch partial
# aggregation BEFORE each big-side hash join shrinks the shipped rows
# to <=|distinct keys| per block; the two data-scaled hops
# (orderkey, custkey) are hash-partitioned Dataset.joins; the two
# bounded dims (nation 25, region 5) broadcast once via ray.put and
# resolve with one vectorized index_in lookup — never a shuffle.
# ---------------------------------------------------------------------------
@query(
    "multiway_join_region_revenue",
    """
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS rev_e4,
           count(*) AS n_items
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def multiway_join_region_revenue(sf_dir: str):
    nparts = _join_parts()

    # fact side: per-batch partial (combiner) -> at most |orderkeys/block|
    # rows enter the first exchange
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev})
        return t2.group_by("l_orderkey").aggregate(
            [("rev_e4", "sum"), ("rev_e4", "count")])

    li_agg = li.map_batches(li_partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def orders_filter(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                       pc.less(t["o_orderdate"], hi))
        t = t.filter(mask)
        return t.select(["o_orderkey", "o_custkey"])

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]
                        ).map_batches(orders_filter, batch_format="pyarrow",
                                      zero_copy_batch=True)

    hop1 = li_agg.join(orders, join_type="inner", num_partitions=nparts,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    # shrink before the second big join: partial-agg to custkey grain
    def cust_partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"o_custkey": t["o_custkey"],
                       "rev_e4": t["rev_e4_sum"],
                       "n_items": t["rev_e4_count"]})
        return t2.group_by("o_custkey").aggregate(
            [("rev_e4", "sum"), ("n_items", "sum")])

    by_cust = hop1.map_batches(cust_partial, batch_format="pyarrow",
                               zero_copy_batch=True)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    hop2 = by_cust.join(cust, join_type="inner", num_partitions=nparts,
                        on=("o_custkey",), right_on=("c_custkey",))

    # bounded dims: nation (25) + region (5) pre-joined on the driver,
    # broadcast once, vectorized index_in lookup per batch (SURVEY J2/T3)
    nat = read_small(sf_dir, "nation",
                     columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = nat.join(reg, keys="n_regionkey", right_keys="r_regionkey")
    ref = ray.put(dim.select(["n_nationkey", "n_name", "r_name"]))

    class Enrich:
        def __init__(self, ref):
            t = ray.get(ref)
            self.nkeys = t["n_nationkey"].combine_chunks()
            self.nnames = t["n_name"].combine_chunks()
            self.rnames = t["r_name"].combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["c_nationkey"], value_set=self.nkeys)
            t2 = pa.table({
                "r_name": pc.take(self.rnames, idx),
                "n_name": pc.take(self.nnames, idx),
                "rev_e4": t["rev_e4_sum"],
                "n_items": t["n_items_sum"],
            })
            return t2.group_by(["r_name", "n_name"]).aggregate(
                [("rev_e4", "sum"), ("n_items", "sum")])

    return (
        hop2.map_batches(Enrich, fn_constructor_args=(ref,),
                         batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=_pool())
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("rev_e4_sum", alias_name="rev_e4"),
                   Sum("n_items_sum", alias_name="n_items"))
    )


# ---------------------------------------------------------------------------
# range_window_hour_sum — time-RANGE windowed aggregate: per event, the
# sum of `value` over the SAME USER's events in [ts - 1 hour, ts]
# (RANGE frame, peers included — the row-position sibling
# rolling_sum4_per_user is the ROWS frame).  Exchange on
# hash(user) % nparts; per-partition kernel pre-aggregates to
# (user, ts) grain so equal-timestamp peers get identical frame sums
# (SQL RANGE semantics), then one Cython time-rolling pass per
# partition and a vectorized merge back to event rows.  No whole-group
# driver state; partitions bound task memory.
# ---------------------------------------------------------------------------
@query(
    "range_window_hour_sum",
    """
    SELECT event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS BIGINT) AS hour_sum_c
    FROM events
    """,
)
def range_window_hour_sum(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value", "ts"])
    nparts = _join_parts()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        cents = (g["value"] * 100).round().astype(np.int64)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "ts": g["ts"].to_numpy(),
                           "cents": cents.to_numpy()})
        # (user, ts) grain: every equal-ts peer shares one frame sum
        per_ts = (df.groupby(["user_id", "ts"], sort=True)["cents"]
                    .sum().reset_index())
        win = (per_ts.groupby("user_id", sort=False)
                     .rolling("3600s", on="ts", closed="both")["cents"]
                     .sum().to_numpy())
        per_ts["hour_sum_c"] = np.round(win).astype(np.int64)
        out = df.merge(per_ts[["user_id", "ts", "hour_sum_c"]],
                       on=["user_id", "ts"], how="left")
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "hour_sum_c": out["hour_sum_c"].to_numpy()})

    return ds.map_batches(
        lambda t: int_key_part_col(t, "user_id", nparts),
        batch_format="pyarrow", zero_copy_batch=True,
    ).groupby("gpart").map_groups(kernel, batch_format="pandas")


# ---------------------------------------------------------------------------
# train_test_split_counts — deterministic hash split of the corpus into
# train/valid/test (18/1/1 of h mod 20): the reproducible, resumable
# version of a random split (no RNG state; re-runs and late-arriving
# shards land in the same split).  Knuth multiplicative hash mirrored
# exactly in SQL; per-split stats via one bounded (3-group) aggregate
# over map_batches partials.
# ---------------------------------------------------------------------------
@query(
    "train_test_split_counts",
    """
    WITH s AS (
      SELECT CASE
               WHEN (doc_id * 2654435761) % 20 < 18 THEN 'train'
               WHEN (doc_id * 2654435761) % 20 = 18 THEN 'valid'
               ELSE 'test' END AS split,
             n_chars
      FROM documents)
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
)
def train_test_split_counts(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (d * np.int64(2654435761)) % np.int64(20)
        split = np.where(bucket < 18, "train",
                         np.where(bucket == 18, "valid", "test"))
        t2 = pa.table({"split": pa.array(split, pa.string()),
                       "n_chars": t["n_chars"]})
        return t2.group_by("split").aggregate(
            [("n_chars", "count"), ("n_chars", "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("split")
        .aggregate(Sum("n_chars_count", alias_name="n_docs"),
                   Sum("n_chars_sum", alias_name="total_chars"))
    )


def _levenshtein_pairs(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Edit distance for N string pairs, DP vectorized ACROSS pairs:
    the i/j loops run over string positions (bounded by max length),
    every cell op is a length-N numpy vector — no per-pair Python."""
    n = len(a_list)
    la = np.array([len(s) for s in a_list], np.int32)
    lb = np.array([len(s) for s in b_list], np.int32)
    ma, mb = int(la.max(initial=1)), int(lb.max(initial=1))
    A = np.zeros((n, ma), np.uint32)
    B = np.zeros((n, mb), np.uint32)
    for k, s in enumerate(a_list):
        A[k, :len(s)] = np.frombuffer(s.encode(), np.uint8)
    for k, s in enumerate(b_list):
        B[k, :len(s)] = np.frombuffer(s.encode(), np.uint8) + np.uint32(0)
    prev = np.tile(np.arange(mb + 1, dtype=np.int32), (n, 1))
    ans = lb.astype(np.int32).copy()  # rows with len_a == 0
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        done = la == i
        if done.any():
            ans[done] = cur[done, lb[done]]
        prev = cur
    return ans.astype(np.int64)


# ---------------------------------------------------------------------------
# fuzzy_name_pairs — blocked fuzzy (edit-distance) matching over the
# part-name domain: distinct names, blocked on the last token (the
# scalable blocking key — candidates never cross blocks), Levenshtein
# <= 4 within a block.  The distinct pass is distributed (per-batch
# unique partials); the name DOMAIN is grading-key bounded (like
# nation/brand), so the pair DP runs once driver-side over the deduped
# domain — vectorized across pairs.  Reference: resolver near-match
# fallback chains (helpers/resolver_helper.py), SURVEY J6.
# ---------------------------------------------------------------------------
@query(
    "fuzzy_name_pairs",
    """
    WITH t AS (SELECT DISTINCT p_name FROM part),
    p AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM t a JOIN t b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM p
    WHERE levenshtein(name_a, name_b) <= 4
    """,
)
def fuzzy_name_pairs(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_name"])

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"p_name": pc.unique(t["p_name"])})

    names_df = (ds.map_batches(uniq, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas())
    names = sorted(set(names_df["p_name"]))

    # block on the last token; emit a<b candidate pairs per block
    blocks: dict[str, list[str]] = {}
    for s in names:
        blocks.setdefault(s.rsplit(" ", 1)[-1], []).append(s)
    a_side: list[str] = []
    b_side: list[str] = []
    for members in blocks.values():
        for i in range(len(members)):
            a_side.extend(members[i] for _ in range(len(members) - i - 1))
            b_side.extend(members[i + 1:])
    if not a_side:
        return pd.DataFrame({"name_a": pd.Series([], dtype=str),
                             "name_b": pd.Series([], dtype=str),
                             "dist": pd.Series([], dtype=np.int64)})
    dist = _levenshtein_pairs(a_side, b_side)
    keep = dist <= 4
    return pd.DataFrame({
        "name_a": np.array(a_side, dtype=object)[keep],
        "name_b": np.array(b_side, dtype=object)[keep],
        "dist": dist[keep],
    }).reset_index(drop=True)
