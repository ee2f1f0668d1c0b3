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
from ray.data.aggregate import Count, Max, Sum

from ..functions.pools import join_parts as _join_parts
from ..functions.pools import pool as _pool
from ..functions.pools import task_stage
from ..functions.tables import read_small, read_table
from ..stages.exchange import exchange_map_groups as _exg
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

    # single-exchange attaches, not Dataset.join: both lookup sides are
    # unique-keyed dims, and the join's per-row Python hash partition +
    # second output pass cost ~2x (stages/attach.py rationale)
    from ..stages.attach import exchange_attach

    hop1 = exchange_attach(li_agg, orders, "l_orderkey",
                           attach_key="o_orderkey", nparts=nparts)

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
    hop2 = exchange_attach(by_cust, cust, "o_custkey",
                           attach_key="c_custkey", nparts=nparts)

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

    # (region × nation) ≤ 25 rows: combine tree, not a sort exchange
    from ..stages.quantiles import _collect_tree

    def enrich_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_name", "n_name"]).aggregate(
            [("rev_e4", "sum"), ("n_items", "sum")])
        return pa.table({"r_name": g["r_name"], "n_name": g["n_name"],
                         "rev_e4": g["rev_e4_sum"].cast(pa.int64()),
                         "n_items": g["n_items_sum"].cast(pa.int64())})

    enriched = hop2.map_batches(task_stage(Enrich, ref),
                                batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(lambda t: pa.table({
            "r_name": t["r_name"], "n_name": t["n_name"],
            "rev_e4": t["rev_e4_sum"].cast(pa.int64()),
            "n_items": t["n_items_sum"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
    enrich_empty = pa.table({"r_name": pa.array([], pa.string()),
                             "n_name": pa.array([], pa.string()),
                             "rev_e4": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
    return _collect_tree(enriched, enrich_combine,
                         empty=enrich_empty).to_pandas() \
        .sort_values(["r_name", "n_name"]).reset_index(drop=True)


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

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


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
    every cell op is a length-N numpy vector — no per-pair Python.

    Positions are UTF-8 BYTES, matching DuckDB's ``levenshtein``
    exactly — probed on this build: ``levenshtein('café','cafe') = 2``
    (é is two bytes), i.e. the oracle is byte-wise, not codepoint-wise.
    Lengths are byte lengths too (the former ``len(s)`` codepoint count
    mis-shaped the matrix for non-ASCII input)."""
    a_bytes = [s.encode() for s in a_list]
    b_bytes = [s.encode() for s in b_list]
    n = len(a_bytes)
    la = np.array([len(s) for s in a_bytes], np.int32)
    lb = np.array([len(s) for s in b_bytes], np.int32)
    ma, mb = int(la.max(initial=1)), int(lb.max(initial=1))
    A = np.zeros((n, ma), np.uint32)
    B = np.zeros((n, mb), np.uint32)
    for k, s in enumerate(a_bytes):
        A[k, :len(s)] = np.frombuffer(s, np.uint8)
    for k, s in enumerate(b_bytes):
        B[k, :len(s)] = np.frombuffer(s, np.uint8)
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


# ---------------------------------------------------------------------------
# pareto_frontier_parts — distributed SKYLINE per group: parts not
# dominated within their p_type on (price low, size high).  The classic
# two-phase distributed skyline: every batch computes its LOCAL skyline
# (a batch-dominated row can never be globally non-dominated, so the
# prune is safe and the union of local skylines is a small exact
# superset), then ONE per-type exchange and the SAME kernel finalizes.
# The kernel is all Cython groupby ops: sort (type, price asc, size
# desc), per-(type, price) max, exclusive per-type cummax of group
# maxes; tie semantics mirror NOT EXISTS domination exactly (equal
# price+size rows are mutually non-dominated).
# ---------------------------------------------------------------------------
def pareto_skyline_kernel(d: pd.DataFrame) -> pd.DataFrame:
    """Rows of (p_type, p_partkey, price_c, p_size) not dominated within
    p_type (minimize price_c, maximize p_size); the SAME kernel serves
    the local-prune and the final per-group pass.  Equal (price, size)
    rows are mutually non-dominated (NOT EXISTS strict-part semantics)."""
    d = d.sort_values(["p_type", "price_c", "p_size"],
                      ascending=[True, True, False],
                      kind="mergesort").reset_index(drop=True)
    same_max = (d.groupby(["p_type", "price_c"], sort=False)["p_size"]
                  .transform("max").to_numpy())
    gm = (d.groupby(["p_type", "price_c"], sort=False)["p_size"]
            .max().reset_index())
    gm["prev_max"] = (gm.groupby("p_type", sort=False)["p_size"]
                        .cummax().shift(1).fillna(-1))
    gm.loc[gm["p_type"] != gm["p_type"].shift(1), "prev_max"] = -1
    d = d.merge(gm[["p_type", "price_c", "prev_max"]],
                on=["p_type", "price_c"], how="left")
    sz = d["p_size"].to_numpy()
    dominated = (d["prev_max"].to_numpy() >= sz) | (same_max > sz)
    return d.loc[~dominated, ["p_type", "p_partkey", "price_c", "p_size"]]


@query(
    "pareto_frontier_parts",
    """
    SELECT a.p_type, a.p_partkey
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_type = a.p_type
        AND b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
)
def pareto_frontier_parts(sf_dir: str):
    ds = read_table(sf_dir, "part",
                    columns=["p_partkey", "p_type", "p_size", "p_retailprice"])
    skyline = pareto_skyline_kernel

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "p_type": df["p_type"].to_numpy(),
            "p_partkey": df["p_partkey"].to_numpy(),
            "price_c": (df["p_retailprice"] * 100).round().astype(np.int64).to_numpy(),
            "p_size": df["p_size"].to_numpy(),
        })
        return skyline(df)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = skyline(g)
        return out[["p_type", "p_partkey"]]

    return (ds.map_batches(local, batch_format="pandas")
              .groupby("p_type").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# dup_cluster_sizes — exact-duplicate CLUSTER-SIZE histogram over the
# corpus (the dedup REPORT the survivors query doesn't give): how many
# text clusters of each multiplicity exist.  Exchange on
# hash(text) % nparts (equal texts co-locate), per-partition Cython
# count per text, per-batch histogram partials, bounded final aggregate
# (multiplicity domain is tiny).  Reference A1/D1 counts-report family.
# ---------------------------------------------------------------------------
@query(
    "dup_cluster_sizes",
    """
    SELECT n_dup, CAST(count(*) AS BIGINT) AS n_clusters
    FROM (SELECT count(*) AS n_dup FROM documents GROUP BY text)
    GROUP BY n_dup
    """,
)
def dup_cluster_sizes(sf_dir: str):
    from ..stages.partition import stable_hash_strings

    ds = read_table(sf_dir, "documents", columns=["text"])
    nparts = _join_parts()

    def key(t: pa.Table) -> pa.Table:
        h = stable_hash_strings(t["text"])
        return pa.table({
            "text": t["text"],
            "gpart": pa.array((h % np.uint64(nparts)).astype(np.int32)),
        })

    def cluster_hist(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("text", sort=False).size().to_numpy()
        mult, cnt = np.unique(sizes, return_counts=True)
        return pd.DataFrame({"n_dup": mult.astype(np.int64),
                             "n_clusters": cnt.astype(np.int64)})

    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    hist = exchange_map_groups(
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: cluster_hist(g.to_pandas()), nparts,
        drop_part_col=True)

    def hist_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("n_dup").aggregate([("n_clusters", "sum")])
        return pa.table({"n_dup": g["n_dup"],
                         "n_clusters": g["n_clusters_sum"].cast(pa.int64())})

    return _collect_tree(hist, hist_combine).to_pandas() \
        .sort_values("n_dup").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hourly_distinct_users — COUNT(DISTINCT) inside a tumbling window (the
# window+distinct composition; distinct_users_per_type is the global
# sibling).  One exchange keyed on hash(user): distinct (window, user)
# pairs never cross user partitions, so per-partition dedup partials
# are exact; the final per-window sum is bounded by the window count.
# ---------------------------------------------------------------------------
@query(
    "hourly_distinct_users",
    """
    SELECT date_trunc('hour', ts) AS w, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def hourly_distinct_users(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    nparts = _join_parts()

    def part_col(t: pa.Table) -> pa.Table:
        return int_key_part_col(t, "user_id", nparts)

    def dedup_count(g: pa.Table) -> pa.Table:
        # driver hash is timestamp-UNIT sensitive: date_trunc emits us
        empty = pa.table({"w": pa.array([], pa.timestamp("us")),
                          "n_users": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        w = pc.floor_temporal(g["ts"].combine_chunks(), unit="hour") \
            .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = g["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, w))
        w_s, u_s = w[order], u[order]
        keep = np.r_[True, (w_s[1:] != w_s[:-1]) | (u_s[1:] != u_s[:-1])]
        wk = w_s[keep]
        first = np.r_[True, wk[1:] != wk[:-1]]
        starts = np.flatnonzero(first)
        return pa.table({
            "w": pa.array(wk[first]).cast(pa.timestamp("us")),
            "n_users": pa.array(
                (np.r_[starts[1:], len(wk)] - starts).astype(np.int64)),
        })

    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    def w_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("w").aggregate([("n_users", "sum")])
        return pa.table({"w": g["w"].cast(pa.timestamp("us")),
                         "n_users": g["n_users_sum"].cast(pa.int64())})

    # per-user-partition exact dedup partials, then the window-bounded
    # final folds through the combine tree
    return _collect_tree(
        exchange_map_groups(
            ds.map_batches(part_col, batch_format="pyarrow",
                           zero_copy_batch=True),
            "gpart", dedup_count, nparts, drop_part_col=True),
        w_combine).to_pandas()


# ---------------------------------------------------------------------------
# value_share_per_type — ratio-to-report (share of total) per group:
# the sum(x) OVER () window reformulated scale-first as exact integer
# partials + ONE bounded aggregate; the only float op is one division
# per output row, mirrored in SQL textual order so doubles are
# bit-identical.
# ---------------------------------------------------------------------------
@query(
    "value_share_per_type",
    """
    WITH s AS (
      SELECT event_type,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM events GROUP BY event_type)
    SELECT event_type, rev_c,
           rev_c * 1.0 / (SELECT sum(rev_c) FROM s) AS share
    FROM s
    """,
)
def value_share_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"event_type": t["event_type"], "rev_c": _cents(t["value"])})
        return t2.group_by("event_type").aggregate([("rev_c", "sum")])

    grouped = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("event_type")
               .aggregate(Sum("rev_c_sum", alias_name="rev_c"))
               .to_pandas())  # bounded: one row per event type
    total = np.float64(int(grouped["rev_c"].sum()))
    grouped["share"] = (grouped["rev_c"].to_numpy().astype(np.float64)
                        * np.float64(1.0)) / total
    return grouped.reset_index(drop=True)


# ---------------------------------------------------------------------------
# scd2_intervals — type-2 slowly-changing-dimension history build from
# the change stream: per user ordered by (ts, event_id), each event's
# validity interval is [ts, next event's ts) with an open (NULL) end
# for the current row — the CDC lake's temporal-history export.  One
# user-keyed exchange; the LEAD is a vectorized grouped shift in the
# partition kernel.  Reference K2/J8 temporal upsert lineage.
# ---------------------------------------------------------------------------
@query(
    "scd2_intervals",
    """
    SELECT event_id, user_id, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(round(value * 100) AS BIGINT) AS value_c
    FROM events
    """,
)
def scd2_intervals(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    nparts = _join_parts()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        valid_to = g.groupby("user_id", sort=False)["ts"].shift(-1)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "valid_from": g["ts"].to_numpy().astype("datetime64[us]"),
            "valid_to": valid_to.to_numpy().astype("datetime64[us]"),
            "value_c": (g["value"] * 100).round().astype(np.int64).to_numpy(),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# out_of_order_counts — late-data measurement over the change stream:
# per user, how many events ARRIVED (event_id order ≈ arrival order)
# with an event time older than an already-arrived event — the
# out-of-orderness metric that sizes the engine's late-data watermark
# (§2.9 tombstone GC horizon).  Grouped running-max + compare, one
# exchange.
# ---------------------------------------------------------------------------
@query(
    "out_of_order_counts",
    """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE ts < prev_max) AS BIGINT) AS n_late,
           CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT user_id, ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM events)
    GROUP BY user_id
    """,
)
def out_of_order_counts(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    nparts = _join_parts()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby("user_id", sort=False)
        prev_max = grp["ts"].cummax().shift(1)
        first = grp.cumcount() == 0
        late = (g["ts"] < prev_max) & ~first
        out = pd.DataFrame({"user_id": g["user_id"], "late": late})
        agg = out.groupby("user_id", as_index=False).agg(
            n_late=("late", "sum"), n_events=("late", "size"))
        agg["n_late"] = agg["n_late"].astype(np.int64)
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# events_since_error — grouped RESET counter: per event, how many
# events since the user's most recent 'error' (the error itself resets
# to 0; users with no prior error count from their first event).  The
# reset-cumsum pattern: segment id = running error count, position =
# cumcount within (user, segment) — all Cython grouped ops, one
# exchange.  SQL mirror via the same windowed segment id.
# ---------------------------------------------------------------------------
@query(
    "events_since_error",
    """
    SELECT event_id,
           CAST(row_number() OVER (PARTITION BY user_id, err_grp
                                   ORDER BY ts, event_id)
                - CASE WHEN err_grp > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_since
    FROM (
      SELECT event_id, user_id, ts,
             count(*) FILTER (WHERE event_type = 'error')
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS err_grp
      FROM events)
    """,
)
def events_since_error(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nparts = _join_parts()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        is_err = pd.Series((g["event_type"] == "error").to_numpy())
        # inclusive running error count per user (Cython grouped cumsum)
        err_grp = is_err.groupby(g["user_id"].to_numpy(), sort=False).cumsum()
        seg = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                            "seg": err_grp.to_numpy()})
        pos = seg.groupby(["user_id", "seg"], sort=False).cumcount().to_numpy()
        # segment 0 (never saw an error): 1-based row_number from the first
        # event; segment k>0: the error row itself is 0, followers 1, 2, ...
        n_since = pos + np.where(err_grp.to_numpy() > 0, 0, 1)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "n_since": n_since.astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# global_rank_documents — GLOBAL total-order ranking without a driver
# sort: the classic two-pass distributed row_number.  Pass 1 assigns
# each row a range bucket on the (n_chars, doc_id) key (bucket
# boundaries from integer arithmetic so both sides agree); a bounded
# per-bucket count aggregate prefix-sums into global offsets
# (broadcast); pass 2 sorts WITHIN each bucket only and adds the
# bucket's offset.  No stage ever holds more than one bucket.
# Reference O5 stable export ordering, generalized to rank assignment.
# ---------------------------------------------------------------------------
@query(
    "global_rank_documents",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
             AS global_rank
    FROM documents
    """,
)
def global_rank_documents(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    n_buckets = 32

    # range bucketing must be ORDER-preserving on (n_chars, doc_id):
    # bucket on n_chars quantile-ish splits from a cheap metadata probe
    # (min/max), equal-width on n_chars — skew only degrades balance,
    # never correctness (ties stay in one bucket's sort)
    import pyarrow.parquet as pq
    from ..functions.tables import table_path
    meta = pq.read_table(table_path(sf_dir, "documents"), columns=["n_chars"])
    lo = int(pc.min(meta["n_chars"]).as_py())
    hi = int(pc.max(meta["n_chars"]).as_py()) + 1
    width = max(1, (hi - lo + n_buckets - 1) // n_buckets)

    def bucketize(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        b = ((nc - lo) // width).astype(np.int32)
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"],
                         "bucket": pa.array(b, pa.int32())})

    # materialize the NARROW projection (doc_id, n_chars, bucket ≈ 20 B/row
    # thanks to the column-pruned read — never the documents text) once: it
    # feeds both the bucket-count pass and the rank pass, and blocks are
    # object-store-resident/spillable, not driver memory
    bucketed = ds.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # bounded: one count per bucket -> exclusive prefix sum = offsets
    counts = (bucketed.map_batches(
        lambda t: t.select(["bucket"]).group_by("bucket").aggregate([("bucket", "count")]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("bucket_count", alias_name="n"))
        .to_pandas().sort_values("bucket"))
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    np.add.at(offs, counts["bucket"].to_numpy() + 1, counts["n"].to_numpy())
    offsets = dict(zip(range(n_buckets), np.cumsum(offs)[:n_buckets]))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = offsets[int(g["bucket"].iloc[0])]
        order = np.lexsort((g["doc_id"].to_numpy(), g["n_chars"].to_numpy()))
        out = g.iloc[order]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(),
            "global_rank": base + 1 + np.arange(len(out), dtype=np.int64),
        })

    return (bucketed.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# unpivot_order_stats — UNPIVOT (melt): per-priority wide aggregates
# (n_orders, total price cents) melted into (priority, metric, val)
# rows — the inverse of pivot_event_type_counts, closing the reshape
# family.  The wide side is a bounded grouped aggregate; the melt is a
# constant-column explode per batch.
# ---------------------------------------------------------------------------
@query(
    "unpivot_order_stats",
    """
    WITH w AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_c
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, metric, val
    FROM w UNPIVOT (val FOR metric IN (n_orders, price_c))
    """,
)
def unpivot_order_stats(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"o_orderpriority": t["o_orderpriority"],
                       "price_c": _cents(t["o_totalprice"])})
        return t2.group_by("o_orderpriority").aggregate(
            [("price_c", "count"), ("price_c", "sum")])

    wide = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("o_orderpriority")
            .aggregate(Sum("price_c_count", alias_name="n_orders"),
                       Sum("price_c_sum", alias_name="price_c")))

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        pri = pa.concat_arrays([t["o_orderpriority"].combine_chunks(),
                                t["o_orderpriority"].combine_chunks()])
        metric = pa.array(["n_orders"] * n + ["price_c"] * n, pa.string())
        val = pa.concat_arrays([pc.cast(t["n_orders"], pa.int64()).combine_chunks(),
                                t["price_c"].combine_chunks()])
        return pa.table({"o_orderpriority": pri, "metric": metric, "val": val})

    return wide.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# minmax_scale_per_type — grouped min-max feature scaling (the classic
# training-data normalization): x' = (x - min) / (max - min) per
# event_type.  Min/max come exact from integer-cents partials + one
# bounded aggregate, broadcast back into a vectorized per-batch map;
# the single float op per row mirrors the SQL textual order.
# ---------------------------------------------------------------------------
@query(
    "minmax_scale_per_type",
    """
    WITH m AS (
      SELECT event_type,
             min(CAST(round(value * 100) AS BIGINT)) AS lo,
             max(CAST(round(value * 100) AS BIGINT)) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id,
           (CAST(round(e.value * 100) AS BIGINT) - m.lo) * 1.0
             / (m.hi - m.lo) AS scaled
    FROM events e JOIN m USING (event_type)
    """,
)
def minmax_scale_per_type(sf_dir: str):
    from ray.data.aggregate import Max, Min

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "c": _cents(t["value"])})

    cds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)

    def mm_partial(t: pa.Table) -> pa.Table:
        return t.select(["event_type", "c"]).group_by("event_type").aggregate(
            [("c", "min"), ("c", "max")])

    mm = (cds.map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
          .groupby("event_type")
          .aggregate(Min("c_min", alias_name="lo"), Max("c_max", alias_name="hi"))
          .to_pandas())  # bounded: one row per event type
    lo = dict(zip(mm["event_type"], mm["lo"].astype(np.int64)))
    hi = dict(zip(mm["event_type"], mm["hi"].astype(np.int64)))
    lo_ref, hi_ref = ray.put(lo), ray.put(hi)

    class Scale:
        def __init__(self, lo_ref, hi_ref):
            lo, hi = ray.get(lo_ref), ray.get(hi_ref)
            self.types = pa.array(sorted(lo))
            self.lo = np.array([lo[t.as_py()] for t in self.types], np.int64)
            self.hi = np.array([hi[t.as_py()] for t in self.types], np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["event_type"], value_set=self.types
                              ).to_numpy(zero_copy_only=False).astype(np.int64)
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            lo, hi = self.lo[idx], self.hi[idx]
            scaled = ((c - lo) * np.float64(1.0)) / (hi - lo).astype(np.float64)
            return pa.table({"event_id": t["event_id"],
                             "scaled": pa.array(scaled, pa.float64())})

    return cds.map_batches(task_stage(Scale, lo_ref, hi_ref),
                           batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quartile_bin_counts — equal-frequency (quantile) feature binning:
# per-type exact p25/p50/p75 boundaries (the distributed
# histogram-refine order statistics from stages/quantiles.py) broadcast
# back and every row assigned bin 1-4 by boundary compare, then a
# bounded (type × bin) count.  Composition of the exact-quantile stage
# with a broadcast re-application — the binning half of a feature
# pipeline.  Bin rule mirrors SQL: bin = 1 + (c > p25) + (c > p50)
# + (c > p75) over quantile_disc boundaries.
# ---------------------------------------------------------------------------
@query(
    "quartile_bin_counts",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    q AS (
      SELECT event_type,
             quantile_disc(c, 0.25) AS p25,
             quantile_disc(c, 0.50) AS p50,
             quantile_disc(c, 0.75) AS p75
      FROM c GROUP BY event_type)
    SELECT c.event_type,
           CAST(1 + CAST(c.c > q.p25 AS INT) + CAST(c.c > q.p50 AS INT)
                  + CAST(c.c > q.p75 AS INT) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM c JOIN q USING (event_type)
    GROUP BY c.event_type, bin
    """,
)
def quartile_bin_counts(sf_dir: str):
    from ..stages.quantiles import exact_group_quantiles

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})

    # pinned once: the quantile passes AND the final Bin pass all read
    # these blocks instead of re-running read+cents per execution
    cds = ds.map_batches(cents, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    qs = exact_group_quantiles(cds, "event_type", "c",
                               quantiles=((1, 4), (1, 2), (3, 4)),
                               pool=_pool())
    qs.pop("_n")
    bounds = {g: (int(q[0]), int(q[1]), int(q[2])) for g, q in qs.items()}
    # columnar boundary arrays keyed by a type list: per-batch lookup is
    # one index_in + three fancy-index gathers.  TASK closure over a
    # ray.put ref, not an actor pool — the state is a broadcast dict and
    # per-query pool startup was the stage's dominant fixed cost
    # (measured: bin+aggregate 2.8 s -> 0.2 s at sf0.1); the final
    # (type × bin) count is statistics-sized, so the combine tree
    # replaces the sort exchange.
    from ..stages.quantiles import _collect_tree

    types = pa.array(sorted(bounds))
    arr = np.array([bounds[t.as_py()] for t in types], np.int64)
    bounds_ref = ray.put((types, arr[:, 0].copy(), arr[:, 1].copy(),
                          arr[:, 2].copy()))

    def bin_partial(t: pa.Table) -> pa.Table:
        types, p25, p50, p75 = ray.get(bounds_ref)
        idx = pc.index_in(t["event_type"], value_set=types
                          ).to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        bin_ = (1 + (c > p25[idx]).astype(np.int64)
                + (c > p50[idx]).astype(np.int64)
                + (c > p75[idx]).astype(np.int64))
        g = pa.table({"event_type": t["event_type"],
                      "bin": pa.array(bin_, pa.int64())}) \
            .group_by(["event_type", "bin"]).aggregate([("bin", "count")])
        return pa.table({"event_type": g["event_type"], "bin": g["bin"],
                         "n": g["bin_count"].cast(pa.int64())})

    def bin_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "bin"]).aggregate([("n", "sum")])
        return pa.table({"event_type": g["event_type"], "bin": g["bin"],
                         "n": g["n_sum"]})

    out = _collect_tree(
        cds.map_batches(bin_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        bin_combine).to_pandas()
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# linenumber_gap_audit — per-order sequence-integrity audit (the D5
# uniqueness/contiguity invariant family, reference's primary-key and
# ordering QC): an order's linenumbers are CONTIGUOUS iff the multiset is
# exactly {1..n} (min=1, max=n, distinct=n — catching both gaps and
# duplicates).  One hash-partition exchange on l_orderkey; the kernel is
# a single C-speed pandas groupby computing min/max/count/nunique per
# order, pre-aggregated to (n_lines, n_orders, n_gapped) partials so the
# final exchange is statistics-sized.
# ---------------------------------------------------------------------------
@query(
    "linenumber_gap_audit",
    """
    WITH per_order AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
             min(l_linenumber) AS mn, max(l_linenumber) AS mx,
             count(DISTINCT l_linenumber) AS nd
      FROM lineitem GROUP BY l_orderkey)
    SELECT n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN mn = 1 AND mx = n_lines AND nd = n_lines
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_gapped
    FROM per_order GROUP BY n_lines ORDER BY n_lines
    """,
)
def linenumber_gap_audit(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "l_orderkey": t["l_orderkey"],
            "ln": pc.cast(t["l_linenumber"], pa.int64()),
        })
        return int_key_part_col(out, "l_orderkey", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("l_orderkey", sort=False)["ln"] \
            .agg(n_lines="size", mn="min", mx="max", nd="nunique")
        gapped = ~((per["mn"] == 1) & (per["mx"] == per["n_lines"])
                   & (per["nd"] == per["n_lines"]))
        out = pd.DataFrame({
            "n_lines": per["n_lines"].to_numpy().astype(np.int64),
            "n_orders": np.ones(len(per), np.int64),
            "n_gapped": gapped.to_numpy().astype(np.int64),
        })
        return out.groupby("n_lines", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("n_lines")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("n_gapped", alias_name="n_gapped"))
        .sort("n_lines")
    )


# ---------------------------------------------------------------------------
# fk_childless_orders — referential-integrity audit (the lake-QC member
# of the D5 invariant family; reference analogue: the resolver's
# missing-reference MISS accounting): per priority, how many orders have
# no lineitem children.  Ray-first shape: the lineitem side is reduced to
# DISTINCT orderkeys with an in-batch pre-dedup combiner before the
# exchange, then ONE left-outer hash join against the orders projection
# and a statistics-sized groupby.
# ---------------------------------------------------------------------------
@query(
    "fk_childless_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN lk.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_childless
    FROM orders o
    LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) lk
      ON lk.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def fk_childless_orders(sf_dir: str, broadcast_limit: int = 2_000_000):
    nparts = _join_parts()
    keys = (
        read_table(sf_dir, "lineitem", columns=["l_orderkey"])
        .map_batches(
            # in-batch dedup, then the bounded partition column: the
            # global distinct is ONE exchange + an np.unique kernel per
            # partition (a per-KEY groupby.aggregate pays Python cost per
            # group — measured 25-40s on ~500k groups)
            lambda t: int_key_part_col(
                t.group_by("l_orderkey").aggregate([]), "l_orderkey", nparts),
            batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(
            lambda g: pd.DataFrame(
                {"l_orderkey": np.unique(g["l_orderkey"].to_numpy())}),
            batch_format="pandas")
        .materialize()
    )
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])

    if keys.count() <= broadcast_limit:
        # hybrid small side: broadcast the distinct-key vector once,
        # probe with np.isin per batch (measured 2-4x faster than the
        # hash join's fixed exchange cost at these cardinalities)
        key_ref = ray.put(np.sort(
            keys.to_pandas()["l_orderkey"].to_numpy().astype(np.int64)))

        class Probe:
            def __init__(self, ref):
                self.keys = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
                childless = ~np.isin(ok, self.keys, assume_unique=False)
                return pa.table({
                    "o_orderpriority": t["o_orderpriority"],
                    "n_orders": pa.array(np.ones(len(ok), np.int64)),
                    "n_childless": pa.array(childless.astype(np.int64)),
                }).group_by("o_orderpriority").aggregate(
                    [("n_orders", "sum"), ("n_childless", "sum")])

        partials = orders.map_batches(task_stage(Probe, key_ref),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
    else:
        # scale path: real left-outer hash join (same shape as
        # left_outer_order_counts)
        marked = keys.map_batches(
            lambda t: pa.table({"l_orderkey": t["l_orderkey"],
                                "has_child": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        joined = orders.join(marked, join_type="left_outer",
                             num_partitions=_join_parts(),
                             on=("o_orderkey",), right_on=("l_orderkey",))
        partials = joined.map_batches(
            lambda t: pa.table({
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
                "n_childless": pc.cast(pc.is_null(t["has_child"]), pa.int64()),
            }).group_by("o_orderpriority").aggregate(
                [("n_orders", "sum"), ("n_childless", "sum")]),
            batch_format="pyarrow", zero_copy_batch=True)

    return (
        partials.groupby("o_orderpriority")
        .aggregate(Sum("n_orders_sum", alias_name="n_orders"),
                   Sum("n_childless_sum", alias_name="n_childless"))
        .sort("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# cusum_alarm_counts — streaming drift detection: one-sided CUSUM per
# user over ts-ordered rounded values (target K=250, alarm H=500,
# no-reset variant).  The sequential recurrence s_i = max(0, s_{i-1} +
# d_i) is evaluated in closed form as s_i = cs_i - min(0, running-min of
# cs) — two vectorized prefix scans (cumsum + cummin) per partition
# instead of a per-row Python loop.  One hash-partition exchange on
# user_id; exact int64 throughout.
# ---------------------------------------------------------------------------
_CUSUM_K, _CUSUM_H = 250, 500


@query(
    "cusum_alarm_counts",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(round(value) AS BIGINT) - {_CUSUM_K} AS d
      FROM events),
    c AS (
      SELECT user_id, ts, event_id,
             sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cs
      FROM e),
    s AS (
      SELECT user_id,
             cs - least(0, min(cs) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)) AS s
      FROM c)
    SELECT user_id,
           CAST(count(*) FILTER (s > {_CUSUM_H}) AS BIGINT) AS n_alarms,
           CAST(max(s) AS BIGINT) AS max_cusum
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def cusum_alarm_counts(sf_dir: str):
    from ..pipelines.stats_queries import _round_half_away_int

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        d = _round_half_away_int(
            t["value"].to_numpy(zero_copy_only=False)) - _CUSUM_K
        out = pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "d": pa.array(d),
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        cs = grp["d"].cumsum()
        g = g.assign(cs=cs)
        runmin = g.groupby("user_id", sort=False)["cs"].cummin()
        s = cs - np.minimum(0, runmin)
        g = g.assign(s=s, alarm=(s.to_numpy() > _CUSUM_H).astype(np.int64))
        per = g.groupby("user_id", sort=False).agg(
            n_alarms=("alarm", "sum"), max_cusum=("s", "max"))
        return pd.DataFrame({
            "user_id": per.index.to_numpy(),
            "n_alarms": per["n_alarms"].to_numpy().astype(np.int64),
            "max_cusum": per["max_cusum"].to_numpy().astype(np.int64),
        })

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .sort("user_id")
    )


# ---------------------------------------------------------------------------
# relational_division_users — the relational-division operator: users
# whose event stream covers ALL of a required event-type set (the
# "for-all" join the semi/anti family lacks).  In-batch indicator
# partials (one row per (user, batch)) → statistics-sized groupby →
# coverage test; no exploded exchange.
# ---------------------------------------------------------------------------
_DIV_REQUIRED = ("view", "click", "purchase")


@query(
    "relational_division_users",
    f"""
    SELECT user_id FROM events
    WHERE event_type IN {_DIV_REQUIRED!r}
    GROUP BY user_id
    HAVING count(DISTINCT event_type) = {len(_DIV_REQUIRED)}
    ORDER BY user_id
    """.replace('"', "'"),
)
def relational_division_users(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for typ in _DIV_REQUIRED:
            cols[f"has_{typ}"] = pc.cast(
                pc.equal(t["event_type"], typ), pa.int64())
        return pa.table(cols).group_by("user_id").aggregate(
            [(f"has_{typ}", "max") for typ in _DIV_REQUIRED])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*[Max(f"has_{typ}_max", alias_name=f"has_{typ}")
                     for typ in _DIV_REQUIRED])
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = np.ones(t.num_rows, bool)
        for typ in _DIV_REQUIRED:
            keep &= t[f"has_{typ}"].to_numpy(zero_copy_only=False) == 1
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64())}) \
            .filter(pa.array(keep))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True).sort("user_id")


# ---------------------------------------------------------------------------
# event_trigram_topk — sequential pattern mining one step past the Markov
# bigram transitions: top-10 length-3 event-type sequences over each
# user's ts-ordered stream (ties → sequence string ASC).  One
# hash-partition exchange; the kernel forms trigrams by two array shifts
# with user-boundary masking — no per-row Python.
# ---------------------------------------------------------------------------
@query(
    "event_trigram_topk",
    """
    WITH s AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, trigram LIMIT 10
    """,
)
def event_trigram_topk(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(et) < 3:
            return pd.DataFrame({"trigram": [], "n": []})
        same = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        tri = np.char.add(np.char.add(np.char.add(
            et[:-2].astype("U16"), ">"),
            np.char.add(et[1:-1].astype("U16"), ">")), et[2:].astype("U16"))
        tri = tri[same]
        uniq, counts = np.unique(tri, return_counts=True)
        return pd.DataFrame({"trigram": uniq,
                             "n": counts.astype(np.int64)})

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("trigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "trigram"], descending=[True, False])
        .limit(10)
    )


# ---------------------------------------------------------------------------
# grouping_sets_order_stats — GROUPING SETS ((priority), (status), ())
# in one pass: per-batch partials for each grouping set (bounded output
# per batch), one statistics-sized exchange, NULL-filled grouping
# columns exactly as SQL emits them (completes the ROLLUP/CUBE family).
# ---------------------------------------------------------------------------
_GS_ALL = "\x00ALL\x00"  # sentinel: never a real priority/status value


@query(
    "grouping_sets_order_stats",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderpriority, o_orderstatus
    """,
)
def grouping_sets_order_stats(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_orderstatus",
                             "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        base = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "o_orderstatus": t["o_orderstatus"],
            "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
            "sum_cents": pa.array(cents),
        })
        # Ray's sort-based shuffle rejects NULL string keys, so the
        # grouped-out column travels as a sentinel and becomes a real
        # NULL only in the final projection
        outs = []
        for keep in (("o_orderpriority",), ("o_orderstatus",), ()):
            g_cols = list(keep)
            if g_cols:
                g = base.select([*g_cols, "n_orders", "sum_cents"]) \
                    .group_by(g_cols).aggregate(
                        [("n_orders", "sum"), ("sum_cents", "sum")])
                n = g.num_rows
                all_col = pa.array([_GS_ALL] * n, pa.string())
                tbl = {
                    "gp": (g["o_orderpriority"]
                           if "o_orderpriority" in g_cols else all_col),
                    "gs": (g["o_orderstatus"]
                           if "o_orderstatus" in g_cols else all_col),
                    "n_orders": g["n_orders_sum"],
                    "sum_cents": g["sum_cents_sum"],
                }
            else:
                tbl = {
                    "gp": pa.array([_GS_ALL], pa.string()),
                    "gs": pa.array([_GS_ALL], pa.string()),
                    "n_orders": pa.array(
                        [int(pc.sum(base["n_orders"]).as_py() or 0)]),
                    "sum_cents": pa.array(
                        [int(pc.sum(base["sum_cents"]).as_py() or 0)]),
                }
            outs.append(pa.table(tbl))
        return pa.concat_tables(outs)

    def finish(t: pa.Table) -> pa.Table:
        def unsent(col):
            c = t[col].combine_chunks()
            return pc.if_else(pc.equal(c, _GS_ALL),
                              pa.scalar(None, pa.string()), c)
        return pa.table({
            "o_orderpriority": unsent("gp"),
            "o_orderstatus": unsent("gs"),
            "n_orders": t["n_orders"],
            "sum_cents": t["sum_cents"],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["gp", "gs"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("sum_cents", alias_name="sum_cents"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# debounce_dedup_events — streaming time-epsilon dedup (the CDC-side
# "debounce" QC: drop an event when the SAME user emitted the SAME type
# within the preceding second — double-click / retry suppression).
# Note the chained semantics: a kept event resets the clock, a dropped
# one does NOT (drop is vs the previous RAW event, LAG semantics — the
# SQL-mirrorable variant).  One hash-partition exchange; kernel = two
# array shifts with boundary masking.
# ---------------------------------------------------------------------------
_DEBOUNCE_US = 1_000_000


@query(
    "debounce_dedup_events",
    f"""
    WITH lagged AS (
      SELECT user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL
                          AND epoch_us(ts) - epoch_us(prev_ts) <= {_DEBOUNCE_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM lagged GROUP BY event_type ORDER BY event_type
    """,
)
def debounce_dedup_events(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "event_type"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
        })
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        same = np.zeros(len(g), bool)
        if len(g) > 1:
            same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1]) \
                & (ts[1:] - ts[:-1] <= _DEBOUNCE_US)
        out = pd.DataFrame({
            "event_type": et,
            "n_events": np.ones(len(g), np.int64),
            "n_debounced": same.astype(np.int64),
        })
        return out.groupby("event_type", as_index=False).sum()

    return (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("n_debounced", alias_name="n_debounced"))
        .sort("event_type")
    )


# ---------------------------------------------------------------------------
# data_quality_audit — Deequ-style one-pass multi-constraint validation
# over the events table (the distributed generalization of the
# reference's per-ETL sanity counters, SURVEY A1/A5): null check,
# range check, domain allow-list, format regex, temporal bounds — all
# evaluated as per-batch integer partials in ONE scan; the uniqueness
# constraint (inherently global) is the audit's only exchange, run as
# a key-hash partition kernel.  Output: one row per constraint with
# exact violation counts.
# ---------------------------------------------------------------------------
_DQ_PROPS_RE = r'^\{"k": [0-9]+\}$'
_DQ_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "data_quality_audit",
    f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
    SELECT * FROM (
      SELECT 'user_id_not_null' AS check_name, n_rows,
             (SELECT CAST(count(*) FILTER (user_id IS NULL) AS BIGINT)
              FROM events) AS n_violations FROM n
      UNION ALL
      SELECT 'value_in_range_0_400', n_rows,
             (SELECT CAST(count(*) FILTER (value < 0 OR value > 400) AS BIGINT)
              FROM events) FROM n
      UNION ALL
      SELECT 'event_type_in_domain', n_rows,
             (SELECT CAST(count(*) FILTER (event_type NOT IN
               ('click','error','purchase','signup','view')) AS BIGINT)
              FROM events) FROM n
      UNION ALL
      SELECT 'props_json_format', n_rows,
             (SELECT CAST(count(*) FILTER (NOT regexp_matches(props,
               '^\\{{"k": [0-9]+\\}}$')) AS BIGINT) FROM events) FROM n
      UNION ALL
      SELECT 'ts_within_2024', n_rows,
             (SELECT CAST(count(*) FILTER (ts < TIMESTAMP '2024-01-01'
               OR ts >= TIMESTAMP '2025-01-01') AS BIGINT) FROM events) FROM n
      UNION ALL
      SELECT 'event_id_unique', n_rows,
             (SELECT CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
              FROM events) FROM n
    ) ORDER BY check_name
    """,
)
def data_quality_audit(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type",
                             "value", "props"])
    nparts = _join_parts()
    _TS_LO = 1_704_067_200_000_000   # 2024-01-01 epoch us
    _TS_HI = 1_735_689_600_000_000   # 2025-01-01

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = pc.cast(t["ts"], pa.int64())
        viol = {
            "user_id_not_null": pc.sum(pc.is_null(t["user_id"])).as_py() or 0,
            "value_in_range_0_400": pc.sum(pc.or_(
                pc.less(t["value"], 0.0),
                pc.greater(t["value"], 400.0))).as_py() or 0,
            "event_type_in_domain": n - (pc.sum(pc.is_in(
                t["event_type"], value_set=pa.array(_DQ_TYPES))).as_py() or 0),
            "props_json_format": n - (pc.sum(pc.match_substring_regex(
                t["props"], _DQ_PROPS_RE)).as_py() or 0),
            "ts_within_2024": pc.sum(pc.or_(
                pc.less(ts, _TS_LO), pc.greater_equal(ts, _TS_HI))).as_py() or 0,
        }
        return pa.table({
            "check_name": pa.array(list(viol), pa.string()),
            "n_rows": pa.array([n] * len(viol), pa.int64()),
            "n_violations": pa.array([int(v) for v in viol.values()], pa.int64()),
        })

    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    def check_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("check_name").aggregate(
            [("n_rows", "sum"), ("n_violations", "sum")])
        return pa.table({"check_name": g["check_name"],
                         "n_rows": g["n_rows_sum"].cast(pa.int64()),
                         "n_violations": g["n_violations_sum"].cast(pa.int64())})

    # 6 check rows total: combine tree, not a sort exchange
    scan_checks = _collect_tree(
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        check_combine).to_pandas()

    # uniqueness: the one global constraint — key-hash exchange, then a
    # vectorized per-partition duplicate count (exact: equal ids always
    # co-locate)
    ids = read_table(sf_dir, "events", columns=["event_id"])

    def id_part(t: pa.Table) -> pa.Table:
        return int_key_part_col(t, "event_id", nparts)

    def dup_kernel(g: pa.Table) -> pa.Table:
        ids_np = g["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "check_name": pa.array(["event_id_unique"], pa.string()),
            "n_rows": pa.array([len(ids_np)], pa.int64()),
            "n_violations": pa.array(
                [len(ids_np) - len(np.unique(ids_np))], pa.int64()),
        })

    uniq = _collect_tree(
        exchange_map_groups(
            ids.map_batches(id_part, batch_format="pyarrow",
                            zero_copy_batch=True),
            "gpart", dup_kernel, nparts, drop_part_col=True),
        check_combine).to_pandas()

    return pd.concat([scan_checks, uniq], ignore_index=True) \
        .sort_values("check_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# entity_resolution_clusters — end-to-end entity resolution: fuzzy
# edit-distance edges (last-token blocking, ≤4) → connected components
# → cluster-size histogram.  Composes the blocked Levenshtein matcher
# with the hybrid component resolver (driver union-find on this
# bounded name dictionary; the distributed pointer-doubling path
# engages automatically above the pair limit).  Unmatched names are
# singleton clusters.  WITH RECURSIVE min-label oracle over the same
# edge predicate.
# ---------------------------------------------------------------------------
@query(
    "entity_resolution_clusters",
    """
    WITH RECURSIVE t AS (SELECT DISTINCT p_name FROM part),
    edges AS (
      SELECT a.p_name AS u, b.p_name AS v
      FROM t a JOIN t b
        ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
       AND a.p_name <> b.p_name
       AND levenshtein(a.p_name, b.p_name) <= 4),
    reach(u, lab) AS (
      SELECT p_name, p_name FROM t
      UNION
      SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u, min(lab) AS cluster FROM reach GROUP BY u),
    sizes AS (SELECT cluster, count(*) AS sz FROM comp GROUP BY cluster)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY sz ORDER BY sz
    """,
)
def entity_resolution_clusters(sf_dir: str):
    import ray.data as _rd

    from ..stages.components import connected_components_auto

    pairs = fuzzy_name_pairs(sf_dir)          # blocked + matched edges
    ds = read_table(sf_dir, "part", columns=["p_name"])

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"p_name": pc.unique(t["p_name"])})

    names = sorted(set(
        ds.map_batches(uniq, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["p_name"]))
    idx = {s: i for i, s in enumerate(names)}

    if len(pairs):
        edges = _rd.from_arrow(pa.table({
            "id_a": pa.array([idx[s] for s in pairs["name_a"]], pa.int64()),
            "id_b": pa.array([idx[s] for s in pairs["name_b"]], pa.int64()),
        }))
        comp = connected_components_auto(edges).to_pandas()
        comp_sizes = comp.groupby("component").size().to_numpy()
        n_in_comp = int(comp_sizes.sum())
    else:
        comp_sizes = np.array([], np.int64)
        n_in_comp = 0

    n_singletons = len(names) - n_in_comp
    sizes = np.r_[comp_sizes, np.ones(n_singletons, np.int64)]
    sz, cnt = np.unique(sizes, return_counts=True)
    return pd.DataFrame({
        "cluster_size": sz.astype(np.int64),
        "n_clusters": cnt.astype(np.int64),
    })


# ---------------------------------------------------------------------------
# frequent_part_pairs — market-basket frequent-pair mining (Apriori's
# hot inner step): count part pairs co-purchased within an order, keep
# pairs with support ≥ 3, top-20 by (count DESC, pair ASC).  The pair
# explode runs inside the order-keyed partition kernel with offset math
# (per-order C(k,2) fan-out is bounded by basket size); pair counts
# pack into ONE int64 key (partkey < 2^31) so the count exchange ships
# (key, n) integers only.
# ---------------------------------------------------------------------------
_FPP_SUPPORT, _FPP_TOPK = 3, 20


@query(
    "frequent_part_pairs",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, n_orders FROM p
    WHERE n_orders >= {_FPP_SUPPORT}
    ORDER BY n_orders DESC, part_a, part_b LIMIT {_FPP_TOPK}
    """,
)
def frequent_part_pairs(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        return int_key_part_col(t, "l_orderkey", nparts)

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"key": np.array([], np.int64),
                                 "n_orders": np.array([], np.int64)})
        g = g.drop_duplicates(["l_orderkey", "l_partkey"]) \
            .sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(first)
        sizes = np.r_[starts[1:], n] - starts
        # offset-math pair explode: for a basket of k parts emit C(k,2)
        # (i<j) pairs without any per-order Python
        ks = sizes
        npairs = ks * (ks - 1) // 2
        total = int(npairs.sum())
        if total == 0:
            return pd.DataFrame({"key": np.array([], np.int64),
                                 "n_orders": np.array([], np.int64)})
        basket = np.repeat(np.arange(len(ks)), npairs)
        within = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(npairs)[:-1]], npairs)
        # map pair index p in [0, C(k,2)) to (i, j), i<j, row-major:
        # i = k-2 - floor((sqrt(8(C-1-p)+1)-1)/2) … simpler: use the
        # triangular inversion on q = C(k,2)-1-p
        k_b = ks[basket]
        q = k_b * (k_b - 1) // 2 - 1 - within
        jj = np.floor((np.sqrt(8.0 * q + 1) - 1) / 2).astype(np.int64)
        i_idx = k_b - 2 - jj
        j_idx = within - (i_idx * (2 * k_b - i_idx - 1) // 2) + i_idx + 1
        from ..functions.bounds import checked_pack

        a = pk[starts[basket] + i_idx]
        b = pk[starts[basket] + j_idx]
        key = checked_pack(np.minimum(a, b), np.maximum(a, b), 31,
                           "association_rules pair key")
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uk, "n_orders": cnt.astype(np.int64)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "key" not in g.columns:
            return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                                 "part_b": pd.Series([], dtype=np.int64),
                                 "n_orders": pd.Series([], dtype=np.int64)})
        g = g.groupby("key", as_index=False)["n_orders"].sum()
        g = g[g["n_orders"] >= _FPP_SUPPORT]
        g["part_a"] = (g["key"].to_numpy() >> 31).astype(np.int64)
        g["part_b"] = (g["key"].to_numpy() & ((1 << 31) - 1)).astype(np.int64)
        g = g.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True],
                          kind="mergesort").head(_FPP_TOPK)
        return g[["part_a", "part_b", "n_orders"]].reset_index(drop=True)

    # pair-count partials are per-partition-complete on the ORDER key,
    # but the same PAIR may occur under orders in different partitions —
    # final bounded merge on the pair key
    def key_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # all-empty stream: Ray hands a 0-col batch
            return pa.table({"key": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64()),
                             "gpart": pa.array([], pa.int32())})
        return int_key_part_col(t, "key", nparts)

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        # per-pair totals are final here (pair-keyed partition);
        # local prune to the query's support + top-k bound
        g = g.groupby("key", as_index=False)["n_orders"].sum()
        g = g[g["n_orders"] >= _FPP_SUPPORT]
        return g.sort_values("n_orders", ascending=False,
                             kind="mergesort").head(_FPP_TOPK)

    parts = (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: pair_kernel(g.to_pandas()), nparts,
             drop_part_col=True)
        .map_batches(key_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(local_top, batch_format="pandas")
    ).to_pandas()  # ≤ nparts × topk rows
    return finish(parts)


# ---------------------------------------------------------------------------
# association_rules — the full market-basket deliverable on top of the
# frequent pairs: for each surviving pair, both directed rules with
# exact integer supports and confidence / lift as mirrored float
# divisions (conf(a→b) = n_ab/n_a; lift = n_ab·N / (n_a·n_b)).  Single-
# item supports fold as bounded (part, n) partials; the 2·topk rule
# rows assemble on the driver (statistics-sized).
# ---------------------------------------------------------------------------
@query(
    "association_rules",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nord AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
    singles AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_one
      FROM b GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2),
    top AS (
      SELECT * FROM pairs WHERE n_pair >= {_FPP_SUPPORT}
      ORDER BY n_pair DESC, part_a, part_b LIMIT {_FPP_TOPK}),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, n_pair,
             sa.n_one AS n_ante, sb.n_one AS n_cons
      FROM top JOIN singles sa ON sa.l_partkey = top.part_a
               JOIN singles sb ON sb.l_partkey = top.part_b
      UNION ALL
      SELECT part_b, part_a, n_pair, sb.n_one, sa.n_one
      FROM top JOIN singles sa ON sa.l_partkey = top.part_a
               JOIN singles sb ON sb.l_partkey = top.part_b)
    SELECT antecedent, consequent, n_pair, n_ante, n_cons,
           CAST(n_pair AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence,
           CAST(n_pair AS DOUBLE) * (SELECT n FROM nord)
             / (CAST(n_ante AS DOUBLE) * CAST(n_cons AS DOUBLE)) AS lift
    FROM rules ORDER BY antecedent, consequent
    """,
)
def association_rules(sf_dir: str):
    pairs = frequent_part_pairs(sf_dir)        # ≤ topk rows, exact
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        return int_key_part_col(t, "l_orderkey", nparts)

    def singles_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        out = g.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"size": "n_one"})
        out["n_one"] = out["n_one"].astype(np.int64)
        out["n_orders_part"] = np.int64(0)
        out.loc[out.index[:1], "n_orders_part"] = np.int64(
            g["l_orderkey"].nunique())
        return out

    # per-gpart partials are <= nparts x |parts| rows (catalog-bounded,
    # never data-scaled): fold them on the driver.  A Ray
    # groupby().aggregate() here would also sort PANDAS blocks, the
    # measured 16x-slower aggregate path (28.8 s vs 1.8 s on arrow
    # blocks at sf0.1; driver fold 0.02 s).
    agg = (
        _exg(ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: singles_kernel(g.to_pandas()), nparts,
             drop_part_col=True)
    ).to_pandas().groupby("l_partkey", as_index=False) \
        [["n_one", "n_orders_part"]].sum()
    n_orders = int(agg["n_orders_part"].sum())
    ones = dict(zip(agg["l_partkey"].astype(np.int64),
                    agg["n_one"].astype(np.int64)))

    rows = []
    for _, r in pairs.iterrows():              # ≤ topk rows
        a, b, nab = int(r["part_a"]), int(r["part_b"]), int(r["n_orders"])
        na, nb = int(ones[a]), int(ones[b])
        rows.append((a, b, nab, na, nb))
        rows.append((b, a, nab, nb, na))
    rows.sort()
    ante = np.array([r[0] for r in rows], np.int64)
    cons = np.array([r[1] for r in rows], np.int64)
    npair = np.array([r[2] for r in rows], np.int64)
    nante = np.array([r[3] for r in rows], np.int64)
    ncons = np.array([r[4] for r in rows], np.int64)
    return pd.DataFrame({
        "antecedent": ante, "consequent": cons, "n_pair": npair,
        "n_ante": nante, "n_cons": ncons,
        "confidence": npair.astype(np.float64) / nante.astype(np.float64),
        "lift": npair.astype(np.float64) * np.float64(n_orders)
        / (nante.astype(np.float64) * ncons.astype(np.float64)),
    })


# ---------------------------------------------------------------------------
# decile_lift_value — model-evaluation lift table: events ranked by
# score (cents DESC, event_id tiebreak) are cut into 10 global-rank
# deciles; each decile reports its exact positive ("purchase") count
# and the cumulative lift (cum positive rate ÷ base rate).  The chart
# every targeting model ships with, next to roc_points_value.  Shape =
# the two-pass global row_number (global_rank_documents) AGGREGATED:
# order-preserving equal-width score buckets → bounded count prefix →
# per-bucket sort assigns global ranks locally → per-(decile) partial
# (n, pos) — no task holds more than one bucket and only 10 rows leave
# the final exchange.  Lift = (cum_pos·N)/(cum_n·P): exact int64
# products, ONE mirrored IEEE division per decile.
# ---------------------------------------------------------------------------
@query(
    "decile_lift_value",
    """
    WITH r AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c, event_id,
             CAST(event_type = 'purchase' AS BIGINT) AS pos,
             row_number() OVER (
               ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id
             ) - 1 AS rk
      FROM events),
    n AS (SELECT count(*) AS n, CAST(sum(pos) AS BIGINT) AS p FROM r),
    d AS (SELECT (rk * 10) // (SELECT n FROM n) + 1 AS decile,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(pos) AS BIGINT) AS n_pos
          FROM r GROUP BY 1)
    SELECT decile, n_rows, n_pos,
           CAST(CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
                * (SELECT n FROM n) AS DOUBLE)
             / CAST(CAST(sum(n_rows) OVER (ORDER BY decile) AS BIGINT)
                    * (SELECT p FROM n) AS DOUBLE) AS cum_lift
    FROM d
    """,
)
def decile_lift_value(sf_dir: str):
    import pyarrow.parquet as pq

    from ..functions.tables import table_path

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])
    n_buckets = 32

    meta = pq.read_table(table_path(sf_dir, "events"), columns=["value"])
    cmeta = pc.cast(pc.round(pc.multiply(meta["value"], 100.0)), pa.int64())
    lo = int(pc.min(cmeta).as_py())
    hi = int(pc.max(cmeta).as_py()) + 1
    width = max(1, (hi - lo + n_buckets - 1) // n_buckets)

    def bucketize(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        # bucket 0 holds the HIGHEST scores (rank order is c DESC)
        b = (n_buckets - 1 - (c - lo) // width).astype(np.int32)
        pos = pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "c": pa.array(c, pa.int64()),
                         "pos": pa.array(pos),
                         "bucket": pa.array(b, pa.int32())})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    counts = (bucketed.map_batches(
        lambda t: t.select(["bucket"]).group_by("bucket").aggregate(
            [("bucket", "count")]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("bucket_count", alias_name="n"))
        .to_pandas().sort_values("bucket"))
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    np.add.at(offs, counts["bucket"].to_numpy() + 1, counts["n"].to_numpy())
    offsets = dict(zip(range(n_buckets), np.cumsum(offs)[:n_buckets]))
    n_total = int(counts["n"].sum())

    def decile_partial(g: pd.DataFrame) -> pd.DataFrame:
        base = offsets[int(g["bucket"].iloc[0])]
        order = np.lexsort((g["event_id"].to_numpy(), -g["c"].to_numpy()))
        pos = g["pos"].to_numpy()[order]
        rk = base + np.arange(len(g), dtype=np.int64)
        dec = (rk * 10) // n_total + 1
        out = pd.DataFrame({"decile": dec, "n_rows": 1, "n_pos": pos})
        return out.groupby("decile", as_index=False).sum()

    dtab = (bucketed.groupby("bucket")
            .map_groups(decile_partial, batch_format="pandas")
            .groupby("decile")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("n_pos", alias_name="n_pos"))
            ).to_pandas().sort_values("decile").reset_index(drop=True)
    p_total = int(dtab["n_pos"].sum())
    cum_n = dtab["n_rows"].cumsum().to_numpy().astype(np.int64)
    cum_p = dtab["n_pos"].cumsum().to_numpy().astype(np.int64)
    return pa.table({
        "decile": pa.array(dtab["decile"].to_numpy(np.int64)),
        "n_rows": pa.array(dtab["n_rows"].to_numpy(np.int64)),
        "n_pos": pa.array(dtab["n_pos"].to_numpy(np.int64)),
        "cum_lift": pa.array((cum_p * n_total).astype(np.float64)
                             / (cum_n * p_total).astype(np.float64),
                             pa.float64()),
    })
