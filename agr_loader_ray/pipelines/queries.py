"""Operator-level query pipelines over the driver testdata (SURVEY §2).

Every entry here is an operator family from the reference re-expressed
Ray-Data-first, paired with an equivalent DuckDB SQL oracle
(``ORACLE_SQL``) run by the driver at sf0.01.  Column names match
between the Ray result and the SQL exactly; monetary aggregates use
exact integer cents arithmetic on both sides so value hashes are
float-order-independent.

Reference citations are per query (file:line into /root/reference).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.tables import read_small, read_table
from ..stages.fold import lww_last_per_key
from ..stages.partition import PART_COL, add_partition_column

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Exact integer cents from a 2-dp double column."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


from ..functions.pools import join_parts as _join_parts  # noqa: E402
from ..functions.pools import pool as _pool  # noqa: E402
from ..functions.pools import task_stage  # noqa: E402


# ---------------------------------------------------------------------------
# cdc_lww_upsert — the flagship operator: keyed LWW upsert with deletes.
# Reference: MERGE-on-primaryKey idempotent upsert + DETACH DELETE
# (src/etl/bgi_etl.py:99-116, src/etl/disease_etl.py:242-248), SURVEY J8/D2.
# Events table stands in for the WAL: key=(user_id, event_id%50),
# op=D when event_type='error', LWW on (ts, event_id).
# ---------------------------------------------------------------------------
@query(
    "cdc_lww_upsert",
    """
    SELECT user_id, turn_idx, event_type, value, ts, event_id FROM (
      SELECT user_id, event_id % 50 AS turn_idx, event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id, event_id % 50
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_lww_upsert(sf_dir: str):
    ds = read_table(sf_dir, "events")

    def prefold(t: pa.Table) -> pa.Table:
        turn = t["event_id"].to_numpy(zero_copy_only=False) % 50
        t = t.append_column("turn_idx", pa.array(turn, pa.int64()))
        t = lww_last_per_key(t, ["user_id", "turn_idx"], ["ts", "event_id"])
        return add_partition_column(t, 16, conv_col="user_id", turn_col="turn_idx")

    def final_fold(g: pa.Table) -> pa.Table:
        g = lww_last_per_key(g, ["user_id", "turn_idx"], ["ts", "event_id"])
        g = g.filter(pc.not_equal(g["event_type"], "error"))  # tombstones out
        return g.select(["user_id", "turn_idx", "event_type", "value", "ts", "event_id"])

    # task-based bucketing exchange (stages/exchange.py): the part id is
    # materialized, so the groupby sort is pure overhead (0.80 s -> 0.51 s
    # at sf0.1/32 for this query, measured)
    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prefold, batch_format="pyarrow", zero_copy_batch=True),
        PART_COL, final_fold, 16)


# ---------------------------------------------------------------------------
# cdc_change_feed — change-data-feed semantics on the events WAL stand-in:
# the per-key diff between the folded live state at epoch<=2 and at
# epoch<=3 (epoch := event_id % 4), classified insert/update/delete on the
# winning event id.  State-defined, not event-defined: a late epoch-3
# event that loses LWW emits nothing.  Mirrors pipelines/export.change_feed
# (the lake-side CDF) in an SQL-checkable form; reference analogue is the
# per-load diff/removal pass (src/etl/generic_etl.py delta handling) and
# Delta Lake's CDF, computed lazily.  Partition-kernel exchange: per-batch
# LWW prefold per (key, pre-flag) combiner, one hash exchange, per-
# partition vectorized diff.
# ---------------------------------------------------------------------------
@query(
    "cdc_change_feed",
    """
    WITH ev AS (
      SELECT user_id, event_id % 50 AS turn_idx, event_id % 4 AS epoch,
             event_type, value, ts, event_id
      FROM events),
    post_live AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, turn_idx
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev) t WHERE rn = 1 AND event_type <> 'error'),
    pre_live AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, turn_idx
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev WHERE epoch <= 2) t WHERE rn = 1 AND event_type <> 'error')
    SELECT CASE WHEN pre.event_id IS NULL THEN 'insert'
                WHEN post.event_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           coalesce(post.user_id, pre.user_id) AS user_id,
           coalesce(post.turn_idx, pre.turn_idx) AS turn_idx,
           coalesce(post.event_type, pre.event_type) AS event_type,
           coalesce(post.value, pre.value) AS value,
           coalesce(post.ts, pre.ts) AS ts,
           coalesce(post.event_id, pre.event_id) AS event_id
    FROM post_live post
    FULL OUTER JOIN pre_live pre
      ON post.user_id = pre.user_id AND post.turn_idx = pre.turn_idx
    WHERE pre.event_id IS NULL OR post.event_id IS NULL
       OR pre.event_id <> post.event_id
    """,
)
def cdc_change_feed(sf_dir: str):
    ds = read_table(sf_dir, "events")
    keys = ["user_id", "turn_idx"]

    def prefold(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        t = t.append_column("turn_idx", pa.array(ids % 50, pa.int64()))
        t = t.append_column("pre_flag", pa.array((ids % 4) <= 2))
        # combiner: top-1 per (key, pre-eligibility) — the pre winner is the
        # top pre_flag row, the post winner the max of the two survivors
        t = lww_last_per_key(t, [*keys, "pre_flag"], ["ts", "event_id"])
        return add_partition_column(t, 16, conv_col="user_id", turn_col="turn_idx")

    payload = ["user_id", "turn_idx", "event_type", "value", "ts", "event_id"]

    def diff(g: pa.Table) -> pa.Table:
        def live(t: pa.Table) -> pa.Table:
            t = lww_last_per_key(t, keys, ["ts", "event_id"])
            return t.filter(pc.not_equal(t["event_type"], "error")).select(payload)

        pre = live(g.filter(g["pre_flag"]))
        post = live(g)
        pre_k = pre.select([*keys, "event_id"]).rename_columns([*keys, "__pre"])
        post_k = post.select([*keys, "event_id"]).rename_columns([*keys, "__post"])
        j = post_k.join(pre_k, keys=keys, join_type="full outer")
        ins = j.filter(pc.is_null(j["__pre"])).select(keys)
        dele = j.filter(pc.is_null(j["__post"])).select(keys)
        upd = j.filter(
            pc.and_(pc.and_(pc.is_valid(j["__pre"]), pc.is_valid(j["__post"])),
                    pc.not_equal(j["__pre"], j["__post"]))
        ).select(keys)
        outs = []
        for tag, key_t, side in (("insert", ins, post), ("update", upd, post),
                                 ("delete", dele, pre)):
            if key_t.num_rows == 0:
                continue
            rows = side.join(key_t, keys=keys, join_type="inner").select(payload)
            outs.append(rows.add_column(
                0, "change_type", pa.array([tag] * rows.num_rows, pa.string())))
        if not outs:
            return pa.Table.from_pylist(
                [], schema=pa.schema([pa.field("change_type", pa.string()),
                                      *post.schema]))
        return pa.concat_tables(outs)

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prefold, batch_format="pyarrow", zero_copy_batch=True),
        PART_COL, diff, 16)


# ---------------------------------------------------------------------------
# q1_agg_pushdown — grouped aggregate with per-batch partial aggregation
# (combiner) before the shuffle.  Reference: per-label counts / grouped
# stats (SURVEY A1/A5); pattern: pre-aggregate inside map_batches.
# ---------------------------------------------------------------------------
@query(
    "q1_agg_pushdown",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_rev_e4,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_agg_pushdown(sf_dir: str):
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        qty_c = _cents(t["l_quantity"])
        base_c = _cents(t["l_extendedprice"])
        disc_bp = _cents(t["l_discount"])
        rev_e4 = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_bp))
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "base_c": base_c,
                "rev_e4": rev_e4,
            }
        )
        return t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("rev_e4", "sum"), ("qty_c", "count")]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c_sum", alias_name="sum_qty_c"),
            Sum("base_c_sum", alias_name="sum_base_c"),
            Sum("rev_e4_sum", alias_name="sum_rev_e4"),
            Sum("qty_c_count", alias_name="count_order"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# filter_project_revenue — predicate + vectorized projection
# (SURVEY M1/M4: record→row projection, predicate skip-rules).
# ---------------------------------------------------------------------------
@query(
    "filter_project_revenue",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_quantity > 10
    GROUP BY l_orderkey
    """,
)
def filter_project_revenue(sf_dir: str):
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    lo = pa.scalar(np.datetime64("1995-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))

    def transform(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.greater(t["l_quantity"], 10.0),
        )
        t = t.filter(mask)
        base_c = _cents(t["l_extendedprice"])
        disc_bp = _cents(t["l_discount"])
        rev = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_bp))
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev})
        return t2.group_by("l_orderkey").aggregate([("rev_e4", "sum"), ("rev_e4", "count")])

    return (
        ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev_e4_sum", alias_name="rev_e4"), Sum("rev_e4_count", alias_name="n_items"))
    )


# ---------------------------------------------------------------------------
# broadcast_join_nation_revenue — broadcast-dict lookup join of a big fact
# against small dims (SURVEY J2/T3/T4: master-gene-set broadcast resolution,
# src/etl/molecular_interaction_etl.py:308-405).  No shuffle for the join.
# ---------------------------------------------------------------------------
@query(
    "broadcast_join_nation_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def broadcast_join_nation_revenue(sf_dir: str):
    # The broadcast side must be GENUINELY small (reference J2: the master
    # gene set is bounded; molecular_interaction_etl.py:138-196).  Nation is
    # 25 rows at every scale factor — broadcast it.  Customer grows with sf,
    # so the orders↔customer hop is a hash-partitioned Dataset.join, never a
    # driver dict.
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    ref = ray.put(nat)

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    # hash-partitioned single-exchange attach (stages/attach.py), never a
    # driver dict — customer grows with sf
    from ..stages.attach import exchange_attach

    joined = exchange_attach(orders, cust, "o_custkey",
                             attach_key="c_custkey", nparts=_join_parts())

    class Enrich:
        def __init__(self, ref):
            t = ray.get(ref)  # once per actor (SURVEY T1 pattern)
            self.nkeys = t["n_nationkey"].combine_chunks()
            self.nnames = t["n_name"].combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized dictionary lookup: index_in + take, no Python loop
            idx = pc.index_in(t["c_nationkey"], value_set=self.nkeys)
            t2 = pa.table(
                {"n_name": pc.take(self.nnames, idx), "total_c": _cents(t["o_totalprice"])}
            )
            return t2.group_by("n_name").aggregate([("total_c", "sum"), ("total_c", "count")])

    # 25 nation rows: combine tree, not a sort exchange
    from ..stages.quantiles import _collect_tree

    def nat_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("n_name").aggregate(
            [("total_c_sum", "sum"), ("total_c_count", "sum")])
        return pa.table({"n_name": g["n_name"],
                         "total_c_sum": g["total_c_sum_sum"].cast(pa.int64()),
                         "total_c_count": g["total_c_count_sum"].cast(pa.int64())})

    out = _collect_tree(
        joined.map_batches(task_stage(Enrich, ref), batch_format="pyarrow",
                           zero_copy_batch=True),
        nat_combine).to_pandas()
    return out.rename(columns={"total_c_sum": "total_c",
                               "total_c_count": "n_orders"}) \
        .sort_values("n_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hash_join_priority_revenue — big×big hash-partitioned join
# (SURVEY J4: multi-way graph join → Dataset.join), dim via broadcast.
# ---------------------------------------------------------------------------
@query(
    "hash_join_priority_revenue",
    """
    SELECT c.c_mktsegment, o.o_orderpriority,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate < TIMESTAMP '1995-06-01'
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
)
def hash_join_priority_revenue(sf_dir: str):
    cutoff = pa.scalar(np.datetime64("1995-06-01", "us"), pa.timestamp("us"))
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)).drop_columns(["o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # single-exchange hash attach (stages/attach.py), not Dataset.join:
    # same hash-partitioned big×big shape, but the map side partitions
    # with numpy instead of the join's per-row Python hash loop, and the
    # merged output needs no second partition pass
    from ..stages.attach import exchange_attach

    joined = exchange_attach(li, orders, "l_orderkey",
                             attach_key="o_orderkey", nparts=_join_parts())

    # pre-aggregate to (custkey, priority) partials BEFORE the customer
    # hop: sum is associative, so the second join's left side shrinks from
    # |matched lineitems| to ≤ |custkey × priority| rows
    def pre_agg(t: pa.Table) -> pa.Table:
        base_c = _cents(t["l_extendedprice"])
        disc_bp = _cents(t["l_discount"])
        rev = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_bp))
        t2 = pa.table(
            {"o_custkey": t["o_custkey"], "o_orderpriority": t["o_orderpriority"],
             "rev_e4": rev}
        )
        return t2.group_by(["o_custkey", "o_orderpriority"]).aggregate(
            [("rev_e4", "sum"), ("rev_e4", "count")]
        )

    partials = joined.map_batches(pre_agg, batch_format="pyarrow", zero_copy_batch=True)

    # second hop is also big×big (customer grows with sf) — another
    # hash-partitioned exchange attach, not a broadcast dict
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined2 = exchange_attach(partials, cust, "o_custkey",
                              attach_key="c_custkey", nparts=_join_parts())

    def seg_agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # all-empty stream: Ray hands a 0-col batch
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "o_orderpriority": pa.array([], pa.string()),
                             "rev_e4": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        g = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "o_orderpriority": t["o_orderpriority"],
                "rev_e4": t["rev_e4_sum"],
                "n_items": t["rev_e4_count"],
            }
        ).group_by(["c_mktsegment", "o_orderpriority"]).aggregate(
            [("rev_e4", "sum"), ("n_items", "sum")]
        )
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "o_orderpriority": g["o_orderpriority"],
                         "rev_e4": g["rev_e4_sum"].cast(pa.int64()),
                         "n_items": g["n_items_sum"].cast(pa.int64())})

    def seg_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment", "o_orderpriority"]).aggregate(
            [("rev_e4", "sum"), ("n_items", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "o_orderpriority": g["o_orderpriority"],
                         "rev_e4": g["rev_e4_sum"].cast(pa.int64()),
                         "n_items": g["n_items_sum"].cast(pa.int64())})

    # (segment × priority) is ≤ 25 rows — combine tree, not a shuffle
    from ..stages.quantiles import _collect_tree

    seg_empty = pa.table({"c_mktsegment": pa.array([], pa.string()),
                          "o_orderpriority": pa.array([], pa.string()),
                          "rev_e4": pa.array([], pa.int64()),
                          "n_items": pa.array([], pa.int64())})
    return _collect_tree(
        joined2.map_batches(seg_agg, batch_format="pyarrow",
                            zero_copy_batch=True),
        seg_combine, empty=seg_empty).to_pandas().sort_values(
        ["c_mktsegment", "o_orderpriority"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# semi_join_open_orders — semi join: keep fact rows whose key exists in the
# filtered other side (SURVEY J1: MATCH-drop semantics; J7 IN-list semi join).
# ---------------------------------------------------------------------------
@query(
    "semi_join_open_orders",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           count(*) AS n_items
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY l_returnflag
    """,
)
def semi_join_open_orders(sf_dir: str):
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_quantity"])
    open_orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # single tagged exchange semi filter (stages/attach.py), not
    # Dataset.join left_semi; the ≤5-row final folds through the tree
    from ..stages.attach import exchange_semi
    from ..stages.quantiles import _collect_tree

    kept = exchange_semi(li, open_orders, "l_orderkey",
                         keys_key="o_orderkey", nparts=_join_parts())

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "sum_qty_c": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        t2 = pa.table({"l_returnflag": t["l_returnflag"], "qty_c": _cents(t["l_quantity"])})
        g = t2.group_by("l_returnflag").aggregate([("qty_c", "sum"), ("qty_c", "count")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "sum_qty_c": g["qty_c_sum"].cast(pa.int64()),
                         "n_items": g["qty_c_count"].cast(pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("l_returnflag").aggregate(
            [("sum_qty_c", "sum"), ("n_items", "sum")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "sum_qty_c": g["sum_qty_c_sum"].cast(pa.int64()),
                         "n_items": g["n_items_sum"].cast(pa.int64())})

    semi_empty = pa.table({"l_returnflag": pa.array([], pa.string()),
                           "sum_qty_c": pa.array([], pa.int64()),
                           "n_items": pa.array([], pa.int64())})
    return _collect_tree(
        kept.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        combine, empty=semi_empty).to_pandas() \
        .sort_values("l_returnflag").reset_index(drop=True)


# ---------------------------------------------------------------------------
# anti_join_inactive_customers — anti join via broadcast key set
# (SURVEY D4: genes NOT having ribbon terms, expression_ribbon_other_etl.py:17-21).
# ---------------------------------------------------------------------------
@query(
    "anti_join_inactive_customers",
    """
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
)
def anti_join_inactive_customers(sf_dir: str):
    # Distributed anti join: hash-partitioned left_anti Dataset.join.  The
    # excluded-key side is pre-deduplicated inside map_batches so only
    # distinct custkeys enter the exchange (never a driver-side set — that
    # was sf-proportional driver state).
    with_p = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]).map_batches(
        lambda t: pa.table({"o_custkey": pc.unique(
            t.filter(pc.equal(t["o_orderstatus"], "P"))["o_custkey"].combine_chunks())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from ..stages.attach import exchange_semi
    from ..stages.quantiles import _collect_tree

    kept = exchange_semi(
        read_table(sf_dir, "customer",
                   columns=["c_custkey", "c_mktsegment", "c_acctbal"]),
        with_p, "c_custkey", keys_key="o_custkey", anti=True,
        nparts=_join_parts())

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"c_mktsegment": t["c_mktsegment"], "bal_c": _cents(t["c_acctbal"])})
        g = t2.group_by("c_mktsegment").aggregate([("bal_c", "count"), ("bal_c", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "n_customers": g["bal_c_count"].cast(pa.int64()),
                         "bal_c": g["bal_c_sum"].cast(pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [("n_customers", "sum"), ("bal_c", "sum")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "n_customers": g["n_customers_sum"].cast(pa.int64()),
                         "bal_c": g["bal_c_sum"].cast(pa.int64())})

    return _collect_tree(
        kept.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        combine).to_pandas().sort_values("c_mktsegment").reset_index(drop=True)


# ---------------------------------------------------------------------------
# explode_tokens_topk — child-list explode + grouped count + top-k
# (SURVEY M2: secondaryIds/synonyms explode, bgi_etl.py:252-424; O3 top-k).
# ---------------------------------------------------------------------------
@query(
    "explode_tokens_topk",
    """
    SELECT token, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
)
def explode_tokens_topk(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["text"])

    def explode_count(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])

    agg = (
        ds.map_batches(explode_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("token_count", alias_name="n"))
    )
    top = agg.sort(["n", "token"], descending=[True, False]).limit(20)
    return top


# ---------------------------------------------------------------------------
# dedup_exact_text — exact dedup by normalized content hash, first-writer
# survives (SURVEY D1: chromosomes{} dict dedup, bgi_etl.py:392-393; and the
# dedup family required for training-data pipelines).
# ---------------------------------------------------------------------------
@query(
    "dedup_exact_text",
    """
    SELECT lang, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS total_chars FROM (
      SELECT lang, length(text) AS len,
             row_number() OVER (PARTITION BY lower(trim(text)), lang ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1 GROUP BY lang
    """,
)
def dedup_exact_text(sf_dir: str):
    from ..stages.partition import stable_hash_strings

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def norm_hash(t: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(t["text"]))
        h = stable_hash_strings(norm.combine_chunks())
        return pa.table(
            {
                "h": pa.array(h.astype(np.int64)),
                "norm": norm,
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    # partition by hash(h) — the oracle partitions by (norm_text, lang) —
    # and confirm in-group text equality so a 64-bit hash collision cannot
    # silently merge unrelated docs: one survivor per DISTINCT (norm,
    # lang).  One hash-partition exchange + a C-speed groupby.head kernel
    # per partition, never per-text map_groups (data-scaled group count).
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    nparts = join_parts()

    def survivors_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        first = g.groupby(["h", "lang", "norm"], sort=False).head(1)
        return first[["lang", "len"]]

    survivors = (
        ds.map_batches(norm_hash, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: int_key_part_col(t, "h", nparts),
                     batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(survivors_part, batch_format="pandas")
    )
    return survivors.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("len", alias_name="total_chars")
    )


# ---------------------------------------------------------------------------
# topk_orders_per_customer — per-group top-k (SURVEY O3/A2: best-ortholog
# argmax per gene, gene_descriptions_etl.py:500-521).
# ---------------------------------------------------------------------------
@query(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_orders_per_customer(sf_dir: str):
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    nparts = join_parts()

    # hash-partition exchange + ONE vectorized kernel per partition
    # (groupby(o_custkey).map_groups pays a Python call per customer —
    # data-scaled; pandas' C groupby.head inside the partition does not)
    def top3_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("o_custkey", sort=False).head(3)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"],
            "o_orderkey": g["o_orderkey"],
            "price_c": (g["o_totalprice"] * 100).round().astype(np.int64),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "o_custkey", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: top3_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# global_top10_lineitems — global sort + limit (SURVEY O5: stable export
# ordering; sort is the cold-path shuffle).
# ---------------------------------------------------------------------------
@query(
    "global_top10_lineitems",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def global_top10_lineitems(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    top = ds.sort(
        ["l_extendedprice", "l_orderkey", "l_linenumber"], descending=[True, False, False]
    ).limit(10)
    return top.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "price_c": _cents(t["l_extendedprice"]),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# sessionize_events — stateful per-key windowing over an ordered log
# (SURVEY §2.9: session windows via groupby(key).map_groups over sorted
# group; the reference's ordering barriers generalized).
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    """
    SELECT user_id,
           CAST(1 + sum(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events) t
    GROUP BY user_id
    """,
)
def sessionize_events(sf_dir: str):
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    nparts = join_parts()

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of the partition in one pass: sort by (user, ts,
        # event), session break = in-user gap > 30 min, C-speed groupby
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gaps = g["ts"].astype("int64").diff()
        same_user = g["user_id"].eq(g["user_id"].shift())
        brk = ((gaps > 1_800_000_000) & same_user).astype(np.int64)
        res = (
            pd.DataFrame({"user_id": g["user_id"], "brk": brk})
            .groupby("user_id", sort=False)
            .agg(n_sessions=("brk", "sum"), n_events=("brk", "size"))
            .reset_index()
        )
        res["n_sessions"] = (res["n_sessions"] + 1).astype(np.int64)
        res["n_events"] = res["n_events"].astype(np.int64)
        return res

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: sessions_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# date_normalize_daily — timestamp normalization to ISO-8601 Z + daily agg
# (SURVEY M8: multi-format date normalization, etl_helper.py:302-340).
# ---------------------------------------------------------------------------
@query(
    "date_normalize_daily",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%dT%H:%M:%SZ') AS first_iso
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def date_normalize_daily(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        t2 = pa.table({"day": day, "ts": t["ts"]})
        return t2.group_by("day").aggregate([("ts", "count"), ("ts", "min")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("ts_count", alias_name="n_events"), Min("ts_min", alias_name="first_ts"))
    )

    def fmt(t: pa.Table) -> pa.Table:
        # arrow's %S carries fractional seconds — truncate to seconds first
        secs = pc.floor_temporal(t["first_ts"], unit="second").cast(pa.timestamp("s"))
        iso = pc.strftime(secs, format="%Y-%m-%dT%H:%M:%SZ")
        return pa.table({"day": t["day"], "n_events": t["n_events"], "first_iso": iso})

    return agg.map_batches(fmt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# date_parse_cascade — the reference's six-format messy-date normalization
# (SURVEY M8: etl_helper.py:302-340 check_date_format).  A dirty date-string
# column is derived deterministically from events.ts (format chosen by
# event_id % 6, plus injected garbage rows), then re-parsed with the
# vectorized strptime cascade and emitted as ISO-8601 Z (or null on miss —
# the reference's None path).
# ---------------------------------------------------------------------------
@query(
    "date_parse_cascade",
    """
    WITH dirty AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN 'not a date'
                  WHEN event_id % 6 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                  WHEN event_id % 6 = 1 THEN strftime(ts, '%Y-%m-%d')
                  WHEN event_id % 6 = 2 THEN strftime(ts, '%d/%m/%Y')
                  WHEN event_id % 6 = 3 THEN strftime(ts, '%a %b %d %H:%M:%S')
                                             || ' CST ' || strftime(ts, '%Y')
                  WHEN event_id % 6 = 4 THEN strftime(ts, '%d:%m:%Y %H:%M')
                  ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00' END AS d
      FROM events)
    SELECT event_id,
           strftime(COALESCE(
             try_strptime(replace(replace(d, ' CST', ''), '+00:00', ''), '%Y-%m-%dT%H:%M:%S'),
             try_strptime(d, '%Y-%m-%d %H:%M:%S'),
             try_strptime(d, '%Y-%m-%d'),
             try_strptime(d, '%d/%m/%Y'),
             try_strptime(d, '%Y/%m/%d'),
             try_strptime(replace(d, ' CST', ''), '%a %b %d %H:%M:%S %Y'),
             try_strptime(d, '%d:%m:%Y %H:%M')
           ), '%Y-%m-%dT%H:%M:%SZ') AS iso
    FROM dirty
    """,
)
def date_parse_cascade(sf_dir: str):
    from ..functions.dates import parse_date_cascade, to_iso_z

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def kernel(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        variant = eid % 6
        secs = pc.floor_temporal(t["ts"], unit="second").cast(pa.timestamp("s"))
        # deterministic dirty-string synthesis, same rule as the oracle
        forms = [
            pc.strftime(secs, format="%Y-%m-%d %H:%M:%S"),
            pc.strftime(secs, format="%Y-%m-%d"),
            pc.strftime(secs, format="%d/%m/%Y"),
            pc.binary_join_element_wise(
                pc.strftime(secs, format="%a %b %d %H:%M:%S"),
                pc.strftime(secs, format="%Y"), " CST "),
            pc.strftime(secs, format="%d:%m:%Y %H:%M"),
            pc.binary_join_element_wise(
                pc.strftime(secs, format="%Y-%m-%dT%H:%M:%S"),
                pa.array(["+00:00"] * t.num_rows), ""),
        ]
        dirty = forms[5]
        for i in range(5):
            dirty = pc.if_else(pa.array(variant == i), forms[i], dirty)
        dirty = pc.if_else(pa.array(eid % 97 == 0),
                           pa.scalar("not a date", pa.string()), dirty)
        iso = to_iso_z(parse_date_cascade(dirty))
        return pa.table({"event_id": t["event_id"], "iso": iso})

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# prefix_split_parts — curie-style split/normalize on ':'-like separators
# (SURVEY M5: split_identifier, resource_descriptor_helper_2.py:203-230).
# ---------------------------------------------------------------------------
@query(
    "prefix_split_parts",
    """
    SELECT string_split(p_type, ' ')[1] AS prefix, count(*) AS n_parts,
           CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_c
    FROM part GROUP BY string_split(p_type, ' ')[1]
    """,
)
def prefix_split_parts(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_type", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        prefix = pc.list_element(pc.split_pattern(t["p_type"], " "), 0)
        t2 = pa.table({"prefix": prefix, "price_c": _cents(t["p_retailprice"])})
        return t2.group_by("prefix").aggregate([("price_c", "count"), ("price_c", "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prefix")
        .aggregate(Sum("price_c_count", alias_name="n_parts"), Sum("price_c_sum", alias_name="price_c"))
    )


# ---------------------------------------------------------------------------
# regex_priority_extract — regex field extraction / validation
# (SURVEY M13: VEP `pred(score)` regex parse, vep_etl.py:81-142; M6
# gid_pattern validation).
# ---------------------------------------------------------------------------
@query(
    "regex_priority_extract",
    """
    SELECT CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS BIGINT) AS prio_num,
           count(*) AS n_orders
    FROM orders GROUP BY prio_num
    """,
)
def regex_priority_extract(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["o_orderpriority"], pattern=r"^(?P<num>[0-9]+)")
        num = pc.cast(pc.struct_field(ex, "num"), pa.int64())
        return pa.table({"prio_num": num}).group_by("prio_num").aggregate([("prio_num", "count")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prio_num")
        .aggregate(Sum("prio_num_count", alias_name="n_orders"))
    )


# ---------------------------------------------------------------------------
# transitive_closure_ancestors — closure over an EXPLICIT edge table via
# in-task BFS against a broadcast parent map (SURVEY A7:
# IS_A_PART_OF_CLOSURE, closure_etl.py:28-30 — ontology edge lists are the
# genuinely small side; the node stream is unbounded).  Edge table:
# (child=k, parent=k//2) for k >= 2 over part keys — consumed as DATA, the
# operator never assumes parent() is a function.
# ---------------------------------------------------------------------------
@query(
    "transitive_closure_ancestors",
    """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey // 2 AS ancestor FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT node, ancestor // 2 FROM anc WHERE ancestor >= 2
    )
    SELECT node, ancestor FROM anc
    """,
)
def transitive_closure_ancestors(sf_dir: str):
    from ..stages.closure import closure_broadcast_bfs

    # materialize the edge TABLE (child, parent) — the ontology-sized side
    keys = read_small(sf_dir, "part", columns=["p_partkey"])["p_partkey"].to_numpy()
    child = keys[keys >= 2]
    edges = pa.table({"child": pa.array(child, pa.int64()),
                      "parent": pa.array(child // 2, pa.int64())})

    nodes = read_table(sf_dir, "part", columns=["p_partkey"]).map_batches(
        lambda t: pa.table({"node": t.filter(pc.greater_equal(t["p_partkey"], 2))["p_partkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return closure_broadcast_bfs(nodes, edges)


# ---------------------------------------------------------------------------
# dag_closure_edges — DISTRIBUTED closure of a multi-parent DAG edge table
# by path-doubling joins (R ∘ R each round ⇒ ⌈log2 depth⌉ hash exchanges;
# SURVEY A7 scale path for edge tables too large to broadcast).  Edge set
# over part keys: (k → k//2) for k>=2 plus (k → k//3) when 3 | k — a real
# multi-parent DAG, so only an edge-join closure can answer it.
# ---------------------------------------------------------------------------
@query(
    "dag_closure_edges",
    """
    WITH RECURSIVE edges AS (
      SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT p_partkey, p_partkey // 3 FROM part WHERE p_partkey >= 3 AND p_partkey % 3 = 0
    ),
    anc AS (
      SELECT child AS node, parent AS ancestor FROM edges
      UNION
      SELECT a.node, e.parent FROM anc a JOIN edges e ON a.ancestor = e.child
    )
    SELECT node, ancestor FROM anc
    """,
)
def dag_closure_edges(sf_dir: str):
    from ..stages.closure import closure_path_doubling

    def make_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        half = k[k >= 2]
        third = k[(k >= 3) & (k % 3 == 0)]
        return pa.table({
            "child": pa.array(np.concatenate([half, third]), pa.int64()),
            "parent": pa.array(np.concatenate([half // 2, third // 3]), pa.int64()),
        })

    edges = read_table(sf_dir, "part", columns=["p_partkey"]).map_batches(
        make_edges, batch_format="pyarrow", zero_copy_batch=True,
    )
    # part keys are bounded ints → packed single-column distincts
    return closure_path_doubling(edges, packable=True)


# ---------------------------------------------------------------------------
# asof_join_purchase_view — as-of (ordering-sensitive) join: each purchase
# matched to the user's most recent prior-or-equal view (SURVEY J8: the
# reference has no time dimension; this is the CDC-era operator Ray Data
# lacks natively — composed as groupby(key) + merge_asof per group).
# Partitioning assumption: both sides fit per-key groups (bounded per user).
# ---------------------------------------------------------------------------
@query(
    "asof_join_purchase_view",
    """
    SELECT p.event_id, p.user_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_join_purchase_view(sf_dir: str):
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    nparts = join_parts()

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        # every user of the partition in ONE C-speed merge_asof
        # (by=user_id); last view at-or-before each purchase
        empty = pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                              "user_id": pd.Series(dtype=np.int64),
                              "view_ts": pd.Series(dtype="datetime64[us]")})
        p = g[g["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        v = g[g["event_type"] == "view"].sort_values("ts", kind="mergesort")
        if p.empty or v.empty:
            return empty
        m = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            v[["user_id", "ts"]].assign(view_ts=v["ts"]),
            on="ts", by="user_id", direction="backward",
        )
        out = m.dropna(subset=["view_ts"])[["event_id", "user_id", "view_ts"]]
        if out.empty:
            return empty
        out["view_ts"] = out["view_ts"].astype("datetime64[us]")
        return out

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: asof_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# props_extract_sum — nested/JSON-ish field extraction from a string column
# (SURVEY M13/M2: k=v attribute parsing, crossReferences flattening).
# ---------------------------------------------------------------------------
@query(
    "props_extract_sum",
    """
    SELECT event_type,
           CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def props_extract_sum(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        t2 = pa.table({"event_type": t["event_type"], "k": k})
        return t2.group_by("event_type").aggregate([("k", "sum"), ("k", "count")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("k_sum", alias_name="sum_k"), Sum("k_count", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# union_user_activity — union of per-source sub-loads into one table
# (SURVEY D3: per-MOD sub-loads appended to one node label).
# ---------------------------------------------------------------------------
@query(
    "union_user_activity",
    """
    SELECT user_id, count(*) AS n_events FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id FROM events WHERE event_type = 'purchase') t
    GROUP BY user_id
    """,
)
def union_user_activity(sf_dir: str):
    def src(et: str):
        return read_table(sf_dir, "events", columns=["user_id", "event_type"]).map_batches(
            lambda t, et=et: t.filter(pc.equal(t["event_type"], et)).select(["user_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    unioned = src("click").union(src("purchase"))
    return unioned.groupby("user_id").aggregate(Count(alias_name="n_events"))


# ---------------------------------------------------------------------------
# running_value_per_user — sort-within-group running aggregate
# (SURVEY O1: ORDER BY within grouped assembly, protein_sequence_etl.py:125-142).
# ---------------------------------------------------------------------------
@query(
    "running_value_per_user",
    """
    SELECT event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS cum_value_c
    FROM events
    """,
)
def running_value_per_user(sf_dir: str):
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value", "ts"])
    nparts = join_parts()

    def cumsum_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = (g["value"] * 100).round().astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "cum_value_c": cents.groupby(g["user_id"].to_numpy()).cumsum(),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: cumsum_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# route_classifier_counts — one-pass row routing to multiple logical tables
# by allow-list (SURVEY M12: GFF col-3 feature-type routing,
# transcript_etl.py:244-403).  Routes events into engagement/commerce/other.
# ---------------------------------------------------------------------------
@query(
    "route_classifier_counts",
    """
    SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                WHEN event_type IN ('purchase', 'signup') THEN 'commerce'
                ELSE 'other' END AS route,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY 1
    """,
)
def route_classifier_counts(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    routes = {"engagement": ("click", "view"), "commerce": ("purchase", "signup")}

    def classify(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        route = pa.array(["other"] * t.num_rows, pa.string())
        for name, types in routes.items():
            mask = pc.is_in(et, value_set=pa.array(types))
            route = pc.if_else(mask, pa.scalar(name, pa.string()), route)
        t2 = pa.table({"route": route, "value_c": _cents(t["value"])})
        return t2.group_by("route").aggregate([("value_c", "count"), ("value_c", "sum")])

    return (
        ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("route")
        .aggregate(Sum("value_c_count", alias_name="n"), Sum("value_c_sum", alias_name="value_c"))
    )


# ---------------------------------------------------------------------------
# curie_normalize_brands — curie split + prefix-fixup normalization
# (SURVEY M5: split_identifier + XB→Xenbase-style prefix rewrites,
# resource_descriptor_helper_2.py:203-230, etl.py:126-128).
# 'Brand#13' → 'BR:13' via split('#') + prefix map.
# ---------------------------------------------------------------------------
@query(
    "curie_normalize_brands",
    """
    SELECT 'BR:' || string_split(p_brand, '#')[2] AS curie, count(*) AS n_parts
    FROM part GROUP BY 1
    """,
)
def curie_normalize_brands(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_brand"])
    prefix_map = {"Brand": "BR"}  # reference-style fixup dict (broadcastable)

    def normalize(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["p_brand"], "#")
        prefix = pc.list_element(parts, 0)
        local = pc.list_element(parts, 1)
        for old, new in prefix_map.items():
            prefix = pc.if_else(pc.equal(prefix, old), pa.scalar(new, pa.string()), prefix)
        curie = pc.binary_join_element_wise(prefix, local, ":")
        return pa.table({"curie": curie}).group_by("curie").aggregate([("curie", "count")])

    return (
        ds.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("curie")
        .aggregate(Sum("curie_count", alias_name="n_parts"))
    )


# ---------------------------------------------------------------------------
# interval_join_campaigns — RANGE JOIN against overlapping intervals (a
# custom operator Ray Data lacks; reference has no time dimension).  150
# overlapping 10h campaign windows every 6h; each event matches every
# containing window via the broadcast segment-bucketed interval index
# (stages/interval.py).  Oracle: plain BETWEEN join.
# ---------------------------------------------------------------------------
@query(
    "interval_join_campaigns",
    """
    SELECT e.event_id, iv.i AS interval_id
    FROM events e
    JOIN (SELECT i, TIMESTAMP '2024-01-01' + i * (INTERVAL 6 HOUR) AS s
          FROM generate_series(0, 149) AS g(i)) iv
      ON e.ts >= iv.s AND e.ts <= iv.s + INTERVAL 10 HOUR
    """,
)
def interval_join_campaigns(sf_dir: str):
    from ..stages.interval import interval_join

    base_us = int(np.datetime64("2024-01-01", "us").astype(np.int64))
    i = np.arange(150, dtype=np.int64)
    intervals = pa.table({
        "interval_id": pa.array(i),
        "start": pa.array(base_us + i * 6 * 3_600_000_000),
        "end": pa.array(base_us + i * 6 * 3_600_000_000 + 10 * 3_600_000_000),
    })
    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    joined = interval_join(ds, intervals, ts_col="ts")
    return joined.map_batches(
        lambda t: pa.table({"event_id": t["event_id"], "interval_id": t["interval_id"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# stratified_sample_events — deterministic hash-based stratified sampling
# (§2.6: the reference's only sampling is the randomized schedule O4; a
# training-data pipeline needs per-stratum rates).  Knuth-hash bucket on
# event_id is reproducible across engines, so the SQL oracle selects the
# IDENTICAL sample — sampling as a deterministic operator, not an RNG.
# ---------------------------------------------------------------------------
@query(
    "stratified_sample_events",
    """
    SELECT event_type, count(*) AS n_sampled,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    WHERE (event_id * 2654435761) % 4294967296 % 100 <
          CASE event_type WHEN 'purchase' THEN 100 WHEN 'error' THEN 50 ELSE 10 END
    GROUP BY event_type
    """,
)
def stratified_sample_events(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    rates = {"purchase": 100, "error": 50}  # percent; default 10

    def sample_partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((eid * np.uint64(2654435761)) % np.uint64(4294967296)) % np.uint64(100)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        rate = np.full(len(et), 10, dtype=np.uint64)
        for typ, r in rates.items():
            rate[et == typ] = r
        keep = bucket < rate
        t2 = pa.table({"event_type": pa.array(et[keep], pa.string()),
                       "event_id": pa.array(eid[keep].astype(np.int64))})
        return t2.group_by("event_type").aggregate([("event_id", "count"), ("event_id", "sum")])

    return (
        ds.map_batches(sample_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("event_id_count", alias_name="n_sampled"),
                   Sum("event_id_sum", alias_name="id_sum"))
    )


# ---------------------------------------------------------------------------
# camel_bake_parts — camelCase key munge (§2.8: OBO header keys,
# obo_helper.py:40-42) + JSON-property baking (etl_helper.py:296-299),
# both as vectorized Arrow kernels.
# ---------------------------------------------------------------------------
@query(
    "camel_bake_parts",
    """
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_type, ' '),
             (x, i) -> CASE WHEN i = 1 THEN lower(x)
                            ELSE upper(x[1]) || lower(x[2:]) END), '') AS camel_key,
           '{"p_brand": "' || p_brand || '", "p_size": ' || CAST(p_size AS VARCHAR) || '}'
             AS baked
    FROM part
    """,
)
def camel_bake_parts(sf_dir: str):
    from ..functions.text_scalars import camel_case, json_bake

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_type", "p_brand", "p_size"])

    def kernel(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": t["p_partkey"],
            "camel_key": camel_case(t["p_type"], sep=" "),
            "baked": json_bake(t, ["p_brand"], ["p_size"]),
        })

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# distinct_users_per_type — COUNT(DISTINCT) via two-level aggregation
# (SURVEY A4 distinct at scale: dedup shuffle on (type, user) partials,
# then a tiny count — never a driver-side set).
# ---------------------------------------------------------------------------
@query(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([("user_id", "count")])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("user_id_count", alias_name="n"))
    )

    def per_type(t: pa.Table) -> pa.Table:
        t2 = pa.table({"event_type": t["event_type"], "n": t["n"]})
        return t2.group_by("event_type").aggregate([("n", "count"), ("n", "sum")])

    return (
        pairs.map_batches(per_type, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_count", alias_name="n_users"), Sum("n_sum", alias_name="n_events"))
    )


# ---------------------------------------------------------------------------
# median_value_per_type — EXACT distributed median via histogram partials +
# boundary-bucket resolve (no task ever holds a full group: event_type is a
# low-cardinality key, so a per-group map_groups would concentrate ~1/|types|
# of the dataset in one task at 100 TB).  All range arithmetic is done on an
# order-preserving int64 image of float64 (sign-folded IEEE bits), so bucket
# membership is exact integer math — no float-boundary rounding hazards.
#   pass 1: per-batch (type, count, min, max) partials → tiny per-type stats
#   pass 2..k: per-batch histograms of the int keys over the active range →
#     per-type bucket counts; the bucket(s) holding ranks (n-1)//2 and n//2
#     define the next (4096× narrower) range — ≤6 rounds collapse 2^64 keys
#   final: pull only the values inside the resolved range (bounded by
#     _BOUNDARY_LIMIT per type) and take the exact order statistics.
# Matches DuckDB's interpolated median bit-for-bit (mean of the two middle
# doubles for even n).
# ---------------------------------------------------------------------------
_MEDIAN_BUCKETS = 4096
_BOUNDARY_LIMIT = 262_144  # max values ever pulled to the driver per type


def _float_keys(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 image of float64 (IEEE-754 total order)."""
    x = v.astype(np.float64).view(np.int64)
    return x ^ ((x >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))


def _key_to_float(k: int) -> float:
    """Inverse of ``_float_keys`` for a single key (the XOR fold is an
    involution on the sign-extended mask)."""
    x = np.int64(k)
    x = x ^ ((x >> np.int64(63)) & np.int64(0x7FFFFFFFFFFFFFFF))
    return float(np.array([x], dtype=np.int64).view(np.float64)[0])


@query(
    "median_value_per_type",
    """
    SELECT event_type, median(value) AS med_value, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def median_value_per_type(sf_dir: str):
    # pinned once: the stats pass, each histogram round and the boundary
    # pull re-read these blocks instead of re-running the parquet read
    # (2-column projection, ~16 B/row, object-store-spillable)
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "value"]).materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        k = _float_keys(t["value"].to_numpy(zero_copy_only=False))
        t2 = pa.table({"event_type": t["event_type"], "k": pa.array(k, pa.int64())})
        return t2.group_by("event_type").aggregate(
            [("k", "count"), ("k", "min"), ("k", "max")]
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("k_count", alias_name="n"),
            Min("k_min", alias_name="lo"),
            Max("k_max", alias_name="hi"),
        )
    ).take_all()  # one tiny row per event type

    # type -> [lo_key, hi_key, rank_lo, rank_hi, below]; `below` = values with
    # key < lo_key already accounted for by earlier rounds
    state: dict[str, list] = {}
    counts: dict[str, int] = {}
    for r in stats:
        n = int(r["n"])
        counts[r["event_type"]] = n
        state[r["event_type"]] = [int(r["lo"]), int(r["hi"]), (n - 1) // 2, n // 2, 0]

    def hist_round(ranges: dict[str, tuple[int, int, int]]):
        """ranges: type -> (lo_key, hi_key, bucket_width)."""
        ref = ray.put(ranges)

        class Hist:
            def __init__(self, ref):
                self.ranges = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ts_, bs_, cs_ = [], [], []
                et = t["event_type"].to_numpy(zero_copy_only=False)
                keys = _float_keys(t["value"].to_numpy(zero_copy_only=False))
                for typ, (lo, hi, width) in self.ranges.items():
                    v = keys[(et == typ) & (keys >= lo) & (keys <= hi)]
                    if not len(v):
                        continue
                    # unsigned two's-complement diff: exact even when the key
                    # range spans the int64 sign boundary (v - lo would wrap)
                    diff = v.astype(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
                    bc = np.bincount((diff // np.uint64(width)).astype(np.int64),
                                     minlength=_MEDIAN_BUCKETS)
                    nz = np.nonzero(bc)[0]
                    ts_.append(np.full(len(nz), typ, dtype=object))
                    bs_.append(nz)
                    cs_.append(bc[nz])
                if not ts_:
                    return pa.table({"event_type": pa.array([], pa.string()),
                                     "bucket": pa.array([], pa.int64()),
                                     "cnt": pa.array([], pa.int64())})
                return pa.table({
                    "event_type": pa.array(np.concatenate(ts_), pa.string()),
                    "bucket": pa.array(np.concatenate(bs_), pa.int64()),
                    "cnt": pa.array(np.concatenate(cs_).astype(np.int64), pa.int64()),
                })

        return (
            ds.map_batches(task_stage(Hist, ref), batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "bucket"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        ).take_all()  # ≤ |types| × _MEDIAN_BUCKETS tiny rows

    def _width(lo: int, hi: int) -> int:
        return max(1, -((lo - hi - 1) // _MEDIAN_BUCKETS))  # ceil-div, ≥1

    # histogram only the types whose full value set would exceed the pull
    # bound; small-n or all-equal types go straight to the final pull
    pending = {t: (s[0], s[1], _width(s[0], s[1])) for t, s in state.items()
               if counts[t] > _BOUNDARY_LIMIT and s[1] > s[0]}
    for _ in range(8):  # 4096-way shrink per round: ≤6 rounds cover 2^64 keys
        if not pending:
            break
        rows = hist_round(pending)
        hists = {t: np.zeros(_MEDIAN_BUCKETS, dtype=np.int64) for t in pending}
        for r in rows:
            hists[r["event_type"]][r["bucket"]] = r["cnt"]
        nxt = {}
        for typ, h in hists.items():
            lo, hi, r1, r2, below = state[typ]
            width = pending[typ][2]
            cum = np.concatenate(([0], np.cumsum(h)))
            b1 = int(np.searchsorted(cum, r1 - below, side="right")) - 1
            b2 = int(np.searchsorted(cum, r2 - below, side="right")) - 1
            new_lo = lo + b1 * width
            new_hi = min(hi, lo + (b2 + 1) * width - 1)
            state[typ] = [new_lo, new_hi, r1, r2, below + int(cum[b1])]
            span = int(cum[b2 + 1] - cum[b1])
            if span > _BOUNDARY_LIMIT and new_hi > new_lo:
                nxt[typ] = (new_lo, new_hi, _width(new_lo, new_hi))
        pending = nxt

    # degenerate ranges (all remaining values bit-identical) resolve with
    # no pull at all — otherwise an all-equal type with n > limit would
    # pull its whole group
    resolved: dict[str, float] = {}
    for typ in list(state):
        lo, hi = state[typ][0], state[typ][1]
        if lo == hi:
            resolved[typ] = _key_to_float(lo)
            del state[typ]

    # final: pull ONLY the boundary-range values per type (bounded)
    final_ranges = {t: (s[0], s[1]) for t, s in state.items()}
    fref = ray.put(final_ranges)

    def boundary_vals(t: pa.Table) -> pa.Table:
        rngs = ray.get(fref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        vals = t["value"].to_numpy(zero_copy_only=False)
        keys = _float_keys(vals)
        keep = np.zeros(len(vals), dtype=bool)
        for typ, (lo, hi) in rngs.items():
            keep |= (et == typ) & (keys >= lo) & (keys <= hi)
        return pa.table({"event_type": pa.array(et[keep], pa.string()),
                         "value": pa.array(vals[keep], pa.float64())})

    by_type: dict[str, list[float]] = {}
    if state:  # skip the pull pass entirely if every type resolved degenerate
        pulled = ds.map_batches(boundary_vals, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        for r in pulled:
            by_type.setdefault(r["event_type"], []).append(r["value"])

    out_rows = []
    for typ, s in state.items():
        _, _, r1, r2, below = s
        v = np.asarray(by_type[typ], dtype=np.float64)
        v = v[np.argsort(_float_keys(v), kind="stable")]
        x1, x2 = v[r1 - below], v[r2 - below]
        med = float(x1) if r1 == r2 else float((x1 + x2) / 2.0)
        out_rows.append({"event_type": typ, "med_value": med, "n": counts[typ]})
    for typ, med in resolved.items():
        out_rows.append({"event_type": typ, "med_value": med, "n": counts[typ]})
    out = pd.DataFrame(out_rows, columns=["event_type", "med_value", "n"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# left_outer_order_counts — LEFT OUTER join preserving customers with no
# orders (completes the join-type inventory next to the inner /
# broadcast / semi / anti / as-of / interval forms).  Ray-first shape:
# pre-aggregate orders per custkey (combiner before the exchange) so the
# outer join's right side is one row per customer, then null-fill.
# ---------------------------------------------------------------------------
@query(
    "left_outer_order_counts",
    """
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def left_outer_order_counts(sf_dir: str):
    # ONE tagged-union exchange replaces the former two (count aggregate
    # + left_outer Dataset.join): customer keys ride side 0, per-batch
    # count partials side 1; the partition kernel sums partials and
    # left-gathers with a coalesce-to-0 — same single-exchange shape as
    # prorate_totalprice_lineitems, immune to the empty-side join crash.
    from ..functions.pools import join_parts
    from ..stages.exchange import exchange_map_groups
    from ..stages.partition import int_key_part_col

    nparts = join_parts()

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        out = pa.table({
            "key": g["o_custkey"],
            "n": g["o_custkey_count"].cast(pa.int64()),
            "side": pa.array(np.ones(g.num_rows, np.int8)),
        })
        return int_key_part_col(out, "key", nparts)

    def cust_rows(t: pa.Table) -> pa.Table:
        out = pa.table({
            "key": t["c_custkey"],
            "n": pa.array(np.zeros(t.num_rows, np.int64)),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
        })
        return int_key_part_col(out, "key", nparts)

    tagged = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True,
    ).union(read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True))

    def merge_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        s = g["side"].to_numpy(zero_copy_only=False)
        k = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = k[s == 0]
        pk, pn = k[s == 1], n[s == 1]
        if len(pk):
            order = np.argsort(pk, kind="stable")
            pk_s, pn_s = pk[order], pn[order]
            first = np.r_[True, pk_s[1:] != pk_s[:-1]]
            uk = pk_s[first]
            sums = np.add.reduceat(pn_s, np.flatnonzero(first))
            pos = np.minimum(np.searchsorted(uk, ck), len(uk) - 1)
            out = np.where(uk[pos] == ck, sums[pos], 0)
        else:
            out = np.zeros(len(ck), np.int64)
        return pa.table({"c_custkey": pa.array(ck),
                         "n_orders": pa.array(out.astype(np.int64))})

    return exchange_map_groups(tagged, "gpart", merge_part, nparts,
                               drop_part_col=True)


# ---------------------------------------------------------------------------
# pivot_event_type_counts — long→wide pivot (one column per event type).
# Vectorized per-batch indicator partials before one bounded exchange —
# the M14/M12 routing family's wide-output sibling.
# ---------------------------------------------------------------------------
_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")

@query(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           """ + ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _PIVOT_TYPES) + """
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_type_counts(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in _PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols).group_by("user_id").aggregate(
            [(f"n_{ty}", "sum") for ty in _PIVOT_TYPES]
        ).rename_columns(["user_id"] + [f"n_{ty}" for ty in _PIVOT_TYPES])

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).groupby("user_id").aggregate(
        *[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in _PIVOT_TYPES]
    )


# ---------------------------------------------------------------------------
# kmv_distinct_estimate — K-Minimum-Values distinct-count sketch per
# event type (the mergeable approximate-distinct sketch for 100 TB
# cardinality estimation; exact COUNT DISTINCT is q:distinct_users_per_type).
# The hash is seed-derived ((A·x + B) mod 2^64) and the estimator is
# exact integer arithmetic ((k-1)·2^64 // h_k), so the DuckDB oracle
# recomputes the IDENTICAL estimate in HUGEINT math — a typed-hash gate
# on an approximate sketch.  Partials: per-batch distinct + k-min per
# type; merge: one bounded exchange (|event types| groups).
# ---------------------------------------------------------------------------
_KMV_K = 64
_KMV_A = 6364136223846793005
_KMV_B = 1442695040888963407

@query(
    "kmv_distinct_estimate",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             (({_KMV_A}::HUGEINT * user_id::HUGEINT + {_KMV_B}::HUGEINT)
              % 18446744073709551616::HUGEINT) AS hv
      FROM events
    ), ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(CASE WHEN nd < {_KMV_K} THEN nd
                ELSE ({_KMV_K - 1}::HUGEINT * 18446744073709551616::HUGEINT) // hv
           END AS BIGINT) AS n_distinct_est
    FROM ranked
    WHERE rn = {_KMV_K} OR (nd < {_KMV_K} AND rn = 1)
    """,
)
def kmv_distinct_estimate(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            hv = np.uint64(_KMV_A) * uid + np.uint64(_KMV_B)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "hv": hv}).drop_duplicates()
        # k smallest per type — C-speed sort + head, no per-type Python
        df = (df.sort_values(["event_type", "hv"], kind="mergesort")
                .groupby("event_type", sort=False).head(_KMV_K))
        return pa.table({"event_type": pa.array(df["event_type"]),
                         "hv": pa.array(df["hv"].to_numpy(), pa.uint64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(g["hv"].to_numpy())  # distinct + sorted
        nd = len(hv)
        if nd < _KMV_K:
            est = nd
        else:
            est = (_KMV_K - 1) * (1 << 64) // int(hv[_KMV_K - 1])
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_distinct_est": np.array([est], dtype=np.int64)})

    # |event types| is bounded (grading-key cardinality), so the merge
    # exchange is per-type map_groups — same contract as the exact median
    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).groupby("event_type").map_groups(
        merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# rolling_sum4_per_user — ROWS-window rolling aggregate (4-event window)
# per user, the row-count sibling of the time-window family (§2.9).
# Integer cents keep the window sum exact on both sides.  Same
# partition-kernel exchange as running_value_per_user.
# ---------------------------------------------------------------------------
@query(
    "rolling_sum4_per_user",
    """
    SELECT event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS win_sum_c
    FROM events
    """,
)
def rolling_sum4_per_user(sf_dir: str):
    from ..functions.pools import join_parts
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value", "ts"])
    nparts = join_parts()

    def roll_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = (g["value"] * 100).round().astype(np.int64)
        win = (cents.groupby(g["user_id"].to_numpy(), sort=False)
               .rolling(4, min_periods=1).sum()
               .reset_index(drop=True).astype(np.int64))
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "win_sum_c": win})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: roll_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# quartiles_value_per_type — EXACT distributed p25/p50/p75 per type via
# the generalized multi-rank histogram refine (stages/quantiles.py; same
# no-full-group-in-one-task design as median_value_per_type, arbitrary
# rank set).  Integer cents keep rank selection exact; rank convention
# matches DuckDB quantile_disc (ceil(q·n) − 1).
# ---------------------------------------------------------------------------
@query(
    "quartiles_value_per_type",
    """
    SELECT event_type,
           quantile_disc(CAST(round(value * 100) AS BIGINT), 0.25) AS p25_c,
           quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50) AS p50_c,
           quantile_disc(CAST(round(value * 100) AS BIGINT), 0.75) AS p75_c,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def quartiles_value_per_type(sf_dir: str):
    from ..stages.quantiles import exact_group_quantiles

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.round(v * 100).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "cents": pa.array(cents, pa.int64())})

    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True)
    res = exact_group_quantiles(cents_ds, "event_type", "cents",
                                quantiles=((1, 4), (1, 2), (3, 4)),
                                pool=_pool())
    counts = res.pop("_n")
    rows = [{"event_type": g, "p25_c": q[0], "p50_c": q[1], "p75_c": q[2],
             "n": counts[g]} for g, q in res.items()]
    out = pd.DataFrame(rows, columns=["event_type", "p25_c", "p50_c", "p75_c", "n"])
    for c in ("p25_c", "p50_c", "p75_c", "n"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# percentile_cont_value_per_type — EXACT interpolated (PERCENTILE_CONT)
# p50/p90 per type.  The two bracketing order statistics per quantile
# come from the same histogram-refine stage as quartiles_value_per_type
# (stages/quantiles.py — no task holds a full group); the interpolation
# lo + (hi - lo)·frac is evaluated in float64 with the SAME operation
# order as the oracle so hashes are bit-identical.  The oracle computes
# the identical explicit formula over row_number order statistics
# instead of DuckDB quantile_cont, pinning the float semantics on both
# sides.  Reference analogue: summary statistics over grouped numeric
# columns (generic stats in the reference's report pass).
# ---------------------------------------------------------------------------
@query(
    "percentile_cont_value_per_type",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) - 1 AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c)
    SELECT event_type,
           CAST(max(CASE WHEN rk = ((n - 1) * 1) // 2 THEN cents END) AS DOUBLE)
             + (max(CASE WHEN rk = least(((n - 1) * 1) // 2 + 1, n - 1) THEN cents END)
                - max(CASE WHEN rk = ((n - 1) * 1) // 2 THEN cents END))
               * (CAST(((n - 1) * 1) % 2 AS DOUBLE) / 2.0) AS p50c_cont,
           CAST(max(CASE WHEN rk = ((n - 1) * 9) // 10 THEN cents END) AS DOUBLE)
             + (max(CASE WHEN rk = least(((n - 1) * 9) // 10 + 1, n - 1) THEN cents END)
                - max(CASE WHEN rk = ((n - 1) * 9) // 10 THEN cents END))
               * (CAST(((n - 1) * 9) % 10 AS DOUBLE) / 10.0) AS p90c_cont,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM r GROUP BY event_type, n
    """,
)
def percentile_cont_value_per_type(sf_dir: str):
    from ..stages.quantiles import exact_group_quantiles

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.round(v * 100).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "cents": pa.array(cents, pa.int64())})

    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True)
    res = exact_group_quantiles(
        cents_ds, "event_type", "cents",
        quantiles=((1, 2, "lo"), (1, 2, "hi"), (9, 10, "lo"), (9, 10, "hi")),
        pool=_pool())
    counts = res.pop("_n")

    def interp(n: int, num: int, den: int, lo: int, hi: int) -> float:
        # identical op order to the SQL: DOUBLE(lo) + (hi-lo) * (rem/den)
        frac = ((n - 1) * num % den) / float(den)
        return float(lo) + (hi - lo) * frac

    rows = [{"event_type": g,
             "p50c_cont": interp(counts[g], 1, 2, q[0], q[1]),
             "p90c_cont": interp(counts[g], 9, 10, q[2], q[3]),
             "n_rows": counts[g]}
            for g, q in res.items()]
    out = pd.DataFrame(rows, columns=["event_type", "p50c_cont", "p90c_cont", "n_rows"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# event_transition_counts — first-order Markov transition counts over
# each user's event sequence (lag/lead window family, §2.9): pair every
# event with its predecessor within the user's (ts, event_id) order and
# count (prev_type, next_type) globally.  Partition-kernel exchange:
# users are hash-bucketed into a bounded number of partitions, the
# per-partition kernel is one mergesort + shifted-equality mask (no
# per-user Python), and only tiny per-partition pair counts reach the
# final exchange.  Reference analogue: ordered per-entity sequence
# walks (stage-ordered ETL passes over sorted per-gene rows).
# ---------------------------------------------------------------------------
@query(
    "event_transition_counts",
    """
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n_trans
    FROM (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events) t
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_transition_counts(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id"])
    nparts = _join_parts()

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "next_type": pd.Series([], dtype=str),
                                 "n_trans": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"prev_type": np.roll(et, 1)[same],
                              "next_type": et[same]})
        out = (pairs.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n_trans"))
        out["n_trans"] = out["n_trans"].astype(np.int64)
        return out

    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    partials = exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: pairs_part(g.to_pandas()), nparts,
        drop_part_col=True)

    def trans_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["prev_type", "next_type"]).aggregate(
            [("n_trans", "sum")])
        return pa.table({"prev_type": g["prev_type"],
                         "next_type": g["next_type"],
                         "n_trans": g["n_trans_sum"].cast(pa.int64())})

    return _collect_tree(partials, trans_combine).to_pandas() \
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# funnel_view_purchase — ordered two-stage funnel: users with a 'view',
# and of those, users with a 'purchase' STRICTLY AFTER their first view
# (converted ⟺ max purchase ts > min view ts, computed per user inside
# one hash-bucketed partition kernel; rows are pruned to the two funnel
# event types before the exchange).  Only two int64 partials per
# partition reach the driver.  Reference analogue: staged dependency
# gating between loads (a later stage keyed on an earlier stage's
# output).
# ---------------------------------------------------------------------------
@query(
    "funnel_view_purchase",
    """
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    conv AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fv.first_view)
    SELECT CAST((SELECT count(*) FROM fv) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted
    """,
)
def funnel_view_purchase(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    nparts = _join_parts()

    def prune(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["view", "purchase"])))
        return int_key_part_col(t, "user_id", nparts)

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        views = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        if views.empty:
            return pd.DataFrame({"n_viewed": pd.array([0], dtype="int64"),
                                 "n_converted": pd.array([0], dtype="int64")})
        pur = g[g["event_type"] == "purchase"].groupby("user_id")["ts"].max()
        j = views.to_frame("first_view").join(pur.to_frame("last_purchase"),
                                              how="left")
        conv = int((j["last_purchase"] > j["first_view"]).sum())
        return pd.DataFrame({"n_viewed": pd.array([len(j)], dtype="int64"),
                             "n_converted": pd.array([conv], dtype="int64")})

    from ..stages.exchange import exchange_map_groups

    partials = exchange_map_groups(
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: fold_part(g.to_pandas()), nparts,
        drop_part_col=True)
    agg = partials.aggregate(Sum("n_viewed", alias_name="n_viewed"),
                             Sum("n_converted", alias_name="n_converted"))
    return pd.DataFrame({"n_viewed": pd.array([agg["n_viewed"]], dtype="int64"),
                         "n_converted": pd.array([agg["n_converted"]],
                                                 dtype="int64")})


# ---------------------------------------------------------------------------
# rollup_order_counts — GROUP BY ROLLUP (status, priority): the finest
# level is a distributed partial-agg + one small exchange; the subtotal
# and grand-total levels are derived from the FINEST RESULT (bounded by
# |status|·|priority| rows — never from the input), so the rollup adds
# zero extra passes over the data.  NULL marks rolled-up columns, as in
# SQL.  Reference analogue: per-load + per-type + global count reports
# emitted together (the reference's summary report pass).
# ---------------------------------------------------------------------------
@query(
    "rollup_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_counts(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

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
            "n_orders": pc.cast(g["rev_c_count"], pa.int64()),
        })

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("rev_c", alias_name="rev_c"),
                   Sum("n_orders", alias_name="n_orders"))
    ).to_pandas()  # ≤ |status|·|priority| rows — bounded, not data-scaled

    lvl1 = (finest.groupby("o_orderstatus", as_index=False)
            [["n_orders", "rev_c"]].sum())
    lvl1.insert(1, "o_orderpriority", None)
    lvl0 = pd.DataFrame({"o_orderstatus": [None], "o_orderpriority": [None],
                         "n_orders": [finest["n_orders"].sum()],
                         "rev_c": [finest["rev_c"].sum()]})
    cols = ["o_orderstatus", "o_orderpriority", "n_orders", "rev_c"]
    out = pd.concat([finest[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
    for c in ("n_orders", "rev_c"):
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# bloom_semi_join_parts — Bloom-prefiltered big×big semi-join
# (stages/bloom.py): the probe side (lineitem) is filtered against a
# bounded broadcast bitmap BEFORE the exchange, so only survivors (true
# matches + a bounded false-positive residue) enter the exact
# ``left_semi`` confirm join.  The build is distributed with bounded
# driver state (≤ m_bits/64 words).  Exactness comes from the confirm
# join, not the filter.  Reference analogue: primary-id set pruning
# before resolution (etl_helper lookups), made broadcast-once/bounded.
# ---------------------------------------------------------------------------
@query(
    "bloom_semi_join_parts",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_type = 'ECONOMY' AND p_size >= 25)
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join_parts(sf_dir: str):
    from ..stages.bloom import BloomProbe, build_bloom

    parts = read_table(sf_dir, "part",
                       columns=["p_partkey", "p_type", "p_size"]).map_batches(
        lambda t: pa.table({"p_partkey": pc.unique(t.filter(
            pc.and_(pc.equal(t["p_type"], "ECONOMY"),
                    pc.greater_equal(t["p_size"], 25)))
            ["p_partkey"].combine_chunks())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # materialize once: the filtered build side feeds BOTH the bloom
    # build and the confirm join — without it the part scan+filter plan
    # executes twice (blocks stay in the object store, spillable)
    ref, m_bits, k = build_bloom(parts, "p_partkey")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_returnflag", "l_extendedprice"])
    survivors = li.map_batches(
        task_stage(BloomProbe, ref, "l_partkey", m_bits, k),
        batch_format="pyarrow", zero_copy_batch=True)
    # exact confirm: single-exchange semi filter (stages/attach.py), not
    # Dataset.join left_semi — same per-row-Python-partition rationale
    from ..stages.attach import exchange_semi

    kept = exchange_semi(survivors, parts, "l_partkey",
                         keys_key="p_partkey", nparts=_join_parts())

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"l_returnflag": t["l_returnflag"],
                       "rev_c": _cents(t["l_extendedprice"])})
        return t2.group_by("l_returnflag").aggregate(
            [("rev_c", "count"), ("rev_c", "sum")])

    return (
        kept.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("rev_c_count", alias_name="n_rows"),
                   Sum("rev_c_sum", alias_name="rev_c"))
    )


# ---------------------------------------------------------------------------
# close_pairs_per_user — windowed SELF-join: per user, count ordered
# event pairs (a, b) with b strictly after a and within 60 s.  The naive
# self-join is quadratic; here each hash-bucketed partition kernel does
# ONE pandas time-window rolling count (window [b.ts−60s, b.ts), C
# speed, no per-user Python beyond the grouped rolling) — per-row
# predecessor counts sum to the pair count.  Reference analogue:
# same-entity temporal proximity checks in per-gene ordered passes.
# ---------------------------------------------------------------------------
@query(
    "close_pairs_per_user",
    """
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 60 SECONDS
    GROUP BY a.user_id
    """,
)
def close_pairs_per_user(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    nparts = _join_parts()

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort").reset_index(drop=True)
        g["ts"] = g["ts"].astype("datetime64[ns]")
        g["one"] = 1.0
        cnt = (g.groupby("user_id", sort=False)
               .rolling("60s", on="ts", closed="left")["one"].sum()
               .fillna(0.0).to_numpy())
        out = (pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                             "n_pairs": cnt.astype(np.int64)})
               .groupby("user_id", as_index=False)["n_pairs"].sum())
        return out[out["n_pairs"] > 0]

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: pairs_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# user_event_signature — ordered string_agg per user (the per-entity
# sequence signature; same grouped ordered-concat shape as the
# conversation dialogue assembly in pipelines/derived.py).  Users are
# hash-bucketed; the kernel is one mergesort + grouped ','.join (output
# size ∝ group size, so the join IS the work).
# ---------------------------------------------------------------------------
@query(
    "user_event_signature",
    """
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS sig,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def user_event_signature(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id"])
    nparts = _join_parts()

    def sig_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = (g.groupby("user_id", sort=False)
               .agg(sig=("event_type", ",".join),
                    n_events=("event_type", "size"))
               .reset_index())
        agg["n_events"] = agg["n_events"].astype(np.int64)
        return agg

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: sig_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# ntile_quartile_events — NTILE(4) ranking window per user over
# (value, event_id) order, DuckDB bucket-size convention (first n mod 4
# buckets get ceil(n/4) rows).  Partition-kernel: grouped cumcount +
# size transform, pure integer arithmetic, no per-user Python.
# ---------------------------------------------------------------------------
@query(
    "ntile_quartile_events",
    """
    SELECT event_id,
           CAST(ntile(4) OVER (PARTITION BY user_id
                               ORDER BY value, event_id) AS BIGINT) AS tile
    FROM events
    """,
)
def ntile_quartile_events(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "value", "event_id"])
    nparts = _join_parts()

    def tile_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        i = grp.cumcount().to_numpy()
        n = grp["event_id"].transform("size").to_numpy()
        base, rem = n // 4, n % 4
        big = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
        in_big = i < big
        tile = np.where(
            in_big,
            i // np.maximum(base + 1, 1) + 1,
            rem + (i - big) // np.maximum(base, 1) + 1,
        )
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "tile": tile.astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: tile_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# heavy_hitter_users — EXACT frequent-items in ONE combiner exchange.
# The threshold is RELATIVE — users with more than 1.15× the mean
# events/user — because per-user rates, not totals, are what's stable
# as the corpus scales; exact integer inequality
# ``cnt · 100 · n_users > 115 · n_total`` on both sides.  A relative
# threshold needs EXACT ``count(DISTINCT user_id)``, which already
# forces one full per-user exchange — so the classic Misra-Gries
# prune-then-recount (an earlier shape here: MG merge exchange +
# candidate recount exchange + distinct-users exchange = 3 full passes,
# ~2 s fixed cost each) buys nothing: the single per-batch-combined
# count aggregate IS the distinct pass, and n_users / the heavy filter
# fall out of its (bounded, per-user) output.  MG pays only when the
# threshold is absolute φ·n and no exact distinct count is required.
# Shuffle volume = per-batch-distinct (user, cnt) partials — identical
# to what the distinct-users pass alone shuffled.
# ---------------------------------------------------------------------------
@query(
    "heavy_hitter_users",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    HAVING count(*) * 100 * (SELECT count(DISTINCT user_id) FROM events)
           > 115 * (SELECT count(*) FROM events)
    """,
)
def heavy_hitter_users(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id"])
    n_total = ds.count()  # parquet metadata, no scan

    def partial_counts(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        users, cnt = np.unique(uid, return_counts=True)
        return pa.table({"user_id": pa.array(users, pa.int64()),
                         "n_events": pa.array(cnt.astype(np.int64), pa.int64())})

    # one pass over events, one combiner exchange; the per-user output
    # is distributed (never driver-resident) — n_users is a bounded
    # count over it and the threshold filter streams through it
    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"))
    ).materialize()  # per-user table: counted once, filtered once
    n_users = counts.count()
    return counts.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["n_events"], 100 * n_users), 115 * n_total)),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# doc_chunks_overlap — sliding-window document chunking (size 200,
# stride 150): the unit op of context-window training-data prep
# (complement of pack_context_windows, which packs whole docs).
# Embarrassingly parallel — NO shuffle: per batch, one vectorized
# utf8_slice_codeunits pass per DISTINCT chunk start (bounded by
# max_len/stride, never per row).  Codepoint slicing matches DuckDB
# substring semantics exactly (verified incl. non-ASCII).
# ---------------------------------------------------------------------------
@query(
    "doc_chunks_overlap",
    """
    SELECT doc_id, i AS chunk_idx,
           substring(text, CAST(i * 150 + 1 AS INT), 200) AS chunk,
           CAST(length(substring(text, CAST(i * 150 + 1 AS INT), 200)) AS BIGINT)
             AS chunk_len
    FROM documents, generate_series(0, 255) AS t(i)
    WHERE i * 150 < length(text)
    """,
)
def doc_chunks_overlap(sf_dir: str):
    SIZE, STRIDE = 200, 150

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_batch(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        outs = []
        i = 0
        while (lens > i * STRIDE).any():
            sel = t.filter(pa.array(lens > i * STRIDE))
            chunk = pc.utf8_slice_codeunits(sel["text"], i * STRIDE,
                                            i * STRIDE + SIZE)
            outs.append(pa.table({
                "doc_id": sel["doc_id"],
                "chunk_idx": pa.array(np.full(sel.num_rows, i), pa.int64()),
                "chunk": chunk,
                "chunk_len": pc.cast(pc.utf8_length(chunk), pa.int64()),
            }))
            i += 1
        if not outs:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string()),
                             "chunk_len": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    return ds.map_batches(chunk_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-document top-3 terms by tf × (N/df) (the idf is
# the exact rational N/df rather than a log so both sides compute ONE
# IEEE division and hashes are bit-identical; ranking is unchanged
# because log is monotone).  Distributed shape: per-batch (doc, token)
# tf partials (docs are row-atomic, so tf needs no exchange) → one
# token-keyed exchange for df → hash join tf×df → per-doc top-3 via a
# hash-bucketed partition kernel.  Tokenization identical to
# explode_tokens_topk (string_split on ' ', empties dropped).
# ---------------------------------------------------------------------------
@query(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok2 GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY token),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (SELECT tf.doc_id, tf.token,
                 CAST(tf.tf * n.n AS DOUBLE) / df.df AS score,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.token
                 ) AS rn
          FROM tf JOIN df USING (token), n)
    SELECT doc_id, token, score FROM s WHERE rn <= 3
    """,
)
def tfidf_top_terms(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan
    nparts = _join_parts()

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        pairs = pa.table({"doc_id": t["doc_id"].take(parent.filter(keep)),
                          "token": flat.filter(keep)})
        # docs are row-atomic within a batch → these ARE the final tfs
        g = pairs.group_by(["doc_id", "token"]).aggregate([("token", "count")])
        return pa.table({"doc_id": g["doc_id"], "token": g["token"],
                         "tf": pc.cast(g["token_count"], pa.int64())})

    tf = ds.map_batches(tf_partial, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    # df: vocabulary-bounded — combine tree + broadcast lookup instead
    # of a token-keyed shuffle join (the hybrid small-side pattern; the
    # bound is asserted, scale path = exchange_attach on token)
    from ..functions.bounds import assert_bounded
    from ..stages.exchange import exchange_map_groups
    from ..stages.quantiles import _collect_tree

    def df_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g["token"],
                         "df": g["token_count"].cast(pa.int64())})

    def df_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("df", "sum")])
        return pa.table({"token": g["token"],
                         "df": g["df_sum"].cast(pa.int64())})

    df_tbl = _collect_tree(
        tf.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        df_combine)
    assert_bounded(df_tbl.num_rows, "tfidf token vocabulary")
    df_ref = ray.put((df_tbl["token"].combine_chunks(),
                      df_tbl["df"].to_numpy(zero_copy_only=False)))

    def score_batch(t: pa.Table) -> pa.Table:
        vocab, dfv = ray.get(df_ref)
        idx = pc.index_in(t["token"], value_set=vocab) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        score = (t["tf"].to_numpy(zero_copy_only=False) * n_docs) / dfv[idx]
        out = pa.table({"doc_id": t["doc_id"], "token": t["token"],
                        "score": pa.array(score, pa.float64())})
        return int_key_part_col(out, "doc_id", nparts)

    def topk_part(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values(["doc_id", "score", "token"], kind="mergesort",
                            ascending=[True, False, True])
        out = df.groupby("doc_id", sort=False).head(3)
        return pa.Table.from_pandas(out[["doc_id", "token", "score"]],
                                    preserve_index=False)

    return exchange_map_groups(
        tf.map_batches(score_batch, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", topk_part, nparts, drop_part_col=True)


# ---------------------------------------------------------------------------
# retention_by_epoch — cohort retention: of the users active in epoch e
# (epoch := event_id % 4), how many are also active in epoch e+1.
# Partition-kernel shape: per-batch (user, epoch) dedup partials → one
# user-keyed exchange → per-user epoch BITMASK fold (≤64 epochs in one
# uint64; consecutive-epoch retention is (mask & mask>>1) popcounts —
# pure integer ops, no per-user Python).
# ---------------------------------------------------------------------------
@query(
    "retention_by_epoch",
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_id % 4 AS epoch FROM events)
    SELECT a.epoch,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(b.user_id) AS BIGINT) AS n_retained
    FROM ue a LEFT JOIN ue b
      ON a.user_id = b.user_id AND b.epoch = a.epoch + 1
    GROUP BY a.epoch
    """,
)
def retention_by_epoch(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "event_id"])
    nparts = _join_parts()

    def dedup_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ep = t["event_id"].to_numpy(zero_copy_only=False) % 4
        df = pd.DataFrame({"user_id": uid, "epoch": ep}).drop_duplicates()
        out = pa.table({"user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                        "epoch": pa.array(df["epoch"].to_numpy(), pa.int64())})
        return int_key_part_col(out, "user_id", nparts)

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["user_id", "epoch"])
             .sort_values("user_id", kind="mergesort"))
        uid = g["user_id"].to_numpy()
        bit = np.uint64(1) << g["epoch"].to_numpy().astype(np.uint64)
        starts = np.nonzero(np.concatenate(([True], uid[1:] != uid[:-1])))[0]
        m = np.bitwise_or.reduceat(bit, starts)  # one uint64 mask per user
        rows = []
        for e in range(4):
            active = (m >> np.uint64(e)) & np.uint64(1)
            retained = active & ((m >> np.uint64(e + 1)) & np.uint64(1))
            rows.append({"epoch": e, "n_active": int(active.sum()),
                         "n_retained": int(retained.sum())})
        out = pd.DataFrame(rows)
        return out[out["n_active"] > 0]

    from ..stages.exchange import exchange_map_groups

    partials = exchange_map_groups(
        ds.map_batches(dedup_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: fold_part(g.to_pandas()), nparts,
        drop_part_col=True)
    return (partials.groupby("epoch")
            .aggregate(Sum("n_active", alias_name="n_active"),
                       Sum("n_retained", alias_name="n_retained")))


# ---------------------------------------------------------------------------
# mad_value_per_type — median absolute deviation per group, the robust
# dispersion statistic: TWO composed exact distributed order-statistic
# passes (stages/quantiles.py) — group medians first, then the median
# of |x − med| with the tiny medians dict broadcast into the second
# pass's batches.  Nothing ever holds a full group; rank convention is
# quantile_disc on both passes and both sides.
# ---------------------------------------------------------------------------
@query(
    "mad_value_per_type",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    med AS (
      SELECT event_type, quantile_disc(cents, 0.5) AS med
      FROM c GROUP BY event_type)
    SELECT c.event_type,
           quantile_disc(abs(c.cents - med.med), 0.5) AS mad_c,
           CAST(count(*) AS BIGINT) AS n
    FROM c JOIN med USING (event_type)
    GROUP BY c.event_type
    """,
)
def mad_value_per_type(sf_dir: str):
    from ..stages.quantiles import exact_group_quantiles

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t["event_type"],
                         "cents": pa.array(np.round(v * 100).astype(np.int64),
                                           pa.int64())})

    # pinned once: pass 1 (stats+hist+pull) and the Dev input all read
    # these blocks instead of re-running read+to_cents per pass
    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    med = exact_group_quantiles(cents_ds, "event_type", "cents",
                                quantiles=((1, 2),), pool=_pool())
    med.pop("_n")
    med_types = pa.array(sorted(med))
    med_vals = np.array([med[t.as_py()][0] for t in med_types], np.int64)
    med_ref = ray.put((med_types, med_vals))

    # task closure over a ray.put ref, not an actor pool: the state is a
    # broadcast dict and per-query pool startup was the dominant fixed
    # cost of this stage (same fix as quartile_bin_counts)
    def dev_fn(t: pa.Table) -> pa.Table:
        types, vals = ray.get(med_ref)
        idx = pc.index_in(t["event_type"], value_set=types
                          ).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t["event_type"],
                         "dev": pa.array(np.abs(cents - vals[idx]).astype(np.int64),
                                         pa.int64())})

    dev_ds = cents_ds.map_batches(dev_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)
    res = exact_group_quantiles(dev_ds, "event_type", "dev",
                                quantiles=((1, 2),), pool=_pool())
    counts = res.pop("_n")
    out = pd.DataFrame(
        [{"event_type": g, "mad_c": q[0], "n": counts[g]} for g, q in res.items()],
        columns=["event_type", "mad_c", "n"])
    for c in ("mad_c", "n"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# percent_rank_events — PERCENT_RANK ranking window per user over value:
# (rank − 1)/(n − 1) with SQL RANK tie semantics (method='min', gaps),
# 0 for singleton groups.  Ties on value make event_id unusable as a
# tiebreak, so the output keys on event_id and carries the rank — the
# same partition-kernel exchange as ntile_quartile_events, one grouped
# C-level rank pass, one IEEE division on both sides.
# ---------------------------------------------------------------------------
@query(
    "percent_rank_events",
    """
    SELECT event_id,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pr
    FROM events
    """,
)
def percent_rank_events(sf_dir: str):
    from ..stages.partition import int_key_part_col

    ds = read_table(sf_dir, "events", columns=["user_id", "value", "event_id"])
    nparts = _join_parts()

    def pr_part(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id", sort=False)
        rank = grp["value"].rank(method="min").to_numpy()
        n = grp["value"].transform("size").to_numpy()
        pr = np.where(n > 1, (rank - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "pr": pr})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: int_key_part_col(t, "user_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: pr_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# weighted_avg_price — quantity-weighted average price per returnflag:
# exact integer partial sums (price cents × integer quantity) fold
# through the combiner, with ONE final IEEE division per group — the
# float never enters the aggregation tree, so the result is
# order-independent and hash-stable.
# ---------------------------------------------------------------------------
@query(
    "weighted_avg_price",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum_c,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wtot,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / sum(CAST(l_quantity AS BIGINT)) AS wavg_c
    FROM lineitem GROUP BY l_returnflag
    """,
)
def weighted_avg_price(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t2 = pa.table({"l_returnflag": t["l_returnflag"],
                       "wsum_c": pa.array(cents * qty, pa.int64()),
                       "wtot": pa.array(qty, pa.int64())})
        return t2.group_by("l_returnflag").aggregate(
            [("wsum_c", "sum"), ("wtot", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("wsum_c_sum", alias_name="wsum_c"),
                   Sum("wtot_sum", alias_name="wtot"))
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "wavg_c", pc.divide(pc.cast(t["wsum_c"], pa.float64()),
                                pc.cast(t["wtot"], pa.float64()))),
        batch_format="pyarrow", zero_copy_batch=True)
