"""Distributed statistics / shuffle operators (SURVEY §2.7 aggregate
family extensions + training-data shuffle).

Same contract as ``queries.py``: every entry pairs a Ray-Data-first
pipeline with a DuckDB oracle whose arithmetic is mirrored operation by
operation, so value hashes match bit-for-bit.  Float-emitting queries
keep ALL aggregation exact-integer (moment sums, counts) and perform
the IEEE float ops ONCE per output row in the same textual order as
the SQL — the float never enters a nondeterministically-ordered
reduction tree.

Reference provenance: the reference's summary/QC aggregates
(src/etl/summary_etl.py counts-per-category style) and its grouped
"most frequent / best candidate" selection (resolver tie-breaks in
src/etl/helpers/resolver_helper.py) generalize to the grouped moment /
mode / entropy operators here; the deterministic shard shuffle is the
training-data export the reference's randomized batch schedule
(src/transactors/neo4j_transactor.py queue fan-out) maps onto in a
reproducible-pipeline setting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..functions.pools import pool as _pool
from ..functions.tables import read_table
from ..stages.partition import int_key_part_col
from ..stages.exchange import exchange_map_groups as _exg
from .queries import query

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _round_half_away_int(x: np.ndarray) -> np.ndarray:
    """SQL round(x) (half away from zero) -> int64; np.round is
    banker's and silently disagrees on exact .5 ties."""
    return np.trunc(x + np.sign(x) * 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# corr_qty_price_per_flag — grouped Pearson correlation + sample
# covariance via distributed EXACT integer moment sums (n, Σx, Σy, Σxy,
# Σx², Σy²) folded in a map_batches combiner; the only float arithmetic
# is the closed-form corr/covar evaluation once per group, mirrored
# op-for-op in the oracle so the doubles are bit-identical.
# y is whole dollars (half-away round) so Σy² stays in int64 at sf1000.
# ---------------------------------------------------------------------------
@query(
    "corr_qty_price_per_flag",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qp,
           (CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
           / CAST(n - 1 AS DOUBLE) AS covar_qp
    FROM m
    """,
)
def corr_qty_price_per_flag(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = _round_half_away_int(
            t["l_extendedprice"].to_numpy(zero_copy_only=False))
        t2 = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x),
            "syy": pa.array(y * y),
        })
        return t2.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(*[Sum(f"{c}_sum", alias_name=c)
                     for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
    )

    def finish(t: pa.Table) -> pa.Table:
        f = {c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "sx", "sy", "sxy", "sxx", "syy")}
        corr = (f["n"] * f["sxy"] - f["sx"] * f["sy"]) / (
            np.sqrt(f["n"] * f["sxx"] - f["sx"] * f["sx"])
            * np.sqrt(f["n"] * f["syy"] - f["sy"] * f["sy"]))
        covar = (f["sxy"] - f["sx"] * f["sy"] / f["n"]) / (f["n"] - 1.0)
        return t.append_column("corr_qp", pa.array(corr, pa.float64())) \
                .append_column("covar_qp", pa.array(covar, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# value_histogram_per_type — fixed-width histogram (bin = floor(v/25))
# per event_type: per-batch partial counts (the combiner) then a small
# groupby(event_type) merge kernel — the exchange carries one row per
# (batch, type, bin), never one per event.
# ---------------------------------------------------------------------------
@query(
    "value_histogram_per_type",
    """
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, bin
    """,
)
def value_histogram_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / 25.0).astype(np.int64)
        t2 = pa.table({"event_type": t["event_type"],
                       "bin": pa.array(b),
                       "n": pa.array(np.ones(len(b), np.int64))})
        return (t2.group_by(["event_type", "bin"]).aggregate([("n", "sum")])
                .rename_columns(["event_type", "bin", "n"]))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("bin", sort=True)["n"].sum()
        return pd.DataFrame({"event_type": g["event_type"].iloc[0],
                             "bin": m.index.to_numpy(),
                             "n": m.to_numpy().astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# mode_value_per_type — grouped mode of round(value) with deterministic
# min-value tie-break: partial (type, v) counts combine per batch, one
# small per-type kernel picks argmax.  Exact integers end to end.
# ---------------------------------------------------------------------------
@query(
    "mode_value_per_type",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value) AS BIGINT) AS mode_v,
             CAST(count(*) AS BIGINT) AS n_mode
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, mode_v, n_mode,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n_mode DESC, mode_v ASC) AS rn
      FROM c)
    SELECT event_type, mode_v, n_mode FROM r WHERE rn = 1
    """,
)
def mode_value_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = _round_half_away_int(t["value"].to_numpy(zero_copy_only=False))
        t2 = pa.table({"event_type": t["event_type"],
                       "mode_v": pa.array(v),
                       "n_mode": pa.array(np.ones(len(v), np.int64))})
        return (t2.group_by(["event_type", "mode_v"])
                .aggregate([("n_mode", "sum")])
                .rename_columns(["event_type", "mode_v", "n_mode"]))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("mode_v", sort=True)["n_mode"].sum()
        v = m.index.to_numpy()
        n = m.to_numpy().astype(np.int64)
        i = int(np.argmax(n))  # v sorted ascending -> first max = min tie
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "mode_v": np.array([v[i]], np.int64),
                             "n_mode": np.array([n[i]], np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(argmax, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# entropy_event_mix_per_user — Shannon entropy of each user's
# event-type distribution.  Counts fold exactly (partial combine →
# partition-kernel merge); the transcendental part is ONE fixed-order
# five-term expression per user, written identically on both sides
# (p_i = c_i/n, term_i = p_i·ln p_i, H = 0 − (t1+t2+t3+t4+t5) — the
# 0− form normalizes the all-one-type case to +0.0 on both sides,
# where unary minus would emit -0.0 and flip the typed hash).
# DuckDB's ln() is NOT glibc log() (measured 1-ulp disagreement at
# ln(14/67)), so both sides round half-away at 6 dp — entropy error is
# ~2e-16 against a 5e-7 tie window, same guard as quantize_embeddings.
# ---------------------------------------------------------------------------
_ENTROPY_CASE = " + ".join(
    f"""(CASE WHEN c{i} > 0 THEN (CAST(c{i} AS DOUBLE) / CAST(n_events AS DOUBLE))
         * ln(CAST(c{i} AS DOUBLE) / CAST(n_events AS DOUBLE)) ELSE 0.0 END)"""
    for i in range(1, 6))

_ENTROPY_COUNTS = ", ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
    for i, t in enumerate(_EVENT_TYPES, start=1))


@query(
    "entropy_event_mix_per_user",
    f"""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, {_ENTROPY_COUNTS}
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           round(0.0 - ({_ENTROPY_CASE}), 6) AS entropy
    FROM c
    """,
)
def entropy_event_mix_per_user(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    nparts = _pool()[1] * 2

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"user_id": t["user_id"],
                       "event_type": t["event_type"],
                       "c": pa.array(np.ones(t.num_rows, np.int64))})
        out = (t2.group_by(["user_id", "event_type"])
               .aggregate([("c", "sum")])
               .rename_columns(["user_id", "event_type", "c"]))
        return int_key_part_col(out, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        piv = (g.pivot_table(index="user_id", columns="event_type",
                             values="c", aggfunc="sum", fill_value=0)
               .reindex(columns=list(_EVENT_TYPES), fill_value=0))
        counts = piv.to_numpy().astype(np.float64)
        n = counts.sum(axis=1)
        acc = np.zeros(len(n))
        for i in range(5):  # fixed order == SQL's left-assoc t1+..+t5
            c = counts[:, i]
            p = np.divide(c, n, out=np.zeros_like(c), where=c > 0)
            term = np.where(c > 0, p * np.log(p, out=np.zeros_like(p),
                                              where=c > 0), 0.0)
            acc = acc + term
        from ..stages.similarity import round_half_away
        return pd.DataFrame({"user_id": piv.index.to_numpy(),
                             "n_events": n.astype(np.int64),
                             "entropy": round_half_away(0.0 - acc, 6)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# shard_shuffle_positions — deterministic training-data shuffle: every
# document gets a Knuth-hash shuffle key, a shard (h mod 8), and its
# exact position within the shard's hash order.  The reproducible,
# resumable version of random_shuffle: same input -> same shard files
# in the same order, no RNG state to checkpoint.  Positions come from
# one per-shard lexsort kernel (8 groups), not a global driver sort.
# ---------------------------------------------------------------------------
@query(
    "shard_shuffle_positions",
    """
    WITH s AS (
      SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h FROM documents)
    SELECT doc_id, h, h % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8
                                   ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
    FROM s
    """,
)
def shard_shuffle_positions(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def keys(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (d * np.int64(2654435761)) % np.int64(4294967296)
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(h),
                         "shard": pa.array(h % np.int64(8))})

    def positions(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["doc_id"].to_numpy(), g["h"].to_numpy()))
        out = g.iloc[order].reset_index(drop=True)
        out["pos"] = np.arange(len(out), dtype=np.int64)
        return out

    return (
        ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(positions, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# connected_components_sizes — component structure of the bipartite
# order–part graph (orders sharing parts): edges from lineitem, labels
# via the hybrid CC stage (driver union-find under the pair limit,
# distributed pointer doubling above — stages/components.py), sizes by
# partial count.  Oracle: WITH RECURSIVE min-label reachability.
# Reference: transitive identity resolution (resolver_helper chains,
# closure_etl.py:28-81) generalized to an arbitrary edge set.
# ---------------------------------------------------------------------------
@query(
    "connected_components_sizes",
    """
    WITH RECURSIVE e AS (
      SELECT 2 * l_orderkey AS a, 2 * l_partkey + 1 AS b
      FROM lineitem WHERE l_orderkey % 41 = 0
    ), ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(node, lab) AS (
      SELECT a, a FROM ee
      UNION
      SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.node
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orders
    FROM (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    GROUP BY component
    """,
)
def connected_components_sizes(sf_dir: str):
    from ..stages.components import connected_components_auto

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (o % 41) == 0
        return pa.table({"id_a": pa.array(2 * o[m]),
                         "id_b": pa.array(2 * p[m] + 1)})

    labels = connected_components_auto(
        li.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True))

    def partial(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        t2 = pa.table({"component": t["component"],
                       "n_nodes": pa.array(np.ones(len(node), np.int64)),
                       "n_orders": pa.array((node % 2 == 0).astype(np.int64))})
        return (t2.group_by("component")
                .aggregate([("n_nodes", "sum"), ("n_orders", "sum")])
                .rename_columns(["component", "n_nodes", "n_orders"]))

    return (
        labels.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("component")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"),
                   Sum("n_orders", alias_name="n_orders"))
    )


# ---------------------------------------------------------------------------
# cume_dist_events — CUME_DIST window per user over value: rank_max/n,
# one partition-kernel exchange (same shape as percent_rank_events).
# The only float op is a single division of exactly-representable
# integers, identical on both sides.
# ---------------------------------------------------------------------------
@query(
    "cume_dist_events",
    """
    SELECT event_id,
           cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cd
    FROM events
    """,
)
def cume_dist_events(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "value"])
    nparts = _pool()[1] * 2

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id", sort=False)
        r = grp["value"].rank(method="max").to_numpy()
        n = grp["value"].transform("size").to_numpy().astype(np.float64)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "cd": r / n})

    return (
        ds.map_batches(lambda t: int_key_part_col(t, "user_id", nparts),
                       batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# lag_value_delta — LAG window: per-event delta vs the user's previous
# event in (ts, event_id) order; NULL for each user's first event.
# One exchange, one lexsort kernel per partition.
# ---------------------------------------------------------------------------
@query(
    "lag_value_delta",
    """
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def lag_value_delta(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    nparts = _pool()[1] * 2

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts"].to_numpy(), uid))
        v = g["value"].to_numpy()[order]
        u = uid[order]
        delta = np.empty(len(v))
        delta[1:] = v[1:] - v[:-1]
        delta[0] = np.nan
        delta[np.concatenate(([True], u[1:] != u[:-1]))] = np.nan
        return pd.DataFrame({"event_id": g["event_id"].to_numpy()[order],
                             "delta": delta})

    return (
        ds.map_batches(lambda t: int_key_part_col(t, "user_id", nparts),
                       batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# first_last_value_span — FIRST_VALUE / LAST_VALUE over each user's
# (ts, event_id)-ordered event stream plus their difference: the
# grouped "opening/closing state" report.  One exchange; span is a
# single float subtraction of the two selected values on both sides.
# ---------------------------------------------------------------------------
@query(
    "first_last_value_span",
    """
    WITH r AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN value END) AS first_v,
           max(CASE WHEN rn = n THEN value END) AS last_v,
           max(CASE WHEN rn = n THEN value END)
             - max(CASE WHEN rn = 1 THEN value END) AS span
    FROM r GROUP BY user_id
    """,
)
def first_last_value_span(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "value"])
    nparts = _pool()[1] * 2

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts"].to_numpy(), uid))
        u = uid[order]
        v = g["value"].to_numpy()[order]
        starts = np.concatenate(([True], u[1:] != u[:-1]))
        ends = np.concatenate((u[1:] != u[:-1], [True]))
        first_v, last_v = v[starts], v[ends]
        return pd.DataFrame({"user_id": u[starts],
                             "first_v": first_v, "last_v": last_v,
                             "span": last_v - first_v})

    return (
        ds.map_batches(lambda t: int_key_part_col(t, "user_id", nparts),
                       batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shared_shingle_docs — EXACT substring-duplication detection: flag
# every document that shares at least one 32-character substring with a
# DIFFERENT document (the exact-verification half of substring dedup —
# the byte window itself is the key, no hash false positives; the
# MinHash family covers the approximate path).  Shingle extraction is
# ONE sliding-window view over the batch's concatenated bytes with
# offset arithmetic (same pattern as fingerprint_batch) — no loop over
# rows OR positions, so arbitrarily long documents cost O(total bytes).
# Shingles exchange once on a window-derived integer hash partition
# (equality is still decided on the full window inside the kernel);
# per-doc flags fold on a second integer-key exchange.
# Windows slide over UTF-32 code units (4 bytes per char), so window
# equality ≡ SQL substr character-window equality for ANY Unicode text
# — not just ASCII (non-ASCII parity caught by the hypothesis harness).
# ---------------------------------------------------------------------------
@query(
    "shared_shingle_docs",
    """
    WITH sh AS (
      SELECT DISTINCT doc_id, substr(text, i, 32) AS s
      FROM documents, generate_series(1, 4096) g(i)
      WHERE i + 31 <= length(text)
    ), c AS (SELECT s, count(*) AS nd FROM sh GROUP BY s),
    f AS (SELECT sh.doc_id, max(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS fl
          FROM sh JOIN c USING (s) GROUP BY sh.doc_id)
    SELECT d.doc_id, CAST(COALESCE(f.fl, 0) AS BIGINT) AS has_shared
    FROM documents d LEFT JOIN f USING (doc_id)
    """,
)
def shared_shingle_docs(sf_dir: str, k: int = 32):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    nparts = _pool()[1] * 2

    def shingles(t: pa.Table) -> pa.Table:
        kb = k * 4  # window width in UTF-32 bytes
        texts = t["text"].combine_chunks().to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
        lens = np.array([len(b) // 4 for b in bufs], dtype=np.int64)  # chars
        nwin = np.maximum(lens - (k - 1), 0)
        total = int(nwin.sum())
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "s": pa.array([], pa.binary(kb)),
                          "gpart": pa.array([], pa.int32())})
        if total == 0:
            return empty
        all_c = np.frombuffer(b"".join(bufs), dtype=np.uint32)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        wstarts = np.concatenate(([0], np.cumsum(nwin)[:-1]))
        row_idx = np.repeat(np.arange(len(lens)), nwin)
        local = np.arange(total, dtype=np.int64) - wstarts[row_idx]
        gpos = starts[row_idx] + local
        win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(all_c, k)[gpos])
        sview = win.view(f"S{kb}").ravel()
        # partition hash from the first/last 8 bytes of each window —
        # equality is still decided on the full window in the kernel
        w64 = win.view(np.uint64)
        with np.errstate(over="ignore"):
            h = (w64[:, 0] * np.uint64(0x9E3779B97F4A7C15)
                 ^ w64[:, (kb // 8) - 1] * np.uint64(0xC2B2AE3D27D4EB4F))
        gpart = (h % np.uint64(nparts)).astype(np.int32)
        tbl = pa.table({"doc_id": pa.array(ids[row_idx]),
                        "s": pa.array(sview, pa.binary(kb)),
                        "gpart": pa.array(gpart)})
        # per-doc distinct (a doc's shingles are all in its own row)
        return (tbl.group_by(["doc_id", "s", "gpart"])
                .aggregate([("s", "count")])
                .select(["doc_id", "s", "gpart"]))

    def flag_by_shingle(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("s", sort=False)["doc_id"].transform("nunique")
        fl = (nd.to_numpy() > 1).astype(np.int64)
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "fl": fl})
        m = out.groupby("doc_id", sort=False)["fl"].max()
        return pd.DataFrame({"doc_id": m.index.to_numpy(),
                             "fl": m.to_numpy().astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    flags = exchange_map_groups(
        ds.map_batches(shingles, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: flag_by_shingle(g.to_pandas()), nparts,
        drop_part_col=True)

    zeros = ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "fl": pa.array(np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", sort=False)["fl"].max()
        return pd.DataFrame({"doc_id": m.index.to_numpy(),
                             "has_shared": m.to_numpy().astype(np.int64)})

    return exchange_map_groups(
        flags.union(zeros)
        .map_batches(lambda t: int_key_part_col(t, "doc_id", nparts),
                     batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: fold(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# activity_islands_per_user — gaps-and-islands: per user, runs of
# CONSECUTIVE active days (distinct-day partial per batch, one integer
# exchange, one diff/reduceat kernel per partition).  The classic
# sessionize-at-day-granularity report; exact integers end to end.
# ---------------------------------------------------------------------------
@query(
    "activity_islands_per_user",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    r AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS anchor
      FROM d),
    i AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, anchor)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM i GROUP BY user_id
    """,
)
def activity_islands_per_user(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    nparts = _pool()[1] * 2

    US_PER_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // US_PER_DAY)
        t2 = pa.table({"user_id": t["user_id"], "day": pa.array(day)})
        distinct = (t2.group_by(["user_id", "day"])
                    .aggregate([("day", "count")]).select(["user_id", "day"]))
        return int_key_part_col(distinct, "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_islands": pd.Series([], dtype=np.int64),
                "longest": pd.Series([], dtype=np.int64),
                "n_active_days": pd.Series([], dtype=np.int64)})
        # re-distinct across batches, then islands per user
        gg = g.drop_duplicates(["user_id", "day"])
        uid = gg["user_id"].to_numpy()
        day = gg["day"].to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        new_island = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)))
        island_id = np.cumsum(new_island) - 1
        lens = np.bincount(island_id)
        island_uid = uid[new_island]
        ustarts = np.concatenate(
            ([True], island_uid[1:] != island_uid[:-1]))
        uidx = np.cumsum(ustarts) - 1
        n_islands = np.bincount(uidx)
        longest = np.maximum.reduceat(lens, np.flatnonzero(ustarts))
        active = np.add.reduceat(lens, np.flatnonzero(ustarts))
        return pd.DataFrame({
            "user_id": island_uid[ustarts],
            "n_islands": n_islands.astype(np.int64),
            "longest": longest.astype(np.int64),
            "n_active_days": active.astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# type_cooccurrence_matrix — for every ordered event-type pair (a < b),
# how many users emitted BOTH: per-user 5-bit type mask folds through a
# partition kernel (same bitmask-reduceat shape as cohort retention),
# the bounded 32-row mask histogram crosses ONE tiny exchange, pairs
# are decoded driver-free in a final single-block kernel.
# ---------------------------------------------------------------------------
@query(
    "type_cooccurrence_matrix",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def type_cooccurrence_matrix(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    nparts = _pool()[1] * 2
    bit_of = {t: 1 << i for i, t in enumerate(_EVENT_TYPES)}

    def partial(t: pa.Table) -> pa.Table:
        bits = pd.Series(t["event_type"].to_pandas()).map(bit_of).to_numpy(
            dtype=np.int64)
        t2 = pa.table({"user_id": t["user_id"], "bits": pa.array(bits)})
        # per-batch partial: dedup (user, bit) pairs; the OR-fold to a
        # mask happens once per user in the kernel
        g2 = (t2.group_by(["user_id", "bits"]).aggregate([("bits", "count")])
              .select(["user_id", "bits"]))
        return int_key_part_col(g2, "user_id", nparts)

    def mask_hist(g: pd.DataFrame) -> pd.DataFrame:
        # distinct single-bit rows -> sum of powers of two == OR-fold
        gg = g.drop_duplicates(["user_id", "bits"])
        m = gg.groupby("user_id", sort=False)["bits"].sum()
        hist = np.bincount(m.to_numpy(), minlength=32)
        return pd.DataFrame({"mask": np.arange(32, dtype=np.int64),
                             "n": hist.astype(np.int64)})

    hist = (
        _exg(ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: mask_hist(g.to_pandas()), nparts,
             drop_part_col=True)
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
    )

    def pairs(t: pa.Table) -> pa.Table:
        mask = t["mask"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        rows_a, rows_b, rows_n = [], [], []
        names = sorted(_EVENT_TYPES)  # SQL '<' on the type STRINGS
        for i, ta in enumerate(names):
            for tb in names[i + 1:]:
                both = (bit_of[ta] | bit_of[tb])
                cnt = int(n[(mask & both) == both].sum())
                if cnt:
                    rows_a.append(ta); rows_b.append(tb); rows_n.append(cnt)
        return pa.table({"type_a": pa.array(rows_a, pa.string()),
                         "type_b": pa.array(rows_b, pa.string()),
                         "n_users": pa.array(rows_n, pa.int64())})

    return hist.repartition(1).map_batches(pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dense_topk_orders — DENSE_RANK ≤ 2 per customer over order value
# (ties INCLUDED — the rank-window variant row_number top-k cannot
# express).  Exact integer cents ranking; one partition-kernel
# exchange.
# ---------------------------------------------------------------------------
@query(
    "dense_topk_orders",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             dense_rank() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC)
               AS drank
      FROM orders)
    SELECT o_custkey, o_orderkey, price_c, CAST(drank AS BIGINT) AS drank
    FROM r WHERE drank <= 2
    """,
)
def dense_topk_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_totalprice"])
    nparts = _pool()[1] * 2

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        t2 = pa.table({"o_custkey": t["o_custkey"],
                       "o_orderkey": t["o_orderkey"], "price_c": cents})
        return int_key_part_col(t2, "o_custkey", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        dr = (g.groupby("o_custkey", sort=False)["price_c"]
              .rank(method="dense", ascending=False).to_numpy()
              .astype(np.int64))
        keep = dr <= 2
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy()[keep],
            "o_orderkey": g["o_orderkey"].to_numpy()[keep],
            "price_c": g["price_c"].to_numpy()[keep],
            "drank": dr[keep]})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# ohlc_hourly_per_user — open/high/low/close per (user, hour): the
# market-data-style mergeable aggregate.  The per-batch combiner
# reduces each (user, hour) group to ONE partial row carrying the
# open/close CANDIDATES (value at the batch-local (ts, event_id)
# min/max) plus high/low/n — so the exchange ships one row per
# (batch, user, hour) and the kernel merges partials by re-selecting
# on the carried timestamps.  Values are selected, never added: no
# float-order sensitivity.
# ---------------------------------------------------------------------------
@query(
    "ohlc_hourly_per_user",
    """
    WITH e AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, ts, event_id, value
      FROM events),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, hour
                                   ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, hour) AS cnt
      FROM e)
    SELECT user_id, hour,
           max(CASE WHEN rn = 1 THEN value END) AS open_v,
           max(value) AS high_v, min(value) AS low_v,
           max(CASE WHEN rn = cnt THEN value END) AS close_v,
           CAST(count(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id, hour
    """,
)
def ohlc_hourly_per_user(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "value"])
    nparts = _pool()[1] * 2

    US_PER_HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        hour = (ts // US_PER_HOUR) * US_PER_HOUR
        order = np.lexsort((eid, ts, hour, uid))
        uid, eid, ts, v, hour = (uid[order], eid[order], ts[order],
                                 v[order], hour[order])
        starts = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (hour[1:] != hour[:-1])))
        sidx = np.flatnonzero(starts)
        eidx = np.concatenate((sidx[1:], [len(uid)])) - 1
        return pa.table({
            "user_id": pa.array(uid[sidx]),
            "hour_us": pa.array(hour[sidx]),
            "open_ts": pa.array(ts[sidx]), "open_eid": pa.array(eid[sidx]),
            "open_v": pa.array(v[sidx]),
            "close_ts": pa.array(ts[eidx]), "close_eid": pa.array(eid[eidx]),
            "close_v": pa.array(v[eidx]),
            "high_v": pa.array(np.maximum.reduceat(v, sidx)),
            "low_v": pa.array(np.minimum.reduceat(v, sidx)),
            "n_events": pa.array(
                (eidx - sidx + 1).astype(np.int64)),
            "gpart": int_key_part_col(
                pa.table({"k": pa.array(uid[sidx])}), "k", nparts)["gpart"],
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        opens = g.sort_values(["user_id", "hour_us", "open_ts", "open_eid"],
                              kind="mergesort").groupby(
            ["user_id", "hour_us"], sort=True).first()
        closes = g.sort_values(["user_id", "hour_us", "close_ts",
                                "close_eid"], kind="mergesort").groupby(
            ["user_id", "hour_us"], sort=True).last()
        agg = g.groupby(["user_id", "hour_us"], sort=True).agg(
            high_v=("high_v", "max"), low_v=("low_v", "min"),
            n_events=("n_events", "sum"))
        idx = agg.index
        return pd.DataFrame({
            "user_id": idx.get_level_values(0).to_numpy(),
            "hour": idx.get_level_values(1).to_numpy()
                .astype("datetime64[us]"),
            "open_v": opens["open_v"].to_numpy(),
            "high_v": agg["high_v"].to_numpy(),
            "low_v": agg["low_v"].to_numpy(),
            "close_v": closes["close_v"].to_numpy(),
            "n_events": agg["n_events"].to_numpy().astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: merge(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# centroid_per_label — grouped VECTOR centroid over the embedding
# column: embeddings are int8-quantized (the exact deterministic
# max-abs scheme shared with quantize_embeddings), per-(label, dim)
# integer sums fold through the combiner (one 640-row exchange for any
# input size), and the centroid is one division per output row.  The
# "class prototype" aggregate of an embedding pipeline with an exact
# SQL oracle — float centroids of raw floats would be
# summation-order-dependent; quantized integer sums are not.
# ---------------------------------------------------------------------------
@query(
    "centroid_per_label",
    """
    WITH base AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s2 AS (
      SELECT label, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                  THEN 1.0
                  ELSE list_max(list_transform(v, x -> abs(x))) END AS m
      FROM base),
    q AS (
      SELECT label,
             list_transform(v, x -> CASE WHEN x >= 0
                                         THEN floor(x / m * 127 + 0.5)
                                         ELSE ceil(x / m * 127 - 0.5) END)
               AS qv
      FROM s2),
    d AS (SELECT label, qv, i FROM q, generate_series(1, 64) g(i))
    SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
           CAST(sum(qv[i]) AS BIGINT) AS q_sum,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(qv[i]) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS centroid_q
    FROM d GROUP BY label, i
    """,
)
def centroid_per_label(sf_dir: str):
    from ..stages.similarity import _batch_matrix

    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t, "embedding")
        m = np.abs(mat).max(axis=1)
        m_safe = np.where(m == 0, 1.0, m)
        scaled = mat / m_safe[:, None] * 127.0
        q = np.trunc(scaled + np.sign(scaled) * 0.5)
        lab = t["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(lab, kind="mergesort")
        labs, qs = lab[order], q[order]
        starts = np.flatnonzero(
            np.concatenate(([True], labs[1:] != labs[:-1])))
        sums = np.add.reduceat(qs, starts, axis=0)
        counts = np.diff(np.concatenate((starts, [len(labs)])))
        n_lab, d = sums.shape
        return pa.table({
            "label": pa.array(np.repeat(labs[starts], d).astype(np.int64)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    n_lab)),
            "q_sum": pa.array(sums.ravel().astype(np.int64)),
            "n": pa.array(np.repeat(counts, d).astype(np.int64)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(Sum("q_sum", alias_name="q_sum"),
                   Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        qs = t["q_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("centroid_q", pa.array(qs / n, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# funnel3_within_window — three-step ORDERED funnel with a time bound:
# purchases preceded by a click within the previous hour, where that
# click is itself preceded by ANY earlier view.  The sequential-pattern
# operator: one partition-kernel exchange; inside the kernel the
# "latest qualified click before each purchase" is a per-user running
# max (C-level grouped cummax), never a per-event Python scan.
# Equal timestamps do NOT satisfy the strict "before" (purchases sort
# before clicks at ties so the cummax cannot see same-ts clicks).
# ---------------------------------------------------------------------------
@query(
    "funnel3_within_window",
    """
    SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_funnels
    FROM events p
    WHERE p.event_type = 'purchase' AND EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        AND EXISTS (
          SELECT 1 FROM events v
          WHERE v.user_id = c.user_id AND v.event_type = 'view'
            AND v.ts < c.ts))
    GROUP BY p.user_id
    """,
)
def funnel3_within_window(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])
    nparts = _pool()[1] * 2
    WINDOW_US = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["view", "click", "purchase"]))
        t = t.filter(keep)
        return int_key_part_col(
            pa.table({"user_id": t["user_id"],
                      "event_type": t["event_type"],
                      "ts_us": t["ts"].cast(pa.int64())}),
            "user_id", nparts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()

        views = pd.DataFrame({"user_id": uid[et == "view"],
                              "ts": ts[et == "view"]})
        first_view = views.groupby("user_id")["ts"].min()

        cmask = et == "click"
        cdf = pd.DataFrame({"user_id": uid[cmask], "ts": ts[cmask]})
        fv = cdf["user_id"].map(first_view)
        qualified = cdf[fv.notna() & (cdf["ts"] > fv)]

        pmask = et == "purchase"
        pdf = pd.DataFrame({"user_id": uid[pmask], "ts": ts[pmask]})

        merged = pd.concat([
            pdf.assign(kind=0, click_ts=np.int64(-1)),
            qualified.assign(kind=1, click_ts=qualified["ts"]),
        ])
        # purchases before clicks at equal ts -> strict c.ts < p.ts
        merged = merged.sort_values(["user_id", "ts", "kind"],
                                    kind="mergesort")
        last_click = merged.groupby("user_id", sort=False)["click_ts"].cummax()
        p = merged[merged["kind"] == 0]
        lc = last_click[merged["kind"] == 0].to_numpy()
        hit = (lc >= 0) & (lc >= p["ts"].to_numpy() - WINDOW_US)
        counts = (p[hit].groupby("user_id", sort=True).size())
        return pd.DataFrame({
            "user_id": counts.index.to_numpy(),
            "n_funnels": counts.to_numpy().astype(np.int64)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        "gpart", lambda g: kernel(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# skew_kurt_value_per_type — grouped sample-free (population) skewness and
# excess kurtosis from EXACT integer power sums (n, Σx, Σx², Σx³, Σx⁴) of the
# half-away-rounded value.  Per-row x⁴ ≤ 490⁴ ≈ 5.8e10 so a per-block partial
# stays in int64 up to ~10⁸ rows/block; the CROSS-BLOCK reduction carries Σx³
# and Σx⁴ as two int64 limbs (hi = s >> 32, lo = s & 0xffffffff, summed
# independently — exact at 10¹⁰+ rows where a single int64 Σx⁴ would
# overflow), recombined to an arbitrary-precision Python int per group at
# finish.  The float skew/kurt evaluation happens ONCE per group, in the
# same textual operation order as the oracle, from the same exactly-rounded
# double conversions (Python int→float64 and DuckDB HUGEINT→DOUBLE are both
# correctly rounded), so the hashes match bit-for-bit.
# Reference provenance: generalizes the reference's per-category QC summary
# aggregates (src/etl/summary_etl.py) to higher-moment shape statistics.
# ---------------------------------------------------------------------------
_LIMB = np.int64(1) << np.int64(32)


def _limb_cols(name: str, s: np.ndarray) -> dict[str, pa.Array]:
    """Split an int64 partial-sum vector into independently summable
    hi/lo int64 limbs (exact two-limb carry representation)."""
    hi = s >> np.int64(32)
    lo = s & np.int64(0xFFFFFFFF)
    return {f"{name}_hi": pa.array(hi), f"{name}_lo": pa.array(lo)}


def _limb_total(t: pa.Table, name: str) -> list[int]:
    """Recombine limb sums to exact Python ints (one per group row)."""
    hi = t[f"{name}_hi"].to_pylist()
    lo = t[f"{name}_lo"].to_pylist()
    return [int(h) * (1 << 32) + int(l) for h, l in zip(hi, lo)]


@query(
    "skew_kurt_value_per_type",
    """
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(value) AS BIGINT)) AS s1,
             sum(CAST(round(value) AS BIGINT) * CAST(round(value) AS BIGINT)) AS s2,
             sum(CAST(round(value) AS BIGINT) * CAST(round(value) AS BIGINT)
                 * CAST(round(value) AS BIGINT)) AS s3,
             sum(CAST(round(value) AS BIGINT) * CAST(round(value) AS BIGINT)
                 * CAST(round(value) AS BIGINT) * CAST(round(value) AS BIGINT)) AS s4
      FROM events GROUP BY event_type),
    d AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS q2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS q3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS q4
      FROM m),
    c AS (
      SELECT event_type, n, mu, q3, q4,
             q2 - mu * mu AS m2
      FROM d)
    SELECT event_type, n,
           (q3 - 3.0 * mu * (m2 + mu * mu) + 2.0 * (mu * mu * mu))
             / (m2 * sqrt(m2)) AS skew_v,
           (q4 - 4.0 * mu * q3 + 6.0 * (mu * mu) * (m2 + mu * mu)
            - 3.0 * ((mu * mu) * (mu * mu))) / (m2 * m2) - 3.0 AS kurt_v
    FROM c
    ORDER BY event_type
    """,
)
def skew_kurt_value_per_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = _round_half_away_int(t["value"].to_numpy(zero_copy_only=False))
        x2 = x * x
        cols = {
            "event_type": t["event_type"],
            "n": pa.array(np.ones(len(x), np.int64)),
            "s1": pa.array(x),
            "s2": pa.array(x2),
        }
        g = pa.table(cols).group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "s1", "s2")])
        # Σx³ / Σx⁴ per block (int64-safe per block), then limb-split for
        # the overflow-proof cross-block reduction.
        et = pa.table({"event_type": t["event_type"],
                       "s3": pa.array(x2 * x), "s4": pa.array(x2 * x2)})
        g34 = et.group_by("event_type").aggregate([("s3", "sum"), ("s4", "sum")])
        s3 = g34["s3_sum"].to_numpy(zero_copy_only=False)
        s4 = g34["s4_sum"].to_numpy(zero_copy_only=False)
        out = {"event_type": g["event_type"], "n": g["n_sum"],
               "s1": g["s1_sum"], "s2": g["s2_sum"]}
        out.update(_limb_cols("s3", s3))
        out.update(_limb_cols("s4", s4))
        return pa.table(out)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "s1", "s2",
                               "s3_hi", "s3_lo", "s4_hi", "s4_lo")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_pylist()
        s1 = t["s1"].to_pylist()
        s2 = t["s2"].to_pylist()
        s3 = _limb_total(t, "s3")
        s4 = _limb_total(t, "s4")
        skew = np.empty(len(n), np.float64)
        kurt = np.empty(len(n), np.float64)
        for i in range(len(n)):  # one iteration PER GROUP (≤ #event types)
            nd = float(n[i])
            mu = float(s1[i]) / nd
            q2 = float(s2[i]) / nd
            q3 = float(s3[i]) / nd
            q4 = float(s4[i]) / nd
            m2 = q2 - mu * mu
            skew[i] = (q3 - 3.0 * mu * (m2 + mu * mu)
                       + 2.0 * (mu * mu * mu)) / (m2 * np.sqrt(m2))
            kurt[i] = (q4 - 4.0 * mu * q3 + 6.0 * (mu * mu) * (m2 + mu * mu)
                       - 3.0 * ((mu * mu) * (mu * mu))) / (m2 * m2) - 3.0
        return pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "skew_v": pa.array(skew, pa.float64()),
            "kurt_v": pa.array(kurt, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# regr_price_on_qty — grouped simple linear regression (slope, intercept,
# r²) of whole-dollar extendedprice on quantity per returnflag, computed
# from the same exact-integer moment sums as corr_qty_price_per_flag, with
# Σxy / Σy² carried as two int64 limbs so the reduction is exact at 10¹⁰
# rows (y ≤ ~10⁵ ⇒ y² ≈ 10¹⁰ per row would overflow a single int64 Σ at
# ~10⁹ rows).  Mirrors DuckDB's regr_slope/regr_intercept/regr_r2 closed
# forms but evaluates them from the shared sums in a pinned op order.
# ---------------------------------------------------------------------------
@query(
    "regr_price_on_qty",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS sx,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice) AS BIGINT)) AS sxy,
             sum(CAST(round(l_extendedprice) AS BIGINT)
                 * CAST(round(l_extendedprice) AS BIGINT)) AS syy
      FROM lineitem GROUP BY l_returnflag),
    d AS (
      SELECT l_returnflag, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
      FROM m)
    SELECT l_returnflag, n,
           (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
           (syd / nd) - ((nd * sxyd - sxd * syd)
                         / (nd * sxxd - sxd * sxd)) * (sxd / nd) AS intercept,
           ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
             / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) AS r2
    FROM d
    ORDER BY l_returnflag
    """,
)
def regr_price_on_qty(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = _round_half_away_int(
            t["l_extendedprice"].to_numpy(zero_copy_only=False))
        base = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sxx": pa.array(x * x),
            "sy": pa.array(y), "sxy": pa.array(x * y), "syy": pa.array(y * y),
        }).group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx", "sxx", "sy", "sxy", "syy")])
        out = {"l_returnflag": base["l_returnflag"],
               "n": base["n_sum"], "sx": base["sx_sum"],
               "sxx": base["sxx_sum"], "sy": base["sy_sum"]}
        out.update(_limb_cols(
            "sxy", base["sxy_sum"].to_numpy(zero_copy_only=False)))
        out.update(_limb_cols(
            "syy", base["syy_sum"].to_numpy(zero_copy_only=False)))
        return pa.table(out)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sxx", "sy",
                               "sxy_hi", "sxy_lo", "syy_hi", "syy_lo")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_pylist()
        sx = t["sx"].to_pylist()
        sxx = t["sxx"].to_pylist()
        sy = t["sy"].to_pylist()
        sxy = _limb_total(t, "sxy")
        syy = _limb_total(t, "syy")
        slope = np.empty(len(n), np.float64)
        icept = np.empty(len(n), np.float64)
        r2 = np.empty(len(n), np.float64)
        for i in range(len(n)):  # one iteration PER GROUP
            nd, sxd, sxxd = float(n[i]), float(sx[i]), float(sxx[i])
            syd, sxyd, syyd = float(sy[i]), float(sxy[i]), float(syy[i])
            sl = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
            slope[i] = sl
            icept[i] = (syd / nd) - sl * (sxd / nd)
            r2[i] = ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) \
                / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pc.cast(t["n"], pa.int64()),
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(icept, pa.float64()),
            "r2": pa.array(r2, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# frequency_moments_users — the AMS frequency-moment family over the
# user_id stream, computed EXACTLY (the sketches' ground truth): F0 =
# distinct users, F1 = stream length, F2 = Σc_u² (self-join size — what
# a cost-based optimizer charges a self-equijoin on user_id), F∞ = max
# per-user count, plus the exact skew ratio F2·F0/F1² the salting
# heuristics key off.  Shape: per-batch partial counts → ONE user-keyed
# exchange → per-partition Σc², count, max partials (statistics-sized)
# → 1-row rollup.  c_u ≤ F1 ≈ 1e7 at bench scale → Σc² ≤ F1² = 1e14,
# far inside int64.
# ---------------------------------------------------------------------------
@query(
    "frequency_moments_users",
    """
    WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT)       AS f0,
           CAST(sum(c) AS BIGINT)         AS f1,
           CAST(sum(c * c) AS BIGINT)     AS f2,
           CAST(max(c) AS BIGINT)         AS f_inf,
           CAST(CAST(sum(c * c) AS BIGINT) * CAST(count(*) AS BIGINT)
                AS DOUBLE)
             / (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS skew
    FROM c
    """,
)
def frequency_moments_users(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id"])
    from ..functions.pools import join_parts as _jp
    nparts = _jp()

    def partial(t: pa.Table) -> pa.Table:
        uid, cnt = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False), return_counts=True)
        out = pa.table({"user_id": pa.array(uid, pa.int64()),
                        "c": pa.array(cnt.astype(np.int64))})
        return int_key_part_col(out, "user_id", nparts)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # final per-user counts live wholly in this partition
        c = g.groupby("user_id")["c"].sum().to_numpy()
        return pd.DataFrame({"f0": [len(c)], "f1": [int(c.sum())],
                             "f2": [int((c * c).sum())],
                             "f_inf": [int(c.max()) if len(c) else 0]})

    def finish(t: pa.Table) -> pa.Table:
        f0 = int(pc.sum(t["f0"]).as_py() or 0)
        f1 = int(pc.sum(t["f1"]).as_py() or 0)
        f2 = int(pc.sum(t["f2"]).as_py() or 0)
        fi = int(pc.max(t["f_inf"]).as_py() or 0)
        return pa.table({
            "f0": pa.array([f0], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "f_inf": pa.array([fi], pa.int64()),
            "skew": pa.array([float(f2 * f0) / (f1 * f1)], pa.float64()),
        })

    return (
        _exg(ds.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True),
             "gpart", lambda g: per_part(g.to_pandas()), nparts,
             drop_part_col=True)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# calibration_bins_value — reliability diagram for a score: fixed-width
# score bins (cents over the metadata [lo, hi] range), per bin the mean
# predicted score and the observed positive ("purchase") rate — the
# companion diagnostic to decile_lift_value/roc_points_value.  One
# bounded (bin) exchange from per-batch partials; the two floats per
# row are mirrored IEEE divisions of exact int64 sums.
# ---------------------------------------------------------------------------
@query(
    "calibration_bins_value",
    """
    WITH m AS (
      SELECT min(CAST(round(value * 100) AS BIGINT)) AS lo,
             max(CAST(round(value * 100) AS BIGINT)) + 1 AS hi
      FROM events),
    r AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
             CAST(event_type = 'purchase' AS BIGINT) AS pos
      FROM events),
    b AS (
      SELECT least((c - m.lo) // ((m.hi - m.lo + 9) // 10), 9) AS bin,
             c, pos
      FROM r, m)
    SELECT bin,
           CAST(count(*) AS BIGINT)  AS n,
           CAST(sum(pos) AS BIGINT)  AS n_pos,
           CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / count(*)   AS mean_score_c,
           CAST(CAST(sum(pos) AS BIGINT) AS DOUBLE) / count(*) AS pos_rate
    FROM b GROUP BY bin
    """,
)
def calibration_bins_value(sf_dir: str):
    import pyarrow.parquet as pq

    from ..functions.tables import table_path

    meta = pq.read_table(table_path(sf_dir, "events"), columns=["value"])
    cmeta = pc.cast(pc.round(pc.multiply(meta["value"], 100.0)), pa.int64())
    lo = int(pc.min(cmeta).as_py())
    hi = int(pc.max(cmeta).as_py()) + 1
    width = (hi - lo + 9) // 10

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        pos = pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = np.minimum((c - lo) // width, 9)
        out = pa.table({"bin": pa.array(b, pa.int64()),
                        "n": pa.array(np.ones(len(c), np.int64)),
                        "n_pos": pa.array(pos),
                        "sc": pa.array(c)})
        return out.group_by("bin").aggregate(
            [("n", "sum"), ("n_pos", "sum"), ("sc", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["sum(n_sum)"], pa.int64()).to_numpy(zero_copy_only=False)
        npos = pc.cast(t["sum(n_pos_sum)"], pa.int64()).to_numpy(
            zero_copy_only=False)
        sc = pc.cast(t["sum(sc_sum)"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pc.cast(t["bin"], pa.int64()),
            "n": pa.array(n), "n_pos": pa.array(npos),
            "mean_score_c": pa.array(sc.astype(np.float64) / n, pa.float64()),
            "pos_rate": pa.array(npos.astype(np.float64) / n, pa.float64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin").sum(["n_sum", "n_pos_sum", "sc_sum"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# welch_t_purchase_vs_view — Welch's unequal-variance t statistic (and
# Welch–Satterthwaite df) between purchase and view event values: the
# parametric sibling of ab_test_stats_price's rank tests.  All
# aggregation is exact (n, Σc, Σc²); the float evaluation chain is one
# closed form per side, mirrored token-for-token in the oracle.
# ---------------------------------------------------------------------------
@query(
    "welch_t_purchase_vs_view",
    """
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY event_type),
    a AS (SELECT n, s, q FROM g WHERE event_type = 'purchase'),
    b AS (SELECT n, s, q FROM g WHERE event_type = 'view')
    SELECT a.n AS n_a, b.n AS n_b,
           (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             / sqrt((CAST(a.n * a.q - a.s * a.s AS DOUBLE)
                     / (CAST(a.n AS DOUBLE) * (a.n - 1))) / a.n
                    + (CAST(b.n * b.q - b.s * b.s AS DOUBLE)
                       / (CAST(b.n AS DOUBLE) * (b.n - 1))) / b.n) AS t_welch,
           ((CAST(a.n * a.q - a.s * a.s AS DOUBLE)
             / (CAST(a.n AS DOUBLE) * (a.n - 1))) / a.n
            + (CAST(b.n * b.q - b.s * b.s AS DOUBLE)
               / (CAST(b.n AS DOUBLE) * (b.n - 1))) / b.n)
           * ((CAST(a.n * a.q - a.s * a.s AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * (a.n - 1))) / a.n
              + (CAST(b.n * b.q - b.s * b.s AS DOUBLE)
                 / (CAST(b.n AS DOUBLE) * (b.n - 1))) / b.n)
           / (((CAST(a.n * a.q - a.s * a.s AS DOUBLE)
                / (CAST(a.n AS DOUBLE) * (a.n - 1))) / a.n)
              * ((CAST(a.n * a.q - a.s * a.s AS DOUBLE)
                  / (CAST(a.n AS DOUBLE) * (a.n - 1))) / a.n) / (a.n - 1)
              + ((CAST(b.n * b.q - b.s * b.s AS DOUBLE)
                  / (CAST(b.n AS DOUBLE) * (b.n - 1))) / b.n)
                * ((CAST(b.n * b.q - b.s * b.s AS DOUBLE)
                    / (CAST(b.n AS DOUBLE) * (b.n - 1))) / b.n) / (b.n - 1))
           AS df_welch
    FROM a, b
    """,
)
def welch_t_purchase_vs_view(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(keep)
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table({"event_type": t["event_type"],
                        "n": pa.array(np.ones(len(c), np.int64)),
                        "s": pa.array(c), "q": pa.array(c * c)})
        return out.group_by("event_type").aggregate(
            [("n", "sum"), ("s", "sum"), ("q", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("event_type").sum(["n_sum", "s_sum", "q_sum"])).to_pandas()
    agg = agg.set_index("event_type")

    def stats(row):
        n = int(row["sum(n_sum)"])
        s = int(row["sum(s_sum)"])
        q = int(row["sum(q_sum)"])
        # mirrored: var/n with the exact int64 numerator, THEN / n
        se2 = (float(n * q - s * s) / (float(n) * (n - 1))) / n
        mean = float(s) / n
        return n, mean, se2

    na, ma, va = stats(agg.loc["purchase"])
    nb, mb, vb = stats(agg.loc["view"])
    import math

    t_w = (ma - mb) / math.sqrt(va + vb)
    df = (va + vb) * (va + vb) / (va * va / (na - 1) + vb * vb / (nb - 1))
    return pa.table({
        "n_a": pa.array([na], pa.int64()), "n_b": pa.array([nb], pa.int64()),
        "t_welch": pa.array([t_w], pa.float64()),
        "df_welch": pa.array([df], pa.float64()),
    })
