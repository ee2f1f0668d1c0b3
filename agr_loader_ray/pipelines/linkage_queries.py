"""Record-linkage / similarity-join operator families, Ray-Data-first.

- ``snm_candidate_pairs``: sorted-neighborhood blocking (the classic
  record-linkage candidate generator) — a windowed self-join over a
  GLOBAL total order, distributed as two-pass rank assignment + a
  rank-block halo exchange so no stage ever holds the whole order.
- ``mutual_topk_pairs``: k-NN-graph mutual-neighbor edges over the
  embeddings table (the similarity-self-join primitive behind near-dup
  graph construction).
- ``seasonality_weekday_index``: per-(type, weekday) seasonal index —
  ratio-of-averages from exact integer sums.

Reference provenance: the reference's pairwise-resolution loads
(molecular_interaction_etl.py:430-676) and ordered-export family
(SURVEY O5) generalized to linkage primitives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from ..functions.pools import join_parts as _join_parts
from ..functions.tables import read_small, read_table
from ..stages.partition import int_key_part_col
from .queries import query


# ---------------------------------------------------------------------------
# snm_candidate_pairs — sorted-neighborhood method: order all documents
# by (sortkey = first 12 chars, doc_id), slide a window of w=2, emit
# candidate pairs that share a 4-char prefix.  Distribution: (1) two-pass
# global row_number (order-preserving first-byte buckets → bounded
# per-bucket counts → broadcast offsets → in-bucket sort), exactly the
# global_rank_documents pattern; (2) windowed pairing via a rank-block
# HALO exchange — each row is routed to its rank block, rows within w of
# a block's start are ALSO sent to the previous block, and a pair is
# emitted only by the block owning its smaller rank (no duplicates).
# ---------------------------------------------------------------------------
@query(
    "snm_candidate_pairs",
    """
    WITH k AS (SELECT doc_id, substr(text, 1, 12) AS key FROM documents),
    r AS (SELECT doc_id, key,
                 row_number() OVER (ORDER BY key, doc_id) AS rn
          FROM k)
    SELECT r1.doc_id AS doc_a, r2.doc_id AS doc_b
    FROM r r1 JOIN r r2 ON r2.rn > r1.rn AND r2.rn <= r1.rn + 2
    WHERE substr(r1.key, 1, 4) = substr(r2.key, 1, 4)
    """,
)
def snm_candidate_pairs(sf_dir: str, window: int = 2, block: int = 4096):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_buckets = 64

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(t["text"], 0, 12)
        # order-preserving bucket: first BYTE code via binary buffer
        # math (vectorized — no per-row ord()); empty key → bucket 0
        kb = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        bo = np.frombuffer(kb.buffers()[1], np.int32,
                           count=len(kb) + 1, offset=4 * kb.offset)
        vals = np.frombuffer(kb.buffers()[2], np.uint8)
        lens = bo[1:] - bo[:-1]
        b = np.zeros(len(kb), np.int64)
        nz = lens > 0
        b[nz] = vals[bo[:-1][nz]].astype(np.int64)
        b = np.clip(b - 32, 0, n_buckets - 1).astype(np.int32)
        return pa.table({"doc_id": t["doc_id"], "key": key,
                         "bucket": pa.array(b, pa.int32())})

    bucketed = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    counts = (bucketed.map_batches(
        lambda t: t.select(["bucket"]).group_by("bucket")
                   .aggregate([("bucket", "count")]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("bucket_count", alias_name="n"))
        .to_pandas().sort_values("bucket"))
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    np.add.at(offs, counts["bucket"].to_numpy() + 1,
              counts["n"].to_numpy())
    offsets = dict(zip(range(n_buckets), np.cumsum(offs)[:n_buckets]))

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        base = int(offsets[int(g["bucket"].iloc[0])])
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy()),
            "key": pa.array(g["key"].to_numpy(), pa.string()),
            "rn": pa.array(base + 1 + np.arange(len(g), dtype=np.int64)),
        })

    ranked = (bucketed.groupby("bucket")
              .map_groups(rank_bucket, batch_format="pandas"))

    # halo routing: row → block rn//B; rows with rn%B < window also →
    # previous block so every in-window pair is co-located somewhere
    def route(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        blk = (rn // block).astype(np.int64)
        halo = (rn % block) < window
        parts = [pa.table({"doc_id": t["doc_id"], "key": t["key"],
                           "rn": t["rn"],
                           "blk": pa.array(blk)})]
        if halo.any():
            h = t.filter(pa.array(halo))
            parts.append(pa.table({
                "doc_id": h["doc_id"], "key": h["key"], "rn": h["rn"],
                "blk": pa.array(blk[halo] - 1)}))
        return pa.concat_tables(parts)

    def window_pairs(g: pd.DataFrame) -> pa.Table:
        blk = int(g["blk"].iloc[0])
        g = g.sort_values("rn", kind="mergesort")
        rn = g["rn"].to_numpy()
        ids = g["doc_id"].to_numpy()
        pre = g["key"].astype(str).str.slice(0, 4).to_numpy()
        own_lo, own_hi = blk * block, (blk + 1) * block
        outs_a, outs_b = [], []
        for d in range(1, window + 1):
            if len(rn) <= d:
                break
            a, b = np.arange(len(rn) - d), np.arange(d, len(rn))
            # adjacency in the GLOBAL order: ranks exactly d apart,
            # smaller rank owned by this block
            m = ((rn[b] - rn[a]) == d) & (rn[a] >= own_lo) & (rn[a] < own_hi)
            m &= pre[a] == pre[b]
            outs_a.append(ids[a[m]])
            outs_b.append(ids[b[m]])
        if not outs_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        return pa.table({"doc_a": pa.array(np.concatenate(outs_a)),
                         "doc_b": pa.array(np.concatenate(outs_b))})

    return (ranked.map_batches(route, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("blk").map_groups(window_pairs, batch_format="pandas"))


# ---------------------------------------------------------------------------
# mutual_topk_pairs — mutual-k-NN edges of the cosine k-NN graph: (u, v)
# is an edge iff v is in u's top-3 AND u is in v's top-3 (round-6 sims,
# ties broken by neighbor id — the ann_cosine_topk convention).
# SIZE-DISPATCHED (the closure_auto pattern): below
# _MUTUAL_BROADCAST_MAX rows the normalized matrix is broadcast once and
# each batch matmuls its rows against it; above it the exact k-NN edges
# come from the blocked block-pair exchange
# (stages/similarity.knn_edges_blocked — local per-block top-k, exact
# groupby(src) merge, no broadcast).  Either way mutuality resolves with
# ONE partition-kernel exchange on the undirected pair key (count==2 ⇒
# mutual).  sim is computed on the u<v orientation on both sides.
# ---------------------------------------------------------------------------
_MUTUAL_BROADCAST_MAX = 150_000  # rows; ~75 MB broadcast at dim 64
@query(
    "mutual_topk_pairs",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    s AS (SELECT a.vec_id AS i, b.vec_id AS j,
                 round(list_cosine_similarity(a.e, b.e), 6) AS sim
          FROM v a JOIN v b ON a.vec_id <> b.vec_id),
    r AS (SELECT i, j, sim,
                 row_number() OVER (PARTITION BY i
                                    ORDER BY sim DESC, j) AS rk
          FROM s)
    SELECT r1.i AS u, r1.j AS v, r1.sim
    FROM r r1 JOIN r r2 ON r2.i = r1.j AND r2.j = r1.i
    WHERE r1.rk <= 3 AND r2.rk <= 3 AND r1.i < r1.j
    """,
)
def mutual_topk_pairs(sf_dir: str, k: int = 3, mode: str = "auto"):
    from ..stages.similarity import (_batch_matrix, knn_edges_blocked,
                                     n_blocks_for, round_half_away)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    nparts = _join_parts()
    if mode == "auto":
        mode = ("broadcast" if ds.count() <= _MUTUAL_BROADCAST_MAX
                else "blocked")
    if mode == "blocked":
        # max(vec_id) is a bounded aggregate; no driver-resident table
        pack_mod = np.int64(int(ds.max("vec_id")) + 2)
        knn = knn_edges_blocked(ds, k=k, n_blocks=n_blocks_for(ds.count()))
        return _mutual_resolve(knn, pack_mod, nparts)

    base = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids_all = base["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    srt = np.argsort(ids_all)
    ids_all = ids_all[srt]
    mat = _batch_matrix(base, "embedding")[srt]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = ray.put((ids_all, mat / norms[:, None]))

    pack_mod = np.int64(int(ids_all.max()) + 2)

    def topk_rows(t: pa.Table) -> pa.Table:
        ids_a, mn = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = _batch_matrix(t, "embedding")
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        sims = round_half_away((q @ mn.T) / qn[:, None], 6)
        # self-similarity out of the running
        self_col = np.searchsorted(ids_a, ids)
        sims[np.arange(len(ids)), self_col] = -np.inf
        # per-row top-k by (sim DESC, neighbor id ASC)
        order = np.lexsort((np.broadcast_to(ids_a, sims.shape),
                            -sims), axis=1)[:, :k]
        src = np.repeat(ids, k)
        dst = ids_a[order].ravel()
        sim = np.take_along_axis(sims, order, axis=1).ravel()
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "sim": pa.array(sim)})

    knn = ds.map_batches(topk_rows, batch_format="pyarrow",
                         zero_copy_batch=True)
    return _mutual_resolve(knn, pack_mod, nparts)


def _mutual_resolve(knn: "ray.data.Dataset", pack_mod: np.int64,
                    nparts: int) -> "ray.data.Dataset":
    """Mutuality over directed (src, dst, sim) k-NN edges: ONE
    partition-kernel exchange on the packed undirected pair key —
    count==2 in a partition ⇒ both directions exist ⇒ mutual.  Shared by
    the broadcast and blocked k-NN routes."""

    def pack(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"pk": pa.array(lo * pack_mod + hi),
                         "lo_is_src": pa.array((s < d).astype(np.int64)),
                         "sim": t["sim"]})

    def mutual_part(g: pd.DataFrame) -> pa.Table:
        pk = g["pk"].to_numpy().astype(np.int64)
        uniq, inv, cnt = np.unique(pk, return_inverse=True,
                                   return_counts=True)
        mutual = cnt == 2
        keep = mutual[inv] & (g["lo_is_src"].to_numpy() == 1)
        pk_m = pk[keep]
        sim_m = g["sim"].to_numpy()[keep]
        return pa.table({
            "u": pa.array(pk_m // pack_mod),
            "v": pa.array(pk_m % pack_mod),
            "sim": pa.array(sim_m),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        knn.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
           .map_batches(lambda t: int_key_part_col(t, "pk", nparts),
                        batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: mutual_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# seasonality_weekday_index — per-(event_type, weekday) seasonal index:
# (weekday mean value) / (type-overall mean value), from exact integer
# cent sums.  One bounded groupby exchange (|types|·7 rows); the index is
# the identical 3-division chain on both sides.  DuckDB dayofweek: 0=Sun;
# numpy mirror: (epoch_days + 4) % 7.
# ---------------------------------------------------------------------------
@query(
    "seasonality_weekday_index",
    """
    WITH base AS (SELECT event_type,
                         CAST(dayofweek(ts) AS BIGINT) AS wd,
                         CAST(round(value * 100) AS BIGINT) AS vc
                  FROM events),
    w AS (SELECT event_type, wd, CAST(sum(vc) AS BIGINT) AS sum_c,
                 CAST(count(*) AS BIGINT) AS n
          FROM base GROUP BY event_type, wd),
    t AS (SELECT event_type, CAST(sum(sum_c) AS BIGINT) AS tot_c,
                 CAST(sum(n) AS BIGINT) AS tot_n
          FROM w GROUP BY event_type)
    SELECT w.event_type, w.wd, w.sum_c, w.n,
           (CAST(w.sum_c AS DOUBLE) / CAST(w.n AS DOUBLE))
             / (CAST(t.tot_c AS DOUBLE) / CAST(t.tot_n AS DOUBLE)) AS idx
    FROM w JOIN t USING (event_type)
    """,
)
def seasonality_weekday_index(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        days = ts.astype("datetime64[D]").astype(np.int64)
        wd = (days + 4) % 7
        vc = np.round(t["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"], "wd": pa.array(wd),
                       "sum_c": pa.array(vc),
                       "n": pa.array(np.ones(len(wd), np.int64))})
        return (tt.group_by(["event_type", "wd"])
                .aggregate([("sum_c", "sum"), ("n", "sum")])
                .rename_columns(["event_type", "wd", "sum_c", "n"]))

    w = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "wd"])
        .aggregate(Sum("sum_c", alias_name="sum_c"),
                   Sum("n", alias_name="n"))
    ).to_pandas()  # |types|·7 rows — bounded

    tot = w.groupby("event_type", as_index=False).agg(
        tot_c=("sum_c", "sum"), tot_n=("n", "sum"))
    m = w.merge(tot, on="event_type")
    idx = ((m["sum_c"].to_numpy().astype(np.float64)
            / m["n"].to_numpy().astype(np.float64))
           / (m["tot_c"].to_numpy().astype(np.float64)
              / m["tot_n"].to_numpy().astype(np.float64)))
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "wd": pa.array(m["wd"].to_numpy(), pa.int64()),
        "sum_c": pa.array(m["sum_c"].to_numpy(), pa.int64()),
        "n": pa.array(m["n"].to_numpy(), pa.int64()),
        "idx": pa.array(idx),
    })


# ---------------------------------------------------------------------------
# golden_record_attrs — survivorship merge (the step after entity
# resolution): one golden row per user combining "most recent value"
# policies per attribute — last event_type overall, last purchase cents
# (NULL when the user never purchased), and the distinct-type count.
# One gpart exchange; the kernel lexsorts each partition once by
# (user, ts, event_id) and takes boundary rows — no per-user Python.
# Recency ties break on event_id, mirrored exactly in the oracle's
# window ORDER BY.
# ---------------------------------------------------------------------------
@query(
    "golden_record_attrs",
    """
    WITH e AS (SELECT user_id, event_id, ts, event_type,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events),
    r AS (SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e),
    p AS (SELECT user_id, vc,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e WHERE event_type = 'purchase'),
    d AS (SELECT user_id,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
          FROM e GROUP BY user_id)
    SELECT r.user_id, r.event_type AS last_type,
           p.vc AS last_purchase_c, d.n_types
    FROM r
    LEFT JOIN p ON p.user_id = r.user_id AND p.rn = 1
    JOIN d ON d.user_id = r.user_id
    WHERE r.rn = 1
    """,
)
def golden_record_attrs(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "event_type",
                             "value"])
    nparts = _join_parts()

    def prep(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        out = pa.table({"user_id": t["user_id"], "event_id": t["event_id"],
                        "ts_us": pc.cast(t["ts"], pa.int64()),
                        "event_type": t["event_type"], "vc": vc})
        return int_key_part_col(out, "user_id", nparts)

    def golden_part(g: pd.DataFrame) -> pa.Table:
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        ts = g["ts_us"].to_numpy().astype(np.int64)
        et = g["event_type"].to_numpy()
        vc = g["vc"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))  # per user ASC: last row wins
        uid, eid, ts, et, vc = (uid[order], eid[order], ts[order],
                                et[order], vc[order])
        n = len(uid)
        last = np.empty(n, bool)
        last[-1] = True
        last[:-1] = uid[1:] != uid[:-1]
        lasts = np.flatnonzero(last)
        users = uid[lasts]
        last_type = et[lasts]
        # distinct types per user: unique (user, type) pairs per segment
        pair_new = np.empty(n, bool)
        pair_new[0] = True
        pair_new[1:] = (uid[1:] != uid[:-1])
        # count distinct via sorting types within user segments
        order2 = np.lexsort((et, uid))
        u2, t2 = uid[order2], et[order2]
        new2 = np.empty(n, bool)
        new2[0] = True
        new2[1:] = (u2[1:] != u2[:-1]) | (t2[1:] != t2[:-1])
        n_types = np.bincount(
            np.searchsorted(users, u2[new2]), minlength=len(users))
        # last purchase cents: scan only purchase rows (still vectorized)
        is_p = et == "purchase"
        pu, pv = uid[is_p], vc[is_p]
        plast = np.empty(len(pu), bool)
        if len(pu):
            plast[-1] = True
            plast[:-1] = pu[1:] != pu[:-1]
        p_users, p_vals = pu[plast], pv[plast]
        pos = np.searchsorted(users, p_users)
        purchase = np.full(len(users), 0, np.int64)
        has_p = np.zeros(len(users), bool)
        purchase[pos] = p_vals
        has_p[pos] = True
        return pa.table({
            "user_id": pa.array(users),
            "last_type": pa.array(last_type, pa.string()),
            "last_purchase_c": pa.array(
                np.ma.masked_array(purchase, mask=~has_p)),
            "n_types": pa.array(n_types.astype(np.int64)),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: golden_part(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# ppjoin_pairs — prefix-filtered set-similarity join (the PPJoin family):
# exact 5-shingle Jaccard ≥ 0.8 document pairs WITHOUT the all-pairs
# product.  Prefix-filter theory: order each doc's shingles by global
# rarity (df ASC, h ASC); two docs with Jaccard ≥ θ MUST share a shingle
# inside their first (n − ⌈θ·n⌉ + 1) rarest — so candidates come only
# from prefix-shingle collisions (recall 1 by construction, asserted
# against brute force in tests).  Stages: per-doc distinct shingle
# hashes (the sketch family's code-point polynomial, so the SQL oracle
# mirrors it exactly) → df exchange → hybrid df attach (broadcast ≤2M
# distinct shingles, hash join above) → per-doc prefix kernel →
# collision pairing → distinct pairs → exact-Jaccard verify
# (stages/dedup.verify_pairs_jaccard).
# Scale note: collision buckets are keyed on PREFIX shingles, which the
# rarity ordering makes the globally rarest ones, so bucket width is
# df-bounded on natural corpora; a degenerate corpus of m identical
# docs still pairs m² — but that is the size of the TRUE output itself
# (every pair is a duplicate), i.e. candidate cost stays output-bound.
# For boilerplate-heavy corpora where even the output is too big, the
# banded MinHash family (stages/dedup.py) with its hot-bucket cap is
# the lossy-but-bounded alternative.
# ---------------------------------------------------------------------------
def _ppjoin_sql(threshold: float = 0.8, k: int = 5) -> str:
    from .sketch_sql import _shingle_ctes

    return f"""
    WITH {_shingle_ctes(k)},
    shd AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM shh),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           FROM shd GROUP BY doc_id),
    fr AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM shd GROUP BY h),
    o AS (SELECT s.doc_id, s.h,
                 row_number() OVER (PARTITION BY s.doc_id
                                    ORDER BY f.df, s.h) AS rk,
                 z.n
          FROM shd s JOIN fr f USING (h) JOIN sz z USING (doc_id)),
    pref AS (SELECT doc_id, h FROM o
             WHERE rk <= n - CAST(ceil({threshold} * n) AS BIGINT) + 1),
    cand AS (SELECT DISTINCT p1.doc_id AS id_a, p2.doc_id AS id_b
             FROM pref p1 JOIN pref p2
               ON p2.h = p1.h AND p1.doc_id < p2.doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS c
              FROM cand c
              JOIN shd a ON a.doc_id = c.id_a
              JOIN shd b ON b.doc_id = c.id_b AND b.h = a.h
              GROUP BY c.id_a, c.id_b)
    SELECT i.id_a, i.id_b,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.id_a
    JOIN sz sb ON sb.doc_id = i.id_b
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= {threshold}
    """


@query("ppjoin_pairs", _ppjoin_sql(0.8, 5))
def ppjoin_pairs(sf_dir: str, threshold: float = 0.8, k: int = 5,
                 broadcast_limit: int = 2_000_000):
    from ..stages.dedup import (_dedup_pairs, _hash_part_col,
                                _shingle_hashes, verify_pairs_jaccard)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    nparts = _join_parts()

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids_out, hs_out, ns = [], [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, txt in enumerate(t["text"].to_pylist()):
            # sub-k docs get the one-window fallback hash — covered by
            # the oracle's guarded-terms CASE, no length exclusion
            hs = np.unique(_shingle_hashes(txt, k))
            ids_out.append(np.full(len(hs), ids[i], np.int64))
            hs_out.append(hs)
            ns.append(np.full(len(hs), len(hs), np.int64))
        if not ids_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(ids_out)),
                         "h": pa.array(np.concatenate(hs_out), pa.uint64()),
                         "n": pa.array(np.concatenate(ns))})

    sh = docs.map_batches(shingle_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def df_part(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.uint64()),
                         "df": pa.array(cnt.astype(np.int64))})

    from ..stages.exchange import exchange_map_groups as _exg

    df_ds = _exg(
        sh.map_batches(
            lambda t: _hash_part_col(t.select(["h"]), "h", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "part", df_part, nparts, drop_part_col=True).materialize()

    if df_ds.count() == 0:  # no doc long enough to shingle
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))
    if df_ds.count() <= broadcast_limit:
        df_tbl = pa.concat_tables(
            df_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        keys = df_tbl["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        ref = ray.put((keys[order],
                       df_tbl["df"].to_numpy(zero_copy_only=False)[order]))

        def attach_df(t: pa.Table) -> pa.Table:
            ks, dfs = ray.get(ref)
            h = t["h"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "df", pa.array(dfs[np.searchsorted(ks, h)]))

        attached = sh.map_batches(attach_df, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        # scale path: distributed attach with NO driver state — ONE
        # h-keyed exchange (stages/attach.py; Ray's Dataset.join
        # hash-partitions with a per-row Python hash loop and crawls at
        # sf0.1's ~6M distinct shingles).  Every h in `sh` exists in
        # `df_ds` by construction (df was computed FROM sh), so the
        # inner attach drops nothing.
        from ..stages.attach import exchange_attach

        attached = exchange_attach(sh, df_ds, "h", nparts=nparts)

    def prefix_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, df, did))
        did, h, n = did[order], h[order], n[order]
        first = np.empty(len(did), bool)
        first[0] = True
        first[1:] = did[1:] != did[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(len(did)) - np.repeat(
            starts, np.r_[starts[1:], len(did)] - starts)
        L = n - np.ceil(threshold * n).astype(np.int64) + 1
        keep = rank < L
        return pa.table({"doc_id": pa.array(did[keep]),
                         "h": pa.array(h[keep], pa.uint64()),
                         "n": pa.array(n[keep]),
                         "rank": pa.array(rank[keep])})

    # r5: both exchanges route through the STREAMING task exchange —
    # split tasks launch per upstream block as produced, so the r4
    # materialization penalty (6.4 s -> 7.2 s, reverted then) is gone
    from ..stages.exchange import exchange_map_groups

    pref = exchange_map_groups(
        attached.map_batches(
            lambda t: int_key_part_col(t, "doc_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", prefix_part, nparts, drop_part_col=True)

    def collide_part(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = g["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, h))
        h, did, nn, rk = h[order], did[order], nn[order], rk[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ends = np.r_[starts[1:], len(h)]
        outs_a, outs_b = [], []
        for s, e in zip(starts, ends):  # only COLLIDING prefix shingles
            d = e - s
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            na, nb = nn[s:e][iu], nn[s:e][ju]
            # PPJoin candidate pruning (sound — verify decides
            # membership; a qualifying pair always passes at its FIRST
            # shared rarity-ordered shingle, so recall stays 1):
            #   length:   J>=t  =>  t*max(na,nb) <= min(na,nb)
            #   position: overlap <= 1 + min(remaining suffix lengths)
            #             and J>=t needs overlap >= t/(1+t)*(na+nb)
            alpha = np.ceil((threshold / (1.0 + threshold))
                            * (na + nb) - 1e-9)
            ubound = 1 + np.minimum(na - 1 - rk[s:e][iu],
                                    nb - 1 - rk[s:e][ju])
            keep = ((threshold * np.maximum(na, nb)
                     <= np.minimum(na, nb) + 1e-9)
                    & (ubound >= alpha))
            if not keep.any():
                continue
            outs_a.append(did[s:e][iu[keep]])
            outs_b.append(did[s:e][ju[keep]])
        if not outs_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(outs_a)),
                         "id_b": pa.array(np.concatenate(outs_b))})

    cand = exchange_map_groups(
        pref.map_batches(
            lambda t: _hash_part_col(t, "h", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "part", collide_part, nparts, drop_part_col=True)

    pairs = _dedup_pairs(cand)
    return verify_pairs_jaccard(pairs, docs, threshold=threshold, k=k)


# ---------------------------------------------------------------------------
# jaro_winkler_pairs — blocked Jaro-Winkler fuzzy self-join over DISTINCT
# part entity strings (name+type+brand), the classic record-linkage
# comparator next to the blocked-Levenshtein of fuzzy_name_pairs.  The
# kernel is PAIR-VECTORIZED: the greedy Jaro matching loop runs over
# CHAR POSITIONS (L² ≈ 1k numpy steps per block) with every step an
# elementwise op across all of the block's pairs — no per-pair Python.
# Transpositions come from row-major nonzero scans of the match masks
# (a-order vs b-order matched chars), prefix length from a cumprod of
# the first-4-char equality.  DuckDB's jaro_winkler_similarity applies
# the Winkler prefix boost only when jaro > 0.7 (verified bit-identical
# on 200k blocked pairs), and both sides evaluate the same IEEE
# expression order, so the emitted doubles hash-match exactly.
# Blocking key = first token; the block is the partition, so the
# quadratic pair expansion never crosses the exchange.
# ---------------------------------------------------------------------------
_JW_THRESHOLD = 0.9


def _jw_pairs_kernel(ents: np.ndarray) -> pd.DataFrame:
    """All-pairs Jaro-Winkler over one block's unique strings; returns
    pairs (ent_a < ent_b) with jw >= _JW_THRESHOLD.

    The greedy Jaro matching state per pair is a single uint64 BITSET of
    already-matched b positions (strings ≤ 63 chars), so the loop is L
    steps of elementwise shift/mask ops across all pairs — the candidate
    window, first-unmatched selection (lowest set bit: x & -x), and the
    match bookkeeping each cost O(P) per step instead of O(P·L)."""
    n = len(ents)
    if n < 2:
        return pd.DataFrame({"ent_a": ents[:0], "ent_b": ents[:0],
                             "jw": np.empty(0, np.float64)})
    codes = [np.frombuffer(e.encode(), np.uint8) for e in ents]
    lens = np.array([len(c) for c in codes], np.int64)
    L = int(lens.max())
    assert L <= 63, "bitset Jaro kernel requires strings <= 63 chars"
    M = np.zeros((n, L), np.uint8)
    for r, c in enumerate(codes):
        M[r, :len(c)] = c
    # char-position bitsets per string: bpos[s, c] has bit j set iff
    # string s has char-class c at position j
    uchars = np.unique(M)
    lut = np.zeros(256, np.int64)
    lut[uchars] = np.arange(len(uchars))
    Mc = lut[M]
    bitpos = np.uint64(1) << np.arange(L, dtype=np.uint64)
    bpos = np.zeros((n, len(uchars)), np.uint64)
    np.bitwise_or.at(bpos, (np.repeat(np.arange(n), L), Mc.ravel()),
                     np.tile(bitpos, n))
    has_pad = uchars[0] == 0  # only zero the pad class when it EXISTS:
    # with every string exactly L bytes, lut[0] aliases the smallest
    # real char class and zeroing it would erase its matches
    if has_pad:
        bpos[:, 0] = 0  # pad char never matches

    ii, jj = np.triu_indices(n, k=1)
    la, lb = lens[ii], lens[jj]
    # sound prefilter: the greedy match count m never exceeds the
    # char-class multiset intersection, and jw >= 0.9 needs
    # jaro >= (0.9 - 0.4)/0.6 = 5/6, i.e. 2·m·(la+lb) >= 3·la·lb —
    # this drops the vast majority of pairs before any (P, L) gather.
    cnts = np.zeros((n, len(uchars)), np.int16)
    np.add.at(cnts, (np.repeat(np.arange(n), L), Mc.ravel()), 1)
    if has_pad:
        cnts[:, 0] = 0
    mub = np.minimum(cnts[ii], cnts[jj]).sum(1, dtype=np.int64)
    pre = 2 * mub * (la + lb) >= 3 * la * lb
    ii, jj, la, lb = ii[pre], jj[pre], la[pre], lb[pre]
    A, B = M[ii], M[jj]
    Ac = Mc[ii]
    Bpos = bpos[jj]
    md = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    P = len(ii)
    one = np.uint64(1)
    rows = np.arange(P)
    bmatched = np.zeros(P, np.uint64)
    amatch = np.zeros((P, L), bool)
    for i in range(L):
        lo = np.maximum(i - md, 0).astype(np.uint64)
        hi = np.minimum(i + md, lb - 1)
        ok = (i < la) & (hi >= 0)
        hi = np.maximum(hi, 0).astype(np.uint64)
        wmask = ((one << (hi + one)) - one) & ~((one << lo) - one)
        cand = Bpos[rows, Ac[:, i]] & ~bmatched & wmask
        cand[~ok] = 0
        lsb = cand & (~cand + one)
        bmatched |= lsb
        amatch[:, i] = cand != 0
    m = amatch.sum(1).astype(np.int64)
    # transpositions: a-order vs b-order matched chars (row-major nonzero
    # is sorted by (pair, position) — runs align because counts match)
    bmatch = ((bmatched[:, None] >> np.arange(L, dtype=np.uint64)) & one) != 0
    pa_r, pa_c = np.nonzero(amatch)
    pb_r, pb_c = np.nonzero(bmatch)
    diff = A[pa_r, pa_c] != B[pb_r, pb_c]
    t = np.bincount(pa_r, weights=diff, minlength=P).astype(np.int64) // 2
    with np.errstate(invalid="ignore", divide="ignore"):
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    k4 = min(4, L)
    eq4 = (A[:, :k4] == B[:, :k4]) & (np.arange(k4) < np.minimum(la, lb)[:, None])
    l = np.cumprod(eq4, axis=1).sum(1).astype(np.int64)
    jw = np.where(jaro > 0.7, jaro + l * 0.1 * (1.0 - jaro), jaro)
    keep = jw >= _JW_THRESHOLD
    return pd.DataFrame({"ent_a": ents[ii[keep]], "ent_b": ents[jj[keep]],
                         "jw": jw[keep]})


@query(
    "jaro_winkler_pairs",
    f"""
    WITH e AS (
      SELECT DISTINCT p_name || ' ' || p_type || ' ' || p_brand AS ent
      FROM part),
    b AS (SELECT ent, split_part(ent, ' ', 1) AS blk FROM e)
    SELECT a.ent AS ent_a, c.ent AS ent_b,
           jaro_winkler_similarity(a.ent, c.ent) AS jw
    FROM b a JOIN b c ON a.blk = c.blk AND a.ent < c.ent
    WHERE jaro_winkler_similarity(a.ent, c.ent) >= {_JW_THRESHOLD}
    ORDER BY 1, 2
    """,
)
def jaro_winkler_pairs(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_name", "p_type", "p_brand"])

    def ent_rows(t: pa.Table) -> pa.Table:
        ent = pc.binary_join_element_wise(
            pc.cast(t["p_name"], pa.string()),
            pc.cast(t["p_type"], pa.string()),
            pc.cast(t["p_brand"], pa.string()), " ")
        blk = pc.list_element(pc.split_pattern(ent, " "), 0)
        return (pa.table({"ent": ent, "blk": blk})
                .group_by(["ent", "blk"]).aggregate([]))

    # ONE blk-keyed exchange replaces the former global distinct + per-
    # block groupby (two sort shuffles): all copies of an (ent, blk) pair
    # co-locate under hash(blk), so the in-partition dedup IS the global
    # distinct, and the kernel loops the partition's blocks (first-token
    # vocabulary-bounded) around the vectorized pair kernel.
    from ..stages.exchange import exchange_map_groups
    from ..stages.partition import str_key_part_col

    nparts = _join_parts()

    def blk_part(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas().drop_duplicates(["ent", "blk"])
        outs = [
            _jw_pairs_kernel(np.sort(sub["ent"].to_numpy().astype(object)))
            for _, sub in df.groupby("blk", sort=False)
        ]
        if not outs:
            return pd.DataFrame({"ent_a": pd.Series([], dtype=str),
                                 "ent_b": pd.Series([], dtype=str),
                                 "jw": pd.Series([], dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    return exchange_map_groups(
        ds.map_batches(ent_rows, batch_format="pyarrow",
                       zero_copy_batch=True)
          .map_batches(lambda t: str_key_part_col(t, "blk", nparts),
                       batch_format="pyarrow", zero_copy_batch=True),
        "gpart", blk_part, nparts, drop_part_col=True,
    ).sort(["ent_a", "ent_b"])
