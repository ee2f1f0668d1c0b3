"""Training-data curation + multi-feature stats batch (SURVEY §2.7/§2.8
extensions in the LLM-pipeline direction):

- n-gram novelty attribution (first-occurrence trigram credit per doc)
- per-user journey assembly (ordered ``string_agg`` — the listagg operator)
- bag-semantics ``EXCEPT ALL`` (multiset difference with multiplicity)
- lexical diversity (type-token ratio per language)
- Zipf log-log slope over per-language top terms
- two-feature OLS via normal equations (exact integer moments, Cramer)
- composite quality-rules audit (Gopher-style pass/fail reason bitmask)

Contract as elsewhere in this package: every aggregation is an exact
integer (counts, scaled-integer logs, moment sums); float arithmetic is
a closed-form evaluation once per output row, mirrored op-for-op in the
DuckDB oracle so typed value-hashes match bit-for-bit.  ``ln`` is NOT
mirrored raw (numpy's SIMD log and DuckDB's libm log differ at the ulp
on ~20% of integer inputs — measured): both sides round ln to 6 dp
half-away-from-zero FIRST, then sum the scaled int64s.

Reference provenance: the reference's per-datatype QC summaries and
duplicate-attribution reports (src/etl/summary_etl.py) are the operator
family these curation diagnostics extend for a training-data engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..functions.tables import read_table
from ..stages.partition import int_key_part_col, str_key_part_col
from .queries import _cents, _join_parts, query


def _flat_tokens(t: pa.Table, text_col: str = "text"):
    """Space-split ``text`` → (flat token Array, parent row indices),
    empties dropped, order preserved.  All Arrow kernels."""
    toks = pc.split_pattern(t[text_col], " ")
    parent = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(parent, pa.ChunkedArray):
        parent = parent.combine_chunks()
    return flat, parent


# ---------------------------------------------------------------------------
# ngram_novelty_scores — first-occurrence attribution: for each doc, the
# fraction of its DISTINCT word trigrams whose corpus-wide first sighting
# (min doc_id) is this doc.  The curation use: rank documents by how
# much genuinely new text they contribute before dedup/packing.
# Distributed shape: docs are row-atomic per batch, so per-doc distinct
# trigrams are final at the batch level (no doc exchange); ONE
# trigram-keyed exchange computes min-doc and emits per-doc partials in
# the same kernel; the doc-keyed rollup is bounded by the document
# dimension.  Trigram strings shuffle once — the scale path dictionary-
# encodes them (hashes alone can't carry min-doc attribution exactly).
# ---------------------------------------------------------------------------
@query(
    "ngram_novelty_scores",
    """
    WITH tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents),
    tok AS (
      SELECT doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
      FROM tok0 WHERE tok <> ''),
    tri AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS tri
      FROM tok a
      JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
    dtri AS (SELECT DISTINCT doc_id, tri FROM tri),
    first AS (SELECT tri, min(doc_id) AS first_doc FROM dtri GROUP BY tri)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_tri,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS novelty
    FROM dtri d JOIN first f USING (tri)
    GROUP BY d.doc_id
    """,
)
def ngram_novelty_scores(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    nparts = _join_parts()

    def tri_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        n = len(flat)
        if n < 3:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.string())})
        w0, w1, w2 = flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2)
        same = pc.equal(parent.slice(0, n - 2), parent.slice(2, n - 2))
        tri = pc.binary_join_element_wise(
            w0.filter(same), w1.filter(same), w2.filter(same), " ")
        docs = t["doc_id"].take(parent.slice(0, n - 2).filter(same))
        # docs are row-atomic per batch → batch-level distinct IS per-doc distinct
        dist = pa.table({"doc_id": docs, "tri": tri}).group_by(
            ["doc_id", "tri"]).aggregate([])
        return str_key_part_col(dist, "tri", nparts)

    def novel_kernel(g: pd.DataFrame) -> pa.Table:
        first = g.groupby("tri")["doc_id"].transform("min")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "one": pa.array(np.ones(len(g), np.int64)),
            "novel": pa.array((g["doc_id"].to_numpy(np.int64)
                               == first.to_numpy(np.int64)).astype(np.int64)),
        })

    def finish(t: pa.Table) -> pa.Table:
        n_tri = pc.cast(t["sum(one)"], pa.int64())
        n_novel = pc.cast(t["sum(novel)"], pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tri": n_tri,
            "n_novel": n_novel,
            "novelty": pc.divide(pc.cast(n_novel, pa.float64()),
                                 pc.cast(n_tri, pa.float64())),
        })

    from ..stages.exchange import exchange_map_groups

    return (
        exchange_map_groups(
            ds.map_batches(tri_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            "gpart", lambda g: novel_kernel(g.to_pandas()), nparts,
            drop_part_col=True)
        .groupby("doc_id").sum(["one", "novel"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# user_journey_paths — the listagg/string_agg operator: per user, the
# full event-type path in (ts, event_id) order joined with '>'.  ONE
# user-keyed exchange; the partition kernel lexsorts once and emits
# FINAL rows (user-keyed ⇒ no second global groupby).
# ---------------------------------------------------------------------------
@query(
    "user_journey_paths",
    """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def user_journey_paths(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    nparts = _join_parts()

    def kern(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gr = g.groupby("user_id", sort=False)
        path = gr["event_type"].agg(">".join)
        n = gr.size()
        return pa.table({
            "user_id": pa.array(path.index.to_numpy(np.int64)),
            "path": pa.array(path.to_numpy(object), pa.string()),
            "n_events": pa.array(n.to_numpy(np.int64)),
        })

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(lambda t: int_key_part_col(t, "user_id", nparts),
                       batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: kern(g.to_pandas()), nparts,
        drop_part_col=True)


# ---------------------------------------------------------------------------
# except_all_type_bags — bag semantics: (user_id, event_type) rows of the
# even-event_id half EXCEPT ALL the odd half, duplicates preserved with
# exact multiplicity max(c_even − c_odd, 0).  Distributed shape: batch
# partials carry both halves' counts in one table, ONE (user,type)-keyed
# exchange, multiplicity replication is a vectorized np.repeat.
# ---------------------------------------------------------------------------
@query(
    "except_all_type_bags",
    """
    SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE event_id % 2 = 1
    """,
)
def except_all_type_bags(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        even = pc.cast(pc.equal(pc.bit_wise_and(t["event_id"], 1), 0), pa.int64())
        part = pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "c0": even, "c1": pc.subtract(1, even),
        })
        return part.group_by(["user_id", "event_type"]).aggregate(
            [("c0", "sum"), ("c1", "sum")])

    def replicate(t: pa.Table) -> pa.Table:
        c0 = t["sum(c0_sum)"].to_numpy(zero_copy_only=False)
        c1 = t["sum(c1_sum)"].to_numpy(zero_copy_only=False)
        mult = np.maximum(c0 - c1, 0)
        idx = np.repeat(np.arange(t.num_rows), mult)
        return pa.table({
            "user_id": t["user_id"].take(pa.array(idx)),
            "event_type": t["event_type"].take(pa.array(idx)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"]).sum(["c0_sum", "c1_sum"])
        .map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# ttr_per_lang — lexical diversity: distinct tokens / total tokens per
# language.  ONE token-keyed exchange carries summed counts; distinct
# and total both derive from that bounded (lang, token, c) table; the
# lang rollup is a 5-row exchange.
# ---------------------------------------------------------------------------
@query(
    "ttr_per_lang",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
    t2 AS (SELECT lang, token FROM tok WHERE token <> '')
    SELECT lang,
           CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT token) AS DOUBLE) / count(*) AS ttr
    FROM t2 GROUP BY lang
    """,
)
def ttr_per_lang(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        part = pa.table({
            "lang": t["lang"].take(parent), "token": flat,
            "c": pa.array(np.ones(len(flat), np.int64)),
        })
        return part.group_by(["lang", "token"]).aggregate([("c", "sum")])

    def lang_partial(t: pa.Table) -> pa.Table:
        part = pa.table({
            "lang": t["lang"],
            "nd": pa.array(np.ones(t.num_rows, np.int64)),
            "nt": pc.cast(t["sum(c_sum)"], pa.int64()),
        })
        return part.group_by("lang").aggregate([("nd", "sum"), ("nt", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        nd = pc.cast(t["sum(nd_sum)"], pa.int64())
        nt = pc.cast(t["sum(nt_sum)"], pa.int64())
        return pa.table({
            "lang": t["lang"], "n_distinct": nd, "n_tokens": nt,
            "ttr": pc.divide(pc.cast(nd, pa.float64()),
                             pc.cast(nt, pa.float64())),
        })

    return (
        ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "token"]).sum("c_sum")
        .map_batches(lang_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang").sum(["nd_sum", "nt_sum"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# zipf_slope_terms — Zipf's-law fit per language: OLS slope of
# round(ln(freq),6) on round(ln(rank),6) over the top-50 terms (rank by
# count DESC, token ASC).  Logs are rounded to 6 dp half-away FIRST on
# both sides (np.log vs DuckDB ln differ at the ulp — measured), so the
# moment sums are exact int64; one mirrored double evaluation per lang.
# The top-50 pull is 5×50 rows — bounded by construction.
# ---------------------------------------------------------------------------
@query(
    "zipf_slope_terms",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
    t2 AS (SELECT lang, token FROM tok WHERE token <> ''),
    cnt AS (SELECT lang, token, count(*) AS c FROM t2 GROUP BY lang, token),
    rk AS (SELECT lang, token, c,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY c DESC, token) AS r
           FROM cnt),
    top AS (SELECT lang,
                   CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
                   CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
            FROM rk WHERE r <= 50),
    s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM top GROUP BY lang)
    SELECT lang, n AS n_terms,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope
    FROM s
    """,
)
def zipf_slope_terms(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        part = pa.table({
            "lang": t["lang"].take(parent), "token": flat,
            "c": pa.array(np.ones(len(flat), np.int64)),
        })
        return part.group_by(["lang", "token"]).aggregate([("c", "sum")])

    def top_kernel(g: pd.DataFrame) -> pa.Table:
        g = g.rename(columns={"sum(c_sum)": "c"})
        g = g.sort_values(["lang", "c", "token"], kind="mergesort",
                          ascending=[True, False, True])
        top = g.groupby("lang", sort=False).head(50).copy()
        top["r"] = top.groupby("lang", sort=False).cumcount() + 1
        return pa.table({
            "lang": pa.array(top["lang"].to_numpy(object), pa.string()),
            "r": pa.array(top["r"].to_numpy(np.int64)),
            "c": pa.array(top["c"].to_numpy(np.int64)),
        })

    top = (
        ds.map_batches(tok_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "token"]).sum("c_sum")
        .groupby("lang").map_groups(top_kernel, batch_format="pandas")
        .to_pandas()  # ≤ 50 × |langs| rows by construction
    )
    # half-away 6-dp scaled logs (ln ≥ 0 here, so floor(x·1e6 + 0.5))
    x = np.floor(np.log(top["r"].to_numpy(np.float64)) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(top["c"].to_numpy(np.float64)) * 1e6 + 0.5).astype(np.int64)
    df = pd.DataFrame({"lang": top["lang"], "x": x, "y": y, "xx": x * x, "xy": x * y})
    s = df.groupby("lang", as_index=False).agg(
        n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
        sxx=("xx", "sum"), sxy=("xy", "sum"))
    slope = ((s["n"].astype(float) * s["sxy"].astype(float)
              - s["sx"].astype(float) * s["sy"].astype(float))
             / (s["n"].astype(float) * s["sxx"].astype(float)
                - s["sx"].astype(float) * s["sx"].astype(float)))
    return pa.table({
        "lang": pa.array(s["lang"].to_numpy(object), pa.string()),
        "n_terms": pa.array(s["n"].to_numpy(np.int64)),
        "zipf_slope": pa.array(slope.to_numpy(np.float64)),
    })


# ---------------------------------------------------------------------------
# ols_price_on_qty_disc — two-feature linear regression via normal
# equations per returnflag: cents(extendedprice) ~ b0 + b1·qty +
# b2·(discount %).  All nine moments are exact int64 batch partials
# (bounds: Σx1y ≤ 50·1e7·6e5 ≈ 3e14 at bench scale — limb-split as in
# corr_matrix beyond that); the 3×3 Cramer solve is ONE mirrored double
# expression per flag over the 3-row moment table.
# ---------------------------------------------------------------------------
_DET3 = ("({a}) * (({e}) * ({i}) - ({f}) * ({h})) "
         "- ({b}) * (({d}) * ({i}) - ({f}) * ({g})) "
         "+ ({c}) * (({d}) * ({h}) - ({e}) * ({g}))")


def _det3_sql(a, b, c, d, e, f, g, h, i):
    def cd(v):
        return f"CAST({v} AS DOUBLE)"
    return _DET3.format(a=cd(a), b=cd(b), c=cd(c), d=cd(d), e=cd(e),
                        f=cd(f), g=cd(g), h=cd(h), i=cd(i))


def _det3_np(a, b, c, d, e, f, g, h, i):
    return (a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g))


_OLS_SQL = f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x1 * x1) AS BIGINT) AS sx11,
             CAST(sum(x2 * x2) AS BIGINT) AS sx22,
             CAST(sum(x1 * x2) AS BIGINT) AS sx12,
             CAST(sum(x1 * y) AS BIGINT) AS sx1y,
             CAST(sum(x2 * y) AS BIGINT) AS sx2y
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x1,
                   CAST(round(l_discount * 100) AS BIGINT) AS x2,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem)
      GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ({_det3_sql('sy', 'sx1', 'sx2', 'sx1y', 'sx11', 'sx12',
                       'sx2y', 'sx12', 'sx22')})
           / ({_det3_sql('n', 'sx1', 'sx2', 'sx1', 'sx11', 'sx12',
                         'sx2', 'sx12', 'sx22')}) AS b0,
           ({_det3_sql('n', 'sy', 'sx2', 'sx1', 'sx1y', 'sx12',
                       'sx2', 'sx2y', 'sx22')})
           / ({_det3_sql('n', 'sx1', 'sx2', 'sx1', 'sx11', 'sx12',
                         'sx2', 'sx12', 'sx22')}) AS b1,
           ({_det3_sql('n', 'sx1', 'sy', 'sx1', 'sx11', 'sx1y',
                       'sx2', 'sx12', 'sx2y')})
           / ({_det3_sql('n', 'sx1', 'sx2', 'sx1', 'sx11', 'sx12',
                         'sx2', 'sx12', 'sx22')}) AS b2
    FROM m
"""


@query("ols_price_on_qty_disc", _OLS_SQL)
def ols_price_on_qty_disc(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_discount",
                             "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x1 = pc.cast(t["l_quantity"], pa.int64())
        x2 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        y = _cents(t["l_extendedprice"])
        part = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "sx1": x1, "sx2": x2, "sy": y,
            "sx11": pc.multiply(x1, x1), "sx22": pc.multiply(x2, x2),
            "sx12": pc.multiply(x1, x2), "sx1y": pc.multiply(x1, y),
            "sx2y": pc.multiply(x2, y),
        })
        return part.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx1", "sx2", "sy", "sx11", "sx22",
                                  "sx12", "sx1y", "sx2y")])

    mom = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .sum(["n_sum", "sx1_sum", "sx2_sum", "sy_sum", "sx11_sum",
              "sx22_sum", "sx12_sum", "sx1y_sum", "sx2y_sum"])
        .to_pandas()  # |returnflag| rows — bounded by construction
    )
    flags, b0s, b1s, b2s, ns = [], [], [], [], []
    for _, r in mom.iterrows():
        n = float(r["sum(n_sum)"])
        sx1, sx2 = float(r["sum(sx1_sum)"]), float(r["sum(sx2_sum)"])
        sy = float(r["sum(sy_sum)"])
        sx11, sx22 = float(r["sum(sx11_sum)"]), float(r["sum(sx22_sum)"])
        sx12 = float(r["sum(sx12_sum)"])
        sx1y, sx2y = float(r["sum(sx1y_sum)"]), float(r["sum(sx2y_sum)"])
        det = _det3_np(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
        b0 = _det3_np(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22) / det
        b1 = _det3_np(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22) / det
        b2 = _det3_np(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y) / det
        flags.append(r["l_returnflag"])
        ns.append(int(r["sum(n_sum)"]))
        b0s.append(b0); b1s.append(b1); b2s.append(b2)
    return pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "b0": pa.array(b0s, pa.float64()),
        "b1": pa.array(b1s, pa.float64()),
        "b2": pa.array(b2s, pa.float64()),
    })


# ---------------------------------------------------------------------------
# quality_rules_audit — composite Gopher-style filter with lineage: per
# doc, four integer-arithmetic rules (word count in [10, 5000]; mean
# word length in [2.5, 12.0] via 10·Σlen ∈ [25n, 120n]; max word length
# ≤ 15; type-token ratio ≥ 0.3 via 10·distinct ≥ 3n) fold into a
# fail-reason bitmask; output is the (lang, mask) histogram.  One tiny
# exchange — all per-doc work is batch-local vectorized kernels.
# ---------------------------------------------------------------------------
@query(
    "quality_rules_audit",
    """
    WITH w AS (
      SELECT doc_id, lang, tok FROM (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''),
    per AS (
      SELECT doc_id, any_value(lang) AS lang, count(*) AS n,
             sum(length(tok)) AS sl, max(length(tok)) AS ml,
             count(DISTINCT tok) AS nd
      FROM w GROUP BY doc_id)
    SELECT lang,
           CAST((CASE WHEN n BETWEEN 10 AND 5000 THEN 0 ELSE 1 END)
              + (CASE WHEN sl * 10 BETWEEN 25 * n AND 120 * n THEN 0 ELSE 2 END)
              + (CASE WHEN ml <= 15 THEN 0 ELSE 4 END)
              + (CASE WHEN nd * 10 >= 3 * n THEN 0 ELSE 8 END)
             AS BIGINT) AS fail_mask,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM per GROUP BY 1, 2
    """,
)
def quality_rules_audit(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def audit_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        par = parent.to_numpy(zero_copy_only=False)
        lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
        nrows = t.num_rows
        n = np.bincount(par, minlength=nrows).astype(np.int64)
        sl = np.bincount(par, weights=lens, minlength=nrows).astype(np.int64)
        ml = np.zeros(nrows, np.int64)
        np.maximum.at(ml, par, lens)
        dd = pd.DataFrame({"d": par, "tok": flat.to_pandas()}).drop_duplicates()
        nd = np.bincount(dd["d"].to_numpy(), minlength=nrows).astype(np.int64)
        mask = (np.where((n >= 10) & (n <= 5000), 0, 1)
                + np.where((sl * 10 >= 25 * n) & (sl * 10 <= 120 * n), 0, 2)
                + np.where(ml <= 15, 0, 4)
                + np.where(nd * 10 >= 3 * n, 0, 8)).astype(np.int64)
        part = pa.table({
            "lang": t["lang"], "fail_mask": pa.array(mask),
            "n_docs": pa.array(np.ones(nrows, np.int64)),
        })
        return part.group_by(["lang", "fail_mask"]).aggregate([("n_docs", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "fail_mask": pc.cast(t["fail_mask"], pa.int64()),
            "n_docs": pc.cast(t["sum(n_docs_sum)"], pa.int64()),
        })

    return (
        ds.map_batches(audit_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "fail_mask"]).sum("n_docs_sum")
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )
