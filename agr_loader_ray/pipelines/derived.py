"""Second-pass (derived) pipelines: committed lake state → derived tables.

Reference analogue (SURVEY §3.2): ClosureETL / GeneDiseaseOrthoETL /
ProteinSequenceETL read the partially-built store, transform, and write
back (``/root/reference/src/etl/closure_etl.py:69-81``,
``/root/reference/src/etl/gene_disease_ortho_etl.py:119-158``).  Here a
derived pipeline reads the lake AS OF a committed epoch (consistent
snapshot via the epoch manifest), derives a new table, and writes it as
partitioned Parquet next to a manifest that records the source epoch —
derived-data lineage chains to the CDC lineage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..state.manifest import LakeManifest, _atomic_write_json
from .export import read_lake


def conversation_stats(lake_root: str, epoch: int | None = None) -> "ray.data.Dataset":
    """Per-conversation statistics derived from the transcript lake:
    turn count, distinct roles, total/mean text length, last timestamp.

    Ray-Data-first: per-batch partial aggregation (combiner) before the
    conversation groupby — the lake's partition files split by key hash,
    so one conversation can span blocks.
    """
    from ray.data.aggregate import Max, Sum

    ds = read_lake(lake_root, epoch=epoch)

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "conv_id": t["conv_id"],
                "chars": pc.cast(
                    pc.coalesce(pc.utf8_length(t["text"]), pa.scalar(0, pa.int32())),
                    pa.int64(),
                ),
                "is_tool": pc.cast(pc.equal(t["role"], "tool"), pa.int64()),
                "ts": t["ts"],
            }
        )
        return t2.group_by("conv_id").aggregate(
            [("chars", "sum"), ("chars", "count"), ("is_tool", "sum"), ("ts", "max")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(
            Sum("chars_sum", alias_name="total_chars"),
            Sum("chars_count", alias_name="n_turns"),
            Sum("is_tool_sum", alias_name="n_tool_turns"),
            Max("ts_max", alias_name="last_ts"),
        )
    )


def write_derived(lake_root: str, out_dir: str, name: str = "conversation_stats",
                  epoch: int | None = None) -> dict:
    """Materialize a derived table with lineage.

    Output layout (resumable: re-running for an already-derived source
    epoch is a no-op)::

        out_dir/epoch=<e>/part-*.parquet
        out_dir/_manifests/epoch=<e>.json   {source_epoch, rows, name}
    """
    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    mpath = os.path.join(out_dir, "_manifests", f"epoch={e}.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            return json.load(fh)

    ds = conversation_stats(lake_root, epoch=e)
    data_dir = os.path.join(out_dir, f"epoch={e}")
    ds.write_parquet(data_dir)
    rows = sum(
        pq.read_metadata(os.path.join(data_dir, f)).num_rows
        for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    info = {"name": name, "source_epoch": e, "rows": rows, "path": data_dir}
    _atomic_write_json(mpath, info)
    return info


def conversation_text(lake_root: str, epoch: int | None = None,
                      sep: str = "\n") -> "ray.data.Dataset":
    """Assemble each conversation's full text in turn order (SURVEY J5:
    CDS-per-transcript ordered assembly,
    ``/root/reference/src/etl/protein_sequence_etl.py:175-203`` —
    ``groupby(key).map_groups(sorted concat)``)."""
    from ..functions.pools import join_parts
    from ..stages.partition import str_key_part_col

    ds = read_lake(lake_root, epoch=epoch, columns=["conv_id", "turn_idx", "role", "text"])
    nparts = join_parts()

    def assemble_part(g: pd.DataFrame) -> pd.DataFrame:
        # all conversations of the partition in one C-speed groupby —
        # per-conv map_groups pays a Python call per conversation
        # (data-scaled)
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = g["role"].fillna("") + ": " + g["text"].fillna("")
        agg = (
            pd.DataFrame({"conv_id": g["conv_id"], "line": line})
            .groupby("conv_id", sort=False)
            .agg(n_turns=("line", "size"), dialogue=("line", sep.join))
            .reset_index()
        )
        agg["n_turns"] = agg["n_turns"].astype(np.int64)
        return agg[["conv_id", "n_turns", "dialogue"]]

    from ..stages.exchange import exchange_map_groups

    return exchange_map_groups(
        ds.map_batches(
            lambda t: str_key_part_col(t, "conv_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", lambda g: assemble_part(g.to_pandas()), nparts,
        drop_part_col=True)


def topic_descriptions(lake_root: str, epoch: int | None = None,
                       top_k: int = 3) -> "ray.data.Dataset":
    """Per-conversation salient-topic sentences — the DEEP
    gene-descriptions analogue (VERDICT r3 "missing #5"): the reference
    selects an entity's ontology terms against corpus-wide context,
    trims the list per category, and joins them with natural-language
    conjunction rules
    (``/root/reference/src/etl/gene_descriptions_etl.py:296-350``).
    Here the "ontology terms" are the conversation's most salient
    tokens: salience = tf·10⁶ // df — EXACT integer math on both sides
    so the DuckDB oracle hash-matches (a float idf would make near-tie
    ORDER BY unstable across engines) — trimmed to ``top_k`` with
    deterministic (salience DESC, token ASC) tie-break, then joined
    with the reference's comma/'and' rules ('a' / 'a' and 'b' /
    'a', 'b', and 'c').  Conversations with no tokens emit no row
    (the reference skips entities with no qualifying terms).

    TWO exchanges, no broadcast side at any scale:
      1. token-hash partition: all rows of one token co-locate, so ONE
         kernel computes tf per (conv, token) AND df per token — the
         tf×df join never happens as a join.
      2. conv-hash partition: per-conversation top-k trim + vectorized
         sentence assembly (scatter by rank, binary_join_element_wise).
    Shuffle volume is per-batch-distinct (conv, token) partials, the
    same envelope as the inverted-index build (``pipelines/inverted``,
    same single-space tokenizer).
    """
    from ..functions.pools import join_parts
    from ..stages.partition import str_key_part_col

    nparts = join_parts()
    live = read_lake(lake_root, epoch=epoch, columns=["conv_id", "text"])

    def pair_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        conv = t["conv_id"].take(parent.filter(keep))
        tok = flat.filter(keep)
        pairs = pa.table({"conv_id": conv, "token": tok})
        cnt = pairs.group_by(["conv_id", "token"]).aggregate(
            [("token", "count")])
        out = pa.table({"conv_id": cnt["conv_id"], "token": cnt["token"],
                        "n": pc.cast(cnt["token_count"], pa.int64())})
        return str_key_part_col(out, "token", nparts, out="tpart")

    def salience_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"conv_id": pa.array([], pa.string()),
                          "token": pa.array([], pa.string()),
                          "sal": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        n = g["n"].to_numpy(zero_copy_only=False)
        # factorize strings ONCE (np.unique codes are lexically ordered)
        # so the multi-key sort runs on int codes — an object-dtype
        # lexsort pays a Python comparison per element (the fold
        # fast-path lesson, stages/fold.py)
        conv_u, conv = np.unique(
            g["conv_id"].to_numpy(zero_copy_only=False), return_inverse=True)
        tok_u, tok = np.unique(
            g["token"].to_numpy(zero_copy_only=False), return_inverse=True)
        order = np.lexsort((conv, tok))
        conv, tok, n = conv[order], tok[order], n[order]
        # segment = one (token, conv): sum the per-batch partial counts
        new_pair = np.concatenate(
            [[True], (tok[1:] != tok[:-1]) | (conv[1:] != conv[:-1])])
        starts = np.nonzero(new_pair)[0]
        csum = np.concatenate(([0], np.cumsum(n)))
        bounds = np.append(starts, len(n))
        tf = csum[bounds[1:]] - csum[bounds[:-1]]
        ptok, pconv = tok[starts], conv[starts]
        # df = number of (token, conv) segments per token
        new_tok = np.concatenate([[True], ptok[1:] != ptok[:-1]])
        tok_seg = np.cumsum(new_tok) - 1
        df = np.bincount(tok_seg)[tok_seg]
        sal = tf * 1_000_000 // df
        return pa.table({"conv_id": pa.array(conv_u[pconv], pa.string()),
                         "token": pa.array(tok_u[ptok], pa.string()),
                         "sal": pa.array(sal.astype(np.int64), pa.int64())})

    def describe_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"conv_id": pa.array([], pa.string()),
                          "description": pa.array([], pa.string()),
                          "n_terms": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        sal = g["sal"].to_numpy(zero_copy_only=False)
        # int codes for the multi-key sort (np.unique order is lexical,
        # preserving the oracle's "ORDER BY sal DESC, token" tie-break)
        conv_u, conv_c = np.unique(
            g["conv_id"].to_numpy(zero_copy_only=False), return_inverse=True)
        tok_u, tok_c = np.unique(
            g["token"].to_numpy(zero_copy_only=False), return_inverse=True)
        order = np.lexsort((tok_c, -sal, conv_c))
        conv, tok = conv_c[order], tok_u[tok_c[order]]
        new_conv = np.concatenate([[True], conv[1:] != conv[:-1]])
        seg = np.cumsum(new_conv) - 1
        starts = np.nonzero(new_conv)[0]
        rank = np.arange(len(conv)) - starts[seg]
        keep = rank < top_k
        seg_k, rank_k, tok_k = seg[keep], rank[keep], tok[keep]
        n_seg = len(starts)
        n_terms = np.bincount(seg_k, minlength=n_seg).astype(np.int64)
        # scatter tokens by rank into (n_seg, top_k) slots
        slots = np.full((n_seg, top_k), "", dtype=object)
        slots[seg_k, rank_k] = tok_k
        t1, t2, t3 = (slots[:, i] if i < top_k else
                      np.full(n_seg, "", dtype=object) for i in range(3))
        one = "'" + t1 + "'"
        two = "'" + t1 + "' and '" + t2 + "'"
        three = "'" + t1 + "', '" + t2 + "', and '" + t3 + "'"
        joined = np.where(n_terms == 1, one, np.where(n_terms == 2, two, three))
        conv_out = conv_u[conv[starts]]
        desc = pc.binary_join_element_wise(
            pa.scalar("Conversation "), pa.array(conv_out, pa.string()),
            pa.scalar(" mainly discusses "),
            pa.array(joined.astype(object), pa.string()), pa.scalar("."), "")
        return pa.table({"conv_id": pa.array(conv_out, pa.string()),
                         "description": desc,
                         "n_terms": pa.array(n_terms, pa.int64())})

    from ..stages.exchange import exchange_map_groups

    sal = exchange_map_groups(
        live.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        "tpart", salience_part, nparts, drop_part_col=True)
    return exchange_map_groups(
        sal.map_batches(
            lambda t: str_key_part_col(t, "conv_id", nparts),
            batch_format="pyarrow", zero_copy_batch=True),
        "gpart", describe_part, nparts, drop_part_col=True)


def conversation_descriptions(lake_root: str, epoch: int | None = None,
                              derived_root: str | None = None) -> "ray.data.Dataset":
    """Generated natural-language description per conversation — the
    gene-descriptions analogue (SURVEY §3.2 / T7: per-entity text
    generated against corpus-wide context,
    ``/root/reference/src/etl/gene_descriptions_etl.py:93-155`` — the
    generator is constructed once per worker with global conf/ontology
    state, then runs per entity).

    Corpus-wide aggregates (mean turns / chars — a genuinely tiny side)
    are computed first and broadcast; the Describe actor assembles the
    sentence fully vectorized (binary_join_element_wise), no Python per
    row.  Deterministic: same lake state → same descriptions.

    ``derived_root``: when the dependency-group scheduler
    (``config.run_derived_groups``) provides its output root and the
    upstream ``conversation_stats`` artifact for this epoch is already
    materialized there, the stats are READ from that parquet instead of
    recomputed from the lake — the declared ``depends_on`` consumes the
    actual barrier-ordered artifact (the reference's etl_groups
    contract), and the stats scan is paid once per epoch, not once per
    downstream pipeline.
    """
    import numpy as np

    import ray

    stats = None
    if derived_root is not None:
        e = (LakeManifest(lake_root).last_committed_epoch()
             if epoch is None else epoch)
        mpath = os.path.join(derived_root, "conversation_stats",
                             "_manifests", f"epoch={e}.json")
        data_dir = os.path.join(derived_root, "conversation_stats",
                                f"epoch={e}")
        if os.path.exists(mpath) and os.path.isdir(data_dir):
            stats = ray.data.read_parquet(data_dir).materialize()
    if stats is None:
        stats = conversation_stats(lake_root, epoch=epoch).materialize()
    tot = stats.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "turns": pa.array([pc.sum(t["n_turns"]).as_py() or 0], pa.int64()),
            "chars": pa.array([pc.sum(t["total_chars"]).as_py() or 0], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    n_conv = tot.sum("n") or 1
    mean_turns = (tot.sum("turns") or 0) / n_conv
    mean_chars = (tot.sum("chars") or 0) / n_conv
    ref = ray.put((mean_turns, mean_chars))

    class Describe:
        def __init__(self, ref):
            self.mean_turns, self.mean_chars = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            n_turns = t["n_turns"].to_numpy(zero_copy_only=False)
            chars = t["total_chars"].to_numpy(zero_copy_only=False)
            tools = t["n_tool_turns"].to_numpy(zero_copy_only=False)
            rel = np.where(n_turns > self.mean_turns, "longer than", "at or below")
            desc = pc.binary_join_element_wise(
                pa.scalar("Conversation "), pc.cast(t["conv_id"], pa.string()),
                pa.scalar(" has "), pa.array(n_turns.astype(str), pa.string()),
                pa.scalar(" turns ("), pa.array(rel, pa.string()),
                pa.scalar(" the corpus mean), "),
                pa.array(tools.astype(str), pa.string()),
                pa.scalar(" tool turns, and "),
                pa.array(chars.astype(str), pa.string()),
                pa.scalar(" characters of text."), "")
            return pa.table({"conv_id": t["conv_id"], "description": desc,
                             "n_turns": t["n_turns"]})

    from ..functions.pools import pool

    return stats.map_batches(Describe, fn_constructor_args=(ref,),
                             batch_format="pyarrow", concurrency=pool())
