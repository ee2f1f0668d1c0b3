"""End-to-end training-data corpus cleaning: the operators composed.

quality-score → language-ID → exact dedup → MinHash-LSH near-dup
removal → optional test-set decontamination → partitioned Parquet output
with a stage-count manifest.  This
is the "every pipeline a user of the reference runs today" composition
for the training-data side of the engine: each stage is a Ray Data
transform from ``stages/`` and the output is resumable (manifest first,
skip-if-done).

Scale shape: the only shuffles are the exact-dedup groupby (hash of
normalized text) and the LSH bucket exchange over tiny (band, hash)
rows; documents themselves stream once.  Near-dup group resolution is
HYBRID: a candidate-pair list under ``_PAIR_DRIVER_LIMIT`` union-finds
on the driver (bounded state, zero extra exchanges); above the limit
the distributed min-label propagation
(``stages/dedup.resolve_duplicate_groups_distributed``) runs and the
non-minimal members drop via a hash-partitioned left_anti join — pair
state is never unbounded driver memory.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.tables import read_table
from ..stages.dedup import minhash_lsh_candidates, resolve_duplicate_groups_distributed
from ..stages.partition import stable_hash_strings
from ..stages.text import LangId, token_quality_batch
from ..state.manifest import _atomic_write_json

#: pair-count bound for driver-side union-find; above it resolution runs
#: as distributed min-label propagation (16 B/pair → ≤ ~32 MiB driver)
_PAIR_DRIVER_LIMIT = 2_000_000


def build_clean_corpus(sf_dir: str, out_dir: str, min_tokens: int = 10,
                       lang: str = "en",
                       benchmark_source: str | None = None) -> dict:
    """documents → cleaned corpus parquet + stage-count manifest.

    Idempotent: an existing ``_MANIFEST.json`` short-circuits (resume).

    ``benchmark_source``: when set, documents from that source are the
    held-out evaluation set — they are excluded from the corpus, and any
    training document sharing a token 4-gram with them is dropped
    (test-set decontamination, ``stages/decontam.py``).
    """
    mpath = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            return json.load(fh)

    from ..functions.tables import table_path
    import pyarrow.parquet as pq

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    # input count from parquet footer metadata — no extra dataset pass
    n_input = pq.read_metadata(table_path(sf_dir, "documents")).num_rows

    # 1. quality scoring + filter (vectorized kernel)
    scored = ds.map_batches(token_quality_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    import pyarrow.compute as pc

    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"], min_tokens)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # 2. language ID (actor pool) + filter
    from ..functions.pools import join_parts, pool

    lang_kept = kept.map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(),
    ).map_batches(
        lambda t: t.filter(pc.equal(t["pred_lang"], lang)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # 3. exact dedup by normalized text hash (first-writer/min-doc_id wins,
    #    in-group norm-text equality confirm so a 64-bit collision cannot
    #    merge unrelated docs).  Exchange shape: hash partitions +
    #    vectorized lexsort survivors kernel per partition — same design
    #    as dedup_exact_text (queries.py) and the closure min-merge, never
    #    per-text-hash map_groups.
    nparts = join_parts()

    def add_hash(t: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(t["text"]))
        h = stable_hash_strings(norm.combine_chunks()).astype(np.int64)
        t = t.append_column("text_hash", pa.array(h))
        return t.append_column(
            "part", pa.array(((h.astype(np.uint64)) % nparts).astype(np.int32)))

    def survivors_part(g: pa.Table) -> pa.Table:
        h = g["text_hash"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        norm = np.asarray(
            pc.utf8_lower(pc.utf8_trim_whitespace(
                g["text"].combine_chunks())).to_numpy(zero_copy_only=False),
            dtype=object)
        order = np.lexsort((doc, norm, h))
        hs, ns = h[order], norm[order]
        first = np.concatenate([[True], (hs[1:] != hs[:-1]) | (ns[1:] != ns[:-1])])
        return g.take(pa.array(order[first])).drop_columns(["part"])

    from ..stages.exchange import exchange_map_groups

    exact_unique = exchange_map_groups(
        lang_kept.map_batches(add_hash, batch_format="pyarrow",
                              zero_copy_batch=True),
        "part", survivors_part, nparts)
    # pin: reused by the near-dup pass AND the final write
    exact_unique = exact_unique.materialize()
    n_exact = exact_unique.count()

    # 4. near-dup removal: LSH candidates → duplicate-group resolution →
    #    drop non-minimal members.  Hybrid resolution (bounded-broadcast
    #    contract): a pair list under _PAIR_DRIVER_LIMIT is
    #    union-found on the driver (bounded memory, no per-round
    #    exchanges); above it the distributed min-label propagation runs
    #    and the drop side becomes a hash-partitioned left_anti join.
    from ..stages.dedup import resolve_duplicate_groups

    pairs = minhash_lsh_candidates(
        exact_unique.map_batches(
            lambda t: t.select(["doc_id", "text"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    ).materialize()
    n_pairs = pairs.count()

    stream = exact_unique
    if n_pairs <= _PAIR_DRIVER_LIMIT:
        pair_df = pairs.to_pandas()
        roots = resolve_duplicate_groups(list(zip(pair_df["id_a"], pair_df["id_b"])))
        drop = {d for d, root in roots.items() if d != root}
        drop_arr = pa.array(np.fromiter(drop, dtype=np.int64)) if drop else pa.array([], pa.int64())
        final = stream.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=drop_arr))),
            batch_format="pyarrow",
        )
    else:
        labels = resolve_duplicate_groups_distributed(pairs)
        drop_ds = labels.map_batches(
            lambda t: pa.table({"drop_id": t.filter(
                pc.not_equal(t["doc_id"], t["group"]))["doc_id"]}),
            batch_format="pyarrow",
        )
        from ..stages.attach import exchange_semi

        final = exchange_semi(stream, drop_ds, "doc_id", keys_key="drop_id",
                              anti=True, nparts=join_parts())
    final = final.map_batches(
        lambda t: t.select(["doc_id", "text", "source", "n_tokens", "stop_ratio", "en_ratio"]),
        batch_format="pyarrow",
    )

    # 5. test-set decontamination (optional): drop benchmark docs and any
    #    training doc overlapping them on a token 4-gram.  The hit list is
    #    usually tiny (broadcast is_in); a pathological corpus where most
    #    docs are contaminated flips to a left_anti join — and an empty
    #    hit list skips the stage (Dataset.join rejects an empty side).
    n_contaminated = 0
    n_bench_excluded = 0
    if benchmark_source is not None:
        from ..stages.decontam import contaminated_docs

        # output-scale materializations: `train` feeds both the hit scan
        # and the write, so this avoids recomputing stages 1-4 twice and
        # makes the stage counts metadata-only
        final = final.materialize()
        n_after_neardup = final.count()
        bench_ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["source"], benchmark_source))
                       .select(["doc_id", "text"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        train = final.map_batches(
            lambda t: t.filter(pc.not_equal(t["source"], benchmark_source)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        n_bench_excluded = n_after_neardup - train.count()
        hits = contaminated_docs(train, bench_ds, k=4).materialize()
        n_contaminated = hits.count()
        if n_contaminated == 0:
            final = train
        elif n_contaminated <= _PAIR_DRIVER_LIMIT:
            hit_arr = pa.array(hits.to_pandas()["doc_id"].to_numpy())
            final = train.map_batches(
                lambda t: t.filter(pc.invert(
                    pc.is_in(t["doc_id"], value_set=hit_arr))),
                batch_format="pyarrow",
            )
        else:
            from ..stages.attach import exchange_semi

            final = exchange_semi(train, hits, "doc_id", anti=True,
                                  nparts=join_parts())

    data_dir = os.path.join(out_dir, "data")
    final.write_parquet(data_dir)
    import pyarrow.parquet as pq

    n_final = sum(
        pq.read_metadata(os.path.join(data_dir, f)).num_rows
        for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    info = {
        "input_docs": n_input,
        "after_exact_dedup": n_exact,
        "near_dup_removed": n_exact - n_final - n_contaminated - n_bench_excluded,
        "benchmark_excluded": n_bench_excluded,
        "contaminated_removed": n_contaminated,
        "final_docs": n_final,
        "path": data_dir,
    }
    _atomic_write_json(mpath, info)
    return info
