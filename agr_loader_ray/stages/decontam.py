"""Test-set decontamination: token n-gram overlap against a benchmark set.

The standard LLM-training hygiene pass: any training document sharing a
token n-gram with an evaluation/benchmark document is flagged (and
usually dropped) before export.  Reference analogue: the IN-list
semi-join drop pattern (SURVEY J7,
``/root/reference/src/etl/generic_anatomical_structure_etl.py:38-54`` —
keep/drop rows by membership in a curated identifier set), recast over
n-gram keys.

Ray-Data-first shape:

- Both sides shingle VECTORIZED: one ``split_pattern`` pass, SipHash the
  flat token stream once, then a k-bounded polynomial combine over
  window offsets — no per-doc Python.
- The benchmark side is distinct-reduced per batch and collected to a
  single hash array (benchmark suites are small by definition — the
  documented small-side contract, same as the IVF centroid pull).
- HYBRID membership, same dispatch as ``stages/dedup``: benchmark sets
  ≤ ``broadcast_limit`` hashes ride ``ray.put`` + per-actor
  ``np.isin`` (sorted-array membership) inside ``map_batches``; larger
  sets flip to a distributed ``left_semi`` join on the shingle hash so
  driver state stays bounded at any benchmark size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_F = np.uint64(1099511628211)  # FNV prime, same wrap-mod-2^64 family as dedup

#: above this many distinct benchmark shingles the broadcast array stops
#: being "small-side" (≈16 MB of uint64) and membership becomes a
#: distributed semi-join — mirrors ``dedup.HYBRID_BUCKET_LIMIT``.
BROADCAST_LIMIT = 2_000_000


def token_ngram_hashes(texts, k: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, window_hash) for every token k-gram in the batch.

    Shingle identity is the polynomial combine of the k token SipHashes
    (collision probability ~n²/2^64 — negligible against string
    identity at any realistic scale).
    """
    toks = pc.split_pattern(texts, " ")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    off = flat.offsets.to_numpy().astype(np.int64)
    counts = np.diff(off)
    vals = flat.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
    n = len(counts)
    nw = np.maximum(counts - (k - 1), 0)
    total = int(nw.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    th = pd.util.hash_array(vals, categorize=True)  # stable SipHash, uint64
    starts = off[:-1] - off[0]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), nw)
    cum = np.concatenate(([0], np.cumsum(nw)[:-1]))
    pos = (np.arange(total, dtype=np.int64) - np.repeat(cum, nw)
           + np.repeat(starts, nw))
    with np.errstate(over="ignore"):
        h = np.zeros(total, dtype=np.uint64)
        for j in range(k):  # k-bounded, not data-bounded
            h = h * _F + th[pos + j]
    return doc_idx, h


def distinct_doc_ngrams(t: pa.Table, k: int = 4,
                        id_col: str = "doc_id") -> pa.Table:
    """Per-doc DISTINCT shingle hashes of a batch → (id, h) rows."""
    doc_idx, h = token_ngram_hashes(t["text"], k)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    if len(h) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "h": pa.array([], pa.uint64())})
    codes, _ = pd.factorize(h)
    ncodes = int(codes.max()) + 1
    uniq = np.unique(doc_idx * ncodes + codes)
    u_doc, u_code = uniq // ncodes, uniq % ncodes
    # map codes back to hashes: first occurrence index per code
    code_to_hash = np.zeros(ncodes, dtype=np.uint64)
    code_to_hash[codes] = h
    return pa.table({id_col: pa.array(ids[u_doc], pa.int64()),
                     "h": pa.array(code_to_hash[u_code], pa.uint64())})


def _bench_shingles(bench_ds, k: int = 4):
    """Per-batch-distinct benchmark shingle hashes as a Dataset (no
    driver materialization — shared by both dispatch paths)."""
    def distinct_part(t: pa.Table) -> pa.Table:
        _, h = token_ngram_hashes(t["text"], k)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    return bench_ds.map_batches(distinct_part, batch_format="pyarrow",
                                zero_copy_batch=True)


def collect_benchmark_hashes(bench_ds, k: int = 4,
                             limit: int | None = None) -> np.ndarray:
    """Distinct shingle hashes of the benchmark set (small-side pull:
    per-batch distinct first, so the driver sees deduplicated arrays;
    the pull is guarded by ``assert_bounded``)."""
    from ..functions.bounds import assert_bounded

    df = _bench_shingles(bench_ds, k).to_pandas()
    assert_bounded(len(df), "decontam benchmark shingle pull",
                   **({"limit": limit} if limit is not None else {}))
    return np.unique(df["h"].to_numpy())


def contaminated_docs(train_ds, bench_ds, k: int = 4,
                      broadcast_limit: int = BROADCAST_LIMIT):
    """→ Dataset(doc_id, n_contaminated): training docs sharing ≥1 token
    k-gram with the benchmark set, with the distinct-overlap count."""
    import ray

    from ..functions.pools import task_stage

    # the size decision is a DISTRIBUTED count (per-batch-distinct row
    # count, an upper bound on the global distinct), so no driver
    # materialization happens before the dispatch — the broadcast pull
    # below runs only once the bound is already known to hold
    bench_sh = _bench_shingles(bench_ds, k)
    if bench_sh.count() <= broadcast_limit:
        from ..functions.bounds import assert_bounded

        df = bench_sh.to_pandas()
        assert_bounded(len(df), "decontam benchmark shingle broadcast")
        bench = np.unique(df["h"].to_numpy())
        ref = ray.put(bench)  # once; read per actor, not per batch

        class Contam:
            def __init__(self, ref):
                self.bench = ray.get(ref)  # sorted by np.unique

            def __call__(self, t: pa.Table) -> pa.Table:
                d = distinct_doc_ngrams(t, k)
                if d.num_rows == 0:
                    return pa.table({"doc_id": pa.array([], pa.int64()),
                                     "n_contaminated": pa.array([], pa.int64())})
                hit = np.isin(d["h"].to_numpy(zero_copy_only=False),
                              self.bench, assume_unique=False)
                ids = d["doc_id"].to_numpy(zero_copy_only=False)
                u, inv = np.unique(ids, return_inverse=True)
                cnt = np.bincount(inv, weights=hit).astype(np.int64)
                keep = cnt > 0
                return pa.table({"doc_id": pa.array(u[keep], pa.int64()),
                                 "n_contaminated": pa.array(cnt[keep], pa.int64())})

        return train_ds.map_batches(task_stage(Contam, ref),
                                    batch_format="pyarrow", zero_copy_batch=True)

    # scale path: distributed semi-join on the shingle hash
    from ray.data.aggregate import Count

    train_sh = train_ds.map_batches(lambda t: distinct_doc_ngrams(t, k),
                                    batch_format="pyarrow", zero_copy_batch=True)
    # bench_sh reused from the dispatch count above (same per-batch
    # distinct shape; duplicate hashes across batches are harmless to
    # the semi-join)
    from ..functions.pools import join_parts
    from .attach import exchange_semi

    hits = exchange_semi(train_sh, bench_sh, "h", nparts=join_parts())
    return hits.groupby("doc_id").aggregate(Count(alias_name="n_contaminated"))
