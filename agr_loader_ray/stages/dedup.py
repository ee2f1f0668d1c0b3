"""Deduplication family for training-data pipelines.

Exact, MinHash+LSH, SimHash and n-gram-Jaccard near-dup — each expressed
Ray-Data-first:

- **exact**: content-hash per batch (vectorized) → hash-partitioned
  ``groupby(hash).map_groups(first)`` — the reference's dict-dedup
  (``/root/reference/src/etl/bgi_etl.py:392-393``) at scale (SURVEY D1).
- **MinHash+LSH**: shingle → minhash signature per batch → explode to
  (band_id, band_hash, doc_id) rows → ``groupby(band)`` buckets →
  candidate pairs → exact-Jaccard verify.  The only shuffle moves tiny
  (band_hash, doc_id) rows, never the documents.
- **SimHash**: 64-bit signature; near-dup via banded grouping on 16-bit
  chunks (hamming ≤ 3 ⇒ at least one of 4 chunks equal).
- duplicate-group resolution: min-doc_id label via union-find over the
  verified pair list (candidate pairs are a tiny side; documented
  assumption — at 100 TB run label propagation rounds instead).

All signature math is numpy-vectorized over Arrow batches; documents
themselves never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.pools import pool
from .partition import stable_hash_strings

_PRIME = np.uint64((1 << 61) - 1)

_MULT64 = np.uint64(0x9E3779B97F4A7C15)

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 lacks bitwise_count)."""
    return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int64)


def _hash_part_col(t: pa.Table, key_col: str, nparts: int,
                   out: str = "part") -> pa.Table:
    """Append a bounded hash-partition column derived from ``key_col`` —
    the exchange key for the groupby(part) + vectorized-kernel pattern
    (per-key ``groupby().aggregate``/``map_groups`` over 10^5+ tiny
    groups measured 25-40 s where this shape runs in ~2 s)."""
    k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        part = ((k * _MULT64) >> np.uint64(33)) % np.uint64(nparts)
    return t.append_column(out, pa.array(part.astype(np.int32)))


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingles of a document.

    The polynomial runs over Unicode CODE POINTS (one UTF-32 decode per
    doc), not UTF-8 bytes, so the DuckDB sketch oracles — which see
    characters via ``unicode(substring(...))`` — mirror it exactly for
    any input text (``pipelines/sketch_sql.py``).

    Sub-k docs hash to ONE window: the same polynomial over the doc's
    full (shorter) length — SQL-expressible with k-1 guarded terms, so
    the minhash-family oracles cover ALL docs (empty text → 0)."""
    if text is None or len(text) < k:
        cp = np.frombuffer((text or "").encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        mult = np.power(np.uint64(1099511628211),
                        np.arange(len(cp), dtype=np.uint64))
        with np.errstate(over="ignore"):
            h = (cp * mult).sum(dtype=np.uint64) if len(cp) else np.uint64(0)
        return np.array([h], dtype=np.uint64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    # rolling window view → hash each k-codepoint window (vectorized dot)
    win = np.lib.stride_tricks.sliding_window_view(cp, k)
    mult = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        return (win * mult).sum(axis=1, dtype=np.uint64)


class MinHasher:
    """Actor-pool stage: doc → minhash signature (num_perm × uint64).

    Permutation parameters are derived once per actor in ``__init__``
    (SURVEY §2.3: stateful setup once per worker).
    """

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _PRIME, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _PRIME, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k) % _PRIME
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) permuted hashes → min over shingles
            perm = (np.outer(self.a, h) + self.b[:, None]) % _PRIME
        return perm.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signatures, fully vectorized: concatenate
        all docs' shingle hashes, permute once, segment-min per doc via
        ``np.minimum.reduceat`` — no per-doc Python in the hot path."""
        shingles = [_shingle_hashes(t, self.k) % _PRIME for t in texts]
        lengths = np.array([len(s) for s in shingles], dtype=np.int64)
        h_all = np.concatenate(shingles) if shingles else np.empty(0, np.uint64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        with np.errstate(over="ignore"):
            perm = (self.a[:, None] * h_all[None, :] + self.b[:, None]) % _PRIME
        sig = np.minimum.reduceat(perm, starts, axis=1)  # (num_perm, n_docs)
        return sig.T

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["minhash"] = list(self.signatures_batch(batch["text"].tolist()))
        return batch


def _dedup_pairs(cand: "ray.data.Dataset", extra_cols: list[str] = []) -> "ray.data.Dataset":
    """Exact distinct over (id_a, id_b) pair rows — ONE hash-partition
    exchange + a per-partition lexsort dedup kernel, never per-pair
    aggregation (candidate sets reach 10^5+ pairs; per-pair
    ``groupby().aggregate`` over that many groups measured 25-40 s where
    this shape runs in ~2 s).  The first occurrence of each pair keeps
    any extra columns (``extra_cols`` kept for API compatibility —
    duplicates of a pair come from different bands and carry equal
    extras, so first ≡ min)."""
    from ..functions.pools import join_parts as _jp

    nparts = _jp()

    def add_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = (a * _MULT64) ^ b
            part = ((key * _MULT64) >> np.uint64(33)) % np.uint64(nparts)
        return t.append_column("ppart", pa.array(part.astype(np.int32)))

    def distinct_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            # a globally-empty candidate set reaches the reduce as a
            # schema-less zero-column block — nothing to drop there
            return (g.drop_columns(["ppart"])
                    if "ppart" in g.column_names else g)
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        first = np.concatenate(
            [[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
        return g.take(pa.array(order[first])).drop_columns(["ppart"])

    from .exchange import exchange_map_groups

    return exchange_map_groups(
        cand.map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True),
        "ppart", distinct_part, nparts)


def minhash_lsh_candidates(ds: "ray.data.Dataset", num_perm: int = 64, bands: int = 16,
                           k: int = 5, id_col: str = "doc_id",
                           max_bucket: int = 64,
                           dedup: bool = True) -> "ray.data.Dataset":
    """docs(text) → candidate near-dup pairs via banded LSH.

    bands=16 over 64 perms (r=4 rows/band) targets Jaccard ≳ 0.5.
    Returns a Dataset of {id_a, id_b} with id_a < id_b (deduped when
    ``dedup=True``; with ``dedup=False`` the same pair may appear once
    per colliding band — callers that verify-then-threshold dedup later,
    saving this path's second exchange).

    ``max_bucket``: buckets larger than this are skipped (boilerplate
    guard — a bucket of s docs expands to s(s-1)/2 pairs; oversized
    buckets indicate near-identical boilerplate better handled by exact
    dedup).  Deterministic; NOT a silent cap — skipped buckets are those
    whose (band, bhash) collision count exceeds the threshold, and the
    threshold is part of the operator contract.

    ONE all-to-all exchange: the signature map emits (id, bkey, bpart)
    with bpart = hash(bkey) % nparts, the groupby(bpart) co-locates each
    bucket, and the per-partition kernel sorts, segments and expands
    colliding buckets in one vectorized pass.  (An earlier shape
    prefiltered colliding buckets with a count exchange + broadcast
    before a second survivor exchange — but singleton-dominated count
    partials are the SAME cardinality as the banded rows, so the
    prefilter shuffled as many bytes and paid an extra round plus two
    materializations; the size filter lives in the expansion kernel for
    free.)
    """
    rows_per_band = num_perm // bands

    import pyarrow as _pa

    from ..functions.pools import join_parts as _join_parts

    nparts = _join_parts()

    class BandExplode(MinHasher):
        def __call__(self, batch: pa.Table) -> pa.Table:
            sigs = self.signatures_batch(batch["text"].to_pylist())  # (n, num_perm)
            n = sigs.shape[0]
            # (n, bands, r): mix each band's r rows with an order-dependent
            # xor-multiply — vectorized across docs and bands
            chunks = sigs.reshape(n, bands, rows_per_band)
            F = np.uint64(1099511628211)
            with np.errstate(over="ignore"):
                bh = np.zeros((n, bands), dtype=np.uint64)
                for r in range(rows_per_band):
                    bh = bh * F ^ chunks[:, :, r]
                # bucket key mixes the band index in (same derivation as
                # the pre-fuse bucket_key map — identical bucket sets)
                bkey = ((bh * _MULT64)
                        ^ np.arange(bands, dtype=np.uint64)[None, :]).reshape(-1)
                part = ((bkey * _MULT64) >> np.uint64(33)) % np.uint64(nparts)
            ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), bands)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "bkey": pa.array(bkey.astype(np.int64)),
                    "bpart": pa.array(part.astype(np.int32)),
                }
            )

    # stateless tasks, not an actor pool: the hasher's state (two small
    # parameter vectors) is trivially picklable, and task pools reach full
    # parallelism immediately where an autoscaling pool ramps from 1
    survivors = ds.map_batches(
        BandExplode(num_perm=num_perm, k=k),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def pairs_part(g: _pa.Table) -> _pa.Table:
        # vectorized over ALL buckets in the partition: sort rows by
        # (bkey, id), segment into runs, expand each run's upper triangle
        empty = _pa.table({"id_a": _pa.array([], _pa.int64()),
                           "id_b": _pa.array([], _pa.int64())})
        if g.num_rows == 0:
            return empty
        bk = g["bkey"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bks, idss = bk[order], ids[order]
        starts = np.nonzero(np.concatenate([[True], bks[1:] != bks[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(bks)))
        out_a, out_b = [], []
        for st, sz in zip(starts, sizes):
            if sz < 2 or sz > max_bucket:
                continue
            seg = idss[st:st + sz]
            ai, bi = np.triu_indices(sz, k=1)
            out_a.append(seg[ai])
            out_b.append(seg[bi])
        if not out_a:
            return empty
        return _pa.table({"id_a": _pa.array(np.concatenate(out_a), _pa.int64()),
                          "id_b": _pa.array(np.concatenate(out_b), _pa.int64())})

    from .exchange import exchange_map_groups

    cand = exchange_map_groups(survivors, "bpart", pairs_part, nparts)
    # dedup identical pairs found by multiple bands
    out = _dedup_pairs(cand) if dedup else cand
    # typed seed LAST: a collision-free corpus yields zero rows, and an
    # executed empty map stage reports schema None — the leading union
    # input pins the typed schema without touching the data path
    return ray.data.from_arrow(
        _pa.table({"id_a": _pa.array([], _pa.int64()),
                   "id_b": _pa.array([], _pa.int64())})).union(out)


def jaccard_ngram(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity (the verify step)."""
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


#: bounds for the verify stage's broadcast text attachment: the pair
#: list may be pulled to the driver up to VERIFY_BROADCAST_PAIR_LIMIT
#: rows (16 B/pair -> ~32 MB), and the id->text map broadcasts only if
#: the DISTINCT referenced docs stay under VERIFY_BROADCAST_TEXT_LIMIT
#: (~250 MB object at 500 B/doc).  Above either bound, two hash joins
#: attach texts instead (never unbounded driver/object-store state).
VERIFY_BROADCAST_PAIR_LIMIT = 2_000_000
VERIFY_BROADCAST_TEXT_LIMIT = 500_000

#: per-WORKER-PROCESS verify state: {ref_hex: (texts, shingle_sets)} —
#: the T1 lookup-singleton pattern as a task-pool cache.  Single-entry
#: (latest ref wins) so one run's id→set memo never outlives its
#: broadcast texts object.
_VERIFY_WORKER_STATE: dict = {}


def _worker_verify_state(ref):
    key = ref.hex() if callable(getattr(ref, "hex", None)) else str(ref)
    st = _VERIFY_WORKER_STATE.get(key)
    if st is None:
        _VERIFY_WORKER_STATE.clear()
        st = _VERIFY_WORKER_STATE[key] = (ray.get(ref), {})
    return st


def verify_pairs_jaccard(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard verification of candidate pairs (the LSH
    false-positive filter).  Returns {id_a, id_b, jaccard} with
    jaccard ≥ threshold.

    HYBRID text attachment (bounded broadcast state, never
    unbounded driver memory — the decontam/closure hybrid contract):
    a candidate set under ``VERIFY_BROADCAST_PAIR_LIMIT`` pulls only the
    REFERENCED texts in one streaming filter pass over docs and
    broadcasts the id→text map (``ray.put`` once, fetched once per
    actor) — no join exchange at all; a larger candidate set goes
    through two hash joins.  Either way the per-pair shingle-set
    Jaccard runs inside map_batches, bounded by the candidate count —
    the verify stage is already past the corpus-scale prune.

    ``distinct=False`` declares that the candidate set may repeat a pair
    (one occurrence per colliding LSH band — ``minhash_lsh_candidates``
    with ``dedup=False``): the broadcast path dedups driver-side on the
    ALREADY-pulled pair table (a lexsort over rows already in hand,
    replacing the upstream ``_dedup_pairs`` exchange); the join path
    runs the distributed pair dedup first."""
    from ..functions.pools import join_parts

    pairs = pairs.materialize()
    if pairs.count() == 0:
        # a corpus can legitimately produce zero candidates (e.g. every
        # doc shorter than the shingle width) — emit the typed empty
        # result instead of feeding concat_tables zero batches
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))
    use_broadcast = pairs.count() <= VERIFY_BROADCAST_PAIR_LIMIT
    if use_broadcast:
        pair_tbl = pa.concat_tables(
            pairs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        if not distinct and pair_tbl.num_rows:
            a = pair_tbl["id_a"].to_numpy(zero_copy_only=False)
            b = pair_tbl["id_b"].to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a))
            a_s, b_s = a[order], b[order]
            first = np.concatenate(
                [[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
            pair_tbl = pair_tbl.take(pa.array(order[first]))
        ids = np.unique(np.concatenate([
            pair_tbl["id_a"].to_numpy(zero_copy_only=False),
            pair_tbl["id_b"].to_numpy(zero_copy_only=False),
        ])) if pair_tbl.num_rows else np.empty(0, np.int64)
        use_broadcast = len(ids) <= VERIFY_BROADCAST_TEXT_LIMIT
    if use_broadcast:
        import ray as _ray

        ids_arr = pa.array(ids)
        needed = docs.map_batches(
            lambda t: pa.table({
                "id": t[id_col], "text": t[text_col]
            }).filter(pc.is_in(t[id_col], value_set=ids_arr)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        texts: dict = {}
        for b in needed.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            texts.update(zip(b["id"].to_pylist(), b["text"].to_pylist()))
        ref = _ray.put(texts)

        def score_broadcast(t: pa.Table) -> pa.Table:
            texts, sets = _worker_verify_state(ref)
            ja = np.empty(t.num_rows)
            for i, (a, b) in enumerate(zip(t["id_a"].to_pylist(),
                                           t["id_b"].to_pylist())):
                sa = sets.get(a)
                if sa is None:
                    sa = sets[a] = np.unique(
                        _shingle_hashes(texts.get(a, ""), k))
                sb = sets.get(b)
                if sb is None:
                    sb = sets[b] = np.unique(
                        _shingle_hashes(texts.get(b, ""), k))
                if len(sa) > len(sb):
                    sa, sb = sb, sa
                loc = np.searchsorted(sb, sa)
                loc[loc == len(sb)] = len(sb) - 1 if len(sb) else 0
                inter = int((sb[loc] == sa).sum()) if len(sb) else 0
                union = len(sa) + len(sb) - inter
                ja[i] = inter / union if union else 0.0
            keep = ja >= threshold
            return pa.table({
                "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
                "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
                "jaccard": pa.array(ja[keep], pa.float64()),
            })

        # score the driver-pulled pair table re-sliced into ~8k-row
        # blocks: the upstream exchange leaves only nparts (~8) blocks,
        # which caps map_batches at 8-way parallelism on 32 CPUs — the
        # measured bottleneck of ppjoin's verify stage at sf0.1 (4.5 s
        # of a 6.7 s query; re-sliced it spreads across the task pool).
        # distinct=False additionally deduped pair_tbl driver-side above.
        # slice count targets ~4 tasks per CPU: full task-pool
        # parallelism (the 8-block input capped the scan at 8-way,
        # measured 4.5 s of ppjoin's 6.7 s) with bounded per-task
        # launch overhead at any pair count
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        step = max(4096, -(-pair_tbl.num_rows // (4 * ncpu)))
        slices = [pair_tbl.slice(i, step)
                  for i in range(0, max(pair_tbl.num_rows, 1), step)]
        pairs = ray.data.from_arrow(slices)
        # tasks + per-worker-process cache, not an actor pool: worker
        # processes persist across tasks, so the id→shingle-set memo
        # amortizes exactly like actor state without paying autoscaling
        # pool startup (~1-2 s — the stage's largest fixed cost at bench
        # scale); ray.get(ref) per task is a local plasma hit
        return pairs.map_batches(score_broadcast, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=8192)

    if not distinct:
        # exchange path (pair set past the broadcast bound): distributed
        # pair dedup before the text attaches
        pairs = _dedup_pairs(pairs)
    # two single-exchange attaches (stages/attach.py) instead of
    # Dataset.join: the join's per-row Python hash partitioning crawls
    # at the >2M-pair cardinality that routes candidates here (measured:
    # ppjoin at sf0.1 never finished the first join)
    from .attach import exchange_attach

    a_side = docs.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "a_text": t[text_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    b_side = docs.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "b_text": t[text_col]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    witha = exchange_attach(pairs, a_side, "id_a", nparts=join_parts())
    withb = exchange_attach(witha, b_side, "id_b", nparts=join_parts())

    def score(t: pa.Table) -> pa.Table:
        # per-batch shingle-set memo: a doc repeated across this batch's
        # pairs (the common case — a hot doc collides with many) is
        # shingled ONCE, intersections are searchsorted on sorted-unique
        # hashes — the same discipline as score_broadcast; recomputing
        # jaccard_ngram per PAIR would re-shingle hot docs thousands of
        # times at the >2M-pair cardinality that routes here
        sets: dict[int, np.ndarray] = {}
        ia = t["id_a"].to_numpy(zero_copy_only=False)
        ib = t["id_b"].to_numpy(zero_copy_only=False)
        ta = t["a_text"].to_pylist()
        tb = t["b_text"].to_pylist()
        ja = np.empty(len(ia), dtype=np.float64)
        for i in range(len(ia)):
            sa = sets.get(ia[i])
            if sa is None:
                sa = sets[ia[i]] = np.unique(_shingle_hashes(ta[i] or "", k))
            sb = sets.get(ib[i])
            if sb is None:
                sb = sets[ib[i]] = np.unique(_shingle_hashes(tb[i] or "", k))
            if len(sa) > len(sb):
                sa, sb = sb, sa
            if len(sb):
                loc = np.searchsorted(sb, sa)
                loc[loc == len(sb)] = len(sb) - 1
                inter = int((sb[loc] == sa).sum())
            else:
                inter = 0
            union = len(sa) + len(sb) - inter
            ja[i] = inter / union if union else 0.0
        keep = ja >= threshold
        return pa.table({
            "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
            "jaccard": pa.array(ja[keep], pa.float64()),
        })

    return withb.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


class SimHasher:
    """64-bit SimHash over token hashes (stateless math, actor-cached params)."""

    def __init__(self, k: int = 5):
        self.k = k
        self._bitpos = np.arange(64, dtype=np.uint64)

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs,) uint64 signatures — all docs' shingle hashes
        concatenated, bit-majority summed per doc via ``np.add.reduceat``,
        sign bits folded to the signature in one shot (no bit loop)."""
        shingles = [_shingle_hashes(t, self.k) for t in texts]
        lengths = np.array([len(s) for s in shingles], dtype=np.int64)
        h_all = np.concatenate(shingles) if shingles else np.empty(0, np.uint64)
        if not len(h_all):
            return np.zeros(len(texts), dtype=np.uint64)
        bits = ((h_all[:, None] >> self._bitpos) & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1  # (n_shingles, 64)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        v = np.add.reduceat(contrib, starts, axis=0)  # (n_docs, 64)
        with np.errstate(over="ignore"):
            return (((v > 0).astype(np.uint64)) << self._bitpos).sum(
                axis=1, dtype=np.uint64
            )

    def signature(self, text: str) -> np.int64:
        return self.signatures_batch([text])[0].astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = self.signatures_batch(batch["text"].tolist()).astype(np.int64)
        return batch


def simhash_near_dup_pairs(ds: "ray.data.Dataset", id_col: str = "doc_id",
                           max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash banding: 4 chunks of 16 bits — any pair
    within hamming ≤ 3 must share at least one exact chunk (pigeonhole).

    ONE all-to-all exchange, same shape as ``minhash_lsh_candidates``:
    the signature map emits (id, bkey, simhash, bpart) and the
    per-partition kernel segments co-located buckets and expands them —
    the collision-count prefilter exchange was the same byte volume as
    the rows themselves (singleton-dominated partials) plus an extra
    round and two materializations."""
    from ..functions.pools import join_parts as _join_parts

    nparts = _join_parts()

    def explode_chunks(batch: pa.Table) -> pa.Table:
        sh = SimHasher()
        sigs = sh.signatures_batch(batch["text"].to_pylist())
        n = len(sigs)
        chunk_ids = np.tile(np.arange(4, dtype=np.uint64), n)
        sig_rep = np.repeat(sigs, 4)
        chash = (sig_rep >> (chunk_ids * np.uint64(16))) & np.uint64(0xFFFF)
        with np.errstate(over="ignore"):
            bkey = (chash * _MULT64) ^ chunk_ids
            part = ((bkey * _MULT64) >> np.uint64(33)) % np.uint64(nparts)
        return pa.table(
            {
                id_col: pa.array(np.repeat(batch[id_col].to_numpy(zero_copy_only=False), 4)),
                "bkey": pa.array(bkey.astype(np.int64)),
                "simhash": pa.array(sig_rep.astype(np.int64)),
                "bpart": pa.array(part.astype(np.int32)),
            }
        )

    survivors = ds.map_batches(
        explode_chunks, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_part(g: pa.Table) -> pa.Table:
        # all buckets of the partition in one pass: sort by (bkey, id),
        # drop within-bucket id duplicates, expand each run's upper
        # triangle; hamming distances via vectorized popcount
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        bk = g["bkey"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sigs = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, bk))
        bks, idss, sgs = bk[order], ids[order], sigs[order]
        uniq = np.concatenate(
            [[True], (bks[1:] != bks[:-1]) | (idss[1:] != idss[:-1])])
        bks, idss, sgs = bks[uniq], idss[uniq], sgs[uniq]
        starts = np.nonzero(np.concatenate([[True], bks[1:] != bks[:-1]]))[0]
        sizes = np.diff(np.append(starts, len(bks)))
        out_a, out_b, out_s = [], [], []
        for st, sz in zip(starts, sizes):
            if sz < 2:
                continue
            ai, bi = np.triu_indices(sz, k=1)
            out_a.append(idss[st + ai])
            out_b.append(idss[st + bi])
            out_s.append(sgs[st + ai] ^ sgs[st + bi])
        if not out_a:
            return empty
        ham = _popcount64(np.concatenate(out_s))
        a_all, b_all = np.concatenate(out_a), np.concatenate(out_b)
        keep = ham <= max_hamming
        return pa.table({"id_a": pa.array(a_all[keep], pa.int64()),
                         "id_b": pa.array(b_all[keep], pa.int64()),
                         "hamming": pa.array(ham[keep], pa.int64())})

    from .exchange import exchange_map_groups

    cand = exchange_map_groups(survivors, "bpart", pairs_part, nparts)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64()),
                  "hamming": pa.array([], pa.int64())})).union(
        _dedup_pairs(cand, extra_cols=["hamming"]))


def resolve_duplicate_groups_distributed(
    pairs: "ray.data.Dataset", max_rounds: int = 30
) -> "ray.data.Dataset":
    """Connected components over the candidate-pair graph by distributed
    min-label propagation — the 100 TB path the driver-side union-find
    can't serve (pair lists proportional to duplicate count).

    Returns a Dataset of {doc_id, group} where ``group`` is the
    component-minimum doc_id (same contract as
    ``resolve_duplicate_groups``).  Each round is one hash join
    (edges ⋈ labels) + one min-aggregate; rounds needed = component
    diameter in label space (near-dup clusters are shallow).  Nothing
    ever lands on the driver but the per-round convergence scalar.
    """
    import pyarrow.compute as _pc
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    from ..functions.pools import join_parts

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table({
            "u": pa.concat_arrays([a, b]),
            "v": pa.concat_arrays([b, a]),
        })

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        # label(u) = min(u, min neighbor) — per-batch partial
        t2 = pa.table({"u": t["u"],
                       "label": _pc.min_element_wise(t["u"], t["v"])})
        return t2.group_by("u").aggregate([("label", "min")]).rename_columns(["u", "label"])

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u").aggregate(_Min("label", alias_name="label"))
    ).materialize()

    def label_sum(ls) -> int:
        return ls.map_batches(
            lambda t: pa.table({"s": pa.array([_pc.sum(t["label"]).as_py() or 0])}),
            batch_format="pyarrow",
        ).sum("s")

    prev = label_sum(labels)
    converged = False
    for _ in range(max_rounds):
        # propagate: u ← min(label(u), label(v)) over edges (u, v)
        lab_v = labels.map_batches(
            lambda t: pa.table({"v2": t["u"], "vlabel": t["label"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # NOTE: this per-round propagate stays on Dataset.join — the
        # label table is bounded by distinct near-dup doc ids (not the
        # fact stream), and swapping the in-LOOP join for the
        # union+groupby exchange wedged Ray 2.49's streaming executor
        # (tested; single-shot exchange_attach call sites are fine)
        prop = edges.join(lab_v, join_type="inner", num_partitions=join_parts(),
                          on=("v",), right_on=("v2",)).map_batches(
            lambda t: pa.table({"u": t["u"], "label": t["vlabel"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        merged = labels.union(prop)
        labels = (
            merged.map_batches(
                lambda t: t.group_by("u").aggregate([("label", "min")])
                .rename_columns(["u", "label"]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("u").aggregate(_Min("label", alias_name="label"))
        ).materialize()
        cur = label_sum(labels)
        if cur == prev:  # fixpoint: labels are component minima
            converged = True
            break
        prev = cur
    if not converged:
        # min-label spreads one hop per round, so a component whose
        # label-space diameter exceeds max_rounds (long boilerplate
        # duplicate chains) would silently get WRONG group labels —
        # fail loudly instead (raise the cap or pre-split the chain).
        raise RuntimeError(
            f"duplicate-group label propagation did not converge in "
            f"{max_rounds} rounds; component diameter exceeds the cap"
        )
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["u"], "group": t["label"]}),
        batch_format="pyarrow",
    )


def resolve_duplicate_groups(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find → {doc_id: group_min_id}.  Driver-side; assumes the
    verified pair set is small (documented LSH-scale assumption)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    seen: set[int] = set()
    for a, b in pairs:
        seen.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}
