"""Similarity search over embedding columns (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — numpy matmul per Arrow
  batch against a broadcast query matrix (``ray.put`` once, read in
  each task), per-batch local top-k then a tiny global merge.  The
  baseline at any scale: no shuffle, one pass over the embeddings.
- ``lsh_bucketed_topk``: random-hyperplane LSH variant — the scale
  path: embeddings are bucketed by sign-pattern once, and a query only
  scans its own (and neighboring-hamming) buckets.

Both normalize in float64 for deterministic scoring (round 6 dp matches
the DuckDB ``list_cosine_similarity`` oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.pools import pool


def round_half_away(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """Decimal rounding HALF AWAY FROM ZERO — matches SQL ``round(x, n)``
    exactly.  ``np.round`` is banker's (half-even): a value whose
    (n+1)-th decimal digit is an exact 5 (any dyadic, e.g. 2^-7) hashes
    differently between the two.  Use this for every float that feeds a
    typed-hash compare against a DuckDB oracle."""
    p = 10.0 ** ndigits
    scaled = np.asarray(x, dtype=np.float64) * p
    return np.trunc(scaled + np.sign(scaled) * 0.5) / p


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column — zero-copy flatten."""
    import pyarrow.compute as pc

    arr = batch[col].combine_chunks()
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def cosine_scores(mat: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Cosine similarity of each row of ``mat`` against 1-D ``query``."""
    qn = query / np.linalg.norm(query)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def brute_force_topk(ds: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> "ray.data.Dataset":
    """Exact cosine top-k: per-batch scoring + local top-k, global merge."""
    qref = ray.put(np.asarray(query_vec, dtype=np.float64))

    class Score:
        def __init__(self, qref, k):
            self.q = ray.get(qref)  # broadcast once per actor
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _batch_matrix(batch, vec_col)
            sims = round_half_away(cosine_scores(mat, self.q), 6)
            # local top-k prune: only k rows per batch reach the merge
            order = np.lexsort((batch[id_col].to_numpy(zero_copy_only=False), -sims))[: self.k]
            return pa.table(
                {
                    id_col: pa.array(batch[id_col].take(pa.array(order))),
                    "sim": pa.array(sims[order], pa.float64()),
                }
            )

    from ..functions.pools import task_stage
    from .quantiles import _collect_tree

    # task closure (broadcast query vector, no pool startup); top-k is
    # associative, so the global merge is a combine tree over the ≤ k
    # rows each batch emits — no sort shuffle, no limit op
    scored = ds.map_batches(task_stage(Score, qref, k),
                            batch_format="pyarrow", zero_copy_batch=True)

    def topk_combine(t: pa.Table) -> pa.Table:
        sims = t["sim"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return t.take(pa.array(order))

    return ray.data.from_arrow(_collect_tree(scored, topk_combine))


class HyperplaneLSH:
    """Random-hyperplane signatures: bucket id = sign pattern (n_planes bits).

    Stateful stage — the plane matrix is drawn once per actor from the
    seed (identical across actors ⇒ consistent bucketing).
    """

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, "embedding")
        return batch.append_column("bucket", pa.array(self.bucket_of(mat)))


def lsh_bucketed_topk(ds: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10,
                      n_planes: int = 8, probe_hamming: int = 1, seed: int = 42,
                      id_col: str = "vec_id") -> "ray.data.Dataset":
    """Approximate top-k: scan only buckets within ``probe_hamming`` of the
    query's bucket.  At 100 TB the bucketed table is written partitioned
    by ``bucket`` so a query reads ~(probed/2^n_planes) of the data."""
    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(q)
    lsh = HyperplaneLSH(dim, n_planes, seed)
    qb = int(lsh.bucket_of(q.reshape(1, -1))[0])
    probe = [b for b in range(1 << n_planes)
             if bin(b ^ qb).count("1") <= probe_hamming]
    probe_arr = pa.array(np.array(probe, dtype=np.int64))

    from ..functions.pools import task_stage

    bucketed = ds.map_batches(task_stage(HyperplaneLSH, dim, n_planes, seed),
                              batch_format="pyarrow", zero_copy_batch=True)

    import pyarrow.compute as pc

    pruned = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=probe_arr)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return brute_force_topk(pruned, q, k=k, id_col=id_col)


class IVFIndex:
    """IVF (inverted-file) coarse quantizer: k-means-lite centroids.

    The scale path for repeated queries: embeddings are assigned once to
    their nearest centroid (one pass, broadcast centroids); a query
    scans only its ``n_probe`` nearest cells.  At 100 TB the assigned
    table is written partitioned by ``cell`` so a query reads
    ~n_probe/n_cells of the data.  Training is sample-based (k-means on
    a driver-held sample — centroids are the genuinely small side:
    n_cells × dim floats), Lloyd iterations fully vectorized.
    """

    def __init__(self, sample: np.ndarray, n_cells: int = 16, iters: int = 10,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        sample = np.asarray(sample, dtype=np.float64)
        n = len(sample)
        cents = sample[rng.choice(n, size=min(n_cells, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):  # n_cells-bounded loop, not data-bounded
                m = assign == c
                if m.any():
                    cents[c] = sample[m].mean(axis=0)
        self.centroids = cents

    @classmethod
    def from_centroids(cls, centroids: np.ndarray) -> "IVFIndex":
        """Index with externally-chosen centroids (e.g. deterministic
        data-vector centroids, making the whole IVF path SQL-mirrorable)."""
        idx = cls.__new__(cls)
        idx.centroids = np.asarray(centroids, dtype=np.float64)
        return idx

    def assign(self, mat: np.ndarray) -> np.ndarray:
        d2 = ((mat[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1).astype(np.int64)

    def probe_cells(self, query: np.ndarray, n_probe: int) -> np.ndarray:
        d2 = ((self.centroids - query[None, :]) ** 2).sum(axis=1)
        return np.argsort(d2, kind="stable")[:n_probe].astype(np.int64)


def ivf_topk(ds: "ray.data.Dataset", query_vec: np.ndarray, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, sample_n: int = 4096,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> "ray.data.Dataset":
    """Approximate top-k via IVF cells: train on a bounded sample, assign
    per batch against broadcast centroids, scan only the probed cells.
    Pass ``centroids`` to skip training (deterministic data-vector
    centroids — the SQL-mirrorable configuration)."""
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    if centroids is not None:
        index = IVFIndex.from_centroids(centroids)
    else:
        sample_tbl = ds.limit(sample_n).take_all()  # bounded driver sample
        sample = np.array([r[vec_col] for r in sample_tbl], dtype=np.float64)
        index = IVFIndex(sample, n_cells=n_cells, seed=seed)
    probe_arr = pa.array(index.probe_cells(q, n_probe))
    iref = ray.put(index)

    class Assign:
        def __init__(self, iref):
            self.index = ray.get(iref)  # broadcast once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            cells = self.index.assign(_batch_matrix(batch, vec_col))
            return batch.append_column("cell", pa.array(cells))

    from ..functions.pools import task_stage

    assigned = ds.map_batches(task_stage(Assign, iref),
                              batch_format="pyarrow", zero_copy_batch=True)
    pruned = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["cell"], value_set=probe_arr)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return brute_force_topk(pruned, q, k=k, id_col=id_col)


def knn_recall(approx: pd.DataFrame, exact: pd.DataFrame, id_col: str = "vec_id") -> float:
    """Recall@k of the approximate result vs the exact one (bench metric)."""
    return len(set(approx[id_col]) & set(exact[id_col])) / max(1, len(exact))


def quantize_embeddings_batch(batch: pa.Table, vec_col: str = "embedding") -> pa.Table:
    """Symmetric max-abs int8 quantization per vector (the storage-side
    embedding op of a training-data pipeline): q_i = round-half-away
    (x_i / max|x| * 127), plus the scale for reconstruction.  Emits an
    order-weighted checksum and max reconstruction error so results are
    scalar-comparable (SQL list hashing is not portable)."""
    mat = _batch_matrix(batch, vec_col)
    m = np.abs(mat).max(axis=1)
    m_safe = np.where(m == 0, 1.0, m)
    scaled = mat / m_safe[:, None] * 127.0
    # round HALF AWAY from zero (matches SQL round; numpy rounds half-even)
    q = np.trunc(scaled + np.sign(scaled) * 0.5)
    recon = q * m_safe[:, None] / 127.0
    err = np.abs(recon - mat).max(axis=1)
    weights = np.arange(1, mat.shape[1] + 1, dtype=np.float64)
    checksum = (q * weights[None, :]).sum(axis=1)
    return pa.table({
        "vec_id": batch["vec_id"],
        "scale": pa.array(round_half_away(m, 6), pa.float64()),
        "q_checksum": pa.array(checksum.astype(np.int64)),
        "max_err": pa.array(round_half_away(err, 6), pa.float64()),
    })


# ---------------------------------------------------------------------------
# Blocked (no-broadcast) EXACT all-pairs kernels — the >memory scale path
# for whole-table pairwise similarity.  Rows are hashed into B blocks;
# each of the B(B+1)/2 unordered block pairs becomes one group of a
# single groupby exchange (each row is replicated B times, the classic
# triangle-join replication factor sqrt(#reducers)); the group kernel
# matmuls the two sub-blocks.  Memory per task is 2·(n/B) vectors —
# bounded by choosing B from the row count — and nothing is ever
# broadcast or driver-resident.  Float op order inside the kernels
# matches the broadcast paths exactly so both routes hash identically.
# ---------------------------------------------------------------------------

def n_blocks_for(n_rows: int, target_block_rows: int = 65536) -> int:
    """Block count so a block-pair task holds ~2·target rows."""
    return max(2, -(-int(n_rows) // int(target_block_rows)))


def _block_pair_id(g1: np.ndarray, g2: np.ndarray, n_blocks: int) -> np.ndarray:
    """Dense id of the unordered block pair {g1, g2} (g1 <= g2 assumed)."""
    b = np.int64(n_blocks)
    return g1 * b - (g1 * (g1 - 1)) // 2 + (g2 - g1)


def _replicate_to_block_pairs(t: pa.Table, n_blocks: int,
                              id_col: str = "vec_id") -> pa.Table:
    """Tag every row with each of the n_blocks block-pair tasks it joins.

    Output columns: ``pt`` (pair-task id), ``blk`` (the row's own block)
    plus the input columns.  Shuffle volume is n_blocks × input — size
    n_blocks so a pair task fits in a worker heap, no larger."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    g = (ids % n_blocks).astype(np.int64)
    n = len(ids)
    rep = np.repeat(np.arange(n, dtype=np.int64), n_blocks)
    other = np.tile(np.arange(n_blocks, dtype=np.int64), n)
    gg = g[rep]
    lo = np.minimum(gg, other)
    hi = np.maximum(gg, other)
    out = t.take(pa.array(rep))
    out = out.append_column("pt", pa.array(_block_pair_id(lo, hi, n_blocks)))
    return out.append_column("blk", pa.array(gg))


def allpairs_cosine_threshold_blocked(
    ds: "ray.data.Dataset", threshold: float, n_blocks: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Exact (id_a < id_b, sim >= threshold) cosine pairs without any
    whole-table broadcast: block-pair groupby exchange + per-group
    matmul.  Float math per pair is ``(x_a/|x_a|) · (x_b/|x_b|)`` —
    identical to the broadcast PairScore kernel, so results hash-match
    the broadcast route (equivalence-tested)."""

    def pair_kernel(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy().astype(np.int64)
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        mat = mat / nrm[:, None]
        blk = g["blk"].to_numpy().astype(np.int64)
        b_lo = blk.min()
        li = blk == b_lo
        if li.all():  # diagonal pair (i == i): strict upper triangle by id
            sims = round_half_away(mat @ mat.T, 6)
            mask = (sims >= threshold) & (ids[None, :] > ids[:, None])
            ri, ci = np.nonzero(mask)
            id_a, id_b = ids[ri], ids[ci]
            sim = sims[ri, ci]
        else:
            ri_m, ci_m = np.nonzero(li), np.nonzero(~li)
            mi, mj = mat[li], mat[~li]
            ii, ij = ids[li], ids[~li]
            sims = round_half_away(mi @ mj.T, 6)
            mask = sims >= threshold
            ri, ci = np.nonzero(mask)
            a, bb = ii[ri], ij[ci]
            id_a = np.minimum(a, bb)
            id_b = np.maximum(a, bb)
            sim = sims[ri, ci]
        return pa.table({
            "id_a": pa.array(id_a, pa.int64()),
            "id_b": pa.array(id_b, pa.int64()),
            "sim": pa.array(sim, pa.float64()),
        })

    rep = ds.map_batches(_replicate_to_block_pairs,
                         fn_kwargs={"n_blocks": n_blocks, "id_col": id_col},
                         batch_format="pyarrow", zero_copy_batch=True)
    return rep.groupby("pt").map_groups(pair_kernel, batch_format="pandas")


def knn_edges_blocked(
    ds: "ray.data.Dataset", k: int, n_blocks: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Exact directed k-NN edges (src, dst, sim) without broadcast.

    Per block-pair group, each side's rows take a LOCAL top-k against
    the other side (by round-6 sim DESC, dst id ASC — the global
    tie-break), then one groupby(src) merge selects the global top-k:
    a local top-k retains every candidate that can appear in the global
    one, so the merge is exact.  Float math per direction is
    ``(x_src · x_dst/|x_dst|) / |x_src|`` — identical to the broadcast
    topk_rows kernel."""

    def local_topk(ids_q, mat_q, nrm_q, ids_c, mn_c, same_block):
        sims = round_half_away((mat_q @ mn_c.T) / nrm_q[:, None], 6)
        if same_block:
            self_col = np.searchsorted(ids_c, ids_q)
            hit = (self_col < len(ids_c)) & (ids_c[np.minimum(
                self_col, len(ids_c) - 1)] == ids_q)
            sims[np.nonzero(hit)[0], self_col[hit]] = -np.inf
        kk = min(k, sims.shape[1])
        order = np.lexsort((np.broadcast_to(ids_c, sims.shape), -sims),
                           axis=1)[:, :kk]
        src = np.repeat(ids_q, kk)
        dst = ids_c[order].ravel()
        sim = np.take_along_axis(sims, order, axis=1).ravel()
        keep = sim > -np.inf
        return src[keep], dst[keep], sim[keep]

    def pair_kernel(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy().astype(np.int64)
        srt = np.argsort(ids, kind="stable")
        ids = ids[srt]
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)[srt]
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        blk = g["blk"].to_numpy().astype(np.int64)[srt]
        b_lo = blk.min()
        li = blk == b_lo
        if li.all():
            s, d, v = local_topk(ids, mat, nrm, ids, mat / nrm[:, None], True)
        else:
            mi, mj = mat[li], mat[~li]
            ni, nj = nrm[li], nrm[~li]
            ii, ij = ids[li], ids[~li]
            s1, d1, v1 = local_topk(ii, mi, ni, ij, mj / nj[:, None], False)
            s2, d2, v2 = local_topk(ij, mj, nj, ii, mi / ni[:, None], False)
            s, d, v = (np.concatenate([s1, s2]), np.concatenate([d1, d2]),
                       np.concatenate([v1, v2]))
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64()),
                         "sim": pa.array(v, pa.float64())})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["dst"].to_numpy(), -g["sim"].to_numpy()))[:k]
        return g.iloc[order][["src", "dst", "sim"]]

    rep = ds.map_batches(_replicate_to_block_pairs,
                         fn_kwargs={"n_blocks": n_blocks, "id_col": id_col},
                         batch_format="pyarrow", zero_copy_batch=True)
    cand = rep.groupby("pt").map_groups(pair_kernel, batch_format="pandas")
    return cand.groupby("src").map_groups(merge_topk, batch_format="pandas")


def multi_query_topk(ds: "ray.data.Dataset", query_ids: np.ndarray,
                     query_mat: np.ndarray, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> "ray.data.Dataset":
    """Batched exact cosine top-k for Q queries in ONE scan: each Arrow
    batch does a single (B×d)@(d×Q) matmul scoring every query at once —
    the serving shape (Q queries amortize one pass over the corpus
    instead of Q scans).  Self-matches (row id == query id) are
    excluded; per-query local top-k prunes each batch to Q·k rows before
    the tiny global per-query merge.  Ties break on (sim desc, id asc)."""
    qids = np.asarray(query_ids, dtype=np.int64)
    qm = np.asarray(query_mat, dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1)[:, None]
    qref = ray.put((qids, qn))

    class Score:
        def __init__(self, qref, k):
            self.qids, self.qn = ray.get(qref)  # broadcast once per actor
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _batch_matrix(batch, vec_col)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = round_half_away((mat @ self.qn.T) / norms[:, None], 6)  # B×Q
            sims[ids[:, None] == self.qids[None, :]] = -np.inf  # self-match
            out_q, out_i, out_s = [], [], []
            for j in range(len(self.qids)):  # Q-bounded loop, not data-bounded
                order = np.lexsort((ids, -sims[:, j]))[: self.k]
                order = order[np.isfinite(sims[order, j])]
                out_q.append(np.full(len(order), self.qids[j], dtype=np.int64))
                out_i.append(ids[order])
                out_s.append(sims[order, j])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q) if out_q else
                                     np.array([], np.int64)),
                id_col: pa.array(np.concatenate(out_i).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            })

    from ..functions.pools import task_stage

    scored = ds.map_batches(task_stage(Score, qref, k),
                            batch_format="pyarrow", zero_copy_batch=True)

    # candidates per query are bounded (n_batches × k): per-query top-k
    # is associative, so ONE combine tree replaces the former
    # groupby(query_id) shuffle + global sort
    from .quantiles import _collect_tree

    def head_k_combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = (df.sort_values(["sim", id_col], ascending=[False, True],
                             kind="mergesort")
              .groupby("query_id", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    out = _collect_tree(scored, head_k_combine).to_pandas()
    return out.sort_values(["query_id", "sim", id_col],
                           ascending=[True, False, True],
                           kind="mergesort").reset_index(drop=True)


def quantized_rerank_topk(ds: "ray.data.Dataset", query_vec: np.ndarray,
                          k: int = 10, shortlist: int = 50,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> pd.DataFrame:
    """Two-stage retrieval on the quantized-storage scale path: stage 1
    scores the int8-quantized (max-abs, round-half-away — the
    quantize_embeddings scheme) DEQUANTIZED vectors and keeps a global
    ``shortlist`` by approximate score; stage 2 re-ranks only the
    shortlist with exact float cosine.  At 100 TB stage 1 is the only
    full scan (int8 vectors are 4–8× cheaper to move) and stage 2
    touches ``shortlist`` rows.  The shortlist rows carry their float
    vectors forward, so the re-rank is a driver-side exact pass over a
    bounded set.  Dequantization is (q · m) / 127 per element — the
    exact op order the SQL mirror uses."""
    q = np.asarray(query_vec, dtype=np.float64)
    qref = ray.put(q)

    class Stage1:
        def __init__(self, qref, shortlist):
            self.q = ray.get(qref)
            self.n = shortlist

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _batch_matrix(batch, vec_col)
            m = np.abs(mat).max(axis=1)
            ms = np.where(m == 0, 1.0, m)
            scaled = mat / ms[:, None] * 127.0
            qi = np.trunc(scaled + np.sign(scaled) * 0.5)  # int8 codes
            dq = (qi * ms[:, None]) / 127.0
            asim = round_half_away(cosine_scores(dq, self.q), 6)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -asim))[: self.n]  # local prune
            idx = pa.array(order)
            return pa.table({
                id_col: batch[id_col].take(idx),
                "asim": pa.array(asim[order], pa.float64()),
                vec_col: batch[vec_col].combine_chunks().take(idx),
            })

    from ..functions.pools import task_stage

    cands = ds.map_batches(task_stage(Stage1, qref, shortlist),
                           batch_format="pyarrow", zero_copy_batch=True)
    # global shortlist is associative top-N — combine tree, no sort op
    from .quantiles import _collect_tree

    def short_combine(t: pa.Table) -> pa.Table:
        asim = t["asim"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -asim))[:shortlist]
        return t.take(pa.array(order))

    short = _collect_tree(cands, short_combine).to_pandas()
    if not len(short):
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "sim": pd.Series([], dtype=np.float64),
                             "asim": pd.Series([], dtype=np.float64)})
    mat = np.array(short[vec_col].tolist(), dtype=np.float64)
    short["sim"] = round_half_away(cosine_scores(mat, q), 6)
    return (short.sort_values(["sim", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
            [[id_col, "sim", "asim"]].reset_index(drop=True))
