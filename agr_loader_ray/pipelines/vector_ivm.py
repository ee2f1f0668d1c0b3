"""Incrementally-maintained vector index: CDC change feed → IVF lake.

The ANN counterpart of ``pipelines/ivm.py`` (delta-maintained
aggregates) and ``pipelines/inverted.py`` (LSM postings): a
cell-partitioned vector index over the transcript lake's ``text``
column that is maintained EPOCH-BY-EPOCH from ``export.change_feed``
deltas instead of being re-embedded/re-assigned from scratch after
every load — the reference re-derives its second-pass stores per run
(/root/reference/src/etl/gene_disease_ortho_etl.py:119-158); here the
derived store tracks the lake's commit lineage.

Layout (all mutations atomic via write-temp-then-rename + one
``_SEGMENTS.json`` state file — readers NEVER glob blindly, so a
crashed compaction can't double rows):

    out_dir/
      meta.json                   dim / n_cells / seed
      centroids.parquet           the coarse quantizer (small side)
      seg-e000003/cell=K/*.parquet   one segment per maintained epoch:
                                  (conv_id, turn_idx, vseq, embedding)
      tombs/epoch=3/*.parquet     (conv_id, turn_idx, kill_upto)
      _SEGMENTS.json              live segments + tombs + last_epoch

Maintenance per epoch is churn-bounded: post-images are embedded
(``stages/text.hash_embed_texts`` — a deterministic stand-in for a
model embedder; the plumbing is the real shape), assigned against the
broadcast centroids and appended as ONE new segment partitioned by
cell; pre-images/deletes append tombstones ``kill_upto`` = epoch-1 /
epoch.  A superseded or deleted row is therefore dead wherever it
lives — an update that moves a row to a different cell needs no
cross-cell coordination.  Queries read only the probed cells' files
across live segments (read-path partition pruning, as
``stages/ann_index.py``) and drop dead rows against the broadcast
tombstone set; ``compact_index`` folds segments+tombs per cell back to
one segment (the LSM discipline ``pipelines/inverted.py`` uses), which
bounds the tombstone set between compactions.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.pools import pool
from ..stages.similarity import IVFIndex, _batch_matrix, cosine_scores, round_half_away
from ..stages.text import hash_embed_texts
from ..state.manifest import _atomic_write_json
from .export import change_feed

STATE_NAME = "_SEGMENTS.json"
META_NAME = "meta.json"
CENTROIDS_NAME = "centroids.parquet"
_ADD_TYPES = ("insert", "update_postimage")
KEY_COLS = ["conv_id", "turn_idx"]


# -- state -------------------------------------------------------------------

def _read_state(out_dir: str) -> dict:
    with open(os.path.join(out_dir, STATE_NAME)) as f:
        return json.load(f)


def _write_state(out_dir: str, state: dict) -> None:
    _atomic_write_json(os.path.join(out_dir, STATE_NAME), state)


def init_vector_index(out_dir: str, dim: int = 16, n_cells: int = 8,
                      seed: int = 42) -> dict:
    """Create an empty index: seeded unit-norm Gaussian centroids (fixed
    for the index's lifetime — maintenance and rebuild must agree on
    cell geometry) + empty segment state."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1)[:, None]
    pq.write_table(
        pa.table({"cell": pa.array(np.arange(n_cells, dtype=np.int64)),
                  "centroid": pa.array(list(cents), pa.list_(pa.float64()))}),
        os.path.join(out_dir, CENTROIDS_NAME))
    meta = {"format": "vector-ivm-v1", "dim": dim, "n_cells": n_cells, "seed": seed}
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    _write_state(out_dir, {"segments": [], "tombs": [], "last_epoch": -1,
                           "compactions": 0, "centroids": CENTROIDS_NAME})
    return meta


def _load_quantizer(out_dir: str, state: dict | None = None) -> tuple[dict, IVFIndex]:
    """Meta + coarse quantizer.  The centroids FILE is named by the
    state json (single atomic read point), so a retrain can swap
    geometry and segments together — a reader can never pair new
    centroids with old segments or vice versa."""
    if state is None:
        state = _read_state(out_dir)
    with open(os.path.join(out_dir, META_NAME)) as f:
        meta = json.load(f)
    cents = np.array(
        pq.read_table(os.path.join(out_dir, state.get("centroids", CENTROIDS_NAME)))
        .sort_by("cell")["centroid"].to_pylist(), dtype=np.float64)
    meta["n_cells"] = len(cents)  # centroids file is authoritative post-retrain
    return meta, IVFIndex.from_centroids(cents)


# -- maintenance -------------------------------------------------------------

class _EmbedAssign:
    """Actor-pool stage: centroids broadcast once per actor; text →
    embedding → cell, vseq stamped with the source epoch."""

    def __init__(self, iref, dim: int, epoch: int):
        self.index: IVFIndex = ray.get(iref)
        self.dim = dim
        self.epoch = epoch

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = hash_embed_texts(batch["text"].to_pylist(), self.dim)
        cells = self.index.assign(mat)
        n = batch.num_rows
        return pa.table({
            # canonical index schema: the lake's turn_idx may WIDEN over
            # epochs (schema-evolution events); segments must not drift
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int64()),
            "vseq": pa.array(np.full(n, self.epoch, dtype=np.int64)),
            "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            "cell": pa.array(cells),
        })


def maintain_epoch(lake_root: str, out_dir: str, epoch: int) -> dict:
    """Apply one committed lake epoch's change feed to the index.
    Idempotent: an epoch at or below ``last_epoch`` is a no-op (the
    state file is the resume log, published atomically AFTER the
    segment/tombstone files exist)."""
    state = _read_state(out_dir)
    if epoch <= state["last_epoch"]:
        return {"epoch": epoch, "skipped": True}
    if epoch != state["last_epoch"] + 1:
        raise ValueError(f"epoch {epoch} out of order (last={state['last_epoch']})")
    meta, index = _load_quantizer(out_dir, state)

    cdf = change_feed(lake_root, epoch, images="both").materialize()  # churn-bounded
    add_types = pa.array(list(_ADD_TYPES))

    adds = cdf.map_batches(
        lambda t: t.filter(pc.is_in(t["change_type"], value_set=add_types))
                   .select(["conv_id", "turn_idx", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    n_adds = adds.count()
    seg_name = None
    if n_adds:
        iref = ray.put(index)
        assigned = adds.map_batches(
            _EmbedAssign, fn_constructor_args=(iref, meta["dim"], epoch),
            batch_format="pyarrow", zero_copy_batch=True, concurrency=pool())
        seg_name = f"seg-e{epoch:06d}"
        tmp = tempfile.mkdtemp(prefix=".tmp-seg-", dir=out_dir)
        assigned.write_parquet(tmp, partition_cols=["cell"])
        os.replace(tmp, os.path.join(out_dir, seg_name))

    def tomb_batch(t: pa.Table) -> pa.Table:
        ct = t["change_type"].to_numpy(zero_copy_only=False)
        pre = ct == "update_preimage"
        dele = ct == "delete"
        keep = pre | dele
        sub = t.filter(pa.array(keep))
        kill = np.where(pre[keep], epoch - 1, epoch).astype(np.int64)
        return pa.table({"conv_id": sub["conv_id"].cast(pa.string()),
                         "turn_idx": sub["turn_idx"].cast(pa.int64()),
                         "kill_upto": pa.array(kill)})

    tombs = cdf.map_batches(tomb_batch, batch_format="pyarrow", zero_copy_batch=True)
    n_tombs = tombs.count()
    tomb_name = None
    if n_tombs:
        tomb_name = f"tombs/epoch={epoch}"
        tmp = tempfile.mkdtemp(prefix=".tmp-tomb-", dir=out_dir)
        tombs.write_parquet(tmp)
        os.makedirs(os.path.join(out_dir, "tombs"), exist_ok=True)
        os.replace(tmp, os.path.join(out_dir, tomb_name))

    state["segments"] += [seg_name] if seg_name else []
    state["tombs"] += [tomb_name] if tomb_name else []
    state["last_epoch"] = epoch
    _write_state(out_dir, state)
    return {"epoch": epoch, "skipped": False, "adds": int(n_adds),
            "tombstones": int(n_tombs), "segment": seg_name}


def maintain_vector_index(lake_root: str, out_dir: str, dim: int = 16,
                          n_cells: int = 8, seed: int = 42,
                          upto: int | None = None) -> list[dict]:
    """Bring the index current with the lake: init if absent, then apply
    every committed epoch above ``last_epoch`` in order (epoch 0's feed
    is all inserts — bootstrap is not a special case).  ``upto`` pins
    the target epoch (time-travel for the group scheduler); default is
    the lake's last commit."""
    from ..state.manifest import LakeManifest

    if not os.path.exists(os.path.join(out_dir, STATE_NAME)):
        init_vector_index(out_dir, dim=dim, n_cells=n_cells, seed=seed)
    last = LakeManifest(lake_root).last_committed_epoch() if upto is None else upto
    state = _read_state(out_dir)
    return [maintain_epoch(lake_root, out_dir, e)
            for e in range(state["last_epoch"] + 1, last + 1)]


# -- read path ---------------------------------------------------------------

def _tomb_frame(out_dir: str, state: dict) -> pd.DataFrame:
    """Max kill_upto per key over the live tombstone files.  Bounded by
    churn since the last compaction — the same read-side small state the
    LSM postings keep; compact_index() folds it away."""
    parts = [pq.read_table(os.path.join(out_dir, t)).to_pandas()
             for t in state["tombs"]]
    if not parts:
        return pd.DataFrame({"conv_id": [], "turn_idx": [], "kill_upto": []})
    return (pd.concat(parts, ignore_index=True)
            .groupby(KEY_COLS, as_index=False)["kill_upto"].max())


def _alive(tbl: pa.Table, tomb: pd.DataFrame) -> pa.Table:
    """Drop rows superseded or deleted per the tombstone set: a row is
    alive iff no tombstone for its key has kill_upto >= vseq."""
    if not len(tomb) or not tbl.num_rows:
        return tbl
    df = tbl.select([*KEY_COLS, "vseq"]).to_pandas()
    m = df.merge(tomb, on=KEY_COLS, how="left")
    keep = ~(m["kill_upto"].notna() & (m["vseq"] <= m["kill_upto"]))
    return tbl.filter(pa.array(keep.to_numpy()))


def _segment_files(out_dir: str, state: dict, cells: "np.ndarray") -> list[str]:
    return [f for seg in state["segments"] for c in cells
            for f in sorted(glob.glob(
                os.path.join(out_dir, seg, f"cell={int(c)}", "*.parquet")))]


def query_topk(out_dir: str, query_text: str, k: int = 10,
               n_probe: int = 2) -> pd.DataFrame:
    """ANN top-k for a text query: embed, probe the n_probe nearest
    cells, read ONLY those cells' files across live segments, drop dead
    rows, exact cosine top-k.  Ties broken on (sim desc, conv_id,
    turn_idx) for determinism."""
    state = _read_state(out_dir)
    meta, index = _load_quantizer(out_dir, state)
    q = hash_embed_texts([query_text], meta["dim"])[0]
    files = _segment_files(out_dir, state, index.probe_cells(q, n_probe))
    empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                          "turn_idx": pd.Series([], dtype=np.int64),
                          "sim": pd.Series([], dtype=np.float64)})
    if not files:
        return empty
    tomb = _tomb_frame(out_dir, state)
    tref = ray.put(tomb)
    qref = ray.put(q)

    class ScoreAlive:
        def __init__(self, tref, qref, k):
            self.tomb = ray.get(tref)
            self.q = ray.get(qref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            live = _alive(batch, self.tomb)
            if not live.num_rows:
                return live.select(KEY_COLS).append_column(
                    "sim", pa.array([], pa.float64()))
            sims = round_half_away(
                cosine_scores(_batch_matrix(live, "embedding"), self.q), 6)
            order = np.lexsort((
                live["turn_idx"].to_numpy(zero_copy_only=False),
                live["conv_id"].to_numpy(zero_copy_only=False), -sims))[: self.k]
            idx = pa.array(order)
            return pa.table({"conv_id": live["conv_id"].take(idx),
                             "turn_idx": live["turn_idx"].take(idx),
                             "sim": pa.array(sims[order], pa.float64())})

    ds = ray.data.read_parquet(files, columns=[*KEY_COLS, "vseq", "embedding"])
    scored = ds.map_batches(ScoreAlive, fn_constructor_args=(tref, qref, k),
                            batch_format="pyarrow", zero_copy_batch=True,
                            concurrency=pool())
    out = (scored.sort(["sim", "conv_id", "turn_idx"],
                       descending=[True, False, False]).limit(k).to_pandas())
    return out if len(out) else empty


def read_alive(out_dir: str) -> "ray.data.Dataset":
    """Full-scan Dataset of the index's alive rows (keys + vseq) after
    the segment+tombstone fold — the maintenance-bookkeeping surface
    (exactly one row per live lake key; the gate query checks it against
    the WAL's LWW live set).  ANN queries use ``query_topk``'s
    cell-pruned path instead."""
    state = _read_state(out_dir)
    meta, _ = _load_quantizer(out_dir, state)
    files = _segment_files(out_dir, state, np.arange(meta["n_cells"]))
    if not files:
        return ray.data.from_arrow(pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int64()),
            "vseq": pa.array([], pa.int64())}))
    tref = ray.put(_tomb_frame(out_dir, state))

    def fold(batch: pa.Table) -> pa.Table:
        return _alive(batch, ray.get(tref))

    return ray.data.read_parquet(files, columns=[*KEY_COLS, "vseq"]).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True)


# -- compaction --------------------------------------------------------------

def compact_index(out_dir: str) -> dict:
    """Fold all live segments + tombstones into ONE segment per the
    current alive set, then atomically swap the state file (old files
    removed best-effort AFTER the swap — a crash in between leaves
    garbage, never duplicates, because readers follow _SEGMENTS.json)."""
    state = _read_state(out_dir)
    meta, _ = _load_quantizer(out_dir, state)
    tomb = _tomb_frame(out_dir, state)
    new_seg = f"seg-c{state['compactions']:04d}-e{state['last_epoch']:06d}"
    tmp = tempfile.mkdtemp(prefix=".tmp-compact-", dir=out_dir)
    tref = ray.put(tomb)

    @ray.remote
    def compact_cell(cell: int, files: list[str], tmp: str, tombs: pd.DataFrame) -> int:
        kept = 0
        writer = None
        try:
            for f in files:  # file-at-a-time: constant memory per task
                live = _alive(pq.read_table(f), tombs)
                if not live.num_rows:
                    continue
                if writer is None:
                    os.makedirs(os.path.join(tmp, f"cell={cell}"), exist_ok=True)
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, f"cell={cell}", "part-0.parquet"),
                        live.schema)
                writer.write_table(live)
                kept += live.num_rows
        finally:
            if writer is not None:
                writer.close()
        return kept

    futs = []
    for c in range(meta["n_cells"]):
        files = _segment_files(out_dir, state, np.array([c]))
        if files:
            futs.append(compact_cell.remote(c, files, tmp, tref))
    kept = int(sum(ray.get(futs)))
    os.replace(tmp, os.path.join(out_dir, new_seg))

    old_segs, old_tombs = state["segments"], state["tombs"]
    _write_state(out_dir, {**state, "segments": [new_seg], "tombs": [],
                           "compactions": state["compactions"] + 1})
    for rel in old_segs + old_tombs:
        shutil.rmtree(os.path.join(out_dir, rel), ignore_errors=True)
    return {"segment": new_seg, "rows": kept,
            "folded_segments": len(old_segs), "folded_tombs": len(old_tombs)}


# -- retrain / rebalance -------------------------------------------------------

def retrain_index(out_dir: str, new_centroids: np.ndarray) -> dict:
    """Swap the coarse quantizer: reassign every ALIVE row to its cell
    under ``new_centroids`` (the rows already carry their embeddings —
    no re-embed) and publish ONE rebalanced segment + the new centroids
    file with a single atomic state swap.  Because readers resolve the
    centroids FILE through ``_SEGMENTS.json``, no reader can pair the
    new geometry with the old segments or vice versa — the failure that
    would silently prune the wrong cells.  The admin answer to cell
    skew after the corpus drifts away from the bootstrap centroids
    (``engine.compact(cluster=...)`` is the lake-side precedent)."""
    state = _read_state(out_dir)
    meta, _ = _load_quantizer(out_dir, state)
    cents = np.asarray(new_centroids, dtype=np.float64)
    if cents.shape[1] != meta["dim"]:
        raise ValueError(f"centroid dim {cents.shape[1]} != index dim {meta['dim']}")
    new_index = IVFIndex.from_centroids(cents)
    old_cells = np.arange(meta["n_cells"])
    files = _segment_files(out_dir, state, old_cells)
    n_retrains = state.get("retrains", 0)
    new_seg = f"seg-r{n_retrains:04d}-e{state['last_epoch']:06d}"
    cent_name = f"centroids-r{n_retrains + 1:04d}.parquet"
    rows = 0
    if files:
        tref = ray.put(_tomb_frame(out_dir, state))
        iref = ray.put(new_index)

        def reassign(batch: pa.Table) -> pa.Table:
            live = _alive(batch, ray.get(tref))
            if "cell" in live.column_names:  # stray hive column, if any
                live = live.drop_columns(["cell"])
            if not live.num_rows:  # fully-tombstoned batch
                return live.append_column("cell", pa.array([], pa.int64()))
            cells = ray.get(iref).assign(_batch_matrix(live, "embedding"))
            return live.append_column("cell", pa.array(cells))

        tmp = tempfile.mkdtemp(prefix=".tmp-retrain-", dir=out_dir)
        ds = ray.data.read_parquet(files).map_batches(
            reassign, batch_format="pyarrow", zero_copy_batch=True)
        ds.write_parquet(tmp, partition_cols=["cell"])
        rows = sum(pq.read_metadata(f).num_rows for f in
                   glob.glob(os.path.join(tmp, "**", "*.parquet"), recursive=True))
        os.replace(tmp, os.path.join(out_dir, new_seg))
    pq.write_table(
        pa.table({"cell": pa.array(np.arange(len(cents), dtype=np.int64)),
                  "centroid": pa.array(list(cents), pa.list_(pa.float64()))}),
        os.path.join(out_dir, cent_name))

    old_segs, old_tombs = state["segments"], state["tombs"]
    _write_state(out_dir, {**state,
                           "segments": [new_seg] if files else [],
                           "tombs": [], "centroids": cent_name,
                           "retrains": n_retrains + 1})
    for rel in old_segs + old_tombs:
        shutil.rmtree(os.path.join(out_dir, rel), ignore_errors=True)
    return {"segment": new_seg if files else None, "rows": int(rows),
            "n_cells": int(len(cents)), "centroids": cent_name}


def cell_sizes(out_dir: str) -> dict[int, int]:
    """Alive-row count per cell (skew diagnostic feeding retrain)."""
    state = _read_state(out_dir)
    meta, _ = _load_quantizer(out_dir, state)
    tomb = _tomb_frame(out_dir, state)
    sizes: dict[int, int] = {}
    for c in range(meta["n_cells"]):
        n = 0
        for f in _segment_files(out_dir, state, np.array([c])):
            n += _alive(pq.read_table(f, columns=[*KEY_COLS, "vseq"]), tomb).num_rows
        if n:
            sizes[int(c)] = n
    return sizes
