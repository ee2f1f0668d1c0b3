"""Persisted IVF ANN index: build once → query many over parquet.

``build_ivf_index`` runs the one expensive pass — assign every vector
to its nearest centroid (broadcast centroids, zero-copy Arrow batches)
— and writes the table hive-partitioned by cell
(``<root>/cells/cell=K/*.parquet``) plus ``centroids.parquet`` and
``meta.json``.  ``IVFDiskIndex.load`` then answers any number of
queries by reading ONLY the ``n_probe`` nearest cells' files: the
query-time I/O is ~``n_probe / n_cells`` of the lake, enforced by
read-path partition pruning rather than a filter after a full scan.
That is the shape that matters at 100 TB — the 10^10-row assign pass
is paid once per corpus epoch, not once per query.

Incremental ``add`` appends new parquet files into the same cell
directories (parquet lakes are append-by-file; Ray's UUID filenames
make concurrent appends collision-free), so the index absorbs new WAL
epochs without a rebuild.

Reference analogue: the reference builds per-dataset lookup stores
once up front and resolves every record against them during the load
(/root/reference/src/etl/helpers/resource_descriptor_helper.py:20-60
pattern of build-once/query-many); here the prebuilt store is a
cell-partitioned vector lake.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.pools import pool
from .similarity import IVFIndex, _batch_matrix, brute_force_topk

META_NAME = "meta.json"
CENTROIDS_NAME = "centroids.parquet"
CELLS_DIR = "cells"


def _cell_dir(root: str, cell: int) -> str:
    return os.path.join(root, CELLS_DIR, f"cell={int(cell)}")


class _Assign:
    """Actor-pool stage: broadcast centroids read once per actor."""

    def __init__(self, iref, vec_col: str):
        self.index: IVFIndex = ray.get(iref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cells = self.index.assign(_batch_matrix(batch, self.vec_col))
        return batch.append_column("cell", pa.array(cells))


def _write_cells(ds: "ray.data.Dataset", root: str, index: IVFIndex,
                 vec_col: str) -> None:
    iref = ray.put(index)
    from ..functions.pools import task_stage

    assigned = ds.map_batches(task_stage(_Assign, iref, vec_col),
                              batch_format="pyarrow", zero_copy_batch=True)
    assigned.write_parquet(os.path.join(root, CELLS_DIR),
                           partition_cols=["cell"])


def build_ivf_index(ds: "ray.data.Dataset", root: str, centroids: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> dict:
    """One-pass build: assign → hive-partitioned parquet + metadata.

    ``centroids`` is the (n_cells, dim) coarse quantizer — trained
    sample k-means (``IVFIndex``) or deterministic data vectors; it is
    the genuinely small side and is persisted whole.
    """
    centroids = np.asarray(centroids, dtype=np.float64)
    index = IVFIndex.from_centroids(centroids)
    os.makedirs(root, exist_ok=True)
    _write_cells(ds, root, index, vec_col)
    pq.write_table(
        pa.table({
            "cell": pa.array(np.arange(len(centroids), dtype=np.int64)),
            "centroid": pa.array(list(centroids),
                                 pa.list_(pa.float64())),
        }),
        os.path.join(root, CENTROIDS_NAME),
    )
    meta = {
        "format": "ivf-parquet-v1",
        "n_cells": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    with open(os.path.join(root, META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


class IVFDiskIndex:
    """Query handle over a persisted index directory."""

    def __init__(self, root: str, meta: dict, centroids: np.ndarray):
        self.root = root
        self.meta = meta
        self.index = IVFIndex.from_centroids(centroids)

    @classmethod
    def load(cls, root: str) -> "IVFDiskIndex":
        with open(os.path.join(root, META_NAME)) as f:
            meta = json.load(f)
        if meta.get("format") != "ivf-parquet-v1":
            raise ValueError(f"not an ivf-parquet-v1 index: {root}")
        cent_tbl = pq.read_table(os.path.join(root, CENTROIDS_NAME)).sort_by("cell")
        centroids = np.array(cent_tbl["centroid"].to_pylist(), dtype=np.float64)
        return cls(root, meta, centroids)

    def probe_paths(self, query_vec: np.ndarray, n_probe: int) -> list[str]:
        """Directories of the n_probe nearest cells that exist on disk
        (a cell with no assigned vectors has no directory)."""
        cells = self.index.probe_cells(np.asarray(query_vec, np.float64), n_probe)
        return [p for c in cells if os.path.isdir(p := _cell_dir(self.root, c))]

    def topk(self, query_vec: np.ndarray, k: int = 10,
             n_probe: int = 4) -> "ray.data.Dataset":
        """Exact cosine top-k over ONLY the probed cells' parquet files."""
        q = np.asarray(query_vec, dtype=np.float64)
        if len(q) != self.meta["dim"]:
            raise ValueError(f"query dim {len(q)} != index dim {self.meta['dim']}")
        import glob

        files = [f for d in self.probe_paths(q, n_probe)
                 for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
        if not files:
            return ray.data.from_arrow(pa.table({
                self.meta["id_col"]: pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }))
        pruned = ray.data.read_parquet(
            files, columns=[self.meta["id_col"], self.meta["vec_col"]])
        return brute_force_topk(pruned, q, k=k, id_col=self.meta["id_col"],
                                vec_col=self.meta["vec_col"])

    def add(self, ds: "ray.data.Dataset") -> None:
        """Incremental append: assign the new vectors with the SAME
        centroids and drop their files into the existing cell dirs —
        no rebuild, no touch of the resident data."""
        _write_cells(ds, self.root, self.index, self.meta["vec_col"])
