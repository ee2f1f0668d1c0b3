"""Persisted IVF ANN index (stages/ann_index.py): build-once/query-many
over a cell-partitioned parquet lake, read-path partition pruning,
incremental append, and equivalence with the in-memory IVF path."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data

from agr_loader_ray.stages.ann_index import (
    CELLS_DIR,
    IVFDiskIndex,
    build_ivf_index,
)
from agr_loader_ray.stages.similarity import ivf_topk

SF = "/root/testdata/sf0.001"


def _vectors(n: int, d: int = 8, seed: int = 7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })
    return vecs, tbl


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    vecs, tbl = _vectors(400)
    build_ivf_index(ray.data.from_arrow(tbl), root, vecs[:4])
    return root, vecs, tbl


def test_build_writes_hive_cells_and_meta(built):
    root, vecs, _ = built
    cells = sorted(os.listdir(os.path.join(root, CELLS_DIR)))
    assert cells == [f"cell={i}" for i in range(4)]
    idx = IVFDiskIndex.load(root)
    assert idx.meta["n_cells"] == 4 and idx.meta["dim"] == 8
    np.testing.assert_allclose(idx.index.centroids, vecs[:4])


def test_topk_reads_only_probed_cells(built):
    root, vecs, _ = built
    idx = IVFDiskIndex.load(root)
    paths = idx.probe_paths(vecs[0], n_probe=2)
    assert len(paths) == 2
    probed_rows = sum(pq.read_metadata(f).num_rows
                      for d in paths for f in glob.glob(os.path.join(d, "*.parquet")))
    assert 0 < probed_rows < 400  # pruning is real, not a post-scan filter


def test_topk_matches_in_memory_ivf(built):
    root, vecs, tbl = built
    idx = IVFDiskIndex.load(root)
    got = idx.topk(vecs[0], k=10, n_probe=2).to_pandas()
    want = ivf_topk(ray.data.from_arrow(tbl), vecs[0], k=10,
                    n_probe=2, centroids=vecs[:4]).to_pandas()
    assert got.values.tolist() == want.values.tolist()


def test_incremental_add_equals_full_rebuild(tmp_path):
    vecs, tbl = _vectors(300, seed=11)
    half_a, half_b = tbl.slice(0, 150), tbl.slice(150)

    inc_root = str(tmp_path / "inc")
    build_ivf_index(ray.data.from_arrow(half_a), inc_root, vecs[:4])
    idx = IVFDiskIndex.load(inc_root)
    idx.add(ray.data.from_arrow(half_b))

    full_root = str(tmp_path / "full")
    build_ivf_index(ray.data.from_arrow(tbl), full_root, vecs[:4])

    q = vecs[42]
    got = idx.topk(q, k=8, n_probe=3).to_pandas()
    want = IVFDiskIndex.load(full_root).topk(q, k=8, n_probe=3).to_pandas()
    assert got.values.tolist() == want.values.tolist()


def test_dim_mismatch_raises(built):
    root, _, _ = built
    idx = IVFDiskIndex.load(root)
    with pytest.raises(ValueError, match="dim"):
        idx.topk(np.zeros(5), k=3)


def test_persisted_query_matches_oracle():
    """The registered query (cache-built index under /tmp) against its
    DuckDB SQL mirror at sf0.001 — the same compare the driver runs."""
    import duckdb

    import __ray_entry__ as entry

    got = entry.queries()["ann_index_persisted_topk"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = con.sql(entry.oracle_sql()["ann_index_persisted_topk"]).df()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), want["sim"].to_numpy(),
                               atol=1e-9)
    # second call hits the persisted index (build cached by source mtime)
    again = entry.queries()["ann_index_persisted_topk"](SF).to_pandas()
    assert again["vec_id"].tolist() == want["vec_id"].tolist()
