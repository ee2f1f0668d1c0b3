"""Incrementally-maintained vector index (pipelines/vector_ivm.py):
CDF-maintained IVF segments + tombstones must answer queries exactly
like a brute-force rebuild from the lake at EVERY epoch, survive
compaction unchanged, stay idempotent, and prune reads to probed cells."""

import os

import numpy as np
import pandas as pd
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import read_lake
from agr_loader_ray.pipelines.vector_ivm import (
    _load_quantizer,
    _read_state,
    _segment_files,
    compact_index,
    init_vector_index,
    maintain_epoch,
    maintain_vector_index,
    query_topk,
)
from agr_loader_ray.stages.similarity import round_half_away
from agr_loader_ray.stages.text import hash_embed_texts
from agr_loader_ray.wal.generator import T2_CORRECTNESS, WalSpec, generate_wal

QUERY_TEXT = "conversation about data tables and rows"
DIM, N_CELLS, K, N_PROBE = 16, 8, 10, 3


def _expected(lake_root, epoch, out_dir) -> pd.DataFrame:
    """Brute-force oracle: embed the WHOLE lake state at ``epoch``,
    assign cells with the index's own quantizer, keep only the probed
    cells, exact cosine top-k with the query's tie order."""
    meta, index = _load_quantizer(out_dir)
    df = (read_lake(lake_root, epoch=epoch).to_pandas()
          .sort_values(["conv_id", "turn_idx"], kind="mergesort"))
    emb = hash_embed_texts(df["text"].tolist(), meta["dim"])
    q = hash_embed_texts([QUERY_TEXT], meta["dim"])[0]
    probed = set(index.probe_cells(q, N_PROBE).tolist())
    elig = np.array([c in probed for c in index.assign(emb)]) if len(df) else np.array([], bool)
    df = df[elig].reset_index(drop=True)
    emb = emb[elig]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    df["sim"] = round_half_away(emb @ qn / norms, 6)
    return (df.sort_values(["sim", "conv_id", "turn_idx"],
                           ascending=[False, True, True], kind="mergesort")
            .head(K)[["conv_id", "turn_idx", "sim"]].reset_index(drop=True))


@pytest.fixture()
def lake(tmp_lake, tmp_wal):
    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 12_000, "n_convs": 300,
                      "delete_frac": 0.15, "update_frac": 0.3, "n_epochs": 5})
    generate_wal(tmp_wal, spec)
    CdcEngine(tmp_lake, n_partitions=8).replay(tmp_wal)
    return tmp_lake, spec


def _got(out_dir) -> pd.DataFrame:
    return query_topk(out_dir, QUERY_TEXT, k=K, n_probe=N_PROBE).reset_index(drop=True)


def _assert_same(got: pd.DataFrame, want: pd.DataFrame):
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": np.int64, "sim": np.float64}),
        want.astype({"turn_idx": np.int64, "sim": np.float64}))


def test_maintained_equals_bruteforce_every_epoch(lake, tmp_path):
    lake_root, spec = lake
    out = str(tmp_path / "vidx")
    init_vector_index(out, dim=DIM, n_cells=N_CELLS)
    infos = []
    for e in range(spec.n_epochs):
        infos.append(maintain_epoch(lake_root, out, e))
        _assert_same(_got(out), _expected(lake_root, e, out))
    # churn must exercise both the add and the tombstone path
    assert sum(i["adds"] for i in infos) > 0
    assert sum(i["tombstones"] for i in infos[1:]) > 0


def test_compaction_preserves_results_and_folds_tombs(lake, tmp_path):
    lake_root, spec = lake
    out = str(tmp_path / "vidx")
    maintain_vector_index(lake_root, out, dim=DIM, n_cells=N_CELLS)
    before = _got(out)
    pre_state = _read_state(out)
    assert len(pre_state["segments"]) > 1 and pre_state["tombs"]

    info = compact_index(out)
    state = _read_state(out)
    assert state["segments"] == [info["segment"]] and state["tombs"] == []
    _assert_same(_got(out), before)
    # dead rows are physically gone: total rows == the alive count
    import pyarrow.parquet as pq
    files = _segment_files(out, state, np.arange(N_CELLS))
    total = sum(pq.read_metadata(f).num_rows for f in files)
    alive = len(read_lake(lake_root, epoch=spec.n_epochs - 1).to_pandas())
    assert total == alive == info["rows"]
    # old segment/tomb dirs removed from disk
    for rel in pre_state["segments"] + pre_state["tombs"]:
        assert not os.path.exists(os.path.join(out, rel))
    # maintenance continues cleanly after a compaction (idempotent skip)
    assert maintain_epoch(lake_root, out, spec.n_epochs - 1)["skipped"]


def test_idempotent_skip_and_order_guard(lake, tmp_path):
    lake_root, _ = lake
    out = str(tmp_path / "vidx")
    init_vector_index(out, dim=DIM, n_cells=N_CELLS)
    assert not maintain_epoch(lake_root, out, 0)["skipped"]
    assert maintain_epoch(lake_root, out, 0)["skipped"]
    with pytest.raises(ValueError, match="out of order"):
        maintain_epoch(lake_root, out, 3)


def test_query_reads_only_probed_cells(lake, tmp_path):
    lake_root, _ = lake
    out = str(tmp_path / "vidx")
    maintain_vector_index(lake_root, out, dim=DIM, n_cells=N_CELLS)
    state = _read_state(out)
    meta, index = _load_quantizer(out)
    q = hash_embed_texts([QUERY_TEXT], meta["dim"])[0]
    probed = _segment_files(out, state, index.probe_cells(q, N_PROBE))
    all_files = _segment_files(out, state, np.arange(N_CELLS))
    assert 0 < len(probed) < len(all_files)


def test_retrain_swaps_geometry_atomically(lake, tmp_path):
    """Retrain reassigns every alive row under the new centroids (no
    re-embed), clears tombstones, changes n_cells, and — because the
    centroids file is resolved THROUGH the state json — queries after a
    subsequent compaction still use the new geometry."""
    from agr_loader_ray.pipelines.vector_ivm import (
        cell_sizes,
        read_alive,
        retrain_index,
    )
    from agr_loader_ray.stages.similarity import IVFIndex

    lake_root, spec = lake
    out = str(tmp_path / "vidx")
    maintain_vector_index(lake_root, out, dim=DIM, n_cells=N_CELLS)
    before_alive = (read_alive(out).to_pandas()
                    .sort_values(["conv_id", "turn_idx"], kind="mergesort")
                    .reset_index(drop=True))

    # data-trained quantizer with a DIFFERENT cell count
    df = read_lake(lake_root).to_pandas().head(256)
    sample = hash_embed_texts(df["text"].tolist(), DIM)
    new_cents = IVFIndex(sample, n_cells=4, seed=1).centroids
    info = retrain_index(out, new_cents)
    assert info["n_cells"] == 4 and info["rows"] == len(before_alive)

    state = _read_state(out)
    assert state["tombs"] == [] and state["segments"] == [info["segment"]]
    assert state["centroids"] == info["centroids"]
    meta, idx = _load_quantizer(out)
    assert meta["n_cells"] == 4
    np.testing.assert_allclose(idx.centroids, new_cents)

    # alive membership unchanged; every row lives in its NEW cell
    after_alive = (read_alive(out).to_pandas()
                   .sort_values(["conv_id", "turn_idx"], kind="mergesort")
                   .reset_index(drop=True))
    pd.testing.assert_frame_equal(after_alive, before_alive)
    assert sum(cell_sizes(out).values()) == len(before_alive)

    # query equals the brute-force oracle under the NEW quantizer, and
    # survives a compaction (the state json carries the centroids file)
    _assert_same(_got(out), _expected(lake_root, spec.n_epochs - 1, out))
    compact_index(out)
    assert _read_state(out)["centroids"] == info["centroids"]
    _assert_same(_got(out), _expected(lake_root, spec.n_epochs - 1, out))


def test_retrain_dim_guard(lake, tmp_path):
    from agr_loader_ray.pipelines.vector_ivm import retrain_index

    lake_root, _ = lake
    out = str(tmp_path / "vidx")
    init_vector_index(out, dim=DIM, n_cells=N_CELLS)
    maintain_epoch(lake_root, out, 0)
    with pytest.raises(ValueError, match="dim"):
        retrain_index(out, np.zeros((4, DIM + 1)))
