"""CDF-maintained inverted index ≡ full rebuild at EVERY epoch, under
updates/deletes/out-of-order/schema evolution; resumable; compaction
preserves the fold."""

import os

import pandas as pd
import pyarrow.dataset as pads

from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.pipelines.inverted import (
    compact_index, maintain_index, read_index,
)
from agr_loader_ray.wal.generator import T2_CORRECTNESS, WalSpec, generate_wal


def _rebuild_from_state(lake_root: str, epoch: int) -> pd.DataFrame:
    """Oracle: tokenize the FULL live state at ``epoch``."""
    df = export_sorted(lake_root, epoch=epoch).to_pandas()
    toks = df["text"].fillna("").str.split(" ")
    flat = df[["conv_id", "turn_idx"]].join(toks.rename("token")).explode("token")
    flat = flat[flat["token"].notna() & (flat["token"] != "")]
    out = (flat.groupby(["token", "conv_id", "turn_idx"], sort=False)
           .size().reset_index(name="tf"))
    out["turn_idx"] = out["turn_idx"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return (out.sort_values(["token", "conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True))


def _index_df(out_dir: str, epoch: int | None = None) -> pd.DataFrame:
    got = read_index(out_dir, epoch=epoch).to_pandas()
    return (got.sort_values(["token", "conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)[["token", "conv_id", "turn_idx", "tf"]])


def test_index_matches_rebuild_every_epoch(tmp_lake, tmp_wal, tmp_path):
    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 8_000, "n_convs": 300})
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=8, compact_every=2)
    eng.replay(tmp_wal)
    out = str(tmp_path / "idx")

    infos = maintain_index(tmp_lake, out, n_buckets=8)
    assert len(infos) == spec.n_epochs
    for e in range(spec.n_epochs):
        got = _index_df(out, epoch=e)
        want = _rebuild_from_state(tmp_lake, e)
        pd.testing.assert_frame_equal(got, want)
    # later epochs fold deltas, not rebuilds: their delta volume must be
    # well under the full index size
    full = len(_index_df(out))
    assert all(i["counters"]["postings_delta"] < full for i in infos[1:])


def test_index_resumable_and_idempotent(tmp_lake, tmp_wal, tmp_path):
    generate_wal(tmp_wal, WalSpec(n_events=2_000, n_convs=100, n_epochs=3,
                                  update_frac=0.3, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)
    out = str(tmp_path / "idx")

    maintain_index(tmp_lake, out, n_buckets=4)
    before = _index_df(out)
    segs_before = {
        root + f for root, _, fs in os.walk(out) for f in fs
    }
    maintain_index(tmp_lake, out, n_buckets=4)  # all epochs skip
    after = _index_df(out)
    segs_after = {root + f for root, _, fs in os.walk(out) for f in fs}
    pd.testing.assert_frame_equal(before, after)
    assert segs_before == segs_after  # nothing rewritten


def test_compaction_preserves_fold(tmp_lake, tmp_wal, tmp_path):
    generate_wal(tmp_wal, WalSpec(n_events=3_000, n_convs=120, n_epochs=4,
                                  update_frac=0.4, delete_frac=0.15))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)
    out = str(tmp_path / "idx")
    maintain_index(tmp_lake, out, n_buckets=4)
    before = _index_df(out)
    stats = compact_index(out)
    assert stats["compacted_buckets"] >= 1
    after = _index_df(out)
    pd.testing.assert_frame_equal(before, after)
    # every bucket now reads one segment
    from agr_loader_ray.pipelines.inverted import _read_manifest
    epochs = [int(f.split("=")[1].split(".")[0])
              for f in os.listdir(os.path.join(out, "_manifests"))]
    m = _read_manifest(out, max(epochs))
    assert all(len(i["segments"]) <= 1 for i in m["partitions"].values())
