"""Lake vacuum (retention GC / expire-snapshots): watermark-first
protocol, idempotence, live-state preservation, time-travel fencing."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import (change_feed, export_sorted,
                                             point_lookup, read_lake)
from agr_loader_ray.state.manifest import LakeManifest
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=6_000, n_convs=200, n_epochs=5,
               update_frac=0.3, delete_frac=0.1)


def _lake_files(lake_root):
    out = []
    for d in sorted(os.listdir(lake_root)):
        if d.startswith("part=") and os.path.isdir(os.path.join(lake_root, d)):
            for f in sorted(os.listdir(os.path.join(lake_root, d))):
                if f.endswith(".parquet"):
                    out.append(os.path.join(d, f))
    return out


@pytest.fixture()
def replayed(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)  # keep deltas
    eng.replay(wal)
    return eng, wal, lake


def test_vacuum_preserves_current_state_and_removes_old_files(replayed):
    eng, wal, lake = replayed
    before = export_sorted(lake).to_pandas().reset_index(drop=True)
    n_before = len(_lake_files(lake))

    eng.compact()  # supersede the per-epoch deltas with one base per part
    stats = eng.vacuum(retain_epochs=1)
    assert stats["removed_files"] > 0
    assert len(_lake_files(lake)) == n_before + 4 - stats["removed_files"]

    after = export_sorted(lake).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas())
    assert len(after) == len(want)


def test_vacuum_is_idempotent_and_watermark_monotonic(replayed):
    eng, _, lake = replayed
    eng.compact()
    s1 = eng.vacuum(retain_epochs=1)
    s2 = eng.vacuum(retain_epochs=1)
    assert s2["removed_files"] == 0
    assert s2["min_readable_epoch"] == s1["min_readable_epoch"]
    # asking to retain MORE epochs later cannot move the watermark back
    s3 = eng.vacuum(retain_epochs=3)
    assert s3["min_readable_epoch"] >= s1["min_readable_epoch"]


def test_time_travel_below_watermark_raises(replayed):
    eng, _, lake = replayed
    last = eng.manifest.last_committed_epoch()
    # readable pre-vacuum
    assert read_lake(lake, epoch=0).count() > 0
    eng.compact()
    eng.vacuum(retain_epochs=1)
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=0)
    with pytest.raises(ValueError, match="vacuumed"):
        point_lookup(lake, "conv-000001", 0, epoch=0)
    with pytest.raises(ValueError, match="vacuumed"):
        change_feed(lake, last)  # needs last-1's (vacuumed) pre-image
    # current epoch stays fully readable
    assert read_lake(lake, epoch=last).count() > 0


def test_vacuum_respects_retained_time_travel(replayed):
    eng, _, lake = replayed
    last = eng.manifest.last_committed_epoch()
    keep_from = last - 1
    pre = read_lake(lake, epoch=keep_from).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    eng.vacuum(retain_epochs=2)
    post = read_lake(lake, epoch=keep_from).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pre, post)
    # change feed across the two retained epochs still works
    assert change_feed(lake, last).count() >= 0
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=keep_from - 1)


def test_vacuum_then_new_epochs_then_vacuum_again(tmp_path):
    """Vacuum mid-lifecycle: replay part of the WAL, vacuum, apply the
    remaining epochs, vacuum again — final state equals the oracle."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)
    eng.replay(wal, upto_epoch=2)
    eng.compact()
    eng.vacuum(retain_epochs=1)
    eng.replay(wal)  # resumes from the checkpoint, applies epochs 3..4
    eng.compact()
    eng.vacuum(retain_epochs=1)
    got = export_sorted(lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_watermark_published_before_deletion(replayed, monkeypatch):
    """Crash between watermark publish and file deletion must leave a
    readable current epoch and a re-runnable vacuum."""
    eng, _, lake = replayed
    eng.compact()

    calls = {"n": 0}
    real_remove = os.remove

    def crashing_remove(path):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash mid-vacuum")
        calls["n"] += 1
        real_remove(path)

    monkeypatch.setattr(os, "remove", crashing_remove)
    with pytest.raises(RuntimeError):
        eng.vacuum(retain_epochs=1)
    monkeypatch.setattr(os, "remove", real_remove)

    # watermark is already visible -> old reads fenced, current fine
    m = LakeManifest(lake)
    assert m.min_readable_epoch() is not None
    assert export_sorted(lake).count() > 0
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=0)
    # re-run completes the deletion
    s = eng.vacuum(retain_epochs=1)
    assert s["removed_files"] > 0
    assert export_sorted(lake).count() > 0


# --------------------------------------------------------------------------
# range_scan: row-group data skipping over the merge-on-read lake
# --------------------------------------------------------------------------
def test_range_scan_equals_filtered_read(replayed):
    from agr_loader_ray.pipelines.export import range_scan

    eng, _, lake = replayed
    lo, hi = "conv-00000010", "conv-00000040"
    got = range_scan(lake, lo, hi).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    full = export_sorted(lake).to_pandas()
    want = full[(full["conv_id"] >= lo) & (full["conv_id"] <= hi)] \
        .reset_index(drop=True)
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0


def test_range_scan_prunes_row_groups_on_compacted_lake(tmp_path):
    from agr_loader_ray.pipelines.export import range_scan

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, WalSpec(n_events=40_000, n_convs=2_000, n_epochs=2,
                              update_frac=0.2, delete_frac=0.05))
    eng = CdcEngine(lake, n_partitions=4)
    eng.replay(wal)
    # key-sorted bases + bounded row groups -> tight row-group stats
    eng.compact(row_group_size=1024)

    lo, hi = "conv-00000100", "conv-00000120"
    ds, stats = range_scan(lake, lo, hi, with_stats=True)
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    full = export_sorted(lake).to_pandas()
    want = full[(full["conv_id"] >= lo) & (full["conv_id"] <= hi)] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    assert stats["row_groups_pruned"] > 0, stats


def test_range_scan_empty_range_and_vacuum_fence(replayed):
    from agr_loader_ray.pipelines.export import range_scan

    eng, _, lake = replayed
    assert range_scan(lake, "zzz", "zzzz").count() == 0
    with pytest.raises(ValueError, match="empty range"):
        range_scan(lake, "b", "a")
    eng.compact()
    eng.vacuum(retain_epochs=1)
    with pytest.raises(ValueError, match="vacuumed"):
        range_scan(lake, "conv-00000001", "conv-00000002", epoch=0)


# --------------------------------------------------------------------------
# size-bounded multi-file base compaction
# --------------------------------------------------------------------------
def test_compact_split_base_roundtrip(tmp_path):
    """compact(max_rows_per_file) splits each partition's sorted base
    into disjoint key-range parts; reads, lookups, later epochs, range
    scans and vacuum all keep working on the list-valued base."""
    from agr_loader_ray.pipelines.export import point_lookup, range_scan

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)
    eng.replay(wal, upto_epoch=3)
    before = export_sorted(lake).to_pandas().reset_index(drop=True)

    eng.compact(max_rows_per_file=200)
    info = next(iter(eng.manifest.current_partitions().values()))
    assert isinstance(info["base"], list) and len(info["base"]) > 1
    after = export_sorted(lake).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    # point lookup + range scan over split bases
    key = before.iloc[0]
    row = point_lookup(lake, key["conv_id"], int(key["turn_idx"]))
    assert row is not None and row["conv_id"] == key["conv_id"]
    lo, hi = "conv-00000010", "conv-00000040"
    got = range_scan(lake, lo, hi).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = after[(after["conv_id"] >= lo) & (after["conv_id"] <= hi)] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    # later epochs apply on top of the split base; final state == oracle
    eng.replay(wal)
    eng.compact(max_rows_per_file=200)
    eng.vacuum(retain_epochs=1)
    got = export_sorted(lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)
