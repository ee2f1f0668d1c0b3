"""Savepoints: vacuum-exempt pinned snapshots (the Hudi SAVEPOINT /
Iceberg tagged-snapshot move).  A pinned epoch stays time-travel
readable and RESTORE-able no matter how far the retention watermark
advances; release makes its files garbage at the next vacuum."""

import os

import pandas as pd
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine, lake_history
from agr_loader_ray.pipelines.export import export_sorted, read_lake
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=6_000, n_convs=200, n_epochs=5,
               update_frac=0.3, delete_frac=0.1)


@pytest.fixture()
def replayed(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)  # keep deltas
    eng.replay(wal)
    return eng, wal, lake


def _snap(lake, epoch):
    return (export_sorted(lake, epoch=epoch).to_pandas()
            .reset_index(drop=True))


def test_savepoint_survives_vacuum(replayed, tmp_path):
    eng, _, lake = replayed
    pinned = _snap(lake, 1)
    eng.savepoint(epoch=1, name="pre-migration")

    eng.compact()
    stats = eng.vacuum(retain_epochs=1)
    assert stats["removed_files"] > 0
    assert 1 in stats["savepoints_pinned"]
    assert stats["min_readable_epoch"] > 1  # watermark moved PAST the pin

    # the pinned epoch reads back exactly; its unpinned neighbors are gone
    pd.testing.assert_frame_equal(_snap(lake, 1), pinned)
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=0)
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=2)


def test_restore_to_savepoint_below_watermark(replayed):
    eng, _, lake = replayed
    pinned = _snap(lake, 1)
    eng.savepoint(epoch=1)
    eng.compact()
    eng.vacuum(retain_epochs=1)

    r = eng.restore(1)
    assert r["restored_from"] == 1 and not r["noop"]
    pd.testing.assert_frame_equal(_snap(lake, None), pinned)


def test_release_then_vacuum_frees_files(replayed):
    eng, _, lake = replayed
    eng.savepoint(epoch=1)
    eng.compact()
    s1 = eng.vacuum(retain_epochs=1)
    assert s1["savepoints_pinned"] == [1]
    assert read_lake(lake, epoch=1).count() > 0

    eng.release_savepoint(1)
    s2 = eng.vacuum(retain_epochs=1)
    assert s2["removed_files"] > 0 and s2["savepoints_pinned"] == []
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake(lake, epoch=1)


def test_savepoint_validation_and_idempotence(replayed):
    eng, _, lake = replayed
    # default pins the latest epoch; re-pin refreshes the name
    last = eng.manifest.last_committed_epoch()
    assert eng.savepoint()["epoch"] == last
    assert eng.savepoint(name="v2")["name"] == "v2"
    assert eng.manifest.read_savepoints()[last]["name"] == "v2"

    with pytest.raises(ValueError, match="not committed"):
        eng.savepoint(epoch=99)
    with pytest.raises(KeyError, match="no savepoint"):
        eng.release_savepoint(0)

    # pinning an already-vacuumed epoch is refused (its files are gone)
    eng.compact()
    eng.vacuum(retain_epochs=1)
    with pytest.raises(ValueError, match="vacuumed"):
        eng.savepoint(epoch=0)


def test_clone_and_sync_carry_savepoints(replayed, tmp_path):
    eng, _, lake = replayed
    pinned = _snap(lake, 1)
    eng.savepoint(epoch=1, name="keep")
    eng.compact()
    eng.vacuum(retain_epochs=1)

    clone = str(tmp_path / "clone")
    eng.clone_to(clone)
    # the savepointed pre-watermark epoch is part of the clone
    pd.testing.assert_frame_equal(_snap(clone, 1), pinned)
    assert CdcEngine(clone).manifest.read_savepoints()[1]["name"] == "keep"
    # a vacuum on the clone keeps honoring the pin
    CdcEngine(clone).vacuum(retain_epochs=1)
    pd.testing.assert_frame_equal(_snap(clone, 1), pinned)

    # a replica that vacuumed epoch 1 LOCALLY (no pin on its side yet)
    # gets the pinned epoch's files re-shipped by sync
    replica = str(tmp_path / "replica")
    rep = CdcEngine(clone)
    rep.release_savepoint(1)
    rep.clone_to(replica)  # released → epoch 1 not cloned to the replica
    assert not os.path.exists(
        CdcEngine(replica).manifest.epoch_manifest_path(1))
    eng.sync_to(replica)   # source still pins epoch 1
    pd.testing.assert_frame_equal(_snap(replica, 1), pinned)
    assert CdcEngine(replica).manifest.read_savepoints()[1]["name"] == "keep"


def test_history_marks_savepoints(replayed):
    eng, _, lake = replayed
    eng.savepoint(epoch=1, name="audit")
    eng.compact()
    eng.vacuum(retain_epochs=1)
    hist = {h["epoch"]: h for h in lake_history(lake)}
    assert "savepoint(audit)" in hist[1]["operations"]
    assert hist[1]["readable"] and not hist[0]["readable"]
