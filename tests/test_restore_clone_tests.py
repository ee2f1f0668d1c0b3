"""RESTORE (epoch rollback) and CLONE (hardlink snapshot copy)."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted, point_lookup
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=6_000, n_convs=200, n_epochs=5,
               update_frac=0.3, delete_frac=0.1)


@pytest.fixture()
def replayed(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal)
    return eng, wal, lake


# --------------------------------------------------------------------------
# restore
# --------------------------------------------------------------------------
def test_restore_rolls_state_back_metadata_only(replayed, tmp_path):
    eng, wal, lake = replayed
    snap2 = export_sorted(lake, epoch=2).to_pandas().reset_index(drop=True)
    final = export_sorted(lake).to_pandas().reset_index(drop=True)
    assert not snap2.equals(final)

    files_before = sum(len(fs) for _, _, fs in os.walk(lake))
    r = eng.restore(2)
    assert r == {"restored_from": 2, "current_epoch": 4, "noop": False}
    # metadata-only: no data file was added or removed
    assert sum(len(fs) for _, _, fs in os.walk(lake)) == files_before

    cur = export_sorted(lake).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(cur, snap2)

    # lineage recorded; epoch numbering preserved
    m = eng.manifest.read_epoch(4)
    assert m["restored_from"] == 2 and m["epoch"] == 4

    # point lookups serve the restored snapshot
    key = snap2.iloc[0]
    row = point_lookup(lake, key["conv_id"], int(key["turn_idx"]))
    assert row is not None and row["text"] == key["text"]

    # restore forward again (epoch 4's manifest was overwritten, but
    # epoch 3 still has the pre-restore chain): noop + idempotence
    assert eng.restore(4)["noop"] is True
    r2 = eng.restore(2)
    pd.testing.assert_frame_equal(
        export_sorted(lake).to_pandas().reset_index(drop=True), snap2)
    assert r2["noop"] is False


def test_restore_below_vacuum_watermark_raises(replayed):
    eng, wal, lake = replayed
    eng.vacuum(retain_epochs=2)
    with pytest.raises(ValueError, match="vacuumed"):
        eng.restore(1)
    # restoring within the retained window still works
    eng.restore(3)
    got = export_sorted(lake).to_pandas()
    assert len(got) > 0


def test_replay_after_restore_applies_future_epochs_only(tmp_path):
    """Restore to an early epoch, then replay: already-committed WAL
    epochs stay consumed (exactly-once), so the state remains the
    restored snapshot — the documented undo semantics."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal)
    snap1 = export_sorted(lake, epoch=1).to_pandas().reset_index(drop=True)
    eng.restore(1)
    r = eng.replay(wal)
    assert r["events_applied"] == 0  # nothing new to apply
    pd.testing.assert_frame_equal(
        export_sorted(lake).to_pandas().reset_index(drop=True), snap1)


# --------------------------------------------------------------------------
# clone
# --------------------------------------------------------------------------
def test_clone_snapshot_equality_and_independence(replayed, tmp_path):
    eng, wal, lake = replayed
    clone = str(tmp_path / "clone")
    r = eng.clone_to(clone)
    assert r["files_linked"] + r["files_copied"] > 0

    src_df = export_sorted(lake).to_pandas().reset_index(drop=True)
    cl_df = export_sorted(clone).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(src_df, cl_df)

    # independence: compaction + vacuum on the SOURCE (rewrites bases,
    # unlinks old names) must not disturb the clone
    eng.compact()
    eng.vacuum(retain_epochs=1)
    cl_df2 = export_sorted(clone).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(cl_df2, src_df)

    # clone is writable: its own engine can restore without touching
    # the source
    ceng = CdcEngine(clone, n_partitions=4, compact_every=3)
    ceng.restore(2)
    assert len(export_sorted(clone).to_pandas()) > 0
    pd.testing.assert_frame_equal(
        export_sorted(lake).to_pandas().reset_index(drop=True), src_df)


def test_clone_refuses_nonempty_target(replayed, tmp_path):
    eng, wal, lake = replayed
    tgt = tmp_path / "occupied"
    tgt.mkdir()
    (tgt / "junk").write_text("x")
    with pytest.raises(FileExistsError):
        eng.clone_to(str(tgt))


def test_clone_after_vacuum_skips_expired_epochs(replayed, tmp_path):
    eng, wal, lake = replayed
    eng.vacuum(retain_epochs=2)
    clone = str(tmp_path / "clone")
    eng.clone_to(clone)
    cl = CdcEngine(clone, n_partitions=4).manifest
    assert cl.min_readable_epoch() == 3
    pd.testing.assert_frame_equal(
        export_sorted(clone).to_pandas().reset_index(drop=True),
        export_sorted(lake).to_pandas().reset_index(drop=True))


# --------------------------------------------------------------------------
# incremental replication (sync_to)
# --------------------------------------------------------------------------
def test_sync_to_ships_new_epochs_incrementally(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal, upto_epoch=2)
    replica = str(tmp_path / "replica")
    eng.clone_to(replica)

    # source advances; replica refreshes incrementally
    eng.replay(wal)
    r = eng.sync_to(replica)
    assert r["epochs_shipped"] >= 2 and r["files_linked"] > 0
    pd.testing.assert_frame_equal(
        export_sorted(replica).to_pandas().reset_index(drop=True),
        export_sorted(lake).to_pandas().reset_index(drop=True))

    # idempotent: nothing new to ship but the (re-shipped) last manifest
    r2 = eng.sync_to(replica)
    assert r2["files_linked"] == 0 and r2["files_copied"] == 0


def test_sync_to_reships_in_place_rewrites(tmp_path):
    """compact/purge rewrite the LAST epoch's manifest in place; a sync
    afterwards must pick up the new file set under the same epoch id."""
    import pyarrow.compute as pc

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)
    eng.replay(wal)
    replica = str(tmp_path / "replica")
    eng.clone_to(replica)

    eng.compact()

    def pred(t):
        import pyarrow as pa
        return pc.is_in(t["conv_id"],
                        value_set=pa.array(["conv-00000005"]))

    eng.purge(pred)
    eng.sync_to(replica)
    pd.testing.assert_frame_equal(
        export_sorted(replica).to_pandas().reset_index(drop=True),
        export_sorted(lake).to_pandas().reset_index(drop=True))
    assert point_lookup(replica, "conv-00000005", 0) is None

    # replica vacuum watermark follows the source forward-only
    eng.vacuum(retain_epochs=1)
    eng.sync_to(replica)
    tgt = CdcEngine(replica, n_partitions=4).manifest
    assert tgt.min_readable_epoch() == eng.manifest.min_readable_epoch()


def test_sync_to_empty_target_full_clones(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal)
    replica = str(tmp_path / "fresh")
    r = eng.sync_to(replica)
    assert "files_linked" in r
    pd.testing.assert_frame_equal(
        export_sorted(replica).to_pandas().reset_index(drop=True),
        export_sorted(lake).to_pandas().reset_index(drop=True))


def test_sync_to_carries_schema_evolution(tmp_path):
    """Schema S-events landing AFTER the clone must reach the replica
    through sync (the registry rides inside each epoch manifest)."""
    import json as _json

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    spec = WalSpec(
        n_events=3_000, n_convs=100, n_epochs=4, update_frac=0.2,
        schema_events=(
            (0.6, _json.dumps({"kind": "add_column", "name": "lang",
                               "type": "string", "default": "en"})),
            (0.8, _json.dumps({"kind": "widen", "name": "turn_idx",
                               "to": "int64"})),
        ),
    )
    generate_wal(wal, spec)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal, upto_epoch=1)          # before the S-events
    replica = str(tmp_path / "replica")
    eng.clone_to(replica)
    assert "lang" not in export_sorted(replica).schema().names

    eng.replay(wal)                         # schema evolves on the source
    eng.sync_to(replica)
    src = export_sorted(lake).to_pandas().reset_index(drop=True)
    rep = export_sorted(replica).to_pandas().reset_index(drop=True)
    assert "lang" in rep.columns
    pd.testing.assert_frame_equal(rep, src)


def test_sync_to_crash_mid_ship_rerun_converges(tmp_path, monkeypatch):
    """Files ship BEFORE manifests, so a crash mid-sync leaves the
    replica at its previous consistent state; the rerun converges."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=3)
    eng.replay(wal, upto_epoch=1)
    replica = str(tmp_path / "replica")
    eng.clone_to(replica)
    before = export_sorted(replica).to_pandas().reset_index(drop=True)
    eng.replay(wal)

    from agr_loader_ray.state import commit_io as cio

    real = cio.LocalCommitIO.publish_json
    calls = {"n": 0}

    def exploding(self, path, obj):
        if "_manifests" in path and replica in path:
            calls["n"] += 1
            if calls["n"] == 2:          # die on the second manifest
                raise RuntimeError("injected crash")
        return real(self, path, obj)

    monkeypatch.setattr(cio.LocalCommitIO, "publish_json", exploding)
    with pytest.raises(RuntimeError, match="injected"):
        eng.sync_to(replica)
    monkeypatch.setattr(cio.LocalCommitIO, "publish_json", real)

    # replica is still a readable, consistent (older) snapshot
    mid = export_sorted(replica).to_pandas()
    assert len(mid) > 0

    # rerun converges to the source state
    eng.sync_to(replica)
    pd.testing.assert_frame_equal(
        export_sorted(replica).to_pandas().reset_index(drop=True),
        export_sorted(lake).to_pandas().reset_index(drop=True))


def test_lake_history_describes_lifecycle(replayed):
    import pyarrow as pa
    import pyarrow.compute as pc

    from agr_loader_ray.pipelines.engine import lake_history

    eng, wal, lake = replayed
    eng.restore(2)
    eng.purge(lambda t: pc.is_in(
        t["conv_id"], value_set=pa.array(["conv-00000001"])))
    eng.vacuum(retain_epochs=2)

    hist = lake_history(lake)
    assert [h["epoch"] for h in hist] == [0, 1, 2, 3, 4]
    last = hist[-1]
    assert "restore(from=2)" in last["operations"]
    assert any(op.startswith("purge(seq=1") for op in last["operations"])
    assert last["schema_version"] >= 0 and last["rows"] > 0
    assert [h["readable"] for h in hist] == [False, False, False, True, True]


# --------------------------------------------------------------------------
# lake_diff (replication verification / Merkle walk)
# --------------------------------------------------------------------------
def test_lake_diff_clone_equal_then_diverge_then_sync(replayed, tmp_path):
    from agr_loader_ray.pipelines.engine import lake_diff

    eng, wal, lake = replayed
    replica = str(tmp_path / "replica")
    eng.clone_to(replica)
    d = lake_diff(lake, replica)
    assert d["equal"] and d["differing_partitions"] == []

    # source advances by one epoch of genuinely NEW events → replica
    # differs in exactly the partitions that epoch touched
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from agr_loader_ray.schemas import WAL_SCHEMA

    rows = [{"offset": 10_000_000 + i, "epoch": 5, "op": "I",
             "conv_id": f"conv-new-{i}", "turn_idx": 0, "role": "user",
             "text": f"new {i}", "tool": "", "ts": None, "schema_change": ""}
            for i in range(6)]
    t = pa.Table.from_pylist(rows, schema=WAL_SCHEMA.remove_metadata())
    ts_vals = np.array([np.datetime64(1_800_000_000_000_000 + i, "us")
                        for i in range(6)], dtype="datetime64[us]")
    t = t.set_column(t.schema.get_field_index("ts"), "ts", pa.array(ts_vals))
    edir = os.path.join(wal, "epoch=5")
    os.makedirs(edir)
    pq.write_table(t, os.path.join(edir, "segment-0000.parquet"))
    open(os.path.join(edir, "_SEALED"), "w").close()
    eng.replay(wal)
    d2 = lake_diff(lake, replica)
    touched = {
        int(p) for p, info in
        eng.manifest.read_epoch(5)["partitions"].items()
        if info.get("epoch") == 5
    }
    assert not d2["equal"]
    assert set(d2["differing_partitions"]) == touched
    # detail carries per-side live row counts for the repair decision
    assert all({"part", "rows_a", "rows_b"} <= set(x) for x in d2["detail"])

    # repair: incremental sync re-ships, diff is clean again
    eng.sync_to(replica)
    assert lake_diff(lake, replica)["equal"]


def test_lake_diff_manifest_fast_path_after_compaction(replayed, tmp_path):
    from agr_loader_ray.pipelines.engine import lake_diff

    eng, wal, lake = replayed
    replica = str(tmp_path / "replica")
    eng.compact()  # real checksums in the manifest, no deltas
    eng.clone_to(replica)
    d = lake_diff(lake, replica)
    assert d["equal"]
    # every partition proved equal from manifests alone — zero data reads
    assert d["content_checked"] == 0 and d["manifest_proved"] > 0


def test_lake_diff_partitioning_mismatch_reported(replayed, tmp_path):
    from agr_loader_ray.pipelines.engine import lake_diff

    eng, wal, lake = replayed
    other = str(tmp_path / "other_lake")
    eng2 = CdcEngine(other, n_partitions=8)
    eng2.replay(wal)
    d = lake_diff(lake, other)
    assert not d["equal"] and d["partitioning_mismatch"] == (4, 8)
