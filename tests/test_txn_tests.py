"""Multi-table atomic transactions: combined-binlog demux + 2PC intent
replay + consistent-snapshot reads + crash recovery."""

import json
import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.pipelines.txn import TxnReplay, combine_wals, demux_wal
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC_A = WalSpec(n_events=4_000, n_convs=150, n_epochs=3, seed=7,
                 update_frac=0.2, delete_frac=0.05)
SPEC_B = WalSpec(n_events=3_000, n_convs=100, n_epochs=3, seed=11,
                 update_frac=0.1, delete_frac=0.1, dup_ts_frac=0.05)


def _wal_df(wal_root):
    return pads.dataset(wal_root, partitioning="hive").to_table().to_pandas()


def _assert_lake_equals_wal(lake_root, wal_root, upto_epoch=None):
    got = export_sorted(lake_root).to_pandas().reset_index(drop=True)
    want = oracle_reduce(_wal_df(wal_root),
                         upto_epoch=upto_epoch).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture()
def multi(tmp_path, ray_session):
    """Combined binlog + demuxed per-table WALs + engines + coordinator."""
    wa, wb = str(tmp_path / "wal_a"), str(tmp_path / "wal_b")
    generate_wal(wa, SPEC_A)
    generate_wal(wb, SPEC_B)
    combined = str(tmp_path / "binlog")
    combine_wals({"a": wa, "b": wb}, combined)
    da, db = str(tmp_path / "demux_a"), str(tmp_path / "demux_b")
    demux_wal(combined, {"a": da, "b": db})
    engines = {"a": CdcEngine(str(tmp_path / "lake_a"), n_partitions=4),
               "b": CdcEngine(str(tmp_path / "lake_b"), n_partitions=4)}
    txn = TxnReplay(str(tmp_path / "txn"), engines,
                    {"a": da, "b": db})
    return {"orig": {"a": wa, "b": wb}, "combined": combined,
            "demux": {"a": da, "b": db}, "engines": engines, "txn": txn}


def test_demux_roundtrip_equals_original(multi):
    """Demuxed per-table WAL carries exactly the original events."""
    for t in ("a", "b"):
        orig = _wal_df(multi["orig"][t]).sort_values("offset").reset_index(drop=True)
        dem = _wal_df(multi["demux"][t]).sort_values("offset").reset_index(drop=True)
        dem = dem[orig.columns.tolist()]
        pd.testing.assert_frame_equal(dem, orig)


def test_demux_idempotent(multi):
    before = {
        t: sorted(os.listdir(os.path.join(multi["demux"][t], "epoch=0")))
        for t in ("a", "b")
    }
    out = demux_wal(multi["combined"], multi["demux"])
    assert out["epochs_demuxed"] == {"a": [], "b": []}
    for t in ("a", "b"):
        assert sorted(os.listdir(
            os.path.join(multi["demux"][t], "epoch=0"))) == before[t]


def test_txn_replay_final_state_and_log(multi):
    txn = multi["txn"]
    stats = txn.replay()
    assert [s["epoch"] for s in stats["txns"]] == [0, 1, 2]
    for t in ("a", "b"):
        _assert_lake_equals_wal(
            multi["engines"][t].manifest.lake_root, multi["orig"][t])
    assert txn.snapshot() == {"a": 2, "b": 2}
    assert txn.pending_intent() is None
    assert [e["epoch"] for e in txn.txn_log()] == [0, 1, 2]
    # idempotent re-replay
    assert txn.replay()["txns"] == []


def test_crash_between_commits_recovers_atomically(multi, monkeypatch):
    txn = multi["txn"]
    eng_b = multi["engines"]["b"]

    calls = {"n": 0}
    real = CdcEngine.apply_epoch

    def flaky(self, wal_root, epoch):
        if self is eng_b and epoch == 1:
            calls["n"] += 1
            raise RuntimeError("injected crash before b's epoch-1 commit")
        return real(self, wal_root, epoch)

    monkeypatch.setattr(CdcEngine, "apply_epoch", flaky)
    with pytest.raises(RuntimeError):
        txn.replay()
    assert calls["n"] == 1

    # torn state: a@1 committed, b@0 — but the SNAPSHOT fence hides it
    assert multi["engines"]["a"].manifest.last_committed_epoch() == 1
    assert eng_b.manifest.last_committed_epoch() == 0
    assert txn.snapshot() == {"a": 0, "b": 0}
    intent = txn.pending_intent()
    assert intent == {"epoch": 1, "tables": ["a", "b"]}

    # recovery rolls FORWARD (presumed commit): b's epoch 1 is re-driven
    monkeypatch.setattr(CdcEngine, "apply_epoch", real)
    r = txn.recover()
    assert r == {"recovered": True, "epoch": 1, "redone": ["b"]}
    assert txn.snapshot() == {"a": 1, "b": 1}
    assert txn.pending_intent() is None

    # remaining epochs replay normally; final state == per-table oracle
    txn.replay()
    for t in ("a", "b"):
        _assert_lake_equals_wal(
            multi["engines"][t].manifest.lake_root, multi["orig"][t])


def test_snapshot_read_is_consistent_mid_txn(multi, monkeypatch):
    """txn.read() during a torn epoch returns every table AT THE FENCE."""
    txn = multi["txn"]
    eng_b = multi["engines"]["b"]
    real = CdcEngine.apply_epoch

    def flaky(self, wal_root, epoch):
        if self is eng_b and epoch == 2:
            raise RuntimeError("crash")
        return real(self, wal_root, epoch)

    monkeypatch.setattr(CdcEngine, "apply_epoch", flaky)
    with pytest.raises(RuntimeError):
        txn.replay()
    assert txn.snapshot() == {"a": 1, "b": 1}

    # a's lake HEAD is epoch 2, but the fenced read pins epoch 1
    got = (txn.read("a").to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = oracle_reduce(_wal_df(multi["orig"]["a"]),
                         upto_epoch=1).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_intent_survives_coordinator_restart(multi, monkeypatch):
    """A NEW coordinator instance over the same txn_root sees the intent
    and rolls it forward (replay() self-heals on entry)."""
    txn = multi["txn"]
    eng_b = multi["engines"]["b"]
    real = CdcEngine.apply_epoch

    def flaky(self, wal_root, epoch):
        if self is eng_b and epoch == 0:
            raise RuntimeError("crash")
        return real(self, wal_root, epoch)

    monkeypatch.setattr(CdcEngine, "apply_epoch", flaky)
    with pytest.raises(RuntimeError):
        txn.replay()
    monkeypatch.setattr(CdcEngine, "apply_epoch", real)

    txn2 = TxnReplay(txn.txn_root, multi["engines"], multi["demux"])
    stats = txn2.replay()
    assert txn2.pending_intent() is None
    assert [s["epoch"] for s in stats["txns"]] == [1, 2]  # 0 via recover()
    assert txn2.snapshot() == {"a": 2, "b": 2}
    for t in ("a", "b"):
        _assert_lake_equals_wal(
            multi["engines"][t].manifest.lake_root, multi["orig"][t])
