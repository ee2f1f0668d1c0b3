"""Writer lease / fencing tokens + minor (delta-stitch) compaction."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted, point_lookup
from agr_loader_ray.state.lease import (LeaseHeldError, LeaseLostError,
                                        WriterLease, read_lease)
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=6_000, n_convs=200, n_epochs=5,
               update_frac=0.3, delete_frac=0.1)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


# --------------------------------------------------------------------------
# lease primitive
# --------------------------------------------------------------------------
def test_lease_acquire_exclusion_and_expiry(tmp_path):
    lake = str(tmp_path / "lake")
    clk = FakeClock()
    a = WriterLease(lake, "writer-a", ttl_s=60, clock=clk)
    b = WriterLease(lake, "writer-b", ttl_s=60, clock=clk)

    assert a.acquire() == 1
    a.assert_held()
    with pytest.raises(LeaseHeldError):
        b.acquire()

    # same owner re-acquires (token bumps — a restart of writer-a)
    assert a.acquire() == 2

    # expiry: b takes over, a's fencing check now fails
    clk.t += 61
    assert b.acquire() == 3
    b.assert_held()
    with pytest.raises(LeaseLostError):
        a.assert_held()

    # renew extends b's lease; release frees it
    clk.t += 50
    b.renew()
    clk.t += 50
    b.assert_held()
    b.release()
    released = read_lease(lake)
    assert released["expires_at"] == 0.0  # file kept: token stays monotonic
    assert a.acquire() == 4  # free again, token continues past b's 3


def test_lease_renew_after_expiry_fails(tmp_path):
    clk = FakeClock()
    a = WriterLease(str(tmp_path), "a", ttl_s=10, clock=clk)
    a.acquire()
    clk.t += 11
    with pytest.raises(LeaseLostError):
        a.renew()
    # release after loss is a no-op, not an error
    a.release()
    assert a.token is None


# --------------------------------------------------------------------------
# engine integration
# --------------------------------------------------------------------------
def test_engine_respects_foreign_lease_and_fencing(tmp_path):
    import time

    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    # lease-less engines check against WALL time, so anchor the fake
    # clock to it (offsets below dwarf test runtime)
    clk = FakeClock(time.time())

    # leased writer replays fine
    lease = WriterLease(lake, "writer-a", ttl_s=1e6, clock=clk)
    lease.acquire()
    eng = CdcEngine(lake, n_partitions=4, compact_every=100, lease=lease)
    eng.replay(wal, upto_epoch=2)

    # a lease-less engine must not write while the lease is live
    intruder = CdcEngine(lake, n_partitions=4)
    with pytest.raises(LeaseHeldError):
        intruder.replay(wal)
    with pytest.raises(LeaseHeldError):
        intruder.compact()

    # fencing: writer-b takes over after expiry → stale writer-a fails
    clk.t += 2e6
    lease_b = WriterLease(lake, "writer-b", ttl_s=1e6, clock=clk)
    lease_b.acquire()
    with pytest.raises(LeaseLostError):
        eng.replay(wal)

    # the successor finishes the replay; final state == oracle
    eng_b = CdcEngine(lake, n_partitions=4, compact_every=100, lease=lease_b)
    eng_b.replay(wal)
    got = export_sorted(lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # released lease → lease-less writers are allowed again (opt-in)
    lease_b.release()
    intruder.compact()


# --------------------------------------------------------------------------
# minor (delta-stitch) compaction
# --------------------------------------------------------------------------
def test_compact_deltas_stitches_without_base_rewrite(tmp_path):
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(lake, n_partitions=4, compact_every=2)
    eng.replay(wal, upto_epoch=1)
    eng.compact()  # establish a base everywhere
    from agr_loader_ray.pipelines.engine import _base_files
    base_before = {p: _base_files(i) for p, i in
                   eng.manifest.current_partitions().items()}
    eng.replay(wal, upto_epoch=3)  # accumulate deltas on top

    infos = eng.manifest.current_partitions()
    assert any(len(i["deltas"]) >= 2 for i in infos.values())
    before = export_sorted(lake).to_pandas().reset_index(drop=True)

    r = eng.compact_deltas(min_deltas=2)
    assert r["stitched"] >= 1
    infos = eng.manifest.current_partitions()
    for p, i in infos.items():
        assert len(i["deltas"]) <= 1
        assert _base_files(i) == base_before[p]  # base untouched

    after = export_sorted(lake).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    # point lookup works against the stitched delta + its bloom
    key = before.iloc[0]
    row = point_lookup(lake, key["conv_id"], int(key["turn_idx"]))
    assert row is not None and row["turn_idx"] == key["turn_idx"]

    # idempotent: nothing left to stitch
    assert eng.compact_deltas(min_deltas=2) == {"stitched": 0}

    # later epochs + another stitch + full replay converge to the oracle
    eng.replay(wal)
    eng.compact_deltas(min_deltas=2)
    got = export_sorted(lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_compact_deltas_preserves_tombstones(tmp_path):
    """A key deleted in one delta and re-inserted in a later one must
    resolve identically through the stitched delta (LWW associativity
    over (ts, offset) incl. tombstones)."""
    wal, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_wal(wal, WalSpec(n_events=4_000, n_convs=80, n_epochs=6,
                              update_frac=0.2, delete_frac=0.4))
    eng = CdcEngine(lake, n_partitions=4, compact_every=100)  # never auto
    eng.replay(wal)
    before = export_sorted(lake).to_pandas().reset_index(drop=True)
    eng.compact_deltas(min_deltas=2)
    after = export_sorted(lake).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    infos = eng.manifest.current_partitions()
    assert all(len(i["deltas"]) == 1 for i in infos.values())
