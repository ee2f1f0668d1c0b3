"""Bounded transient-fault retry on the merge-apply path (SURVEY §4.1:
the provable version of the reference's unbounded requeue-and-sleep,
neo4j_transactor.py:108-118).  Chaos faults are injected through the
engine's failpoint seam; convergence after retries relies on the apply
writes being idempotent (staged per-partition manifests, deterministic
file names)."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine, TransientApplyError
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.wal.generator import T1_SMOKE, WalSpec, generate_wal

SPEC = WalSpec(**{**T1_SMOKE.__dict__, "n_events": 6_000, "n_convs": 300,
                  "update_frac": 0.25, "delete_frac": 0.05})


def _assert_equals_oracle(lake_root, wal_root):
    got = export_sorted(lake_root).to_pandas().reset_index(drop=True)
    wal = pads.dataset(wal_root, partitioning="hive").to_table().to_pandas()
    want = oracle_reduce(wal).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_transient_fault_retried_and_converges(tmp_lake, tmp_wal, tmp_path):
    generate_wal(tmp_wal, SPEC)
    marker = str(tmp_path / "fail_once")
    open(marker, "w").close()

    eng = CdcEngine(tmp_lake, n_partitions=8, failpoint=marker)
    stats = eng.replay(tmp_wal)
    assert stats["events_applied"] == SPEC.n_events
    assert not os.path.exists(marker)  # exactly one task consumed it
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_persistent_fault_fails_bounded_then_clean_rerun_converges(
        tmp_lake, tmp_wal, tmp_path):
    """A fault that survives every retry fails the replay LOUDLY (no
    unbounded requeue) — and because every apply write is idempotent,
    removing the fault and re-running converges to the oracle from the
    partially-staged state."""
    generate_wal(tmp_wal, SPEC)
    marker = str(tmp_path / "fail.always")
    open(marker, "w").close()

    eng = CdcEngine(tmp_lake, n_partitions=8, failpoint=marker,
                    apply_retries=1)
    with pytest.raises(Exception) as ei:
        eng.replay(tmp_wal)
    assert "injected persistent fault" in str(ei.value)

    os.remove(marker)
    eng2 = CdcEngine(tmp_lake, n_partitions=8)
    stats = eng2.replay(tmp_wal)
    assert stats["events_applied"] == SPEC.n_events
    _assert_equals_oracle(tmp_lake, tmp_wal)

    # and a third run is a no-op (exactly-once bookkeeping intact)
    assert eng2.replay(tmp_wal)["events_applied"] == 0


def test_retries_disabled_fails_fast(tmp_lake, tmp_wal, tmp_path):
    generate_wal(tmp_wal, SPEC)
    marker = str(tmp_path / "fail_once")
    open(marker, "w").close()
    eng = CdcEngine(tmp_lake, n_partitions=8, failpoint=marker,
                    apply_retries=0)
    with pytest.raises(Exception):
        eng.replay(tmp_wal)
    # marker was consumed by the single (failed) attempt
    assert not os.path.exists(marker)
    # recovery: same engine config, no fault → converges
    assert CdcEngine(tmp_lake, n_partitions=8).replay(
        tmp_wal)["events_applied"] == SPEC.n_events
    _assert_equals_oracle(tmp_lake, tmp_wal)
