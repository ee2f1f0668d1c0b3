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


def test_partition_fencing_resume_applies_only_unfinished(
        tmp_lake, tmp_wal, tmp_path):
    """Per-partition epoch fencing (the provable version of the
    reference's requeue loop, neo4j_transactor.py:108-118): a replay
    killed after K of N partitions landed resumes by re-applying
    EXACTLY the N-K unfinished ones — every pre-crash partition's data
    files and staged manifest are byte/mtime-untouched on resume."""
    import glob
    import json

    spec = WalSpec(**{**SPEC.__dict__, "n_epochs": 1})
    generate_wal(tmp_wal, spec)
    marker = str(tmp_path / "fail_once")
    open(marker, "w").close()

    eng = CdcEngine(tmp_lake, n_partitions=8, failpoint=marker,
                    apply_retries=0)
    with pytest.raises(Exception):
        eng.replay(tmp_wal)

    staged_glob = os.path.join(tmp_lake, "_manifests", "staged",
                               "epoch=0", "part=*.json")
    # the driver aborts on the first failed partition; its sibling
    # reduce tasks (one per partition) keep running — wait for them to
    # land so the pre-crash state is "K of N partitions staged"
    import time as _time
    staged_before: list = []
    for _ in range(120):
        now = sorted(glob.glob(staged_glob))
        if now and now == staged_before:
            break
        staged_before = now
        _time.sleep(0.25)
    # the crash landed mid-epoch: some partitions staged, not all
    assert 0 < len(staged_before) < 9  # 8 parts + quarantine possible

    def _staged_file_states():
        states = {}
        for sp in glob.glob(staged_glob):
            with open(sp) as fh:
                info = json.load(fh)
            for rel in ([info.get("base")] if info.get("base") else []) \
                    + list(info.get("deltas") or []):
                ap = os.path.join(tmp_lake, rel)
                states[ap] = (os.path.getmtime(ap), os.path.getsize(ap))
        return states

    before = _staged_file_states()
    assert before  # staged manifests point at real files

    stats = CdcEngine(tmp_lake, n_partitions=8).replay(tmp_wal)
    assert stats["events_applied"] == spec.n_events

    after = _staged_file_states()
    for path, st in before.items():
        assert after[path] == st, f"pre-crash partition rewritten: {path}"
    # resume finished the remaining partitions
    assert len(glob.glob(staged_glob)) >= len(staged_before)
    _assert_equals_oracle(tmp_lake, tmp_wal)
