"""The task-based partition exchange (``_task_exchange_apply``) must be
indistinguishable from the ``groupby(part).map_groups`` Dataset path:
same lake state, same manifests/lineage, same quarantine — only the
shuffle mechanism differs."""

import os

import pandas as pd
import pyarrow.dataset as pads

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=40_000, n_convs=1_500, n_epochs=5,
               update_frac=0.25, delete_frac=0.08, zipf_a=1.2,
               out_of_order_frac=0.1, dup_ts_frac=0.05)


def _export(lake: str) -> pd.DataFrame:
    return export_sorted(lake).to_pandas().reset_index(drop=True)


def test_task_exchange_equals_dataset_exchange(tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, SPEC)

    lakes = {}
    for mode in ("task", "dataset"):
        lake = str(tmp_path / f"lake_{mode}")
        eng = CdcEngine(lake, n_partitions=16, exchange=mode)
        r = eng.replay(wal)
        assert r["events_applied"] == SPEC.n_events
        lakes[mode] = (eng, _export(lake))

    got_task, got_ds = lakes["task"][1], lakes["dataset"][1]
    pd.testing.assert_frame_equal(got_task, got_ds)

    # both equal the single-threaded oracle
    wal_df = pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    want = oracle_reduce(wal_df).reset_index(drop=True)
    got = got_task[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # manifest parity: same committed epochs, same live counts/checksums
    m_task = lakes["task"][0].manifest
    m_ds = lakes["dataset"][0].manifest
    assert m_task.committed_epochs() == m_ds.committed_epochs()
    for e in m_task.committed_epochs():
        pt = m_task.read_epoch(e)["partitions"]
        pdd = m_ds.read_epoch(e)["partitions"]
        assert set(pt) == set(pdd)
        for p in pt:
            assert pt[p]["live_rows"] == pdd[p]["live_rows"], (e, p)
            assert pt[p]["checksum"] == pdd[p]["checksum"], (e, p)


def test_task_exchange_quarantine_parity(tmp_path):
    """Constraint-violating events land in the same quarantine stream
    with the same per-reason counts under either exchange."""
    wal = str(tmp_path / "wal")
    generate_wal(wal, WalSpec(n_events=8_000, n_convs=300, n_epochs=2,
                              update_frac=0.2))
    counts = {}
    for mode in ("task", "dataset"):
        lake = str(tmp_path / f"lake_{mode}")
        eng = CdcEngine(lake, n_partitions=8, exchange=mode)
        eng.set_constraints([
            {"kind": "length_max", "column": "text", "max": 60,
             "name": "text_len_60"},
        ])
        eng.replay(wal)
        per_epoch = []
        for e in eng.manifest.committed_epochs():
            q = eng.manifest.read_epoch(e).get("quarantine") or {}
            per_epoch.append((e, q.get("rows", 0),
                              tuple(sorted((q.get("reasons") or {}).items()))))
        counts[mode] = per_epoch
    assert counts["task"] == counts["dataset"]
    assert any(rows > 0 for _, rows, _ in counts["task"])


def test_task_exchange_resume_after_partial_commit(tmp_path):
    """Crash-resume parity: committing only a prefix of epochs and
    re-replaying under the task exchange converges to the oracle."""
    wal = str(tmp_path / "wal")
    generate_wal(wal, SPEC)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, n_partitions=16, exchange="task")
    eng.replay(wal, upto_epoch=1)
    assert eng.manifest.committed_epochs() == [0, 1]
    # fresh engine (new process analogue) resumes the backlog
    eng2 = CdcEngine(lake, n_partitions=16, exchange="task")
    r = eng2.replay(wal)
    skipped = [s["epoch"] for s in r["epochs"] if s["skipped"]]
    assert skipped == [0, 1]

    wal_df = pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    want = oracle_reduce(wal_df).reset_index(drop=True)
    got = _export(lake)[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)
