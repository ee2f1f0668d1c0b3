"""Live binlog tailing under a CONCURRENT writer: the tailer may only
consume epochs whose ``_SEALED`` sentinel is visible, so a half-written
epoch (segments present, sentinel pending — the danger window the
sealed-mode marker exists for) must never be applied-and-skipped.
The writer thread publishes epochs with deliberate sleeps INSIDE the
danger window while the tailer polls at a faster interval."""

import os
import shutil
import threading
import time

import pandas as pd
import pyarrow.dataset as pads

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=12_000, n_convs=400, n_epochs=6,
               update_frac=0.25, delete_frac=0.08,
               out_of_order_frac=0.1, dup_ts_frac=0.05)


def _publish_slowly(src_wal: str, dst_wal: str, epochs: list[int],
                    gap: float) -> None:
    """Re-publish epochs one by one with sleeps inside the
    segments-written-but-not-sealed window."""
    os.makedirs(dst_wal, exist_ok=True)
    with open(os.path.join(dst_wal, "_WAL_SEALED_MODE"), "w"):
        pass
    for e in epochs:
        sdir = os.path.join(src_wal, f"epoch={e}")
        ddir = os.path.join(dst_wal, f"epoch={e}")
        os.makedirs(ddir, exist_ok=True)
        for f in sorted(os.listdir(sdir)):
            if f == "_SEALED":
                continue
            shutil.copy(os.path.join(sdir, f), os.path.join(ddir, f))
            time.sleep(gap / 2)  # tailer polls INSIDE this window
        time.sleep(gap)          # segments visible, sentinel still absent
        with open(os.path.join(ddir, "_SEALED"), "w"):
            pass


def test_tail_never_consumes_unsealed_epochs(tmp_lake, tmp_wal, tmp_path):
    staging = str(tmp_path / "staging_wal")
    generate_wal(staging, SPEC)
    live_wal = str(tmp_path / "live_wal")

    writer = threading.Thread(
        target=_publish_slowly,
        args=(staging, live_wal, list(range(SPEC.n_epochs)), 0.15))
    writer.start()
    try:
        eng = CdcEngine(tmp_lake, n_partitions=8)
        # poll faster than the writer's danger-window sleeps so the
        # tailer repeatedly observes half-written epochs
        r = eng.tail(live_wal, poll_interval=0.05, idle_rounds=25)
    finally:
        writer.join()
    assert r is not None
    # one catch-up round may still be pending after the last idle check
    eng.replay(live_wal)

    got = export_sorted(tmp_lake).to_pandas().reset_index(drop=True)
    wal = pads.dataset(staging, partitioning="hive").to_table().to_pandas()
    want = oracle_reduce(wal).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)
    # every epoch committed exactly once
    assert eng.manifest.committed_epochs() == list(range(SPEC.n_epochs))
