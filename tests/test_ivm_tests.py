"""Incremental view maintenance: CDF-delta-maintained conversation_stats
must equal a full recompute at EVERY epoch, with the non-self-maintainable
MAX repaired exactly and the copy-on-write bucket layout resumable."""

import json
import os

import pandas as pd
import pytest

from agr_loader_ray.pipelines.derived import conversation_stats
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.ivm import maintain_stats, read_stats
from agr_loader_ray.wal.generator import T2_CORRECTNESS, WalSpec, generate_wal


@pytest.fixture()
def maintained(tmp_lake, tmp_wal, tmp_path):
    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 15_000, "n_convs": 400,
                      "delete_frac": 0.15, "update_frac": 0.3})
    generate_wal(tmp_wal, spec)
    CdcEngine(tmp_lake, n_partitions=8).replay(tmp_wal)
    out = str(tmp_path / "stats_view")
    infos = maintain_stats(tmp_lake, out, n_buckets=8)
    return tmp_lake, out, infos, spec


def _full(lake_root, epoch):
    return (conversation_stats(lake_root, epoch=epoch).to_pandas()
            .sort_values("conv_id", kind="mergesort").reset_index(drop=True))


def _view(out, epoch):
    return (read_stats(out, epoch=epoch).to_pandas()
            .sort_values("conv_id", kind="mergesort").reset_index(drop=True))


def test_maintained_equals_full_recompute_every_epoch(maintained):
    lake, out, infos, spec = maintained
    assert len(infos) == spec.n_epochs
    for e in range(spec.n_epochs):
        want = _full(lake, e)
        got = _view(out, e)[want.columns.tolist()]
        for c in want.columns:
            want[c] = want[c].astype(got[c].dtype)
        pd.testing.assert_frame_equal(got, want)


def test_dirty_max_repair_path_exercised(maintained):
    _, _, infos, _ = maintained
    # deletes/updates at 15%/30% churn must hit at least one group whose
    # retracted row carried the group max — else the repair path is dead code
    assert sum(i["counters"]["repaired"] for i in infos[1:]) > 0
    assert all(i["counters"]["changed_convs"] > 0 for i in infos[1:])


def test_copy_on_write_carries_untouched_buckets(maintained):
    _, out, infos, _ = maintained
    for e, info in enumerate(infos):
        for p, ent in info["partitions"].items():
            if ent["file"]:
                assert os.path.exists(os.path.join(out, ent["file"]))
    # manifests are the resume log
    for e in range(len(infos)):
        with open(os.path.join(out, "_manifests", f"epoch={e}.json")) as fh:
            assert json.load(fh)["source_epoch"] == e


def test_maintain_is_idempotent_and_resumable(maintained):
    lake, out, infos, spec = maintained
    before = {e: _view(out, e) for e in range(spec.n_epochs)}
    again = maintain_stats(lake, out, n_buckets=8)  # all epochs skipped
    assert [i["source_epoch"] for i in again] == [i["source_epoch"] for i in infos]
    for e in range(spec.n_epochs):
        pd.testing.assert_frame_equal(_view(out, e), before[e])
    # resume mid-stream: drop the last epoch's manifest, re-maintain
    os.remove(os.path.join(out, "_manifests", f"epoch={spec.n_epochs - 1}.json"))
    maintain_stats(lake, out, n_buckets=8)
    want = _full(lake, spec.n_epochs - 1)
    got = _view(out, spec.n_epochs - 1)[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)
