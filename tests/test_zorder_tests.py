"""Z-order clustering + time-range scan: equality vs a full-read
filter, row-group pruning evidence (both dimensions), the key-sorted
counterfactual, and the delta-fallback soundness path."""

import numpy as np
import pandas as pd
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine, _zorder_cluster
from agr_loader_ray.pipelines.export import (export_sorted, range_scan,
                                             time_range_scan)
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=12_000, n_convs=400, n_epochs=2, seed=21,
               update_frac=0.2, delete_frac=0.05, out_of_order_frac=0.05)


@pytest.fixture()
def lake(tmp_path, ray_session):
    wal = str(tmp_path / "wal")
    generate_wal(wal, SPEC)
    root = str(tmp_path / "lake")
    eng = CdcEngine(root, n_partitions=4)
    eng.replay(wal)
    return {"eng": eng, "root": root, "wal": wal}


def _expected_in_range(root, lo_us, hi_us):
    df = export_sorted(root).to_pandas()
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64)
    return (df[(ts_us >= lo_us) & (ts_us <= hi_us)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def _mid_range(root, frac_lo=0.40, frac_hi=0.45):
    df = export_sorted(root).to_pandas()
    ts_us = np.sort(df["ts"].astype("datetime64[us]").astype(np.int64))
    return int(ts_us[int(len(ts_us) * frac_lo)]), \
        int(ts_us[int(len(ts_us) * frac_hi)])


def _got(ds):
    return (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def test_zorder_time_scan_equality_and_pruning(lake):
    lake["eng"].compact(cluster="zorder", row_group_size=512)
    lo, hi = _mid_range(lake["root"])
    ds, stats = time_range_scan(lake["root"], lo, hi, with_stats=True)
    want = _expected_in_range(lake["root"], lo, hi)
    got = _got(ds)[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0
    assert stats["partitions_full_read"] == 0
    assert stats["row_groups_pruned"] > 0, stats


def test_zorder_still_prunes_key_ranges(lake):
    """The multi-dimensional trade: a zordered base still skips for
    conv_id ranges (less tightly than key-sorted, but > 0)."""
    lake["eng"].compact(cluster="zorder", row_group_size=512)
    df = export_sorted(lake["root"]).to_pandas()
    keys = sorted(df["conv_id"].unique())
    lo, hi = keys[2], keys[4]
    ds, stats = range_scan(lake["root"], lo, hi, with_stats=True)
    got = _got(ds)
    want = (df[(df["conv_id"] >= lo) & (df["conv_id"] <= hi)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    assert stats["row_groups_pruned"] > 0, stats


def test_key_sorted_compact_cannot_prune_time(lake):
    """Counterfactual: key-sorted bases interleave ts across the key
    space, so ts row-group stats span everything → ~no pruning.  The
    same narrow window on a zorder clone DOES prune."""
    lake["eng"].compact(cluster="key", row_group_size=512)
    lo, hi = _mid_range(lake["root"], 0.40, 0.42)
    _, st_key = time_range_scan(lake["root"], lo, hi, with_stats=True)

    clone = lake["root"] + "_z"
    lake["eng"].clone_to(clone)
    CdcEngine(clone, n_partitions=4).compact(cluster="zorder",
                                             row_group_size=512)
    ds, st_z = time_range_scan(clone, lo, hi, with_stats=True)
    assert st_z["row_groups_pruned"] > st_key["row_groups_pruned"], \
        (st_key, st_z)
    want = _expected_in_range(lake["root"], lo, hi)
    pd.testing.assert_frame_equal(_got(ds)[want.columns.tolist()], want)


def test_delta_fallback_is_sound(lake, tmp_path):
    """A partition with outstanding deltas must NOT prune (an out-of-
    range base row can be the LWW winner over an in-range delta) — it
    full-reads, and results still match the filter-everything oracle."""
    wal2 = str(tmp_path / "wal2")
    generate_wal(wal2, WalSpec(n_events=12_000, n_convs=400, n_epochs=3,
                               seed=21, update_frac=0.2, delete_frac=0.05,
                               out_of_order_frac=0.05))
    eng = CdcEngine(str(tmp_path / "lake2"), n_partitions=4)
    eng.replay(wal2, upto_epoch=1)
    eng.compact(cluster="zorder", row_group_size=512)
    eng.replay(wal2)  # epoch 2 lands as deltas on every touched partition
    lo, hi = _mid_range(str(tmp_path / "lake2"))
    ds, stats = time_range_scan(str(tmp_path / "lake2"), lo, hi,
                                with_stats=True)
    assert stats["partitions_full_read"] > 0
    want = _expected_in_range(str(tmp_path / "lake2"), lo, hi)
    pd.testing.assert_frame_equal(_got(ds)[want.columns.tolist()], want)


def test_zorder_cluster_is_pure_permutation(lake):
    import pyarrow as pa

    t = pa.table({
        "conv_id": pa.array([f"c{i%7}" for i in range(50)]),
        "turn_idx": pa.array(np.arange(50, dtype=np.int32)),
        "ts": pa.array(np.arange(50) * 1_000_000).cast(pa.timestamp("us")),
    })
    z = _zorder_cluster(t)
    assert z.num_rows == t.num_rows
    a = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = z.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
