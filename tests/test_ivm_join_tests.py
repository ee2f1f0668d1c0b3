"""IVM join view: per-epoch equality against a full join recompute,
copy-on-write bucket carry-forward, idempotence, and delete handling."""

import os

import numpy as np
import pandas as pd
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import read_lake
from agr_loader_ray.pipelines.ivm_join import (maintain_join,
                                               maintain_join_epoch,
                                               read_join)
from agr_loader_ray.wal.generator import WalSpec, generate_wal


@pytest.fixture(scope="module")
def lakes(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivmjoin"))
    specs = {
        "a": WalSpec(n_events=900, n_convs=40, n_epochs=3, seed=3,
                     update_frac=0.25, delete_frac=0.1,
                     out_of_order_frac=0.1),
        "b": WalSpec(n_events=500, n_convs=30, n_epochs=3, seed=5,
                     update_frac=0.15, delete_frac=0.15),
    }
    lakes = {}
    for t, sp in specs.items():
        wal = os.path.join(root, f"wal_{t}")
        generate_wal(wal, sp)
        lake = os.path.join(root, f"lake_{t}")
        CdcEngine(lake, n_partitions=8).replay(wal)
        lakes[t] = lake
    return root, lakes


def _expected(lakes, epoch) -> pd.DataFrame:
    a = read_lake(lakes["a"], epoch=epoch,
                  columns=["conv_id", "turn_idx", "role"]).to_pandas()
    b = read_lake(lakes["b"], epoch=epoch,
                  columns=["conv_id", "turn_idx", "role"]).to_pandas()
    j = a.merge(b, on="conv_id", suffixes=("_a", "_b"))
    j = pd.DataFrame({
        "conv_id": j["conv_id"],
        "a_turn_idx": j["turn_idx_a"].astype(np.int64),
        "a_role": j["role_a"],
        "b_turn_idx": j["turn_idx_b"].astype(np.int64),
        "b_role": j["role_b"],
    })
    return j.sort_values(list(j.columns), kind="mergesort") \
        .reset_index(drop=True)


def _got(out_dir, epoch) -> pd.DataFrame:
    df = read_join(out_dir, epoch).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def test_every_epoch_matches_full_recompute(lakes):
    root, lk = lakes
    out = os.path.join(root, "view")
    infos = maintain_join(lk["a"], lk["b"], out, [0, 1, 2], n_buckets=8)
    assert infos[0]["counters"]["mode"] == "full"
    assert any(i["counters"]["mode"] == "incremental" for i in infos[1:])
    for e in (0, 1, 2):
        got, want = _got(out, e), _expected(lk, e)
        assert len(got) == len(want) and len(want) > 0
        pd.testing.assert_frame_equal(got, want)


def test_carry_forward_and_idempotence(lakes):
    root, lk = lakes
    out = os.path.join(root, "view")  # maintained by the previous test
    info2 = maintain_join_epoch(lk["a"], lk["b"], out, 1, n_buckets=8)
    # idempotent: re-maintaining a committed epoch is a manifest read
    info2b = maintain_join_epoch(lk["a"], lk["b"], out, 1, n_buckets=8)
    assert info2 == info2b

    # copy-on-write at a bucket count the per-epoch churn cannot cover:
    # untouched buckets must reference the PRIOR epoch's file
    out64 = os.path.join(root, "view64")
    infos = maintain_join(lk["a"], lk["b"], out64, [0, 1], n_buckets=64)
    assert infos[1]["counters"]["mode"] == "incremental"
    carried = [e["file"] for e in infos[1]["partitions"].values()
               if e["file"] and "epoch=1" not in e["file"]]
    rewritten = [e["file"] for e in infos[1]["partitions"].values()
                 if e["file"] and "epoch=1" in e["file"]]
    assert rewritten, "an incremental epoch rewrites some bucket"
    assert carried, "an incremental epoch carries some bucket forward"
    got = _got(out64, 1)
    want = _expected(lk, 1)
    pd.testing.assert_frame_equal(got, want)


def test_deletes_shrink_the_view(lakes):
    """A conv fully deleted on one side must vanish from the join."""
    root, lk = lakes
    out = os.path.join(root, "view")
    got3 = _got(out, 2)
    a3 = set(read_lake(lk["a"], epoch=2,
                       columns=["conv_id"]).to_pandas()["conv_id"])
    b3 = set(read_lake(lk["b"], epoch=2,
                       columns=["conv_id"]).to_pandas()["conv_id"])
    assert set(got3["conv_id"]) == (a3 & b3)


def test_crash_recovery_recomputes_epoch(lakes):
    """A crash AFTER bucket files publish but BEFORE the manifest commit
    leaves orphaned epoch files; re-maintaining must converge to the
    same state (bucket writes are deterministic os.replace targets)."""
    root, lk = lakes
    out = os.path.join(root, "view")
    before = _got(out, 2)
    # simulate the crash: drop epoch 2's manifest, leave its data files
    os.remove(os.path.join(out, "_manifests", "epoch=2.json"))
    with pytest.raises(FileNotFoundError):
        read_join(out, 2)
    maintain_join_epoch(lk["a"], lk["b"], out, 2, n_buckets=8)
    pd.testing.assert_frame_equal(_got(out, 2), before)
