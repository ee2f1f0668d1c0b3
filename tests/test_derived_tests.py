"""Derived (second-pass) pipeline tests: lake → conversation_stats."""

import os

import pandas as pd
import pyarrow.dataset as pads

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.derived import conversation_stats, write_derived
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.wal.generator import WalSpec, generate_wal


def test_conversation_stats_matches_pandas_oracle(tmp_lake, tmp_wal):
    spec = WalSpec(n_events=5_000, n_convs=150, n_epochs=3, update_frac=0.2, delete_frac=0.1)
    generate_wal(tmp_wal, spec)
    CdcEngine(tmp_lake, n_partitions=4).replay(tmp_wal)

    got = (
        conversation_stats(tmp_lake).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    final = oracle_reduce(pads.dataset(tmp_wal, partitioning="hive").to_table().to_pandas())
    want = (
        final.assign(chars=final["text"].str.len().fillna(0).astype("int64"),
                     is_tool=(final["role"] == "tool").astype("int64"))
        .groupby("conv_id", as_index=False)
        .agg(total_chars=("chars", "sum"), n_turns=("chars", "count"),
             n_tool_turns=("is_tool", "sum"), last_ts=("ts", "max"))
        .sort_values("conv_id").reset_index(drop=True)
    )
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_write_derived_lineage_and_idempotency(tmp_lake, tmp_wal, tmp_path):
    spec = WalSpec(n_events=2_000, n_convs=80, n_epochs=2)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)

    out = str(tmp_path / "derived")
    info = write_derived(tmp_lake, out)
    assert info["source_epoch"] == eng.manifest.last_committed_epoch()
    assert info["rows"] == conversation_stats(tmp_lake).count()
    assert os.path.isdir(info["path"])
    # rerun: no-op via the derived manifest
    info2 = write_derived(tmp_lake, out)
    assert info2 == info
