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


def test_conversation_text_assembly(tmp_lake, tmp_wal):
    from agr_loader_ray.pipelines.derived import conversation_text
    spec = WalSpec(n_events=2_000, n_convs=60, n_epochs=2, update_frac=0.2, delete_frac=0.1)
    generate_wal(tmp_wal, spec)
    CdcEngine(tmp_lake, n_partitions=4).replay(tmp_wal)

    got = conversation_text(tmp_lake).to_pandas().set_index("conv_id").sort_index()
    final = oracle_reduce(pads.dataset(tmp_wal, partitioning="hive").to_table().to_pandas())
    for conv, g in final.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        want = "\n".join(f"{r}: {t}" for r, t in zip(g["role"].fillna(""), g["text"].fillna("")))
        assert got.loc[conv, "dialogue"] == want
        assert got.loc[conv, "n_turns"] == len(g)


def test_verify_lake_audit(tmp_lake, tmp_wal):
    from agr_loader_ray.pipelines.engine import verify_lake
    spec = WalSpec(n_events=2_000, n_convs=80, n_epochs=2, delete_frac=0.1)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=4, compact_every=1)
    eng.replay(tmp_wal)
    r = verify_lake(tmp_lake)
    assert r["ok"] and r["verified"] == 4 and not r["unverifiable"]

    # corrupt one partition file -> audit must flag it
    import os
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    info = next(iter(m["partitions"].values()))
    import pyarrow.parquet as pq
    import pyarrow as pa
    from agr_loader_ray.pipelines.engine import _base_files
    path = os.path.join(tmp_lake, _base_files(info)[0])
    t = pq.read_table(path)
    import pyarrow.compute as pc
    live = t.filter(pc.equal(t["_deleted"], False))
    dead = t.filter(pc.equal(t["_deleted"], True))
    assert live.num_rows > 0
    t2 = pa.concat_tables([live.slice(0, live.num_rows - 1), dead])  # drop one LIVE row
    pq.write_table(t2, path)
    r2 = verify_lake(tmp_lake)
    assert not r2["ok"] and len(r2["corrupt_partitions"]) == 1


def test_conversation_descriptions(tmp_lake, tmp_wal):
    """Gene-descriptions analogue: deterministic generated text with
    corpus-context comparison, numbers consistent with the stats table."""
    from agr_loader_ray.pipelines.derived import (
        conversation_descriptions,
        conversation_stats,
    )
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.wal.generator import WalSpec, generate_wal

    generate_wal(tmp_wal, WalSpec(n_events=2000, n_convs=60, n_epochs=1))
    CdcEngine(tmp_lake, n_partitions=4).replay(tmp_wal)

    desc = conversation_descriptions(tmp_lake).to_pandas().set_index("conv_id")
    stats = conversation_stats(tmp_lake).to_pandas().set_index("conv_id")
    assert len(desc) == len(stats)
    for cid, row in stats.head(5).iterrows():
        d = desc.loc[cid, "description"]
        assert f"has {int(row['n_turns'])} turns" in d
        assert f"{int(row['total_chars'])} characters" in d
    # deterministic
    again = conversation_descriptions(tmp_lake).to_pandas().set_index("conv_id")
    assert (again["description"].sort_index() == desc["description"].sort_index()).all()
