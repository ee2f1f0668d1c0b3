"""End-to-end engine tests: WAL replay → lake → export == oracle.

Mirrors the reference's post-load invariant strategy (SURVEY §5): load a
fixed deterministic corpus, then assert final-state equality and
invariants against an independent single-threaded oracle.
"""

import pandas as pd
import pyarrow.dataset as pads

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted, read_lake
from agr_loader_ray.wal.generator import T1_SMOKE, T2_CORRECTNESS, WalSpec, generate_wal


def _wal_df(wal_root: str) -> pd.DataFrame:
    return pads.dataset(wal_root, partitioning="hive").to_table().to_pandas()


def _export_df(lake_root: str) -> pd.DataFrame:
    return export_sorted(lake_root).to_pandas().reset_index(drop=True)


def _assert_equals_oracle(lake_root: str, wal_root: str, upto_epoch=None):
    got = _export_df(lake_root)
    want = oracle_reduce(_wal_df(wal_root), upto_epoch=upto_epoch).reset_index(drop=True)
    got = got[want.columns.tolist()]
    # normalize pandas nullable dtypes for comparison
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_t1_smoke_insert_only(tmp_lake, tmp_wal):
    generate_wal(tmp_wal, T1_SMOKE)
    eng = CdcEngine(tmp_lake, n_partitions=8)
    stats = eng.replay(tmp_wal)
    assert stats["events_applied"] == T1_SMOKE.n_events
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_t2_correctness_lww_tombstones_schema(tmp_lake, tmp_wal):
    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 20_000, "n_convs": 800})
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=8)
    eng.replay(tmp_wal)
    got = _export_df(tmp_lake)

    # schema evolution: lang column added, turn_idx widened to int64
    assert "lang" in got.columns
    assert str(got["turn_idx"].dtype) == "int64"
    # PK uniqueness invariant (reference: uuid-duplication test, SURVEY D5)
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
    # stable ordering
    assert got[["conv_id", "turn_idx"]].equals(
        got[["conv_id", "turn_idx"]].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_schema_rename_and_drop_evolution(tmp_lake, tmp_wal):
    """rename_column / drop_column S-events: legacy partition files keep
    the old physical layout and are conformed through the alias chain at
    merge/read time; final state equals the pandas oracle."""
    import json as _json

    spec = WalSpec(
        n_events=12_000, n_convs=400, n_epochs=6,
        update_frac=0.25, delete_frac=0.08, out_of_order_frac=0.1,
        schema_events=(
            (0.2, _json.dumps({"kind": "add_column", "name": "tmp_flag", "type": "bool", "default": True})),
            (0.5, _json.dumps({"kind": "rename_column", "from": "tool", "to": "tool_name"})),
            (0.8, _json.dumps({"kind": "drop_column", "name": "tmp_flag"})),
        ),
    )
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=8, compact_every=3)
    eng.replay(tmp_wal)
    got = _export_df(tmp_lake)
    assert "tool_name" in got.columns and "tool" not in got.columns
    assert "tmp_flag" not in got.columns
    _assert_equals_oracle(tmp_lake, tmp_wal)
    # column-pruned read resolves the renamed column through the alias
    # (old files physically carry "tool")
    from agr_loader_ray.pipelines.export import read_lake
    pruned = read_lake(tmp_lake, columns=["tool_name"]).to_pandas()
    assert set(pruned.columns) == {"tool_name"}
    assert sorted(pruned["tool_name"].fillna("~")) == sorted(got["tool_name"].fillna("~"))


def test_change_feed_matches_oracle_every_epoch(tmp_lake, tmp_wal):
    """CDF: per-epoch insert/update/delete rows (state diff, not event
    log — LWW-losing late events emit nothing) equal the pandas oracle,
    including under schema evolution."""
    from agr_loader_ray.oracle import oracle_change_feed
    from agr_loader_ray.pipelines.export import change_feed

    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 15_000, "n_convs": 500})
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=8, compact_every=2)
    eng.replay(tmp_wal)
    wal = _wal_df(tmp_wal)

    n_changes = 0
    for e in range(spec.n_epochs):
        got = (change_feed(tmp_lake, e).to_pandas()
               .sort_values(["change_type", "conv_id", "turn_idx"], kind="mergesort")
               .reset_index(drop=True))
        want = oracle_change_feed(wal, e)
        got = got[want.columns.tolist()]
        for c in want.columns:
            want[c] = want[c].astype(got[c].dtype)
        pd.testing.assert_frame_equal(got, want)
        n_changes += len(got)
        if e == 0:
            assert set(got["change_type"]) == {"insert"}
    # the spec generates updates and deletes — make sure the feed saw them
    assert n_changes > T2_CORRECTNESS.n_epochs
    all_types = set()
    for e in range(spec.n_epochs):
        all_types |= set(change_feed(tmp_lake, e).to_pandas()["change_type"])
    assert all_types == {"insert", "update", "delete"}


def test_epoch_replay_is_idempotent(tmp_lake, tmp_wal):
    generate_wal(tmp_wal, WalSpec(n_events=2_000, n_convs=100, n_epochs=2, update_frac=0.3, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)
    before = _export_df(tmp_lake)
    # re-apply everything: committed epochs must be skipped
    stats = eng.replay(tmp_wal)
    assert all(s["skipped"] for s in stats["epochs"])
    pd.testing.assert_frame_equal(before, _export_df(tmp_lake))


def test_resume_after_mid_replay_crash(tmp_lake, tmp_wal):
    """t4-resume: stop between epochs, restart with a NEW engine, final
    state must equal the uninterrupted run (exactly-once)."""
    spec = WalSpec(n_events=8_000, n_convs=300, n_epochs=6, update_frac=0.25, delete_frac=0.1,
                   out_of_order_frac=0.1, dup_ts_frac=0.05)
    generate_wal(tmp_wal, spec)
    eng1 = CdcEngine(tmp_lake, n_partitions=8)
    eng1.replay(tmp_wal, upto_epoch=2)  # "crash" after epoch 2
    eng2 = CdcEngine(tmp_lake, n_partitions=8)  # fresh process analogue
    stats = eng2.replay(tmp_wal)
    assert [s["epoch"] for s in stats["epochs"] if s["skipped"]] == [0, 1, 2]
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_partial_epoch_staged_resume(tmp_lake, tmp_wal):
    """Crash mid-epoch: staged partition manifests let the re-applied
    epoch skip finished partitions and still commit correctly."""
    spec = WalSpec(n_events=3_000, n_convs=100, n_epochs=2, update_frac=0.3, delete_frac=0.1)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.apply_epoch(tmp_wal, 0)

    # simulate a crash during epoch 1: stage some partitions by hand
    # (run the apply, then delete the epoch manifest → uncommitted)
    eng.apply_epoch(tmp_wal, 1)
    import os
    os.remove(eng.manifest.epoch_manifest_path(1))

    eng2 = CdcEngine(tmp_lake, n_partitions=4)
    stats = eng2.replay(tmp_wal)
    assert [s["epoch"] for s in stats["epochs"] if not s["skipped"]] == [1]
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_manifest_lineage_counts(tmp_lake, tmp_wal):
    generate_wal(tmp_wal, WalSpec(n_events=2_000, n_convs=100, n_epochs=2, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=4, compact_every=1)  # pure COW: exact per-epoch counts
    eng.replay(tmp_wal)
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    live = sum(info["live_rows"] for info in m["partitions"].values())
    assert live == read_lake(tmp_lake).count()
    assert all(info["checksum"] for info in m["partitions"].values())


def test_compaction_restores_exact_lineage(tmp_lake, tmp_wal):
    """MOR deltas accumulate between compactions; an explicit compact()
    restores exact per-partition live counts + checksums and the read
    result is unchanged."""
    generate_wal(tmp_wal, WalSpec(n_events=4_000, n_convs=150, n_epochs=3,
                                  update_frac=0.3, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=4, compact_every=10)  # never auto-compact
    eng.replay(tmp_wal)
    before = _export_df(tmp_lake)
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    assert any(info["deltas"] for info in m["partitions"].values())

    r = eng.compact()
    assert r["compacted"] > 0
    m2 = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    assert all(not info["deltas"] for info in m2["partitions"].values())
    live = sum(info["live_rows"] for info in m2["partitions"].values())
    assert live == read_lake(tmp_lake).count()
    pd.testing.assert_frame_equal(before, _export_df(tmp_lake))
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_tombstone_blocks_late_resurrection(tmp_lake, tmp_wal):
    """A late event (earlier ts) arriving after a delete must NOT
    resurrect the key — tombstones carry the delete's (ts, offset)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    from agr_loader_ray.schemas import WAL_SCHEMA

    def row(offset, epoch, op, ts, text):
        return {
            "offset": offset, "epoch": epoch, "op": op, "conv_id": "c1",
            "turn_idx": 0, "role": None if op == "D" else "user",
            "text": None if op == "D" else text, "tool": "" if op != "D" else None,
            "ts": ts, "schema_change": "",
        }

    events = [
        row(0, 0, "I", 1_000, "v1"),
        row(1, 0, "D", 5_000, None),      # delete at ts=5000
    ]
    late = [row(2, 1, "U", 3_000, "late")]  # older ts, later epoch
    for e, rows in [(0, events), (1, late)]:
        d = os.path.join(tmp_wal, f"epoch={e}")
        os.makedirs(d, exist_ok=True)
        t = pa.Table.from_pylist(rows, schema=WAL_SCHEMA.remove_metadata())
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pa.array(np.array([r["ts"] for r in rows], dtype="datetime64[us]")))
        pq.write_table(t, os.path.join(d, "segment-0000.parquet"))
        open(os.path.join(d, "_SEALED"), "w").close()

    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.replay(tmp_wal)
    assert read_lake(tmp_lake).count() == 0


def test_catchup_equals_sequential(tmp_path):
    """Batched catch-up replay must produce byte-identical per-epoch
    manifests (counts + checksums) and the same final state as
    one-shuffle-per-epoch sequential replay."""
    wal = str(tmp_path / "wal")
    spec = WalSpec(n_events=10_000, n_convs=400, n_epochs=5, update_frac=0.25,
                   delete_frac=0.08, out_of_order_frac=0.1, dup_ts_frac=0.05,
                   schema_events=((0.5, '{"kind": "add_column", "name": "lang", "type": "string", "default": null}'),))
    generate_wal(wal, spec)

    lake_seq = str(tmp_path / "lake_seq")
    lake_cat = str(tmp_path / "lake_cat")
    eng_seq = CdcEngine(lake_seq, n_partitions=8)
    eng_seq.replay(wal, catchup=False)
    eng_cat = CdcEngine(lake_cat, n_partitions=8)
    eng_cat.replay(wal, catchup=True)

    for e in eng_seq.manifest.committed_epochs():
        ms = eng_seq.manifest.read_epoch(e)
        mc = eng_cat.manifest.read_epoch(e)
        assert ms["partitions"] == mc["partitions"], f"epoch {e}"
        assert ms["schema_registry"] == mc["schema_registry"]
    _assert_equals_oracle(lake_cat, wal)


def test_catchup_resume_mid_batch(tmp_path):
    """Crash after the batched apply but before commits: staged
    manifests let the rerun skip all the work and still commit."""
    import os
    wal = str(tmp_path / "wal")
    spec = WalSpec(n_events=6_000, n_convs=200, n_epochs=4, update_frac=0.2, delete_frac=0.1)
    generate_wal(wal, spec)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, n_partitions=4)
    eng.replay(wal)
    # simulate crash before the last two commits
    os.remove(eng.manifest.epoch_manifest_path(2))
    os.remove(eng.manifest.epoch_manifest_path(3))
    eng2 = CdcEngine(lake, n_partitions=4)
    stats = eng2.replay(wal)
    applied = [s["epoch"] for s in stats["epochs"] if not s.get("skipped")]
    assert applied == [2, 3]
    _assert_equals_oracle(lake, wal)


def test_tail_applies_new_epochs(tmp_lake, tmp_wal, tmp_path):
    """WAL tailing: epochs appearing over time are applied incrementally."""
    import os
    import shutil
    spec = WalSpec(n_events=3_000, n_convs=100, n_epochs=3, update_frac=0.2, delete_frac=0.05)
    staging = str(tmp_path / "staging")
    generate_wal(staging, spec)

    os.makedirs(tmp_wal, exist_ok=True)
    shutil.copytree(os.path.join(staging, "epoch=0"), os.path.join(tmp_wal, "epoch=0"))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    r1 = eng.tail(tmp_wal, poll_interval=0.05, idle_rounds=2)
    assert r1["batches"] == 1

    for e in (1, 2):
        shutil.copytree(os.path.join(staging, f"epoch={e}"), os.path.join(tmp_wal, f"epoch={e}"))
    r2 = eng.tail(tmp_wal, poll_interval=0.05, idle_rounds=2)
    assert r2["batches"] == 1 and r2["events_applied"] > 0
    _assert_equals_oracle(tmp_lake, staging)


def test_tombstone_gc_at_compaction(tmp_lake, tmp_wal):
    """Tombstones older than the watermark offset are dropped at
    compaction; live state and export are unchanged."""
    generate_wal(tmp_wal, WalSpec(n_events=4_000, n_convs=100, n_epochs=2, delete_frac=0.3))
    eng = CdcEngine(tmp_lake, n_partitions=4, compact_every=1)
    eng.replay(tmp_wal)
    before = _export_df(tmp_lake)
    m = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    total_rows = sum(i["rows"] for i in m["partitions"].values())
    live_rows = sum(i["live_rows"] for i in m["partitions"].values())
    assert total_rows > live_rows  # tombstones present

    eng.compact(drop_tombstones_before_offset=10**9)  # watermark beyond all offsets
    m2 = eng.manifest.read_epoch(eng.manifest.last_committed_epoch())
    assert sum(i["rows"] for i in m2["partitions"].values()) == live_rows
    pd.testing.assert_frame_equal(before, _export_df(tmp_lake))


def test_time_travel_reads_earlier_epoch(tmp_lake, tmp_wal):
    """Epoch manifests are snapshots: read_lake(epoch=k) must equal the
    oracle folded over epochs <= k (files are immutable, never deleted)."""
    spec = WalSpec(n_events=6_000, n_convs=200, n_epochs=4, update_frac=0.3, delete_frac=0.1)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)
    for k in (1, 2):
        got = (
            read_lake(tmp_lake, epoch=k).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        want = oracle_reduce(_wal_df(tmp_wal), upto_epoch=k).reset_index(drop=True)
        got = got[want.columns.tolist()]
        for c in want.columns:
            want[c] = want[c].astype(got[c].dtype)
        pd.testing.assert_frame_equal(got, want)


def test_wide_rows_roundtrip(tmp_lake, tmp_wal):
    """FIXTURES §1: a few ≥64 KiB texts must survive the full path
    (prefold → exchange → delta/compaction → merge-on-read export)."""
    spec = WalSpec(n_events=2_000, n_convs=100, n_epochs=2, update_frac=0.2,
                   delete_frac=0.05, wide_rows=5)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.replay(tmp_wal)
    got = _export_df(tmp_lake)
    assert (got["text"].str.len() >= 65_536).sum() >= 1
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_lake_metrics_summary(tmp_lake, tmp_wal):
    from agr_loader_ray.pipelines.engine import lake_metrics
    generate_wal(tmp_wal, WalSpec(n_events=2_000, n_convs=80, n_epochs=2, update_frac=0.3))
    CdcEngine(tmp_lake, n_partitions=4, compact_every=1).replay(tmp_wal)
    m = lake_metrics(tmp_lake)
    assert m["last_epoch"] == 1
    assert len(m["epochs"]) == 2
    assert m["epochs"][-1]["rows"] > 0
    assert m["epochs"][-1]["schema_version"] == 0
    assert m["epochs"][-1]["compacted_partitions"] == 4


def test_stray_tmp_files_are_ignored(tmp_lake, tmp_wal):
    """A crash can leave .tmp.<pid> files behind; readers and replays
    must ignore them (manifests only reference final renamed files)."""
    import os
    generate_wal(tmp_wal, WalSpec(n_events=1_000, n_convs=50, n_epochs=2))
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.apply_epoch(tmp_wal, 0)
    # plant stray tmp files where data lives
    part_dir = os.path.join(tmp_lake, "part=0")
    os.makedirs(part_dir, exist_ok=True)
    with open(os.path.join(part_dir, "delta-epoch=1.parquet.tmp.999"), "wb") as fh:
        fh.write(b"garbage not parquet")
    eng.replay(tmp_wal)
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_read_lake_column_pruning(tmp_lake, tmp_wal):
    generate_wal(tmp_wal, WalSpec(n_events=1_500, n_convs=60, n_epochs=2, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.replay(tmp_wal)
    full = read_lake(tmp_lake).to_pandas()
    pruned = read_lake(tmp_lake, columns=["conv_id", "turn_idx", "role"]).to_pandas()
    assert list(pruned.columns) == ["conv_id", "turn_idx", "role"]
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        pruned.sort_values(key).reset_index(drop=True),
        full[["conv_id", "turn_idx", "role"]].sort_values(key).reset_index(drop=True),
    )
    import pytest
    with pytest.raises(KeyError):
        read_lake(tmp_lake, columns=["nope"])


def test_unsealed_epoch_invisible_until_sealed(tmp_lake, tmp_wal, tmp_path):
    """A concurrently-written (unsealed) epoch must not be applied: a
    half-epoch apply would commit its manifest and skip late segments
    forever.  Sealing makes the full epoch visible."""
    import os
    import shutil

    spec = WalSpec(n_events=3_000, n_convs=100, n_epochs=2, update_frac=0.2, delete_frac=0.05)
    staging = str(tmp_path / "staging")
    generate_wal(staging, spec)

    os.makedirs(tmp_wal, exist_ok=True)
    shutil.copytree(os.path.join(staging, "epoch=0"), os.path.join(tmp_wal, "epoch=0"))
    # epoch 1 arrives partially: first segment only, no _SEALED sentinel
    src1 = os.path.join(staging, "epoch=1")
    dst1 = os.path.join(tmp_wal, "epoch=1")
    os.makedirs(dst1)
    segs = sorted(f for f in os.listdir(src1) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src1, segs[0]), os.path.join(dst1, segs[0]))

    eng = CdcEngine(tmp_lake, n_partitions=4)
    assert eng.wal_epochs(tmp_wal) == [0]
    eng.tail(tmp_wal, poll_interval=0.05, idle_rounds=2)
    assert eng.manifest.last_committed_epoch() == 0

    # the rest of the epoch lands, then the seal
    for f in os.listdir(src1):
        shutil.copy(os.path.join(src1, f), os.path.join(dst1, f))
    assert eng.wal_epochs(tmp_wal) == [0, 1]
    eng.tail(tmp_wal, poll_interval=0.05, idle_rounds=2)
    assert eng.manifest.last_committed_epoch() == 1
    _assert_equals_oracle(tmp_lake, staging)


def test_foreign_unsealed_wal_requires_explicit_trust(tmp_lake, tmp_wal):
    """A WAL with no sentinels and no sealed-mode marker (foreign,
    sealed-at-rest) is readable ONLY with trust_unsealed=True; without
    it the engine refuses (it may be mid-write).  With the sealed-mode
    marker present, unsealed epochs are simply invisible — never an
    assume-all-sealed inference."""
    import os

    import pytest as _pytest

    generate_wal(tmp_wal, WalSpec(n_events=1_000, n_convs=50, n_epochs=2))
    for e in (0, 1):
        os.remove(os.path.join(tmp_wal, f"epoch={e}", "_SEALED"))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    # sealed-mode marker present, zero sentinels -> nothing consumable
    assert eng.wal_epochs(tmp_wal) == []
    os.remove(os.path.join(tmp_wal, "_WAL_SEALED_MODE"))
    with _pytest.raises(ValueError):
        eng.wal_epochs(tmp_wal)
    assert eng.wal_epochs(tmp_wal, trust_unsealed=True) == [0, 1]


def test_unsealed_epoch0_invisible_during_initial_write(tmp_lake, tmp_wal):
    """The ADVICE race: at the very start of a generator-written WAL,
    epoch=0 segments exist before its _SEALED does.  A tailer polling in
    that window must see NO consumable epochs (the root marker forces
    sentinel-only mode), not assume-all-sealed."""
    import os
    import shutil

    staging = tmp_wal + "-staging"
    generate_wal(staging, WalSpec(n_events=1_000, n_convs=50, n_epochs=2))
    os.makedirs(tmp_wal, exist_ok=True)
    shutil.copy(os.path.join(staging, "_WAL_SEALED_MODE"),
                os.path.join(tmp_wal, "_WAL_SEALED_MODE"))
    src0, dst0 = os.path.join(staging, "epoch=0"), os.path.join(tmp_wal, "epoch=0")
    os.makedirs(dst0)
    segs = sorted(f for f in os.listdir(src0) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src0, segs[0]), os.path.join(dst0, segs[0]))
    eng = CdcEngine(tmp_lake, n_partitions=4)
    assert eng.wal_epochs(tmp_wal) == []  # half-written epoch 0 invisible
    shutil.rmtree(dst0)
    shutil.copytree(src0, dst0)
    assert eng.wal_epochs(tmp_wal) == [0]


def test_bench_scale_partition_count_oracle_equality(tmp_lake, tmp_wal):
    """Oracle equality at the BENCH partition count (64) and a larger WAL:
    guards against partition-count-dependent bugs the small fixtures
    (n_partitions=4) cannot see."""
    spec = WalSpec(n_events=100_000, n_convs=3_000, n_epochs=4,
                   update_frac=0.25, delete_frac=0.05, zipf_a=1.2,
                   out_of_order_frac=0.05, dup_ts_frac=0.02)
    generate_wal(tmp_wal, spec)
    eng = CdcEngine(tmp_lake, n_partitions=64)
    eng.replay(tmp_wal)
    _assert_equals_oracle(tmp_lake, tmp_wal)


def _poison_wal(tmp_wal, n_epochs=2):
    """Generated WAL + hand-injected poison events in epoch 0 (null key /
    null ts / unknown op)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from agr_loader_ray.schemas import WAL_SCHEMA

    generate_wal(tmp_wal, WalSpec(n_events=2_000, n_convs=100, n_epochs=n_epochs,
                                  update_frac=0.2, delete_frac=0.05))

    def row(offset, op, conv, ts):
        return {
            "offset": offset, "epoch": 0, "op": op, "conv_id": conv,
            "turn_idx": 0, "role": "user", "text": "poison", "tool": "",
            "ts": ts, "schema_change": "",
        }

    bad_rows = [
        row(10_000_000, "U", None, 1_000),   # null key
        row(10_000_001, "X", "c-bad", 1_000),  # unknown op
        row(10_000_002, "U", "c-bad", None),   # null LWW ts
    ]
    t = pa.Table.from_pylist(bad_rows, schema=WAL_SCHEMA.remove_metadata())
    ts_vals = np.array([pd.Timestamp(r["ts"], unit="us") if r["ts"] is not None else None
                        for r in bad_rows], dtype="datetime64[us]")
    t = t.set_column(t.schema.get_field_index("ts"), "ts", pa.array(ts_vals))
    pq.write_table(t, os.path.join(tmp_wal, "epoch=0", "segment-9999.parquet"))
    return bad_rows


def test_poison_events_quarantined_not_fatal(tmp_lake, tmp_wal):
    """SURVEY §4.1: malformed events must not fail the replay (the
    reference's unbounded requeue, neo4j_transactor.py:108-118, bounded
    here): they land in a quarantine parquet + manifest counter, the
    valid events apply normally, and the lake equals the oracle over the
    valid subset."""
    import os

    import pyarrow.parquet as pq

    bad_rows = _poison_wal(tmp_wal)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    stats = eng.replay(tmp_wal)
    assert sum(s.get("quarantined", 0) for s in stats["epochs"]) == len(bad_rows)

    qfile = os.path.join(tmp_lake, "quarantine", "epoch=0.parquet")
    assert os.path.exists(qfile)
    q = pq.read_table(qfile)
    assert q.num_rows == len(bad_rows)
    assert sorted(q["text"].to_pylist()) == ["poison"] * 3

    m = eng.manifest.read_epoch(0)
    assert m["quarantine"]["rows"] == len(bad_rows)
    assert m["quarantine"]["files"] == ["quarantine/epoch=0.parquet"]

    # lake state: oracle over the VALID events only (generated WAL)
    want = oracle_reduce(
        _wal_df(tmp_wal).query("offset < 10_000_000")).reset_index(drop=True)
    got = _export_df(tmp_lake)[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # idempotent: a re-run applies nothing new and keeps the counter
    stats2 = eng.replay(tmp_wal)
    assert stats2["events_applied"] == 0
    assert eng.manifest.read_epoch(0)["quarantine"]["rows"] == len(bad_rows)

    # convergence: the FIXED event arrives later as a normal CDC upsert
    # (new epoch), and the key materializes
    import numpy as np
    import pyarrow as pa

    from agr_loader_ray.schemas import WAL_SCHEMA

    fixed = [{
        "offset": 10_000_010, "epoch": 9, "op": "I", "conv_id": "c-bad",
        "turn_idx": 0, "role": "user", "text": "fixed", "tool": "",
        "ts": 2_000, "schema_change": "",
    }]
    t = pa.Table.from_pylist(fixed, schema=WAL_SCHEMA.remove_metadata())
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pa.array(np.array([2_000], dtype="datetime64[us]")))
    edir = os.path.join(tmp_wal, "epoch=9")
    os.makedirs(edir)
    pq.write_table(t, os.path.join(edir, "segment-0000.parquet"))
    open(os.path.join(edir, "_SEALED"), "w").close()
    eng.replay(tmp_wal)
    out = _export_df(tmp_lake)
    assert (out.query("conv_id == 'c-bad'")["text"] == "fixed").all()


def test_engine_with_object_store_commit_io(tmp_lake, tmp_wal):
    """The single-shot-PUT commit path: inject ObjectStoreCommitIO (fake
    client whose namespace is the filesystem) and the whole replay —
    data files, staged manifests, epoch commits — runs through PUTs with
    no rename step, producing an oracle-equal lake.  Re-publishing under
    the same deterministic names (a retried epoch) is an idempotent
    overwrite."""
    from agr_loader_ray.state.commit_io import (
        FakeObjectStoreClient, ObjectStoreCommitIO)

    cio = ObjectStoreCommitIO(FakeObjectStoreClient("/"))
    generate_wal(tmp_wal, WalSpec(n_events=3_000, n_convs=100, n_epochs=3,
                                  update_frac=0.2, delete_frac=0.05))
    eng = CdcEngine(tmp_lake, n_partitions=4, commit_io=cio)
    eng.replay(tmp_wal)
    _assert_equals_oracle(tmp_lake, tmp_wal)

    # deterministic-name idempotent overwrite: wipe ONE epoch manifest
    # and re-replay — same names re-PUT, same final state
    import os
    os.remove(eng.manifest.epoch_manifest_path(2))
    eng2 = CdcEngine(tmp_lake, n_partitions=4, commit_io=cio)
    eng2.replay(tmp_wal)
    _assert_equals_oracle(tmp_lake, tmp_wal)


def test_point_lookup_matches_oracle_and_prunes(tmp_lake, tmp_wal):
    """Serving-path point read: routed to one partition, delta files
    bloom-pruned, result equals the oracle's final row (None for
    deleted/absent keys)."""
    from agr_loader_ray.pipelines.export import point_lookup
    from agr_loader_ray.state.manifest import LakeManifest

    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 15_000, "n_convs": 400})
    generate_wal(tmp_wal, spec)
    # high compact_every → delta chains stay outstanding → skipping matters
    eng = CdcEngine(tmp_lake, n_partitions=8, compact_every=10)
    eng.replay(tmp_wal)

    want = oracle_reduce(_wal_df(tmp_wal)).set_index(["conv_id", "turn_idx"])
    payload_cols = [c for c in want.columns]

    # 1) sampled live keys match the oracle row exactly
    sample = want.sample(20, random_state=7)
    for (conv, turn), exp in sample.iterrows():
        got = point_lookup(tmp_lake, conv, int(turn))
        assert got is not None, (conv, turn)
        for c in payload_cols:
            g, w = got[c], exp[c]
            if pd.isna(w):
                assert g is None or pd.isna(g), (conv, turn, c, g, w)
            else:
                assert g == w, (conv, turn, c, g, w)

    # 2) an absent key returns None and its partition's deltas are pruned
    row, stats = point_lookup(tmp_lake, "conv-that-does-not-exist", 0,
                              return_stats=True)
    assert row is None
    assert stats["files_pruned"] >= 1  # bloom skipping engaged
    # 3) partition routing: only 1/n of the lake's files were considered
    m = LakeManifest(tmp_lake)
    total_files = sum(
        (1 if i.get("base") else 0) + len(i.get("deltas") or [])
        for i in m.current_partitions().values()
    )
    assert stats["files_considered"] < total_files

    # 4) a deleted key returns None (find one from the WAL)
    wal = _wal_df(tmp_wal)
    dels = wal[wal["op"] == "D"][["conv_id", "turn_idx"]]
    deleted = None
    for _, r in dels.iterrows():
        if (r["conv_id"], r["turn_idx"]) not in want.index:
            deleted = (r["conv_id"], int(r["turn_idx"]))
            break
    if deleted is not None:
        assert point_lookup(tmp_lake, deleted[0], deleted[1]) is None


def test_point_lookup_works_after_compaction(tmp_lake, tmp_wal):
    """Compaction clears delta chains (and their blooms); lookups keep
    answering from the rewritten base."""
    from agr_loader_ray.pipelines.export import point_lookup

    generate_wal(tmp_wal, WalSpec(n_events=3_000, n_convs=120, n_epochs=3,
                                  update_frac=0.3, delete_frac=0.1))
    eng = CdcEngine(tmp_lake, n_partitions=4, compact_every=10)
    eng.replay(tmp_wal)
    eng.compact()

    want = oracle_reduce(_wal_df(tmp_wal)).set_index(["conv_id", "turn_idx"])
    (conv, turn), exp = next(iter(want.sample(1, random_state=3).iterrows()))
    got, stats = point_lookup(tmp_lake, conv, int(turn), return_stats=True)
    assert got is not None and got["text"] == exp["text"]
    assert stats["files_pruned"] == 0  # nothing left to prune


def test_repartition_midstream_and_guard(tmp_lake, tmp_wal):
    """Repartition 8 → 16 after half the epochs, continue the replay with
    a 16-way engine, and land on the oracle state; the manifest guard
    rejects an engine built with a stale partition count."""
    import pytest

    from agr_loader_ray.pipelines.export import point_lookup

    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 12_000, "n_convs": 400})
    generate_wal(tmp_wal, spec)
    half = spec.n_epochs // 2

    eng8 = CdcEngine(tmp_lake, n_partitions=8, compact_every=3)
    for e in range(half):
        eng8.apply_epoch(tmp_wal, e)
    _assert_equals_oracle(tmp_lake, tmp_wal, upto_epoch=half - 1)

    stats = eng8.repartition(16)
    assert stats["n_partitions"] == 16
    # state preserved exactly across the rewrite
    _assert_equals_oracle(tmp_lake, tmp_wal, upto_epoch=half - 1)

    # a stale 8-way engine is rejected before it can mis-route keys
    with pytest.raises(ValueError, match="repartition"):
        CdcEngine(tmp_lake, n_partitions=8).apply_epoch(tmp_wal, half)

    eng16 = CdcEngine(tmp_lake, n_partitions=16, compact_every=3)
    for e in range(half, spec.n_epochs):
        eng16.apply_epoch(tmp_wal, e)
    _assert_equals_oracle(tmp_lake, tmp_wal)

    # point lookup routes through the NEW count recorded in the manifest
    want = oracle_reduce(_wal_df(tmp_wal)).set_index(["conv_id", "turn_idx"])
    (conv, turn), exp = next(iter(want.sample(1, random_state=5).iterrows()))
    got = point_lookup(tmp_lake, conv, int(turn))
    assert got is not None and got["text"] == exp["text"]
