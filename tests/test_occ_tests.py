"""Optimistic concurrency (state/occ.py): put-if-absent primitive,
first-writer-wins, disjoint rebase, overlap abort, crash-retry
idempotence, reader visibility of merged multi-writer state."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine, _live_checksum
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.state.commit_io import (FakeObjectStoreClient, LocalCommitIO,
                                            ObjectStoreCommitIO)
from agr_loader_ray.state.manifest import LakeManifest
from agr_loader_ray.state.occ import OccConflictError, OccWriter
from agr_loader_ray.wal.generator import WalSpec, generate_wal

SPEC = WalSpec(n_events=3_000, n_convs=120, n_epochs=2)


# --------------------------------------------------------------------------
# put-if-absent primitive
# --------------------------------------------------------------------------
def test_publish_json_if_absent_first_wins(tmp_path):
    io = LocalCommitIO()
    p = str(tmp_path / "m" / "epoch=0.json")
    assert io.publish_json_if_absent(p, {"who": "a"}) is True
    assert io.publish_json_if_absent(p, {"who": "b"}) is False
    with open(p) as fh:
        assert json.load(fh)["who"] == "a"
    # no temp litter
    assert os.listdir(str(tmp_path / "m")) == ["epoch=0.json"]


def test_object_store_put_if_absent_parity(tmp_path):
    io = ObjectStoreCommitIO(FakeObjectStoreClient(str(tmp_path / "bucket")))
    p = "/lake/_manifests/epoch=3.json"
    assert io.publish_json_if_absent(p, {"who": "a"}) is True
    assert io.publish_json_if_absent(p, {"who": "b"}) is False


# --------------------------------------------------------------------------
# OCC over a real lake
# --------------------------------------------------------------------------
@pytest.fixture()
def lake(tmp_path, ray_session):
    wal = str(tmp_path / "wal")
    root = str(tmp_path / "lake")
    generate_wal(wal, SPEC)
    eng = CdcEngine(root, n_partitions=8)
    eng.replay(wal)
    eng.compact()  # fold to single-base partitions (OCC writes full bases)
    return root


def _retag(lake_root, writer, part, tag, marker):
    """Read a partition's folded base, stamp every text with ``marker``,
    publish as an OCC file; return (new partition info, live rows)."""
    m = LakeManifest(lake_root)
    info = dict(m.current_partitions()[part])
    base = info["base"] if isinstance(info["base"], list) else [info["base"]]
    tbl = pa.concat_tables([pq.read_table(m.abspath(b)) for b in base])
    stamped = pc.binary_join_element_wise(tbl["text"], marker, "")
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", stamped)
    rel = writer.publish_partition(part, tag, tbl)
    info.update(base=[rel], deltas=[], delta_blooms=[], delta_rows=0,
                rows=tbl.num_rows, live_rows=tbl.num_rows,
                checksum=_live_checksum(tbl))
    live = int(pc.sum(pc.invert(tbl["_deleted"])).as_py() or 0)
    return info, live


def test_disjoint_writers_both_commit_and_merge(lake):
    a = OccWriter(lake, "wa")
    b = OccWriter(lake, "wb")
    base_a, base_b = a.snapshot_epoch(), b.snapshot_epoch()
    before = export_sorted(lake).to_pandas()

    info_a, live_a = _retag(lake, a, 1, "t0", "\u2021wa")
    info_b, live_b = _retag(lake, b, 2, "t0", "\u2021wb")
    man_a = a.commit(base_a, {1: info_a})
    # b raced from the same base: must rebase over a's epoch (disjoint)
    man_b = b.commit(base_b, {2: info_b})
    assert man_b["epoch"] == man_a["epoch"] + 1
    assert man_b["occ"]["base_epoch"] == man_a["epoch"]

    after = export_sorted(lake).to_pandas()
    assert len(after) == len(before)
    # both writers' stamps are visible in ONE snapshot
    assert after["text"].str.endswith("\u2021wa").sum() == live_a > 0
    assert after["text"].str.endswith("\u2021wb").sum() == live_b > 0


def test_overlapping_writer_aborts(lake):
    a = OccWriter(lake, "wa")
    b = OccWriter(lake, "wb")
    base = a.snapshot_epoch()
    info_a, _ = _retag(lake, a, 3, "t0", "\u2021x")
    a.commit(base, {3: info_a})
    info_b, _ = _retag(lake, b, 3, "t1", "\u2021y")  # same partition, stale base
    with pytest.raises(OccConflictError, match=r"partitions \[3\]"):
        b.commit(base, {3: info_b})


def test_crash_retry_same_token_is_idempotent(lake):
    a = OccWriter(lake, "wa")
    base = a.snapshot_epoch()
    info, _ = _retag(lake, a, 4, "t0", "\u2021z")
    man1 = a.commit(base, {4: info}, token="tok-1")
    # crashed after publish, restarted, retried with the SAME token and
    # stale base: must recognize its own commit, not raise or re-commit
    man2 = a.commit(base, {4: info}, token="tok-1")
    assert man2["epoch"] == man1["epoch"]
    m = LakeManifest(lake)
    assert m.last_committed_epoch() == man1["epoch"]


def test_lost_race_then_conflict_detected(lake):
    """b loses the put-if-absent race for its target epoch to a, then the
    retry loop's conflict scan sees the overlap and aborts."""
    a = OccWriter(lake, "wa")
    b = OccWriter(lake, "wb")
    base = a.snapshot_epoch()
    info_a, _ = _retag(lake, a, 5, "t0", "\u2021p")
    info_b, _ = _retag(lake, b, 5, "t1", "\u2021q")
    a.commit(base, {5: info_a})
    with pytest.raises(OccConflictError):
        b.commit(base, {5: info_b})


def test_sequential_writer_chain_preserves_lineage(lake):
    w = OccWriter(lake, "wa")
    e0 = w.snapshot_epoch()
    for i, part in enumerate([0, 6, 7]):
        base = w.snapshot_epoch()
        info, _ = _retag(lake, w, part, f"t{i}", "\u2021s")
        man = w.commit(base, {part: info})
        assert man["occ"]["touched"] == [part]
    m = LakeManifest(lake)
    assert m.last_committed_epoch() == e0 + 3
    # untouched partitions carried forward verbatim at every step
    cur = m.current_partitions()
    first = m.read_epoch(e0)["partitions"]
    for p in (1, 2, 3):
        assert cur[p]["base"] == first[str(p)]["base"]


# --------------------------------------------------------------------------
# TRUE multi-process put-if-absent race (two OS processes, shared fs) —
# the in-process tests above prove the protocol; this proves the
# PRIMITIVE under real concurrent os.link contention.
# --------------------------------------------------------------------------
def _occ_racer(root, n_rounds, who, barrier, results):
    from agr_loader_ray.state.commit_io import LocalCommitIO

    io = LocalCommitIO()
    wins = []
    for i in range(n_rounds):
        barrier.wait()  # line both writers up on every round
        won = io.publish_json_if_absent(
            os.path.join(root, f"epoch={i}.json"), {"who": who, "round": i})
        wins.append(bool(won))
    results.put((who, wins))


def test_put_if_absent_two_process_race(tmp_path):
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    n_rounds = 100
    root = str(tmp_path / "m")
    os.makedirs(root)
    barrier = ctx.Barrier(2)
    results = ctx.Queue()
    procs = [ctx.Process(target=_occ_racer,
                         args=(root, n_rounds, who, barrier, results))
             for who in ("a", "b")]
    for p in procs:
        p.start()
    got = dict(results.get(timeout=120) for _ in procs)
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    winners = 0
    for i in range(n_rounds):
        # exactly one winner per round...
        assert got["a"][i] != got["b"][i], f"round {i}: not exactly one winner"
        winners += 1
        # ...and the committed manifest is whole and names that winner
        with open(os.path.join(root, f"epoch={i}.json")) as fh:
            obj = json.load(fh)
        assert obj["round"] == i
        assert obj["who"] == ("a" if got["a"][i] else "b")
    assert winners == n_rounds
    # no temp litter from the losers
    assert sorted(os.listdir(root)) == [f"epoch={i}.json" for i in sorted(
        range(n_rounds), key=lambda x: f"epoch={x}.json")]
