"""Declarative CHECK constraints (state/constraints.py): violations are
quarantined with per-constraint reasons, valid events apply normally,
the rule set is versioned + persisted, and SQL NULL/delete semantics
hold.  Reference analogue: Cerberus input validation before load
(data_file_manager.py:120-137) + ad-hoc skip rules (SURVEY M4)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.state.constraints import (
    INVALID_EVENT_REASON,
    load_constraints,
    validate_constraints,
)
from agr_loader_ray.schemas import WAL_SCHEMA


def _row(offset, op, conv, turn=0, role="user", text="ok", tool="",
         ts=1_000, epoch=0):
    return {"offset": offset, "epoch": epoch, "op": op, "conv_id": conv,
            "turn_idx": turn, "role": role, "text": text, "tool": tool,
            "ts": ts, "schema_change": ""}


def _write_wal(root: str, rows: list[dict], epoch: int = 0) -> None:
    edir = os.path.join(root, f"epoch={epoch}")
    os.makedirs(edir, exist_ok=True)
    with open(os.path.join(root, "_WAL_SEALED_MODE"), "w"):
        pass
    t = pa.Table.from_pylist(rows, schema=WAL_SCHEMA.remove_metadata())
    ts_vals = np.array(
        [pd.Timestamp(r["ts"], unit="us") if r["ts"] is not None else None
         for r in rows], dtype="datetime64[us]")
    t = t.set_column(t.schema.get_field_index("ts"), "ts", pa.array(ts_vals))
    pq.write_table(t, os.path.join(edir, "segment-0000.parquet"))
    with open(os.path.join(edir, "_SEALED"), "w"):
        pass


_RULES = [
    {"name": "role_known", "kind": "allowed_values", "column": "role",
     "values": ["user", "assistant", "system", "tool"]},
    {"name": "text_short", "kind": "length_max", "column": "text", "max": 20},
    {"name": "turn_nonneg", "kind": "range", "column": "turn_idx", "min": 0},
]


def test_constraint_spec_validation():
    validate_constraints(_RULES)
    with pytest.raises(ValueError, match="string name"):
        validate_constraints([{"kind": "not_null", "column": "text"}])
    with pytest.raises(ValueError, match="duplicate"):
        validate_constraints([_RULES[0], _RULES[0]])
    with pytest.raises(ValueError, match="unknown constraint kind"):
        validate_constraints([{"name": "x", "kind": "nope", "column": "c"}])
    with pytest.raises(ValueError, match="min and/or max"):
        validate_constraints([{"name": "x", "kind": "range", "column": "c"}])
    with pytest.raises(ValueError, match="reserved"):
        validate_constraints([{"name": INVALID_EVENT_REASON,
                               "kind": "not_null", "column": "c"}])


def test_violations_quarantined_with_reasons(tmp_lake, tmp_wal):
    rows = [
        _row(0, "I", "c-0", text="fine"),
        _row(1, "I", "c-1", role="robot"),            # role_known
        _row(2, "I", "c-2", text="x" * 50),           # text_short
        _row(3, "I", "c-3", turn=-2),                 # turn_nonneg
        _row(4, "U", "c-4", role="wizard", text="y" * 99),  # first rule wins
        _row(5, "U", None, ts=None),                  # structural poison
        _row(6, "I", "c-5", text="also fine", ts=2_000),
    ]
    _write_wal(tmp_wal, rows)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    state = eng.set_constraints(_RULES)
    assert state["version"] == 1

    stats = eng.replay(tmp_wal)
    assert sum(s.get("quarantined", 0) for s in stats["epochs"]) == 5

    # lake holds exactly the two valid rows
    got = export_sorted(tmp_lake).to_pandas()
    assert sorted(got["conv_id"]) == ["c-0", "c-5"]

    # quarantine file carries a per-row _reason label
    q = pq.read_table(os.path.join(tmp_lake, "quarantine", "epoch=0.parquet"))
    by_conv = dict(zip(q["conv_id"].to_pylist(), q["_reason"].to_pylist()))
    assert by_conv["c-1"] == "role_known"
    assert by_conv["c-2"] == "text_short"
    assert by_conv["c-3"] == "turn_nonneg"
    assert by_conv["c-4"] == "role_known"  # declaration order attributes
    assert by_conv[None] == INVALID_EVENT_REASON

    # manifest lineage: per-reason counts + governing rule-set version
    m = eng.manifest.read_epoch(0)
    assert m["quarantine"]["reasons"] == {
        "role_known": 2, "text_short": 1, "turn_nonneg": 1,
        INVALID_EVENT_REASON: 1}
    assert m["constraints_version"] == 1

    # idempotent re-replay: nothing new, lineage intact
    stats2 = eng.replay(tmp_wal)
    assert stats2["events_applied"] == 0
    assert eng.manifest.read_epoch(0)["quarantine"]["reasons"]["role_known"] == 2


def test_null_and_delete_semantics(tmp_lake, tmp_wal):
    """SQL CHECK semantics: NULL predicates pass (except not_null), and
    D events — whose payload columns are legitimately null — are never
    checked, so a delete still lands as a tombstone."""
    rows = [
        _row(0, "I", "c-a", text="hello"),
        _row(1, "I", "c-b", text="there"),
        # delete with a null payload must NOT trip not_null(text)
        _row(2, "D", "c-b", text=None, role=None, ts=2_000),
        # null role passes allowed_values (NULL check passes) ...
        _row(3, "I", "c-c", role=None),
        # ... but null text fails not_null
        _row(4, "I", "c-d", text=None),
    ]
    _write_wal(tmp_wal, rows)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.set_constraints([
        {"name": "text_present", "kind": "not_null", "column": "text"},
        {"name": "role_known", "kind": "allowed_values", "column": "role",
         "values": ["user", "assistant", "system", "tool"]},
    ])
    eng.replay(tmp_wal)
    got = export_sorted(tmp_lake).to_pandas()
    assert sorted(got["conv_id"]) == ["c-a", "c-c"]  # c-b deleted, c-d parked
    m = eng.manifest.read_epoch(0)
    assert m["quarantine"]["reasons"] == {"text_present": 1}


def test_lww_not_shadowed_by_violating_update(tmp_lake, tmp_wal):
    """A violating later-ts update is parked BEFORE the fold, so it can
    never beat the valid earlier event in the LWW order."""
    rows = [
        _row(0, "I", "c-k", text="valid", ts=1_000),
        _row(1, "U", "c-k", text="z" * 80, ts=9_000),  # later ts, violates
    ]
    _write_wal(tmp_wal, rows)
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.set_constraints([{"name": "text_short", "kind": "length_max",
                          "column": "text", "max": 20}])
    eng.replay(tmp_wal)
    got = export_sorted(tmp_lake).to_pandas()
    assert got["text"].tolist() == ["valid"]


def test_constraints_persist_and_version(tmp_lake, tmp_wal):
    eng = CdcEngine(tmp_lake, n_partitions=2)
    assert eng.constraints_state() == {"version": 0, "constraints": []}
    eng.set_constraints(_RULES[:1])
    s2 = eng.set_constraints(_RULES)  # replace → version bumps
    assert s2["version"] == 2

    # a fresh engine instance (restart) reads the same rule set
    eng2 = CdcEngine(tmp_lake, n_partitions=2)
    st = eng2.constraints_state()
    assert st["version"] == 2 and st["constraints"] == _RULES
    assert load_constraints(tmp_lake)["version"] == 2

    # replay under the restored rules enforces them
    _write_wal(tmp_wal, [_row(0, "I", "c-ok"), _row(1, "I", "c-bad", turn=-1)])
    eng2.replay(tmp_wal)
    got = export_sorted(tmp_lake).to_pandas()
    assert got["conv_id"].tolist() == ["c-ok"]
    assert eng2.manifest.read_epoch(0)["constraints_version"] == 2


def test_regex_and_length_min_kinds(tmp_lake, tmp_wal):
    rows = [
        _row(0, "I", "conv-1", text="hello world"),
        _row(1, "I", "xx-2", text="hi"),      # conv_id pattern + too short
    ]
    _write_wal(tmp_wal, rows)
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.set_constraints([
        {"name": "conv_pattern", "kind": "regex", "column": "conv_id",
         "pattern": r"^conv-"},
        {"name": "min_len", "kind": "length_min", "column": "text", "min": 3},
    ])
    eng.replay(tmp_wal)
    got = export_sorted(tmp_lake).to_pandas()
    assert got["conv_id"].tolist() == ["conv-1"]
    q = pq.read_table(os.path.join(tmp_lake, "quarantine", "epoch=0.parquet"))
    assert q["_reason"].to_pylist() == ["conv_pattern"]


def test_unconstrained_lake_unchanged(tmp_lake, tmp_wal):
    """No rule set → the replay path is byte-identical to before (the
    constraints hook is a no-op): smoke WAL replays clean."""
    from agr_loader_ray.wal.generator import T1_SMOKE, generate_wal

    generate_wal(tmp_wal, T1_SMOKE)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    stats = eng.replay(tmp_wal)
    assert stats["events_applied"] == T1_SMOKE.n_events
    assert "quarantine" not in eng.manifest.read_epoch(0)
    assert "constraints_version" not in eng.manifest.read_epoch(0)


def test_redrive_quarantine_after_relaxing_rules(tmp_lake, tmp_wal):
    """DLQ reprocess: fix the rule set, redrive — previously-parked rows
    apply through the normal late-data path, still-violating rows stay
    parked, and a second redrive is a no-op."""
    rows = [
        _row(0, "I", "c-0", text="fine"),
        _row(1, "I", "c-1", text="x" * 50),          # parked: text_short
        _row(2, "I", "c-2", role="robot"),           # parked: role_known
        # parked violator whose ts is OLDER than a later valid update:
        # after redrive it must NOT win LWW
        _row(3, "I", "c-0", text="y" * 40, ts=500),
        _row(4, "U", None, ts=None),                 # structural: never redriven
    ]
    _write_wal(tmp_wal, rows)
    eng = CdcEngine(tmp_lake, n_partitions=4)
    eng.set_constraints(_RULES)
    eng.replay(tmp_wal)
    assert export_sorted(tmp_lake).to_pandas()["conv_id"].tolist() == ["c-0"]

    # relax: drop the length rule, keep role_known
    eng.set_constraints([_RULES[0]])
    r = eng.redrive_quarantine()
    assert r["redriven"] == 2          # offsets 1 and 3 now pass
    assert r["still_parked"] == 2      # c-2 (role) + the structural row
    got = export_sorted(tmp_lake).to_pandas()
    assert sorted(got["conv_id"]) == ["c-0", "c-1"]
    # LWW: the redriven older-ts row for c-0 did not beat ts=1000
    assert got.loc[got["conv_id"] == "c-0", "text"].tolist() == ["fine"]
    # redrive epoch committed with standard lineage
    assert eng.manifest.read_epoch(r["epoch"])["epoch"] == r["epoch"]

    # idempotent: nothing left to redrive
    r2 = eng.redrive_quarantine()
    assert r2["redriven"] == 0 and r2["still_parked"] == 2

    # relax fully: the role violator redrives too; structural never does
    eng.set_constraints([])
    r3 = eng.redrive_quarantine()
    assert r3["redriven"] == 1 and r3["still_parked"] == 1
    got = export_sorted(tmp_lake).to_pandas()
    assert sorted(got["conv_id"]) == ["c-0", "c-1", "c-2"]


def test_redrive_noop_without_quarantine(tmp_lake, tmp_wal):
    _write_wal(tmp_wal, [_row(0, "I", "c-0")])
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.replay(tmp_wal)
    assert eng.redrive_quarantine() == {"redriven": 0, "epoch": None,
                                        "still_parked": 0}


def test_redrive_epoch_collision_detected_not_skipped(tmp_lake, tmp_wal):
    """ADVICE r3 (medium): a redrive commits epoch last+1; if the source
    WAL later grows an epoch with that number, replay/tail must RAISE
    instead of silently skipping the WAL epoch's events.  The redrive
    epoch is durably marked in both _REDRIVEN.json and its manifest."""
    import glob
    import json as _json

    _write_wal(tmp_wal, [
        _row(0, "I", "c-0", text="fine"),
        _row(1, "I", "c-1", text="x" * 50),   # parked: text_short
    ])
    eng = CdcEngine(tmp_lake, n_partitions=2)
    eng.set_constraints(_RULES)
    eng.replay(tmp_wal)

    before = set(glob.glob("/tmp/agr_redrive_wal_*"))
    eng.set_constraints([])
    r = eng.redrive_quarantine()
    assert r["redriven"] == 1 and r["epoch"] == 1
    # temp WAL dir cleaned up (ADVICE r3 low)
    assert set(glob.glob("/tmp/agr_redrive_wal_*")) == before
    # durable markers
    assert eng.manifest.read_epoch(1).get("redrive") is True
    with open(os.path.join(tmp_lake, "_REDRIVEN.json")) as fh:
        assert _json.load(fh)["epochs"] == [1]

    # source WAL now grows epoch=1 → collision must raise, not skip
    _write_wal(tmp_wal, [_row(2, "I", "c-9", text="late", ts=2_000)], epoch=1)
    with pytest.raises(ValueError, match="collide with redrive"):
        eng.replay(tmp_wal)
    with pytest.raises(ValueError, match="collide with redrive"):
        eng.tail(tmp_wal, poll_interval=0.01, idle_rounds=1)
    # the colliding row was NOT silently dropped-and-forgotten: the lake
    # still has no c-9 and the WAL epoch remains unapplied
    got = export_sorted(tmp_lake).to_pandas()
    assert "c-9" not in set(got["conv_id"])


def test_wal_epochs_missing_root_raises_unless_opted_in(tmp_lake):
    """ADVICE r3 (low): a typo'd replay path fails loudly; only the
    tail loop (racing the writer's first epoch) opts into leniency."""
    eng = CdcEngine(tmp_lake, n_partitions=2)
    with pytest.raises(FileNotFoundError):
        eng.wal_epochs("/tmp/agr-no-such-wal-root")
    assert eng.wal_epochs("/tmp/agr-no-such-wal-root", missing_ok=True) == []
    with pytest.raises(FileNotFoundError):
        eng.replay("/tmp/agr-no-such-wal-root")
    # tail tolerates the startup race and just idles out
    r = eng.tail("/tmp/agr-no-such-wal-root", poll_interval=0.01, idle_rounds=1)
    assert r["events_applied"] == 0
