"""Declarative row constraints (lakehouse CHECK constraints) on change
events.

Reference analogue: the reference validates every input file against a
Cerberus schema before any ETL consumes it
(``/root/reference/src/data_manager/data_file_manager.py:120-137``) and
drops known-bad rows with ad-hoc predicates (SURVEY M4).  Here the rule
set is DECLARATIVE, versioned, and enforced inside the replay itself:
events violating a constraint are diverted to the quarantine sink (with
a per-constraint reason + lineage counts in the epoch manifest) instead
of reaching the lake — the engine's bounded, provable version of
"validate then load".

Semantics (SQL CHECK-faithful):

- Constraints apply to the PAYLOAD of ``I``/``U`` events only.  ``D``
  events carry no payload (their non-key columns are legitimately
  null) and ``S`` events are schema changes — neither is checked.
- A NULL value *passes* every kind except ``not_null`` (SQL: a CHECK
  whose predicate is NULL does not fail the row).
- A column absent from the batch passes (constraints may be declared
  ahead of an ``add_column`` schema event; the default-filled column
  only exists after conform).
- The rule set is persisted as ``_CONSTRAINTS.json`` at the lake root
  (atomic publish via the CommitIO seam), versioned monotonically; the
  governing version is recorded in every epoch manifest it affected.

Kinds::

    {"name": n, "kind": "not_null",       "column": c}
    {"name": n, "kind": "allowed_values", "column": c, "values": [...]}
    {"name": n, "kind": "range",          "column": c, "min": x, "max": y}
    {"name": n, "kind": "length_max",     "column": c, "max": k}
    {"name": n, "kind": "length_min",     "column": c, "min": k}
    {"name": n, "kind": "regex",          "column": c, "pattern": p}  # RE2

Evaluation is fully vectorized (one pyarrow.compute pass per
constraint per block) and runs inside the prefold ``map_batches`` stage
— no extra dataset pass and no exchange beyond the one the replay
already pays.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CONSTRAINTS_FILE = "_CONSTRAINTS.json"

_KINDS = ("not_null", "allowed_values", "range", "length_max",
          "length_min", "regex")

#: reason label for structurally unappliable events (null key/order
#: fields, unknown op) — kept distinct from any user constraint name
INVALID_EVENT_REASON = "invalid_event"


def validate_constraints(constraints: list[dict]) -> None:
    """Raise ValueError on a malformed rule set (checked at SET time so
    replay never trips over a bad spec mid-stream)."""
    seen: set[str] = set()
    for c in constraints:
        name, kind = c.get("name"), c.get("kind")
        if not name or not isinstance(name, str):
            raise ValueError(f"constraint needs a string name: {c!r}")
        if name == INVALID_EVENT_REASON:
            raise ValueError(f"constraint name {name!r} is reserved")
        if name in seen:
            raise ValueError(f"duplicate constraint name {name!r}")
        seen.add(name)
        if kind not in _KINDS:
            raise ValueError(f"unknown constraint kind {kind!r} (of {_KINDS})")
        if not c.get("column"):
            raise ValueError(f"constraint {name!r} needs a column")
        if kind == "allowed_values" and not isinstance(c.get("values"), list):
            raise ValueError(f"constraint {name!r} needs a values list")
        if kind == "range" and c.get("min") is None and c.get("max") is None:
            raise ValueError(f"constraint {name!r} needs min and/or max")
        if kind == "length_max" and not isinstance(c.get("max"), int):
            raise ValueError(f"constraint {name!r} needs an int max")
        if kind == "length_min" and not isinstance(c.get("min"), int):
            raise ValueError(f"constraint {name!r} needs an int min")
        if kind == "regex" and not isinstance(c.get("pattern"), str):
            raise ValueError(f"constraint {name!r} needs a pattern")


def _bound_scalar(value: Any, typ: pa.DataType) -> pa.Scalar:
    """A comparison bound coerced to the column's type (ISO strings are
    accepted for timestamp columns)."""
    if pa.types.is_timestamp(typ) and isinstance(value, str):
        return pc.cast(pa.scalar(value), typ)
    return pa.scalar(value).cast(typ)


def _violation_mask(batch: pa.Table, c: dict) -> "pa.Array | None":
    """Boolean array, True where the row VIOLATES ``c``; None when the
    constraint cannot apply to this batch (column absent)."""
    col_name = c["column"]
    if batch.schema.get_field_index(col_name) == -1:
        return None
    col = batch[col_name]
    kind = c["kind"]
    if kind == "not_null":
        return pc.is_null(col).combine_chunks()
    if kind == "allowed_values":
        ok = pc.is_in(col, value_set=pa.array(c["values"], col.type
                                              if len(c["values"]) else None))
        bad = pc.invert(ok)
    elif kind == "range":
        bad = pa.chunked_array([pa.array(np.zeros(len(ch), bool))
                                for ch in col.chunks]) if col.num_chunks \
            else pa.array(np.zeros(len(col), bool))
        if c.get("min") is not None:
            bad = pc.or_(bad, pc.less(col, _bound_scalar(c["min"], col.type)))
        if c.get("max") is not None:
            bad = pc.or_(bad, pc.greater(col, _bound_scalar(c["max"], col.type)))
    elif kind == "length_max":
        bad = pc.greater(pc.utf8_length(col), c["max"])
    elif kind == "length_min":
        bad = pc.less(pc.utf8_length(col), c["min"])
    elif kind == "regex":
        bad = pc.invert(pc.match_substring_regex(col, c["pattern"]))
    else:  # pragma: no cover - validate_constraints guards this
        raise ValueError(f"unknown constraint kind {kind!r}")
    # SQL CHECK: NULL does not fail any predicate except not_null —
    # is_in yields a non-null False for nulls, so mask validity
    # explicitly rather than relying on null propagation alone
    bad = pc.and_(pc.fill_null(bad, False), pc.is_valid(col))
    return bad.combine_chunks() if isinstance(bad, pa.ChunkedArray) else bad


def _checkable_mask(batch: pa.Table) -> "pa.ChunkedArray | pa.Array":
    """True for rows whose payload is subject to constraints (I/U)."""
    return pc.fill_null(pc.is_in(batch["op"], value_set=pa.array(["I", "U"])),
                        False)


def constraint_violations(batch: pa.Table,
                          constraints: list[dict]) -> "pa.Array | None":
    """One fused boolean mask: True where an I/U row violates ANY
    constraint.  None (cheap fast path) when no constraint applies."""
    if not constraints:
        return None
    total = None
    for c in constraints:
        m = _violation_mask(batch, c)
        if m is None:
            continue
        total = m if total is None else pc.or_(total, m)
    if total is None:
        return None
    return pc.and_(total, _checkable_mask(batch))


def violation_reasons(batch: pa.Table, constraints: list[dict],
                      invalid_mask: "pa.Array | None" = None) -> list:
    """Per-row reason labels for a QUARANTINED batch: the structural
    ``invalid_event`` label wins, else the FIRST violated constraint in
    declaration order, else None (should not happen for parked rows —
    kept total for foreign quarantine files)."""
    n = batch.num_rows
    reasons: list = [None] * n
    if invalid_mask is not None:
        inv = np.asarray(invalid_mask.to_numpy(zero_copy_only=False), bool)
        for i in np.nonzero(inv)[0]:
            reasons[i] = INVALID_EVENT_REASON
    checkable = np.asarray(
        _checkable_mask(batch).combine_chunks().to_numpy(zero_copy_only=False),
        bool)
    for c in constraints:
        m = _violation_mask(batch, c)
        if m is None:
            continue
        bad = np.asarray(m.to_numpy(zero_copy_only=False), bool) & checkable
        for i in np.nonzero(bad)[0]:
            if reasons[i] is None:
                reasons[i] = c["name"]
    return reasons


# -- persistence (lake-root rule-set file, atomic via CommitIO) -------------

def constraints_path(lake_root: str) -> str:
    return os.path.join(lake_root, CONSTRAINTS_FILE)


def load_constraints(lake_root: str) -> dict:
    """→ {"version": int, "constraints": [...]}; version 0 ≙ none set."""
    p = constraints_path(lake_root)
    if not os.path.exists(p):
        return {"version": 0, "constraints": []}
    with open(p) as fh:
        return json.load(fh)


def publish_constraints(lake_root: str, constraints: list[dict],
                        commit_io) -> dict:
    validate_constraints(constraints)
    state = load_constraints(lake_root)
    state = {"version": int(state["version"]) + 1,
             "constraints": list(constraints)}
    commit_io.publish_json(constraints_path(lake_root), state)
    return state
