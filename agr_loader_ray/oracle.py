"""Single-threaded oracle reducer for WAL replay (FIXTURES.md §4).

Pure-pandas reference implementation of the engine's semantics: sort all
events by ``(conv_id, turn_idx, ts, offset)``, fold I/U/D with
last-writer-wins and tombstone deletion, apply ``S`` (schema-change)
events in offset order, and emit the final table sorted by
``(conv_id, turn_idx)``.

This plays the role the reference's post-load invariant suites play
(``/root/reference/src/test/specific_tests.py``): an independent
definition of the correct final state that the distributed engine must
match byte-for-byte (per-turn ``text`` equality under stable key order).

Semantics (shared contract with the engine):

- ``I`` and ``U`` are both full-row upserts — the reference's
  ``MERGE ... ON CREATE SET`` makes re-application idempotent and
  insert-vs-update indistinguishable at the store level
  (``/root/reference/src/etl/bgi_etl.py:99-116``); we generalize to
  last-writer-wins on ``(ts, offset)``.
- ``D`` deletes the key iff it is the last writer; a later (by ts)
  I/U resurrects the key.  Tombstones never appear in exported state.
- ``S`` events mutate the table schema: ``add_column`` (constant
  default applied to ALL rows, past and future), ``widen`` (type
  cast), ``drop_column`` and ``rename_column``.  All four are
  commutative with data events (the WAL payload layout is fixed, so
  data events never carry added/renamed names), so applying them
  after the fold is equivalent to offset-interleaved application.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

_TYPE_MAP = {
    "string": "object",
    "int32": "Int32",
    "int64": "Int64",
    "float64": "float64",
    "bool": "boolean",
}


def apply_schema_changes_pandas(df: pd.DataFrame, changes: list[dict]) -> pd.DataFrame:
    """Apply add_column / widen schema events to a folded pandas frame."""
    for ch in changes:
        if ch["kind"] == "add_column":
            if ch["name"] not in df.columns:
                df[ch["name"]] = ch.get("default")
                if ch.get("default") is None:
                    df[ch["name"]] = df[ch["name"]].astype(_TYPE_MAP.get(ch["type"], "object"))
        elif ch["kind"] == "widen":
            df[ch["name"]] = df[ch["name"]].astype(_TYPE_MAP[ch["to"]])
        elif ch["kind"] == "drop_column":
            df = df.drop(columns=[ch["name"]], errors="ignore")
        elif ch["kind"] == "rename_column":
            if ch["from"] in df.columns:
                df = df.rename(columns={ch["from"]: ch["to"]})
        else:  # pragma: no cover - generator emits only the four kinds
            raise ValueError(f"unknown schema change kind: {ch['kind']}")
    return df


def schema_changes_from_events(events: pd.DataFrame) -> list[dict]:
    """Extract S-event payloads in offset order."""
    s = events[events["op"] == "S"].sort_values("offset")
    return [json.loads(x) for x in s["schema_change"] if x]


def oracle_reduce(events: pd.DataFrame, upto_epoch: int | None = None) -> pd.DataFrame:
    """Fold a WAL event frame into the final transcript table.

    ``upto_epoch``: include only events with ``epoch <= upto_epoch``
    (for mid-replay checks); None → all.
    """
    ev = events if upto_epoch is None else events[events["epoch"] <= upto_epoch]
    changes = schema_changes_from_events(ev)
    data = ev[ev["op"] != "S"]

    data = data.sort_values(["conv_id", "turn_idx", "ts", "offset"], kind="mergesort")
    last = data.groupby(["conv_id", "turn_idx"], sort=False).tail(1)
    alive = last[last["op"] != "D"]

    out = alive[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()
    out = apply_schema_changes_pandas(out, changes)
    out = out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    out["turn_idx"] = out["turn_idx"].astype(
        "Int64" if any(c["kind"] == "widen" and c["name"] == "turn_idx" for c in changes) else "Int32"
    )
    return out


def oracle_change_feed(events: pd.DataFrame, epoch: int) -> pd.DataFrame:
    """Reference implementation of the lake change-data-feed for one
    epoch: diff the folded live state at ``epoch - 1`` vs at ``epoch``
    on the winning ``offset`` (state-defined, so late LWW-losing events
    emit nothing), with the epoch's schema changes applied to the
    emitted images — what ``pipelines.export.change_feed`` must match.
    """
    key = ["conv_id", "turn_idx"]
    changes = schema_changes_from_events(events[events["epoch"] <= epoch])

    def live_state(upto: int) -> pd.DataFrame:
        ev = events[(events["epoch"] <= upto) & (events["op"] != "S")]
        ev = ev.sort_values(key + ["ts", "offset"], kind="mergesort")
        last = ev.groupby(key, sort=False).tail(1)
        alive = last[last["op"] != "D"]
        return alive[key + ["role", "text", "tool", "ts", "offset"]]

    post = live_state(epoch)
    pre = live_state(epoch - 1) if epoch > 0 else post.iloc[0:0]

    mk = post[key + ["offset"]].merge(
        pre[key + ["offset"]], on=key, how="outer",
        suffixes=("_post", "_pre"), indicator=True,
    )
    ins = mk[mk["_merge"] == "left_only"][key]
    dele = mk[mk["_merge"] == "right_only"][key]
    upd = mk[(mk["_merge"] == "both") & (mk["offset_post"] != mk["offset_pre"])][key]

    parts = []
    for tag, kdf, side in (("insert", ins, post), ("update", upd, post), ("delete", dele, pre)):
        rows = side.merge(kdf, on=key).drop(columns=["offset"])
        rows.insert(0, "change_type", tag)
        parts.append(rows)
    out = pd.concat(parts, ignore_index=True)
    out = apply_schema_changes_pandas(out, changes)
    return out.sort_values(["change_type", *key], kind="mergesort").reset_index(drop=True)


def oracle_reduce_arrow(events: pa.Table, upto_epoch: int | None = None) -> pa.Table:
    """Arrow-typed oracle output (what the engine's export must equal)."""
    df = oracle_reduce(events.to_pandas(), upto_epoch)
    return pa.Table.from_pandas(df, preserve_index=False)
