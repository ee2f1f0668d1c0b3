"""Schema registry: versioned Arrow schema + evolution handlers.

Reference analogue: the reference's schemas are implicit (CSV headers
inferred per file, ``/root/reference/src/transactors/csv_transactor.py:41-45``)
with config-level validation (Cerberus,
``/root/reference/src/data_manager/data_file_manager.py:120-137``).  Here
the schema is explicit, versioned, and mutated only by ``S`` WAL events:

- ``{"kind": "add_column", "name": n, "type": t, "default": d}`` —
  column ``n`` of type ``t`` appears with constant default ``d`` for all
  rows (past and future).
- ``{"kind": "widen", "name": n, "to": t}`` — column ``n`` is cast to
  the wider type ``t``.
- ``{"kind": "drop_column", "name": n}`` — column ``n`` disappears from
  the logical schema; physical files keep it until their next rewrite
  (``conform`` drops unknown columns).
- ``{"kind": "rename_column", "from": a, "to": b}`` — column ``a`` is
  renamed to ``b`` in place (type and values preserved).  Old physical
  files — and the WAL events themselves, whose payload layout is fixed —
  still carry ``a``; ``conform`` resolves it through the alias chain.

All four operations commute with data events (added columns are
constant-default until the WAL carries payloads for them; rename/drop
only relabel or remove whole columns), so partitions untouched by an
epoch evolve lazily: their files keep the old physical schema and are
conformed (null/default-filled, cast, re-aliased) at the next merge or
at read time.  The registry state is serialized into every epoch
manifest, making the schema version part of the commit lineage.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

_ARROW_TYPES: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "timestamp[us]": pa.timestamp("us"),
}


def type_from_name(name: str) -> pa.DataType:
    try:
        return _ARROW_TYPES[name]
    except KeyError:
        raise ValueError(f"unsupported schema type: {name!r}") from None


def type_to_name(t: pa.DataType) -> str:
    for name, at in _ARROW_TYPES.items():
        if at == t:
            return name
    raise ValueError(f"unsupported arrow type: {t}")


#: legal widenings (reference has none — ints are parsed in-database via
#: apoc.number.parseInt; we support standard numeric/string widening)
_WIDEN_OK = {
    ("int8", "int16"), ("int8", "int32"), ("int8", "int64"),
    ("int16", "int32"), ("int16", "int64"),
    ("int32", "int64"),
    ("float32", "float64"),
    ("int32", "float64"), ("int64", "float64"),
    ("string", "large_string"),
}


class SchemaRegistry:
    """Current transcript schema + per-column defaults, with evolution."""

    #: columns the engine's fold/partition kernels key on — dropping or
    #: renaming one would orphan the LWW order and the partition map
    PROTECTED = frozenset({"conv_id", "turn_idx", "ts"})

    def __init__(self, base: pa.Schema, version: int = 0,
                 defaults: dict[str, Any] | None = None,
                 aliases: dict[str, list[str]] | None = None):
        self.schema = base
        self.version = version
        self.defaults: dict[str, Any] = dict(defaults or {})
        #: current name -> prior physical names, oldest first
        self.aliases: dict[str, list[str]] = {k: list(v) for k, v in (aliases or {}).items()}

    # -- evolution ---------------------------------------------------------
    def apply(self, change: dict | str) -> None:
        if isinstance(change, str):
            change = json.loads(change)
        kind = change["kind"]
        if kind == "add_column":
            name, typ = change["name"], type_from_name(change["type"])
            if self.schema.get_field_index(name) != -1:
                # idempotent re-apply (replayed epoch) — no-op
                self.version += 1
                return
            self.schema = self.schema.append(pa.field(name, typ))
            self.defaults[name] = change.get("default")
        elif kind == "widen":
            name = change["name"]
            i = self.schema.get_field_index(name)
            if i == -1:
                raise ValueError(f"widen of unknown column {name!r}")
            frm = type_to_name(self.schema.field(i).type)
            to = change["to"]
            if frm != to and (frm, to) not in _WIDEN_OK:
                raise ValueError(f"illegal widen {frm} -> {to}")
            self.schema = self.schema.set(i, pa.field(name, type_from_name(to)))
        elif kind == "drop_column":
            name = change["name"]
            if name in self.PROTECTED:
                raise ValueError(f"cannot drop key/order column {name!r}")
            i = self.schema.get_field_index(name)
            if i == -1:
                # idempotent re-apply (replayed epoch) — no-op
                self.version += 1
                return
            self.schema = self.schema.remove(i)
            self.defaults.pop(name, None)
            self.aliases.pop(name, None)
        elif kind == "rename_column":
            frm, to = change["from"], change["to"]
            if frm in self.PROTECTED:
                raise ValueError(f"cannot rename key/order column {frm!r}")
            i = self.schema.get_field_index(frm)
            if i == -1:
                if self.schema.get_field_index(to) != -1:
                    # idempotent re-apply (replayed epoch) — no-op
                    self.version += 1
                    return
                raise ValueError(f"rename of unknown column {frm!r}")
            if self.schema.get_field_index(to) != -1:
                raise ValueError(f"rename target {to!r} already exists")
            self.schema = self.schema.set(i, pa.field(to, self.schema.field(i).type))
            if frm in self.defaults:
                self.defaults[to] = self.defaults.pop(frm)
            # chain: a->b->c leaves aliases[c] == [a, b] so files written
            # under ANY prior name still conform
            self.aliases[to] = self.aliases.pop(frm, []) + [frm]
        else:
            raise ValueError(f"unknown schema change kind: {kind!r}")
        self.version += 1

    # -- conformance -------------------------------------------------------
    def conform(self, table: pa.Table, extra_fields: list[pa.Field] | None = None) -> pa.Table:
        """Project ``table`` onto the registry schema (+ extra bookkeeping
        fields, in order): add missing columns with their defaults, cast
        widened columns, drop unknown columns."""
        target = list(self.schema)
        for f in extra_fields or []:
            target.append(f)
        n = table.num_rows
        cols = []
        for f in target:
            i = table.schema.get_field_index(f.name)
            if i == -1:
                # renamed column: the file may carry a prior physical name
                # (most recent alias first — a->b->c prefers b over a)
                for old in reversed(self.aliases.get(f.name, [])):
                    i = table.schema.get_field_index(old)
                    if i != -1:
                        break
            if i == -1:
                default = self.defaults.get(f.name)
                cols.append(pa.nulls(n, f.type) if default is None else pa.array([default] * n, f.type))
            else:
                col = table.column(i)
                cols.append(col.cast(f.type) if col.type != f.type else col)
        return pa.Table.from_arrays(cols, schema=pa.schema(target))

    # -- serialization (into manifests) ------------------------------------
    def to_dict(self) -> dict:
        return {
            "version": self.version,
            "fields": [[f.name, type_to_name(f.type)] for f in self.schema],
            # copy: to_dict() snapshots must not alias live mutable state
            # (apply_epochs snapshots the registry once per epoch)
            "defaults": dict(self.defaults),
            "aliases": {k: list(v) for k, v in self.aliases.items()},
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SchemaRegistry":
        schema = pa.schema([pa.field(n, type_from_name(t)) for n, t in d["fields"]])
        return cls(schema, version=d["version"], defaults=d.get("defaults", {}),
                   aliases=d.get("aliases", {}))
