"""Unit tests for schema evolution handlers."""

import pyarrow as pa
import pytest

from agr_loader_ray.schemas import TRANSCRIPT_SCHEMA
from agr_loader_ray.state.schema_registry import SchemaRegistry


def test_add_column_with_default():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "add_column", "name": "lang", "type": "string", "default": "en"})
    assert r.schema.field("lang").type == pa.string()
    assert r.defaults["lang"] == "en"
    t = pa.table({"conv_id": ["a"], "turn_idx": pa.array([1], pa.int32())})
    out = r.conform(t)
    assert out.column("lang").to_pylist() == ["en"]
    assert out.schema == r.schema


def test_widen_casts():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "widen", "name": "turn_idx", "to": "int64"})
    assert r.schema.field("turn_idx").type == pa.int64()
    t = pa.table({"turn_idx": pa.array([1, 2], pa.int32())})
    out = r.conform(t)
    assert out.column("turn_idx").type == pa.int64()


def test_illegal_widen_rejected():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError):
        r.apply({"kind": "widen", "name": "turn_idx", "to": "int8"})


def test_roundtrip_serialization():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "add_column", "name": "lang", "type": "string", "default": None})
    r.apply({"kind": "widen", "name": "turn_idx", "to": "int64"})
    r2 = SchemaRegistry.from_dict(r.to_dict())
    assert r2.schema == r.schema
    assert r2.version == r.version == 2
    assert r2.defaults == r.defaults


def test_add_column_idempotent_on_replay():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    ch = {"kind": "add_column", "name": "lang", "type": "string", "default": None}
    r.apply(ch)
    r.apply(ch)  # replayed epoch → no-op, no duplicate field
    assert len(r.schema) == len(TRANSCRIPT_SCHEMA) + 1


def test_drop_column():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "drop_column", "name": "tool"})
    assert r.schema.get_field_index("tool") == -1
    # conform drops the physical column from a legacy file
    t = pa.table({f.name: pa.nulls(2, f.type) for f in TRANSCRIPT_SCHEMA})
    out = r.conform(t)
    assert "tool" not in out.schema.names
    # idempotent re-apply
    r.apply({"kind": "drop_column", "name": "tool"})
    assert r.version == 2


def test_drop_protected_rejected():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError):
        r.apply({"kind": "drop_column", "name": "conv_id"})
    with pytest.raises(ValueError):
        r.apply({"kind": "rename_column", "from": "ts", "to": "timestamp"})


def test_rename_column_aliases_legacy_files():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "rename_column", "from": "tool", "to": "tool_name"})
    assert r.schema.names.index("tool_name") == TRANSCRIPT_SCHEMA.names.index("tool")
    # legacy file still carries the old physical name → conform re-labels it
    t = pa.table({f.name: pa.array(["x", "x"], pa.string()) if f.type == pa.string()
                  else pa.nulls(2, f.type) for f in TRANSCRIPT_SCHEMA})
    out = r.conform(t)
    assert out.column("tool_name").to_pylist() == ["x", "x"]
    # a post-rename file carries the new name → preferred over the alias
    t2 = t.rename_columns([n if n != "tool" else "tool_name" for n in t.schema.names])
    assert r.conform(t2).column("tool_name").to_pylist() == ["x", "x"]


def test_rename_chain_and_idempotency():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "rename_column", "from": "tool", "to": "tool_mid"})
    r.apply({"kind": "rename_column", "from": "tool_mid", "to": "tool_name"})
    assert r.aliases["tool_name"] == ["tool", "tool_mid"]
    # a file written between the two renames resolves via the NEWER alias
    t = pa.table({"tool_mid": pa.array(["m"]), "tool": pa.array(["old"])})
    assert r.conform(t).column("tool_name").to_pylist() == ["m"]
    # replayed epoch: from-name gone, to-name present → no-op
    v = r.version
    r.apply({"kind": "rename_column", "from": "tool_mid", "to": "tool_name"})
    assert r.version == v + 1 and r.aliases["tool_name"] == ["tool", "tool_mid"]
    # rename onto an existing column is an error
    with pytest.raises(ValueError):
        r.apply({"kind": "rename_column", "from": "role", "to": "text"})


def test_rename_drop_roundtrip_serialization():
    r = SchemaRegistry(TRANSCRIPT_SCHEMA)
    r.apply({"kind": "add_column", "name": "lang", "type": "string", "default": "en"})
    r.apply({"kind": "rename_column", "from": "lang", "to": "language"})
    r.apply({"kind": "drop_column", "name": "tool"})
    r2 = SchemaRegistry.from_dict(r.to_dict())
    assert r2.schema == r.schema
    assert r2.aliases == r.aliases == {"language": ["lang"]}
    assert r2.defaults == r.defaults == {"language": "en"}
