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
