"""Streaming monolithic-JSON-array reader (SURVEY S4 hard case — the
reference's ijson pattern, /root/reference/src/etl/orthology_etl.py:242-244):
constant-memory boundary scan + Arrow-block yield."""

import json

import numpy as np
import pytest

from agr_loader_ray.sources.json_stream import (parse_json_array_records,
                                                read_json_stream)


def _nasty_records(n: int, seed: int = 3) -> list[dict]:
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        recs.append({
            "id": i,
            # structural chars inside strings, escapes, escaped quotes,
            # trailing backslashes — everything that breaks naive splitters
            "text": f'braces {{}} brackets [] commas ,, quote \\" back\\\\ {i}'
                    if i % 3 == 0 else f"plain {i} " + "x" * int(rng.integers(0, 50)),
            "nested": {"a": [i, i + 1], "b": {"c": f"[{i}]"}},
        })
    return recs


def test_records_roundtrip_exact(tmp_path):
    recs = _nasty_records(500)
    p = tmp_path / "arr.json"
    p.write_text(json.dumps(recs, indent=1))  # whitespace between records
    got = list(parse_json_array_records(str(p), batch_records=64,
                                        chunk_bytes=256))  # many chunk spans
    assert got == json.loads(p.read_text())


def test_constant_memory_bound(tmp_path):
    """Peak buffered bytes is O(largest record), never O(file)."""
    recs = _nasty_records(2000)
    p = tmp_path / "big.json"
    p.write_text(json.dumps(recs))
    stats = {}
    n = sum(1 for _ in parse_json_array_records(
        str(p), batch_records=128, chunk_bytes=1024, stats=stats))
    assert n == 2000
    largest = max(len(json.dumps(r)) for r in recs)
    # buffer holds at most one record (+ a held-back chunk tail)
    assert stats["max_buffered"] <= largest + 1024
    assert stats["max_buffered"] < p.stat().st_size / 50


def test_empty_and_truncated(tmp_path):
    p = tmp_path / "e.json"
    p.write_text("  [ ]  ")
    assert list(parse_json_array_records(str(p))) == []
    t = tmp_path / "t.json"
    t.write_text('[{"a": 1}, {"a": ')
    with pytest.raises(ValueError, match="truncated"):
        list(parse_json_array_records(str(t)))


def test_ray_dataset_streams_multiple_blocks(tmp_path):
    recs = _nasty_records(3000)
    p = tmp_path / "ds.json"
    p.write_text(json.dumps(recs))
    ds = read_json_stream(str(p), batch_records=256, chunk_bytes=4096)
    # downstream map_batches runs block-parallel over the yielded blocks
    total = ds.map_batches(
        lambda t: t.select(["id"]), batch_format="pyarrow").count()
    assert total == 3000
    ids = sorted(r["id"] for r in ds.select_columns(["id"]).take_all())
    assert ids == list(range(3000))
