"""exchange_attach (stages/attach.py): the Dataset.join replacement —
single-exchange inner attach with exact native-dtype key matching."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from agr_loader_ray.stages.attach import exchange_attach


def _ds(tbl: pa.Table) -> "ray.data.Dataset":
    return ray.data.from_arrow(tbl)


def test_uint64_keys_match_exactly():
    """Adjacent uint64 keys that collide under a float64 round-trip
    (the pandas-merge failure mode this kernel exists to avoid) must
    attach to their own payloads."""
    base = np.uint64(2**63)
    keys = np.array([base, base + np.uint64(1), base + np.uint64(2)], np.uint64)
    assert float(keys[0]) == float(keys[1])  # the float64 trap is real
    rows = pa.table({"h": pa.array(keys, pa.uint64()),
                     "doc": pa.array([10, 11, 12], pa.int64())})
    att = pa.table({"h": pa.array(keys, pa.uint64()),
                    "df": pa.array([100, 101, 102], pa.int64())})
    out = (exchange_attach(_ds(rows), _ds(att), "h", nparts=4)
           .to_pandas().sort_values("doc").reset_index(drop=True))
    assert out["df"].tolist() == [100, 101, 102]
    assert str(out["h"].dtype) == "uint64" and str(out["df"].dtype) == "int64"


def test_inner_semantics_and_fanin():
    rows = pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                     "v": pa.array(["a", "b", "c", "d"])})
    att = pa.table({"k": pa.array([2, 9], pa.int64()),
                    "p": pa.array([20, 90], pa.int64())})
    out = (exchange_attach(_ds(rows), _ds(att), "k", nparts=4)
           .to_pandas().sort_values("v").reset_index(drop=True))
    # k=1,3 dropped (no attach row); k=2 rows each get the payload
    assert out["v"].tolist() == ["b", "c"] and out["p"].tolist() == [20, 20]


def test_string_keys_and_renamed_attach_key():
    rows = pa.table({"name": pa.array(["x", "y", "z"]),
                     "n": pa.array([1, 2, 3], pa.int64())})
    att = pa.table({"id": pa.array(["y", "z"]),
                    "tag": pa.array(["Y", "Z"])})
    out = (exchange_attach(_ds(rows), _ds(att), "name", attach_key="id",
                           nparts=2).to_pandas()
           .sort_values("n").reset_index(drop=True))
    assert out["name"].tolist() == ["y", "z"]
    assert out["tag"].tolist() == ["Y", "Z"]


def test_duplicate_attach_keys_raise():
    rows = pa.table({"k": pa.array([1], pa.int64()),
                     "v": pa.array([0], pa.int64())})
    att = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "p": pa.array([5, 6], pa.int64())})
    with pytest.raises(Exception, match="unique attach keys"):
        exchange_attach(_ds(rows), _ds(att), "k", nparts=1).to_pandas()


def test_payload_collision_raises():
    rows = pa.table({"k": pa.array([1], pa.int64()),
                     "p": pa.array([0], pa.int64())})
    att = pa.table({"k": pa.array([1], pa.int64()),
                    "p": pa.array([5], pa.int64())})
    with pytest.raises(ValueError, match="collide"):
        exchange_attach(_ds(rows), _ds(att), "k", nparts=1)


def test_empty_sides_yield_empty_not_crash():
    """A globally-empty side must yield an empty result — the case where
    Ray's Dataset.join CRASHES (schema-less partition builders).  Column
    names may be dropped by Ray's empty-block artifact; emptiness is the
    contract."""
    rows = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    att = pa.table({"k": pa.array([1], pa.int64()), "p": pa.array([5], pa.int64())})
    out = exchange_attach(_ds(rows), _ds(att), "k", nparts=2).to_pandas()
    assert len(out) == 0
    assert list(out.columns) in ([], ["k", "v", "p"])
