"""Equivalence pins for stages/exchange.exchange_map_groups against
Ray's native groupby(part).map_groups on the same kernel — the task
exchange must be a drop-in for the sort shuffle whenever the part
column is a materialized partition id."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
import hypothesis.strategies as st

import ray
import ray.data

from agr_loader_ray.stages.exchange import exchange_map_groups


def _make_kernel():
    # built as a closure: a test-module-level function pickles by
    # reference, which Ray workers cannot import
    def kernel(g: pa.Table) -> pa.Table:
        """Per-partition: per-key sums + a count, order-insensitive."""
        if g.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        first = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(v, starts)
        counts = np.r_[starts[1:], len(k)] - starts
        return pa.table({"k": pa.array(k[starts]), "s": pa.array(sums),
                         "n": pa.array(counts.astype(np.int64))})
    return kernel


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31 - 1),
       nparts=st.integers(1, 7),
       n=st.integers(0, 5000))
def test_exchange_matches_groupby(seed, nparts, n, ray_session):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "k": pa.array(rng.integers(0, max(n // 7, 1), max(n, 1))[:n]),
        "v": pa.array(rng.integers(-100, 100, max(n, 1))[:n]),
    })
    t = t.append_column(
        "gpart", pa.array((t["k"].to_numpy(zero_copy_only=False)
                           % nparts).astype(np.int32)))
    ds = ray.data.from_arrow(t)
    if n == 0:
        # Ray yields zero groups; the exchange must yield zero rows too
        got = _sorted_df(exchange_map_groups(ds, "gpart", _make_kernel(), nparts))
        assert len(got) == 0
        return
    want = _sorted_df(ds.groupby("gpart").map_groups(
        _make_kernel(), batch_format="pyarrow"))
    got = _sorted_df(exchange_map_groups(ds, "gpart", _make_kernel(), nparts))
    pd.testing.assert_frame_equal(got, want)


def test_exchange_preserves_block_order(ray_session):
    """Within a partition, rows arrive in input block order then row
    order — the same stable order the sort shuffle yields — so kernels
    that rely on stable tie-break (LWW folds) are safe."""
    blocks = [pa.table({"k": pa.array([0, 0], pa.int64()),
                        "seq": pa.array([2 * i, 2 * i + 1], pa.int64()),
                        "gpart": pa.array([0, 0], pa.int32())})
              for i in range(6)]
    ds = ray.data.from_arrow(blocks)

    def ident(g: pa.Table) -> pa.Table:
        return g.select(["seq"])

    out = exchange_map_groups(ds, "gpart", ident, 1).to_pandas()
    assert list(out["seq"]) == list(range(12))


def test_exchange_pandas_blocks(ray_session):
    """Pandas-block inputs convert to arrow inside the split task."""
    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                       "v": np.ones(10, np.int64),
                       "gpart": (np.arange(10) % 3).astype(np.int32)})
    ds = ray.data.from_pandas(df)
    got = _sorted_df(exchange_map_groups(ds, "gpart", _make_kernel(), 3))
    assert got["n"].sum() == 10
    assert len(got) == 10  # distinct keys


def test_exchange_out_of_range_part_is_loud(ray_session):
    """A miscomputed partition column must raise, not silently drop —
    the groupby this replaces would surface the extra group."""
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([1, 1], pa.int64()),
                  "gpart": pa.array([0, 5], pa.int32())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="out of range"):
        exchange_map_groups(ds, "gpart", _make_kernel(), 3).materialize()


def test_checked_pack_guards():
    from agr_loader_ray.functions.bounds import PackOverflowError, checked_pack

    hi = np.array([1, 2], np.int64)
    lo = np.array([3, (1 << 31) - 1], np.int64)
    got = checked_pack(hi, lo, 31, "t")
    assert list(got >> np.int64(31)) == [1, 2]
    assert list(got & np.int64((1 << 31) - 1)) == [3, (1 << 31) - 1]
    with pytest.raises(PackOverflowError, match="pack budget"):
        checked_pack(hi, np.array([0, 1 << 31], np.int64), 31, "t")
    with pytest.raises(PackOverflowError, match="pack budget"):
        checked_pack(np.array([1 << 32, 0], np.int64), lo, 31, "t")
    with pytest.raises(PackOverflowError, match="pack budget"):
        checked_pack(hi, np.array([-1, 0], np.int64), 31, "t")
