"""Interval-join operator unit tests: index correctness vs brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from agr_loader_ray.stages.interval import IntervalIndex, interval_join


def _brute(ts, starts, ends):
    out = set()
    for r, t in enumerate(ts):
        for i, (s, e) in enumerate(zip(starts, ends)):
            if s <= t <= e:
                out.add((r, i))
    return out


def test_index_matches_brute_force_random():
    rng = np.random.default_rng(9)
    starts = rng.integers(0, 10_000, 80).astype(np.int64)
    ends = starts + rng.integers(0, 3_000, 80).astype(np.int64)
    ids = np.arange(80, dtype=np.int64)
    idx = IntervalIndex(starts, ends, ids, n_segments=64)
    ts = rng.integers(-500, 11_000, 500).astype(np.int64)
    row_idx, ival_idx = idx.candidates(ts)
    keep = (starts[ival_idx] <= ts[row_idx]) & (ts[row_idx] <= ends[ival_idx])
    got = set(zip(row_idx[keep].tolist(), ival_idx[keep].tolist()))
    assert got == _brute(ts, starts, ends)


def test_boundaries_inclusive_and_out_of_range():
    starts = np.array([100], dtype=np.int64)
    ends = np.array([200], dtype=np.int64)
    idx = IntervalIndex(starts, ends, np.array([7]), n_segments=16)
    ts = np.array([99, 100, 150, 200, 201, -5_000, 9_999], dtype=np.int64)
    row_idx, ival_idx = idx.candidates(ts)
    keep = (starts[ival_idx] <= ts[row_idx]) & (ts[row_idx] <= ends[ival_idx])
    assert set(row_idx[keep].tolist()) == {1, 2, 3}


def test_interval_join_dataset_multimatch():
    intervals = pa.table({
        "interval_id": pa.array([10, 20], pa.int64()),
        "start": pa.array([0, 50], pa.int64()),
        "end": pa.array([100, 150], pa.int64()),
    })
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(np.array([25, 75, 125], dtype="datetime64[us]").astype("datetime64[us]")),
    }))
    out = interval_join(ds, intervals).to_pandas().sort_values(
        ["event_id", "interval_id"]).reset_index(drop=True)
    pairs = list(zip(out["event_id"], out["interval_id"]))
    assert pairs == [(1, 10), (2, 10), (2, 20), (3, 20)]  # row 2 multi-matches
