"""Pointer-doubling connected components: equivalence with the exact
driver union-find, log-round convergence on a long path (where one-hop
min-label propagation would exceed the same round cap), and the hybrid
dispatch contract."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from agr_loader_ray.stages.components import (
    connected_components_auto,
    connected_components_pointer_doubling,
)
from agr_loader_ray.stages.dedup import resolve_duplicate_groups


def _labels_dict(ds) -> dict[int, int]:
    t = ds.to_pandas()
    return dict(zip(t["node"].astype(int), t["component"].astype(int)))


def _edges_ds(pairs) -> "ray.data.Dataset":
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return ray.data.from_arrow(pa.table({"id_a": a, "id_b": b}))


def test_pointer_doubling_matches_union_find_random():
    rng = np.random.default_rng(7)
    # several mid-size random components + singleton pairs
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 400, (300, 2))
             if a != b]
    pairs += [(1000, 1001), (2000, 2001)]
    want = resolve_duplicate_groups(pairs)
    got = _labels_dict(connected_components_pointer_doubling(_edges_ds(pairs)))
    assert got == want


def test_pointer_doubling_long_path_converges_in_log_rounds():
    # path 0-1-2-...-64: diameter 64.  One-hop min-label propagation
    # needs 64 rounds; pointer doubling must finish within 10.
    pairs = [(i, i + 1) for i in range(64)]
    got = _labels_dict(connected_components_pointer_doubling(
        _edges_ds(pairs), max_rounds=10))
    assert got == {i: 0 for i in range(65)}


def test_pointer_doubling_round_cap_raises():
    pairs = [(i, i + 1) for i in range(64)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_pointer_doubling(_edges_ds(pairs), max_rounds=2)


def test_auto_dispatch_paths_agree():
    pairs = [(i, i + 1) for i in range(20)] + [(100, 101), (101, 102)]
    small = _labels_dict(connected_components_auto(_edges_ds(pairs)))
    forced = _labels_dict(connected_components_auto(_edges_ds(pairs),
                                                    pair_limit=1))
    assert small == forced == {**{i: 0 for i in range(21)},
                               100: 100, 101: 100, 102: 100}
