"""Unit tests for the LWW fold and partition kernels (pure, no Ray)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from agr_loader_ray.stages.fold import lww_last_per_key
from agr_loader_ray.stages.partition import add_partition_column, key_hash, stable_hash_strings


def _tbl(rows):
    return pa.Table.from_pylist(rows)


def test_lww_keeps_last_by_ts_then_offset():
    t = _tbl(
        [
            {"conv_id": "a", "turn_idx": 0, "ts": 10, "offset": 1, "v": "old"},
            {"conv_id": "a", "turn_idx": 0, "ts": 20, "offset": 0, "v": "new"},
            {"conv_id": "a", "turn_idx": 1, "ts": 5, "offset": 2, "v": "only"},
            {"conv_id": "b", "turn_idx": 0, "ts": 20, "offset": 3, "v": "tie-lo"},
            {"conv_id": "b", "turn_idx": 0, "ts": 20, "offset": 4, "v": "tie-hi"},
        ]
    )
    out = lww_last_per_key(t, ["conv_id", "turn_idx"], ["ts", "offset"])
    got = {(r["conv_id"], r["turn_idx"]): r["v"] for r in out.to_pylist()}
    assert got == {("a", 0): "new", ("a", 1): "only", ("b", 0): "tie-hi"}


def test_lww_empty_and_single():
    t = _tbl([{"conv_id": "a", "turn_idx": 0, "ts": 1, "offset": 0}])
    assert lww_last_per_key(t, ["conv_id", "turn_idx"], ["ts", "offset"]).num_rows == 1
    assert lww_last_per_key(t.slice(0, 0), ["conv_id", "turn_idx"], ["ts", "offset"]).num_rows == 0


def test_lww_matches_pandas_oracle_random():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in rng.integers(0, 50, n)],
            "turn_idx": rng.integers(0, 10, n),
            "ts": rng.integers(0, 100, n),
            "offset": np.arange(n),
            "v": rng.integers(0, 1_000_000, n),
        }
    )
    got = (
        lww_last_per_key(pa.Table.from_pandas(df), ["conv_id", "turn_idx"], ["ts", "offset"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["conv_id", "turn_idx", "ts", "offset"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"], sort=True)
        .tail(1)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stable_hash_deterministic():
    a = np.array(["conv-1", "conv-2", "conv-1"], dtype=object)
    h1, h2 = stable_hash_strings(a), stable_hash_strings(a)
    assert (h1 == h2).all()
    assert h1[0] == h1[2] and h1[0] != h1[1]


def test_partition_column_stable_and_in_range():
    t = _tbl([{"conv_id": f"c{i}", "turn_idx": i % 5} for i in range(100)])
    p1 = add_partition_column(t, 8)["part"].to_numpy()
    p2 = add_partition_column(t, 8)["part"].to_numpy()
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 8
    assert len(set(p1)) > 1  # actually spreads


def test_key_hash_spreads_turns_of_one_conv():
    t = _tbl([{"conv_id": "hot", "turn_idx": i} for i in range(64)])
    parts = key_hash(t["conv_id"], t["turn_idx"]) % np.uint64(8)
    assert len(set(parts.tolist())) > 1


def test_lww_string_order_column_sorts_lexically():
    """A string ORDER column must be ordered lexically, not by
    dictionary-code (first-appearance) order — the fast path must bail
    to sort_by when an order col is a string (ADVICE r3)."""
    t = _tbl(
        [
            # first appearance is "zzz" → its dict code (0) is LOWEST,
            # so a code-ordered lexsort would wrongly pick "aaa" as last
            {"k": 1, "o": "zzz", "v": "lex-last"},
            {"k": 1, "o": "aaa", "v": "lex-first"},
            {"k": 2, "o": "mm", "v": "only"},
        ]
    )
    out = lww_last_per_key(t, ["k"], ["o"])
    got = {r["k"]: r["v"] for r in out.to_pylist()}
    assert got == {1: "lex-last", 2: "only"}


def test_lww_string_key_fast_path_still_exact():
    """String KEY columns stay on the dictionary-encode fast path
    (equality grouping is code-exact); randomized vs pandas."""
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice([f"conv-{i}" for i in range(40)], n),
        "ts": rng.integers(0, 50, n),
        "offset": np.arange(n),
        "v": rng.integers(0, 10**9, n),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = lww_last_per_key(t, ["k"], ["ts", "offset"]).to_pandas()
    want = (df.sort_values(["k", "ts", "offset"]).groupby("k", as_index=False)
            .last())
    got = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "ts", "offset", "v"]],
                                  want[["k", "ts", "offset", "v"]])
