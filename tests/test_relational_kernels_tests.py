"""Property tests for the relational-batch kernels against brute-force
references (no Ray needed — the kernels are pure pandas/numpy)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from agr_loader_ray.pipelines.relational_queries import (
    _levenshtein_pairs,
    pareto_skyline_kernel,
)


def _brute_skyline(df: pd.DataFrame) -> set:
    """NOT EXISTS domination, O(n^2) — the oracle's semantics verbatim."""
    keep = set()
    rows = list(df.itertuples(index=False))
    for a in rows:
        dominated = any(
            b.p_type == a.p_type
            and b.price_c <= a.price_c and b.p_size >= a.p_size
            and (b.price_c < a.price_c or b.p_size > a.p_size)
            for b in rows
        )
        if not dominated:
            keep.add((a.p_type, a.p_partkey))
    return keep


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["A", "B"]),
              st.integers(0, 8),    # price_c — small domain forces ties
              st.integers(0, 8)),   # p_size
    min_size=0, max_size=25))
def test_skyline_kernel_matches_brute_force(rows):
    df = pd.DataFrame({
        "p_type": [r[0] for r in rows],
        "p_partkey": np.arange(len(rows), dtype=np.int64),
        "price_c": np.array([r[1] for r in rows], np.int64),
        "p_size": np.array([r[2] for r in rows], np.int64),
    })
    got = pareto_skyline_kernel(df)
    got_set = set(zip(got["p_type"], got["p_partkey"]))
    assert got_set == _brute_skyline(df)


def test_skyline_kernel_idempotent_on_own_output():
    # two-phase correctness hinges on kernel(kernel(x) ∪ kernel(y)) ==
    # kernel(x ∪ y); spot-check idempotence + split-merge equivalence
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "p_type": rng.choice(["A", "B", "C"], 60),
        "p_partkey": np.arange(60, dtype=np.int64),
        "price_c": rng.integers(0, 10, 60).astype(np.int64),
        "p_size": rng.integers(0, 10, 60).astype(np.int64),
    })
    full = pareto_skyline_kernel(df)
    again = pareto_skyline_kernel(full)
    assert set(zip(full["p_type"], full["p_partkey"])) == \
        set(zip(again["p_type"], again["p_partkey"]))
    merged = pareto_skyline_kernel(
        pd.concat([pareto_skyline_kernel(df.iloc[:23]),
                   pareto_skyline_kernel(df.iloc[23:])]))
    assert set(zip(merged["p_type"], merged["p_partkey"])) == \
        set(zip(full["p_type"], full["p_partkey"]))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text("abcde ", max_size=12),
                          st.text("abcde ", max_size=12)),
                min_size=1, max_size=10))
def test_levenshtein_pairs_property(pairs):
    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    got = _levenshtein_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    assert list(got) == [ref(a, b) for a, b in pairs]
