"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY §5); we add them for the
LWW fold because the whole engine's correctness reduces to this kernel
being a true associative/commutative reduction.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from agr_loader_ray.stages.fold import lww_last_per_key

events = st.lists(
    st.tuples(
        st.integers(0, 5),    # conv
        st.integers(0, 3),    # turn
        st.integers(0, 10),   # ts
        st.text(alphabet="ab", max_size=3),
    ),
    min_size=0, max_size=60,
)


def _tbl(rows):
    return pa.table(
        {
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
            "offset": pa.array(list(range(len(rows))), pa.int64()),
            "v": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _fold_df(t: pa.Table) -> pd.DataFrame:
    out = lww_last_per_key(t, ["conv_id", "turn_idx"], ["ts", "offset"]).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@settings(max_examples=200, deadline=None)
@given(events)
def test_fold_equals_pandas_oracle(rows):
    t = _tbl(rows)
    got = _fold_df(t)
    df = t.to_pandas()
    want = (
        df.sort_values(["conv_id", "turn_idx", "ts", "offset"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"], sort=True).tail(1)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(events, st.integers(1, 59))
def test_fold_is_a_combiner(rows, split):
    """fold(fold(A) ∪ fold(B)) == fold(A ∪ B) — the property the
    prefold/merge two-phase apply depends on."""
    t = _tbl(rows)
    a, b = t.slice(0, min(split, t.num_rows)), t.slice(min(split, t.num_rows))
    pre = pa.concat_tables(
        [
            lww_last_per_key(a, ["conv_id", "turn_idx"], ["ts", "offset"]),
            lww_last_per_key(b, ["conv_id", "turn_idx"], ["ts", "offset"]),
        ]
    )
    pd.testing.assert_frame_equal(_fold_df(pre), _fold_df(t))


@settings(max_examples=100, deadline=None)
@given(events)
def test_fold_idempotent(rows):
    t = _tbl(rows)
    once = lww_last_per_key(t, ["conv_id", "turn_idx"], ["ts", "offset"])
    pd.testing.assert_frame_equal(_fold_df(once), _fold_df(t))
