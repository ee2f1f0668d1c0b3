"""Randomized join-view IVM drill: hypothesis varies BOTH source WALs'
shapes (update/delete mix, late data, timestamp collisions, epoch
count) and the view bucket count, then checks the maintained view at
EVERY epoch against a full pandas join of the epoch-pinned live
states — the ivm_join analogue of the whole-engine property drill."""

import os

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import read_lake
from agr_loader_ray.pipelines.ivm_join import maintain_join, read_join
from agr_loader_ray.wal.generator import WalSpec, generate_wal


@st.composite
def join_config(draw):
    n_epochs = draw(st.integers(1, 4))

    def spec(seed):
        return WalSpec(
            n_events=draw(st.integers(100, 700)),
            n_convs=draw(st.integers(4, 30)),
            n_epochs=n_epochs,
            seed=seed,
            update_frac=draw(st.sampled_from([0.0, 0.25])),
            delete_frac=draw(st.sampled_from([0.0, 0.15, 0.4])),
            out_of_order_frac=draw(st.sampled_from([0.0, 0.2])),
            dup_ts_frac=draw(st.sampled_from([0.0, 0.3])),
            max_turns=draw(st.integers(2, 10)),
        )

    return {"a": spec(draw(st.integers(0, 10_000))),
            "b": spec(draw(st.integers(0, 10_000))),
            "n_epochs": n_epochs,
            "n_buckets": draw(st.sampled_from([1, 4, 16]))}


def _expected(lake_a, lake_b, epoch) -> pd.DataFrame:
    a = read_lake(lake_a, epoch=epoch,
                  columns=["conv_id", "turn_idx", "role"]).to_pandas()
    b = read_lake(lake_b, epoch=epoch,
                  columns=["conv_id", "turn_idx", "role"]).to_pandas()
    j = a.merge(b, on="conv_id", suffixes=("_a", "_b"))
    out = pd.DataFrame({
        "conv_id": j["conv_id"],
        "a_turn_idx": j["turn_idx_a"].astype(np.int64),
        "a_role": j["role_a"],
        "b_turn_idx": j["turn_idx_b"].astype(np.int64),
        "b_role": j["role_b"],
    })
    return out.sort_values(list(out.columns), kind="mergesort") \
        .reset_index(drop=True)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cfg=join_config())
def test_random_wals_join_view_matches_full_join(cfg, tmp_path_factory,
                                                 ray_session):
    base = tmp_path_factory.mktemp("pjoin")
    lakes = {}
    for t in ("a", "b"):
        wal = str(base / f"wal_{t}")
        generate_wal(wal, cfg[t])
        lake = str(base / f"lake_{t}")
        CdcEngine(lake, n_partitions=4).replay(wal)
        lakes[t] = lake
    out = str(base / "view")
    epochs = list(range(cfg["n_epochs"]))
    maintain_join(lakes["a"], lakes["b"], out, epochs,
                  n_buckets=cfg["n_buckets"])
    for e in epochs:
        got = read_join(out, e).to_pandas()
        got = got.sort_values(list(got.columns), kind="mergesort") \
            .reset_index(drop=True)
        want = _expected(lakes["a"], lakes["b"], e)
        assert len(got) == len(want)
        if len(want):
            pd.testing.assert_frame_equal(got, want)
