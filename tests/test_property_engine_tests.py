"""End-to-end randomized engine drill: hypothesis varies the WAL shape
(update/delete mix, skew, late data, timestamp collisions, epoch count)
AND the engine config (partition count, compaction threshold), then
checks replay → export against the single-threaded oracle reducer —
the whole-engine version of the LWW-fold property tests."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from agr_loader_ray.oracle import oracle_reduce
from agr_loader_ray.pipelines.engine import CdcEngine
from agr_loader_ray.pipelines.export import export_sorted
from agr_loader_ray.wal.generator import WalSpec, generate_wal


@st.composite
def wal_config(draw):
    return {
        "spec": WalSpec(
            n_events=draw(st.integers(200, 1500)),
            n_convs=draw(st.integers(5, 60)),
            n_epochs=draw(st.integers(1, 5)),
            segments_per_epoch=draw(st.integers(1, 3)),
            seed=draw(st.integers(0, 10_000)),
            update_frac=draw(st.sampled_from([0.0, 0.2, 0.5])),
            delete_frac=draw(st.sampled_from([0.0, 0.1, 0.4])),
            zipf_a=draw(st.sampled_from([None, 1.2])),
            out_of_order_frac=draw(st.sampled_from([0.0, 0.2])),
            dup_ts_frac=draw(st.sampled_from([0.0, 0.3])),
            max_turns=draw(st.integers(2, 16)),
        ),
        "n_partitions": draw(st.sampled_from([1, 3, 8])),
        "compact_every": draw(st.sampled_from([1, 2, 100])),
        "catchup": draw(st.booleans()),
    }


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cfg=wal_config())
def test_random_wal_replay_matches_oracle(cfg, tmp_path_factory):
    base = tmp_path_factory.mktemp("pwal")
    wal, lake = str(base / "wal"), str(base / "lake")
    generate_wal(wal, cfg["spec"])
    eng = CdcEngine(lake, n_partitions=cfg["n_partitions"],
                    compact_every=cfg["compact_every"])
    eng.replay(wal, catchup=cfg["catchup"])

    got = export_sorted(lake).to_pandas().reset_index(drop=True)
    want = oracle_reduce(
        pads.dataset(wal, partitioning="hive").to_table().to_pandas()
    ).reset_index(drop=True)
    got = got[want.columns.tolist()]
    for c in want.columns:
        want[c] = want[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, want)

    # replay is idempotent under any config
    r = eng.replay(wal)
    assert r["events_applied"] == 0
