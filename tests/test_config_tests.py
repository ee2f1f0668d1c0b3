"""Config validation + extension registry tests."""

import os

import pytest

from agr_loader_ray.config import DERIVED_REGISTRY, EngineConfig, register_derived


def test_config_validates():
    cfg = EngineConfig.from_dict({"lake_root": "/tmp/x", "n_partitions": 8})
    assert cfg.compact_every == 4
    with pytest.raises(ValueError, match="n_partitions"):
        EngineConfig.from_dict({"lake_root": "/tmp/x", "n_partitions": 0})
    with pytest.raises(ValueError, match="unknown"):
        EngineConfig.from_dict({"lake_root": "/tmp/x", "bogus": 1})


def test_build_engine_from_config(tmp_path):
    eng = EngineConfig.from_dict(
        {"lake_root": str(tmp_path / "lake"), "n_partitions": 4, "compact_every": 1}
    ).build_engine()
    assert eng.n_partitions == 4 and eng.compact_every == 1


def test_registry_has_builtin_and_accepts_plugins():
    assert "conversation_stats" in DERIVED_REGISTRY

    @register_derived("noop")
    def noop(lake_root, epoch=None):
        return None

    assert DERIVED_REGISTRY["noop"] is noop
    del DERIVED_REGISTRY["noop"]


# ---------------------------------------------------------------------------
# Dependency-group scheduler (VERDICT r3 #6): declared depends_on →
# Kahn layering → barrier execution with lineage manifests, mirroring
# the reference's 36-group etl_groups schedule
# (/root/reference/src/aggregate_loader.py:122-159).
# ---------------------------------------------------------------------------

def test_plan_groups_layers_by_dependency():
    from agr_loader_ray.config import (DERIVED_DEPS, DERIVED_REGISTRY,
                                       plan_groups, register_derived)

    @register_derived("t_a")
    def t_a(lake_root, epoch=None):
        raise AssertionError("not executed by plan")

    @register_derived("t_b", depends_on=("t_a",))
    def t_b(lake_root, epoch=None):
        raise AssertionError

    @register_derived("t_c", depends_on=("t_a",))
    def t_c(lake_root, epoch=None):
        raise AssertionError

    @register_derived("t_d", depends_on=("t_b", "t_c"))
    def t_d(lake_root, epoch=None):
        raise AssertionError

    try:
        assert plan_groups(["t_a", "t_b", "t_c", "t_d"]) == [
            ["t_a"], ["t_b", "t_c"], ["t_d"]]
        # unknown dep fails loudly
        with pytest.raises(ValueError, match="not in the run set"):
            plan_groups(["t_b"])
        # cycle fails loudly
        DERIVED_DEPS["t_a"] = ("t_d",)
        with pytest.raises(ValueError, match="cycle"):
            plan_groups(["t_a", "t_b", "t_c", "t_d"])
    finally:
        for n in ("t_a", "t_b", "t_c", "t_d"):
            DERIVED_REGISTRY.pop(n, None)
            DERIVED_DEPS.pop(n, None)


def test_run_derived_groups_barrier_and_resume(tmp_path):
    """Group k+1 sees group k fully materialized (the barrier is
    observable: the downstream pipeline READS its upstream's parquet);
    re-running skips completed pipelines."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from agr_loader_ray.config import (DERIVED_DEPS, DERIVED_REGISTRY,
                                       register_derived, run_derived_groups)
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.wal.generator import T1_SMOKE, generate_wal

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "derived")
    generate_wal(wal, T1_SMOKE)
    CdcEngine(lake, n_partitions=4).replay(wal)

    calls = []

    @register_derived("t_base")
    def t_base(lake_root, epoch=None):
        calls.append("t_base")
        from agr_loader_ray.pipelines.derived import conversation_stats

        return conversation_stats(lake_root, epoch=epoch)

    @register_derived("t_down", depends_on=("t_base",))
    def t_down(lake_root, epoch=None):
        calls.append("t_down")
        # the BARRIER contract: upstream parquet must already exist
        up = os.path.join(out, "t_base", f"epoch={epoch}")
        files = [os.path.join(up, f) for f in os.listdir(up)
                 if f.endswith(".parquet")]
        assert files, "barrier violated: upstream not materialized"
        return rd.read_parquet(files).map_batches(
            lambda t: t.select(["conv_id", "n_turns"]),
            batch_format="pyarrow")

    try:
        r = run_derived_groups(lake, out, names=["t_base", "t_down"])
        assert r["groups"] == [["t_base"], ["t_down"]]
        assert calls == ["t_base", "t_down"]
        assert r["pipelines"]["t_down"]["rows"] > 0
        df = pq.read_table(r["pipelines"]["t_down"]["path"]).to_pandas()
        assert set(df.columns) == {"conv_id", "n_turns"}
        # resume: second run executes nothing
        r2 = run_derived_groups(lake, out, names=["t_base", "t_down"])
        assert calls == ["t_base", "t_down"]
        assert r2["pipelines"]["t_base"]["rows"] == r["pipelines"]["t_base"]["rows"]
    finally:
        for n in ("t_base", "t_down"):
            DERIVED_REGISTRY.pop(n, None)
            DERIVED_DEPS.pop(n, None)


def test_production_registry_group_plan_and_artifact_dependency(tmp_path):
    """The PRODUCTION derived pipelines are registry-wired: the plan
    layers conversation_descriptions after conversation_stats, and the
    scheduler-run descriptions consume the materialized stats artifact
    (derived_root path) yielding the same rows as a direct recompute."""
    import pandas as pd

    from agr_loader_ray.config import plan_groups, run_derived_groups
    from agr_loader_ray.pipelines.derived import conversation_descriptions
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.wal.generator import T1_SMOKE, generate_wal

    names = ["conversation_stats", "conversation_text",
             "topic_descriptions", "conversation_descriptions"]
    assert plan_groups(names) == [
        ["conversation_stats", "conversation_text", "topic_descriptions"],
        ["conversation_descriptions"],
    ]

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "derived")
    generate_wal(wal, T1_SMOKE)
    CdcEngine(lake, n_partitions=4).replay(wal)

    r = run_derived_groups(lake, out, names=names)
    assert set(r["pipelines"]) == set(names)
    assert all(info["rows"] > 0 for info in r["pipelines"].values())

    import pyarrow.parquet as pq

    got = (pq.read_table(r["pipelines"]["conversation_descriptions"]["path"])
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    want = (conversation_descriptions(lake).to_pandas()
            .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_vector_index_is_scheduler_wired(tmp_path):
    """The incrementally-maintained vector index is a registered derived
    pipeline: the scheduler materializes its alive-membership view
    (rows == the lake's live set), the store resumes across runs, and a
    time-travel request below the store's watermark fails loudly."""
    import pytest as _pytest

    from agr_loader_ray.config import run_derived_groups
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.pipelines.export import read_lake
    from agr_loader_ray.pipelines.vector_ivm import _read_state
    from agr_loader_ray.wal.generator import T2_CORRECTNESS, WalSpec, generate_wal

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "derived")
    spec = WalSpec(**{**T2_CORRECTNESS.__dict__, "n_events": 6_000,
                      "n_convs": 200, "n_epochs": 3})
    generate_wal(wal, spec)
    CdcEngine(lake, n_partitions=4).replay(wal)

    r = run_derived_groups(lake, out, names=["vector_index"])
    alive = len(read_lake(lake).to_pandas())
    assert r["pipelines"]["vector_index"]["rows"] == alive > 0
    from agr_loader_ray.config import _fallback_store
    store = _fallback_store(out, "_vector_index_store", lake)
    assert _read_state(store)["last_epoch"] == spec.n_epochs - 1

    # resume: a second run at the same epoch re-executes nothing
    r2 = run_derived_groups(lake, out, names=["vector_index"])
    assert r2["pipelines"]["vector_index"]["rows"] == alive

    # the store only moves forward: a time-travel request below the SAME
    # store's watermark raises instead of returning the newer alive set
    with _pytest.raises(ValueError, match="ahead of requested epoch"):
        run_derived_groups(lake, out, names=["vector_index"], epoch=0)


def test_join_view_is_scheduler_wired(tmp_path):
    """The incrementally-maintained join view is a registered derived
    pipeline: the scheduler materializes the lake's self-join view and
    the rows equal a direct pandas join of the live state."""
    import numpy as np
    import pandas as pd

    from agr_loader_ray.config import run_derived_groups
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.pipelines.export import read_lake
    from agr_loader_ray.wal.generator import T1_SMOKE, generate_wal

    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "derived")
    generate_wal(wal, T1_SMOKE)
    CdcEngine(lake, n_partitions=4).replay(wal)

    r = run_derived_groups(lake, out, names=["join_view"])
    assert r["pipelines"]["join_view"]["rows"] > 0

    import pyarrow.parquet as pq

    got = pq.read_table(r["pipelines"]["join_view"]["path"]).to_pandas()
    live = read_lake(lake, columns=["conv_id", "turn_idx", "role"]).to_pandas()
    j = live.merge(live, on="conv_id", suffixes=("_a", "_b"))
    want = pd.DataFrame({
        "conv_id": j["conv_id"],
        "a_turn_idx": j["turn_idx_a"].astype(np.int64),
        "a_role": j["role_a"],
        "b_turn_idx": j["turn_idx_b"].astype(np.int64),
        "b_role": j["role_b"],
    })
    key = ["conv_id", "a_turn_idx", "b_turn_idx", "a_role", "b_role"]
    got = got[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
