"""Config validation + extension registry tests."""

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
