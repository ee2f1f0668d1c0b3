"""Pipeline configuration + extension registry (SURVEY §2.10).

Reference analogues: the ``etl_dispatch`` name→class registry plus YAML
config selecting what runs (``/root/reference/src/aggregate_loader.py:78-116``),
per-source knobs (``data_type_config.py:19-22``) and Cerberus config
validation (``data_file_manager.py:120-137``).

Here: a validated ``EngineConfig`` (plain dataclass — explicit checks,
no extra deps) and a registry of derived pipelines that new code plugs
into with ``@register_derived``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Knobs of a lake + replay (the reference's commit_size/batch_size
    envelope re-expressed)."""

    lake_root: str
    n_partitions: int = 64
    compact_every: int = 4
    max_catchup: int = 64
    #: reserved stage sizing (per-stage batch size / actor pool caps)
    batch_size: int = 65536
    actor_pool_cap: int = 8
    #: partition-exchange strategy: "task" (raw-task bucketing, default)
    #: or "dataset" (groupby(part) sort shuffle)
    exchange: str = "task"

    def validate(self) -> "EngineConfig":
        errors = []
        if not self.lake_root:
            errors.append("lake_root must be set")
        if self.n_partitions < 1:
            errors.append("n_partitions must be >= 1")
        if self.compact_every < 1:
            errors.append("compact_every must be >= 1 (1 = pure copy-on-write)")
        if self.exchange not in ("task", "dataset"):
            errors.append("exchange must be 'task' or 'dataset'")
        if self.max_catchup < 1:
            errors.append("max_catchup must be >= 1")
        if self.batch_size < 1 or self.actor_pool_cap < 1:
            errors.append("batch_size and actor_pool_cap must be >= 1")
        if errors:
            raise ValueError("invalid EngineConfig: " + "; ".join(errors))
        return self

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        unknown = set(d) - {f for f in cls.__dataclass_fields__}
        if unknown:
            raise ValueError(f"unknown EngineConfig keys: {sorted(unknown)}")
        return cls(**d).validate()

    def build_engine(self):
        from .pipelines.engine import CdcEngine

        return CdcEngine(
            self.lake_root, n_partitions=self.n_partitions,
            compact_every=self.compact_every, exchange=self.exchange,
        )


#: derived-pipeline registry: name → fn(lake_root, epoch=None) -> Dataset
DERIVED_REGISTRY: dict[str, Callable] = {}


def register_derived(name: str):
    """Plug a second-pass pipeline into the registry (the reference's
    StubETL template role — see ``pipelines/derived.py`` for the model)."""

    def deco(fn):
        DERIVED_REGISTRY[name] = fn
        return fn

    return deco


# built-ins
from .pipelines.derived import conversation_stats  # noqa: E402

DERIVED_REGISTRY["conversation_stats"] = conversation_stats
