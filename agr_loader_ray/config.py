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

import inspect

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


def _settle_fsspec_http_probe() -> None:
    """Make Ray Data's per-path fsspec-HTTP probe deterministic before
    launching concurrent driver threads.

    ``ray.data.datasource.path_util._is_http_filesystem`` does
    ``from fsspec.implementations.http import HTTPFileSystem`` on every
    path resolution, catching only ``ModuleNotFoundError``.  Without
    aiohttp that module fails MID-BODY each time (failed imports aren't
    cached), and two threads racing the first import can observe a
    partially-torn module and raise plain ``ImportError`` ("cannot
    import name 'HTTPFileSystem'"), which escapes Ray's handler and
    kills the read/write.  When the real import fails (http filesystem
    unusable regardless — no aiohttp, and this engine never reads
    http:// paths), install an inert stub so every later probe import
    succeeds and ``isinstance(..., HTTPFileSystem)`` is simply False.
    """
    import sys as _sys
    import types as _types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ModuleNotFoundError:
        return  # Ray's own except handles this shape consistently
    except ImportError:
        pass
    try:
        import fsspec.implementations as _impl
    except ImportError:
        return
    stub = _types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 - probe isinstance target only
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = stub
    _impl.http = stub


#: derived-pipeline registry: name → fn(lake_root, epoch=None) -> Dataset
DERIVED_REGISTRY: dict[str, Callable] = {}
#: declared upstream pipelines per name (drives the group schedule)
DERIVED_DEPS: dict[str, tuple[str, ...]] = {}


def register_derived(name: str, depends_on: tuple[str, ...] = ()):
    """Plug a second-pass pipeline into the registry (the reference's
    StubETL template role — see ``pipelines/derived.py`` for the model).

    ``depends_on`` names upstream DERIVED pipelines this one reads (the
    reference's etl_groups barrier schedule,
    ``/root/reference/src/aggregate_loader.py:122-159``, states the same
    ordering as a hand-written list-of-lists) — ``plan_groups`` layers
    the registry from these declarations and ``run_derived_groups``
    executes with a barrier between layers."""

    def deco(fn):
        DERIVED_REGISTRY[name] = fn
        DERIVED_DEPS[name] = tuple(depends_on)
        return fn

    return deco


def plan_groups(names: list[str] | None = None) -> list[list[str]]:
    """Kahn layering of the derived registry: group k holds pipelines
    whose declared dependencies all sit in groups < k.  Raises on a
    dependency cycle or an unknown dependency (a typo'd name must fail
    loudly, not silently reorder)."""
    names = sorted(DERIVED_REGISTRY) if names is None else list(names)
    chosen = set(names)
    for n in names:
        missing = [d for d in DERIVED_DEPS.get(n, ()) if d not in chosen]
        if missing:
            raise ValueError(
                f"derived pipeline {n!r} depends on {missing} which are not "
                f"in the run set {sorted(chosen)}")
    placed: set[str] = set()
    groups: list[list[str]] = []
    remaining = list(names)
    while remaining:
        layer = [n for n in remaining
                 if all(d in placed for d in DERIVED_DEPS.get(n, ()))]
        if not layer:
            raise ValueError(f"dependency cycle among {sorted(remaining)}")
        groups.append(sorted(layer))
        placed.update(layer)
        remaining = [n for n in remaining if n not in placed]
    return groups


def run_derived_groups(lake_root: str, out_root: str,
                       names: list[str] | None = None,
                       epoch: int | None = None) -> dict:
    """Execute derived pipelines in dependency groups with a BARRIER
    between groups: every pipeline of group k is fully materialized
    (parquet + lineage manifest) before any pipeline of group k+1
    starts — so conversation_text → descriptions ordering is stated in
    the registry, not implied by call order.

    Resumable: a pipeline whose manifest for the source epoch already
    exists is skipped (the reference reruns only unfinished ETLs).
    Returns ``{name: manifest_info}`` plus the executed group plan.
    """
    import json
    import os

    import pyarrow.parquet as pq

    from .state.manifest import LakeManifest, _atomic_write_json

    e = LakeManifest(lake_root).last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    groups = plan_groups(names)
    infos: dict[str, dict] = {}

    def build_one(name: str, gi: int) -> dict:
        out_dir = os.path.join(out_root, name)
        mpath = os.path.join(out_dir, "_manifests", f"epoch={e}.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                return json.load(fh)
        fn = DERIVED_REGISTRY[name]
        kwargs: dict = {"epoch": e}
        # pipelines that consume upstream MATERIALIZED artifacts
        # (declared depends_on) receive the scheduler's output root —
        # the barrier guarantees the dependency's parquet + manifest
        # already exist in it
        if "derived_root" in inspect.signature(fn).parameters:
            kwargs["derived_root"] = out_root
        ds = fn(lake_root, **kwargs)
        data_dir = os.path.join(out_dir, f"epoch={e}")
        ds.write_parquet(data_dir)
        rows = sum(
            pq.read_metadata(os.path.join(data_dir, f)).num_rows
            for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        info = {"name": name, "source_epoch": e, "rows": rows,
                "path": data_dir, "group": gi,
                "depends_on": list(DERIVED_DEPS.get(name, ()))}
        _atomic_write_json(mpath, info)
        return info

    from concurrent.futures import ThreadPoolExecutor

    _settle_fsspec_http_probe()

    for gi, group in enumerate(groups):
        # members of one group are independent (no declared edges), so
        # they run CONCURRENTLY — each dataset has its own streaming
        # executor and Ray interleaves their stages on the cluster (the
        # reference runs each etl_group's ETLs in a thread pool,
        # /root/reference/src/aggregate_loader.py:185-205).  The loop
        # joins every build before the next group starts — the barrier.
        if len(group) == 1:
            infos[group[0]] = build_one(group[0], gi)
            continue
        with ThreadPoolExecutor(max_workers=min(4, len(group))) as ex:
            for name, info in zip(group, ex.map(
                    lambda n, g=gi: build_one(n, g), group)):
                infos[name] = info
    return {"epoch": e, "groups": groups, "pipelines": infos}


# built-ins — the production second-pass pipelines, group-scheduled:
# stats/text/topics read the lake directly (layer 0); descriptions
# declares — and actually consumes — the materialized stats artifact
# (layer 1), mirroring the reference's etl_groups "after" ordering
# (/root/reference/src/aggregate_loader.py:122-159).
from .pipelines.derived import (  # noqa: E402
    conversation_descriptions,
    conversation_stats,
    conversation_text,
    topic_descriptions,
)

DERIVED_REGISTRY["conversation_stats"] = conversation_stats
DERIVED_DEPS["conversation_stats"] = ()
DERIVED_REGISTRY["conversation_text"] = conversation_text
DERIVED_DEPS["conversation_text"] = ()
DERIVED_REGISTRY["topic_descriptions"] = topic_descriptions
DERIVED_DEPS["topic_descriptions"] = ()
DERIVED_REGISTRY["conversation_descriptions"] = conversation_descriptions
DERIVED_DEPS["conversation_descriptions"] = ("conversation_stats",)


def _fallback_store(derived_root: str | None, name: str,
                    lake_root: str) -> str:
    """Derived-store path when ``derived_root`` is unset.

    Keyed by a hash of the (absolute) lake root so two different lakes —
    or regenerated data at a new path — never share committed epoch
    manifests: a shared tempdir store would short-circuit on a stale
    manifest and silently return the OTHER lake's view."""
    import hashlib
    import os
    import tempfile

    root = derived_root or tempfile.gettempdir()
    key = hashlib.sha256(
        os.path.abspath(lake_root).encode()).hexdigest()[:16]
    return os.path.join(root, f"{name}-{key}")


def _vector_index_members(lake_root: str, epoch: int | None = None,
                          derived_root: str | None = None):
    """Scheduler adapter for the incrementally-maintained vector index
    (pipelines/vector_ivm.py): catches the index store up to ``epoch``
    (segments/tombstones live beside the scheduler's outputs and resume
    across runs — later epochs maintain, never rebuild) and returns the
    alive-membership view the scheduler materializes for this epoch."""
    import os

    from .pipelines.vector_ivm import maintain_vector_index, read_alive

    from .pipelines.vector_ivm import STATE_NAME, _read_state

    store = _fallback_store(derived_root, "_vector_index_store", lake_root)
    if (epoch is not None and os.path.exists(os.path.join(store, STATE_NAME))
            and _read_state(store)["last_epoch"] > epoch):
        # the store only moves forward; a time-travel read below its
        # watermark must fail loudly, not return the newer alive set
        raise ValueError(
            f"vector index store at epoch {_read_state(store)['last_epoch']} "
            f"is ahead of requested epoch {epoch}")
    maintain_vector_index(lake_root, store, upto=epoch)
    return read_alive(store)


DERIVED_REGISTRY["vector_index"] = _vector_index_members
DERIVED_DEPS["vector_index"] = ()


def _join_view_members(lake_root: str, epoch: int | None = None,
                       derived_root: str | None = None):
    """Scheduler adapter for the incrementally-maintained join view
    (pipelines/ivm_join.py) registered as the lake's SELF-join (turn
    pairs within a conversation — the two-lake form is driven directly,
    q:ivm_join_view).  Epochs maintain forward idempotently; a
    time-travel epoch below the store's watermark reads that epoch's
    committed manifest (the view keeps per-epoch manifests, unlike the
    forward-only vector store)."""
    import os

    from .pipelines.ivm_join import maintain_join, read_join
    from .state.manifest import LakeManifest

    store = _fallback_store(derived_root, "_join_view_store", lake_root)
    last = LakeManifest(lake_root).last_committed_epoch()
    upto = last if epoch is None else min(epoch, last)
    maintain_join(lake_root, lake_root, store, list(range(upto + 1)),
                  n_buckets=16)
    return read_join(store, upto)


DERIVED_REGISTRY["join_view"] = _join_view_members
DERIVED_DEPS["join_view"] = ()
