"""Stage-sizing helpers shared by all pipelines.

A fixed-size actor pool that reserves every cluster CPU starves the
read/write stages and deadlocks the streaming executor (observed on a
4-CPU test cluster).  Pools therefore autoscale with a max strictly
below the CPU count (SURVEY §4.2).
"""

from __future__ import annotations

import ray


def pool(cap: int = 8) -> tuple[int, int]:
    """Autoscaling actor-pool bounds: (1, min(cap, ncpu - 1))."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return (1, max(1, min(cap, ncpu - 1)))


def join_parts(cap: int = 32) -> int:
    """Hash-join/shuffle partition count sized to the cluster — each
    partition is an aggregator actor, so stay within the CPU budget.
    Measured sweep at 32 CPUs / sf0.1: 8 partitions beat 16 (5.9 s →
    3.1 s) — aggregator-actor startup dominates small-side joins."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cap, ncpu // 4))


#: per-WORKER-PROCESS stage-instance cache for ``task_stage`` (the T1
#: lookup-singleton pattern as a task-pool cache; worker processes
#: persist across tasks, so construction amortizes exactly like actor
#: state without paying per-query pool startup).
_TASK_STAGE_CACHE: dict = {}


def task_stage(cls, *args, **kwargs):
    """Run a broadcast-state ``map_batches`` stage as TASK closures.

    For stages whose only per-actor state is a broadcast lookup
    (``ray.put`` refs + trivial derived arrays), an autoscaling actor
    pool pays seconds of startup per query — the stage's dominant fixed
    cost at bench scale (measured on quartile_bin_counts: bin+aggregate
    2.8 s → 0.2 s).  ``ray.get`` on a plasma-local ref is zero-copy, and
    the instance is memoized per worker process per (class, args) key.

    Heavy-state stages (decoders, models, file-backed indexes) should
    stay on ``concurrency=pool()`` actor pools — construction there is
    genuinely expensive and the pool bounds memory."""
    def _k(v):
        return v.hex() if isinstance(v, ray.ObjectRef) else repr(v)

    key = (cls.__module__, cls.__qualname__,
           tuple(_k(a) for a in args),
           tuple(sorted((n, _k(v)) for n, v in kwargs.items())))

    def fn(batch):
        inst = _TASK_STAGE_CACHE.get(key)
        if inst is None:
            if len(_TASK_STAGE_CACHE) > 64:  # bound worker-side growth
                _TASK_STAGE_CACHE.clear()
            inst = _TASK_STAGE_CACHE[key] = cls(*args, **kwargs)
        return inst(batch)

    return fn
