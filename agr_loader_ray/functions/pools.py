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
