"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Headline: CDC WAL replay — change-events/sec applied end-to-end through
the partitioned LWW upsert engine (the BASELINE.json target metric) on
a deterministic skewed WAL sized to the sf tier, plus wall times of the
headline operator queries over $GRAFT_SF_DIR tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "events_per_sec": ...}

``--scaling``: runs the identical job in two fresh processes at
num_cpus=8 and num_cpus=32 and reports both throughputs + scaling
efficiency (sandbox stand-in for the N vs 4N-node cluster criterion —
see BASELINE.md §3).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: WAL sizes per sf tier (events); skewed (zipf) like t3.  sf0.1 sized so
#: steady-state work (~280 CPU-s) dominates the ~3 s fixed session cost at
#: both scaling levels — the regime the 10^10-event target actually runs in.
_WAL_EVENTS = {"sf0.001": 20_000, "sf0.01": 200_000, "sf0.1": 16_000_000}

BENCH_QUERIES = [
    "cdc_lww_upsert",
    "q1_agg_pushdown",
    "hash_join_priority_revenue",
    "ann_cosine_topk",
    "minhash_near_dup",
]


def _sf_name() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _consume(result) -> int:
    """Force execution of a query result, return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        n = 0
        for b in result.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(result, (pa.Table, pd.DataFrame)):
        return len(result)
    return 0


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    # ambient load BEFORE this process spins anything up — captured at
    # the end it would mostly measure our own ray workers
    loadavg_ambient = os.getloadavg()[0]

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import agr_loader_ray.pipelines.text_queries  # noqa: F401
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.pipelines.queries import QUERIES
    from agr_loader_ray.wal.generator import WalSpec, generate_wal

    sf = _sf_name()
    n_events = _WAL_EVENTS.get(sf, 200_000)
    # segments fixed (NOT a function of NUM_CPUS): both scaling levels
    # must read the identical input
    spec = WalSpec(
        n_events=n_events, n_convs=max(200, n_events // 30), n_epochs=8,
        segments_per_epoch=32,
        update_frac=0.25, delete_frac=0.05, zipf_a=1.2,
        out_of_order_frac=0.05, dup_ts_frac=0.02,
    )
    wal_root = os.path.join(tempfile.gettempdir(), f"graft_bench_wal_{sf}_{n_events}")
    generate_wal(wal_root, spec)  # cached across runs (deterministic)

    # warm OS page cache so both scaling levels measure compute+shuffle
    for root, _, files in os.walk(wal_root):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass

    # warm the Ray worker pool (untimed): worker process spin-up is a
    # per-session cost, not part of steady-state replay throughput
    import ray.data as _rd
    _rd.range(1_000_000).map_batches(lambda b: b, batch_format="pyarrow").count()

    # best-of-N trials: steady-state throughput, not scheduler noise.
    # N=3 for the full bench; the scaling legs use N=5 (RAY_GRAFT_TRIALS)
    # because the efficiency ratio is the deliverable and each leg's
    # best-of-N must converge to its true floor — 3 samples leave the
    # ratio swinging ±0.08 with co-tenant noise.
    n_trials = int(os.environ.get("RAY_GRAFT_TRIALS", "3"))
    wal_sec, stats = None, None
    for _ in range(n_trials):
        lake_root = tempfile.mkdtemp(prefix="graft_bench_lake_")
        try:
            # GRAFT_EXCHANGE=dataset re-runs the bench on the generic
            # groupby(part) sort-shuffle path (the pre-task-exchange
            # measurement surface) for apples-to-apples comparisons
            eng = CdcEngine(lake_root, n_partitions=64,
                            exchange=os.environ.get("GRAFT_EXCHANGE", "task"))
            t0 = time.perf_counter()
            s = eng.replay(wal_root)
            sec = time.perf_counter() - t0
        finally:
            shutil.rmtree(lake_root, ignore_errors=True)
        if wal_sec is None or sec < wal_sec:
            wal_sec, stats = sec, s

    queries: dict[str, float] = {"wal_replay": round(wal_sec, 3)}
    if not os.environ.get("RAY_GRAFT_SKIP_QUERIES"):  # scaling legs: replay only
        for name in BENCH_QUERIES:
            best = None
            for _ in range(2):  # best-of-2: shared-box noise is ±2× run-to-run
                t0 = time.perf_counter()
                _consume(QUERIES[name](SF_DIR))
                sec = time.perf_counter() - t0
                best = sec if best is None or sec < best else best
            queries[name] = round(best, 3)

    out = {
        "metric": "cdc_wal_replay_sec (change-events/sec end-to-end, skewed WAL)",
        "value": round(wal_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "wal_events": stats["events_applied"],
        "events_per_sec": round(stats["events_applied"] / wal_sec, 1),
        # ambient context: this is a shared box and co-tenant load moves
        # measured numbers ±2× (BASELINE.md §2b) — a reader must be able
        # to tell a loaded run from a quiet one
        "loadavg_1m": round(loadavg_ambient, 2),
        "exchange": os.environ.get("GRAFT_EXCHANGE", "task"),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run_leg(ncpu: int, exchange: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_TRIALS="5",
                   GRAFT_EXCHANGE=exchange,
                   RAY_GRAFT_SKIP_QUERIES="1")  # legs measure replay only
        cmd = [sys.executable, os.path.abspath(__file__)]
        if shutil.which("taskset"):
            # pin to ncpu physical cores: ray's num_cpus only bounds task
            # scheduling, not library-internal threads — without pinning
            # the low-parallelism leg silently uses extra silicon
            cmd = ["taskset", "-c", f"0-{ncpu - 1}", *cmd]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True).stdout
        # let the leg's raylet/workers fully drain before the next one:
        # a leg launched into the previous leg's load decay reads 2-4×
        # slow (measured); wait for loadavg to settle, bounded
        for _ in range(18):
            time.sleep(5)
            if os.getloadavg()[0] < 2.0:
                break
        return json.loads(out.strip().splitlines()[-1])

    # One fresh pinned process per leg, best-of-5 replays inside each
    # (identical treatment both legs): the per-leg floor is the least
    # noise-contaminated estimate of that parallelism level's capacity,
    # and 5 samples make it converge where 3 left the ratio swinging
    # ±0.08 under co-tenant noise (BASELINE.md §2b).  32-CPU leg first:
    # it is the noise-sensitive one (the 8-CPU leg only contends for a
    # quarter of the cores).
    #
    # BOTH exchange surfaces are measured (BASELINE.md §2d "task-based
    # partition exchange"): the sort-shuffle ("dataset") surface is the
    # unchanged cross-round protocol — its ratio is the headline
    # scaling_efficiency — while the task exchange is the capacity
    # record at every parallelism level; its legs are so much faster
    # that one box's shared memory bus caps the 32-core leg (per-core
    # 342k ev/s @ 8 vs 192k @ 32), an artifact a real N→4N-NODE
    # cluster (one bus + NIC per node) does not have.
    def legs(exchange: str, lo_n: int = 8, hi_n: int = 32) -> dict:
        hi, lo = run_leg(hi_n, exchange), run_leg(lo_n, exchange)
        eps_lo, eps_hi = lo["events_per_sec"], hi["events_per_sec"]
        return {
            f"sec_{lo_n}": lo["value"],
            f"sec_{hi_n}": hi["value"],
            f"events_per_sec_{lo_n}": eps_lo,
            f"events_per_sec_{hi_n}": eps_hi,
            "scaling_efficiency": round((eps_hi / eps_lo) / (hi_n / lo_n), 3),
            f"loadavg_leg{hi_n}": hi.get("loadavg_1m"),
            f"loadavg_leg{lo_n}": lo.get("loadavg_1m"),
            "sf": lo["sf"],
            "wal_events": lo["wal_events"],
        }

    dataset, task = legs("dataset"), legs("task")
    out = {
        "metric": "scaling_efficiency (events/sec at 8 vs 32 CPUs, same input)",
        # headline = the unchanged sort-shuffle protocol surface
        # (comparable to the round-1/2 records); the task exchange's
        # own legs + single-box-bus-compressed ratio are reported
        # alongside
        **dataset,
        "exchange": "dataset (protocol surface; see task_exchange)",
        "task_exchange": {**task, "exchange": "task (default engine path)"},
    }
    if os.environ.get("GRAFT_SCALING_CONTROL"):
        # bus-headroom CONTROL pair on the DEFAULT (task) path: same 4×
        # CPU factor but 4→16 cores, so the high leg runs well under the
        # one socket's DRAM-bandwidth ceiling that flattens the 32-core
        # leg (per-core ev/s at 8 pinned cores measured ~1.8× the
        # 32-core figure).  A ≥0.8 reading here with a <0.8 8→32 reading
        # is the box's bus, not the exchange: N→4N NODES adds a memory
        # bus + NIC per node, which the control pair models and the
        # saturated top leg cannot.
        out["control_4_16"] = {**legs("task", 4, 16),
                               "exchange": "task (default engine path)"}
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
