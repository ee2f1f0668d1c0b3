"""Input-size scaling evidence: replay a 2× (32 M-event) WAL at 32 CPUs.

The 10^10-design argument is that wall time is LINEAR in event count
(per-epoch write cost ∝ events, one exchange per backlog) — this script
re-measures the 2× point.  Run from /root/repo on a quiet box:

    python tools/bench_32m.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402


def main() -> int:
    loadavg = os.getloadavg()[0]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.wal.generator import WalSpec, generate_wal

    n = 32_000_000
    spec = WalSpec(
        n_events=n, n_convs=max(200, n // 30), n_epochs=8,
        segments_per_epoch=32, update_frac=0.25, delete_frac=0.05,
        zipf_a=1.2, out_of_order_frac=0.05, dup_ts_frac=0.02,
    )
    wal = os.path.join(tempfile.gettempdir(), f"graft_bench_wal_sf0.1_{n}")
    generate_wal(wal, spec)  # deterministic → cached across runs

    for root, _, files in os.walk(wal):  # warm page cache
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass
    import ray.data as _rd

    _rd.range(1_000_000).map_batches(lambda b: b, batch_format="pyarrow").count()

    best = None
    for _ in range(2):
        lake = tempfile.mkdtemp(prefix="graft_lake_32m_")
        try:
            eng = CdcEngine(lake, n_partitions=64)
            t0 = time.perf_counter()
            eng.replay(wal)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        finally:
            shutil.rmtree(lake, ignore_errors=True)
    print(json.dumps({
        "metric": "input_size_scaling_32m", "wal_events": n,
        "sec": round(best, 2), "events_per_sec": round(n / best, 1),
        "num_cpus": 32, "loadavg_1m": round(loadavg, 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
