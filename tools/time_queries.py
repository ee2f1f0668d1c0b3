"""Ray-side-only timing sweep over the full queries() surface.

Unlike check_gate.py this never runs the DuckDB oracles — it exists to
rank the Ray pipelines by wall time at bench scale so fixed-cost work
(extra exchanges, pool startup, unpruned reads) can be found and cut.

Usage:
    SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 \
        python tools/time_queries.py [--json out.json] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out_path]
    qs = entry.queries()
    names = args or sorted(qs)
    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            res = qs[name](sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            n = len(df)
            times[name] = round(time.time() - t0, 2)
            print(f"{name:38s} {times[name]:7.2f}s rows={n}", flush=True)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"{name:38s} ERROR {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print("\nslowest 15:")
    for k, v in ranked[:15]:
        print(f"  {k:38s} {v:7.2f}s")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf": sf, "times": times}, f, indent=1, sort_keys=True)
    return 1 if any(v < 0 for v in times.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
