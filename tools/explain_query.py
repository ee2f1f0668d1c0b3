"""Print Ray Data execution stats for one or more queries() entries —
the "measure, don't guess" loop for stage-level wall time.

    python tools/explain_query.py minhash_near_dup [sf_dir]
    SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 python tools/explain_query.py q1_agg_pushdown
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    override = [a for a in sys.argv[1:] if a.startswith("/")]
    if override:
        sf = override[0]
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entry

    qs = entry.queries()
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](sf)
        if hasattr(res, "materialize"):
            res = res.materialize()
            print(f"=== {name} ({time.perf_counter() - t0:.2f}s wall, "
                  f"{res.count()} rows) ===")
            print(res.stats())
        else:
            print(f"=== {name} ({time.perf_counter() - t0:.2f}s wall, "
                  f"{len(res)} rows) === (driver-side result; no Dataset "
                  "stats)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
