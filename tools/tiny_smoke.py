"""Empty-stream robustness smoke: run EVERY queries() entry on a
25-row slice of the sf0.001 tables.

At this size most hash partitions are empty and many filtered streams
are GLOBALLY empty, which exercises the three Ray artifacts the engine
hardens against (see stages/exchange.py / stages/attach.py /
stages/quantiles._collect_tree):

- map fns are SKIPPED on empty input blocks and replaced by
  zero-column empties (schema loss at every map boundary),
- Dataset.schema() returns None for such streams,
- per-partition kernels receive zero-row input the sort-based groupby
  would never show them.

Usage:  python tools/tiny_smoke.py   (exit != 0 on any failure)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray
    import ray.data
    import pyarrow.parquet as pq

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")

    src = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    tiny = os.path.join("/tmp", "sf_tiny_smoke")
    os.makedirs(tiny, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.slice(0, min(25, t.num_rows)),
                           os.path.join(tiny, f))

    import __ray_entry__ as entry

    bad = []
    for name, fn in sorted(entry.queries().items()):
        try:
            r = fn(tiny)
            r.count() if isinstance(r, ray.data.Dataset) else len(r)
        except Exception as ex:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"FAIL {name}: {repr(ex)[:160]}", flush=True)
    print(f"tiny smoke: {len(bad)} failures / {len(entry.queries())}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
