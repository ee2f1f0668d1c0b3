"""Schema-conformance sweep: one table-driven pass over EVERY
``queries()`` output at sf0.001, asserting the pandas dtype surface
against the checked-in expectation table ``tests/expected_schemas.json``.

Analogue of the reference's parameterized relationship/node schema
sweeps (/root/reference/src/test/schema_rel_tests.py:20-50,
schema_node_tests.py:17-40): those assert the whole output schema
surface in ONE test; this does the same over the repo's full query
surface so any dtype drift (timestamp unit, int width, decimal
lowering) fails loudly even when a query's value hash is not being
checked.

Usage:
    python tools/schema_sweep.py --write   # (re)generate expectations
    python tools/schema_sweep.py           # verify, exit!=0 on drift
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPECT_PATH = os.path.join(REPO, "tests", "expected_schemas.json")
SF_DIR = os.environ.get("SCHEMA_SWEEP_SF", "/root/testdata/sf0.001")


def result_schema(res) -> dict[str, str]:
    """Column → pandas dtype string, the same surface the driver's
    typed hash keys on (Dataset/Table results pass through to_pandas
    exactly like the gate compare)."""
    import pandas as pd

    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return {c: str(df[c].dtype) for c in sorted(df.columns)}


def sweep(names=None) -> tuple[dict[str, dict[str, str]], dict[str, str]]:
    import __ray_entry__ as entry

    qs = entry.queries()
    got: dict[str, dict[str, str]] = {}
    errs: dict[str, str] = {}
    for name in sorted(names or qs):
        try:
            got[name] = result_schema(qs[name](SF_DIR))
        except Exception as e:  # noqa: BLE001 - sweep must report all
            errs[name] = f"{type(e).__name__}: {e}"
    return got, errs


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    got, errs = sweep()
    if "--write" in sys.argv:
        with open(EXPECT_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {len(got)} schemas -> {EXPECT_PATH}"
              + (f" ({len(errs)} ERRORS: {sorted(errs)})" if errs else ""))
        return 1 if errs else 0

    with open(EXPECT_PATH) as f:
        want = json.load(f)
    bad = []
    for name in sorted(set(want) | set(got) | set(errs)):
        if name in errs:
            bad.append(f"{name}: raised {errs[name]}")
        elif name not in want:
            bad.append(f"{name}: NEW query not in expectation table "
                       "(run tools/schema_sweep.py --write)")
        elif name not in got:
            bad.append(f"{name}: in expectation table but not in queries()")
        elif got[name] != want[name]:
            bad.append(f"{name}: schema drift got={got[name]} "
                       f"want={want[name]}")
    for line in bad:
        print("FAIL", line)
    print(f"schema sweep: {len(got) - sum(1 for b in bad if 'drift' in b)}"
          f"/{len(want)} conform, {len(bad)} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
