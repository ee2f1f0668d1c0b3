"""Local driver-surface correctness gate: run named queries() entries and
compare against oracle_sql() with the driver's typed value-hash.

Usage (from /root/repo):
    python tools/check_gate.py q1 q2 ...      # specific queries
    python tools/check_gate.py --all          # every oracle-backed query
    SF_DIR=/root/testdata/sf0.001 python tools/check_gate.py --all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import ray  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False)
    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:]
    if "--all" in names:
        names = sorted(oracles)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = qs[name](sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            t_ray = time.time() - t0
            if name not in oracles:
                print(f"{name:34s} rows={len(df):6d}  (no oracle) ray={t_ray:.1f}s")
                continue
            t1 = time.time()
            odf = con.sql(oracles[name]).arrow().to_pandas()
            t_sql = time.time() - t1
            h_r, h_o = typed_hash(df), typed_hash(odf)
            rows_ok = len(df) == len(odf)
            schema_ok = h_r[0] == h_o[0]
            hash_ok = h_r[1] == h_o[1]
            status = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
            print(f"{name:34s} {status} rows={len(df)}/{len(odf)} "
                  f"schema={schema_ok} hash={hash_ok} ray={t_ray:.1f}s sql={t_sql:.1f}s")
            if status == "FAIL":
                failures += 1
                if not schema_ok:
                    print(f"   ray dtypes: {h_r[0]}\n   sql dtypes: {h_o[0]}")
                if rows_ok and schema_ok and not hash_ok:
                    a = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
                    b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                    neq = (a != b).any(axis=1) & ~(a.isna() & b.isna()).all(axis=1)
                    print(f"   first diffs:\n{a[neq].head(3)}\n   vs\n{b[neq].head(3)}")
        except Exception as e:
            failures += 1
            print(f"{name:34s} ERROR {type(e).__name__}: {str(e)[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
