"""Allocation/distribution batch (pipelines/allocation_queries.py) —
typed-hash gate pins at sf0.001 plus the largest-remainder invariant
(per-order allocations sum EXACTLY to the order's total cents).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

BATCH = [
    "prorate_totalprice_lineitems",
    "geomean_price_per_priority",
    "type_enrichment_heavy_users",
    "lorenz_decile_revenue",
]


def _typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", BATCH)
def test_allocation_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_prorate_sums_exactly_to_order_totals(oracle_con):
    qs = entry.queries()
    got = qs["prorate_totalprice_lineitems"](SF).to_pandas()
    sums = got.groupby("l_orderkey")["alloc_cents"].sum()
    totals = oracle_con.sql("""
        SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS t
        FROM orders WHERE o_orderkey % 16 = 0
          AND o_orderkey IN (SELECT l_orderkey FROM lineitem)
    """).df().set_index("o_orderkey")["t"]
    joined = sums.to_frame("alloc").join(totals.to_frame("t"), how="inner")
    assert len(joined) == len(sums)
    assert (joined["alloc"] == joined["t"]).all()
    # allocation is proportional: no item differs from exact share by ≥1 cent
    assert (got["alloc_cents"] >= 0).all()


def test_lorenz_cum_share_monotone_ends_at_one():
    qs = entry.queries()
    got = qs["lorenz_decile_revenue"](SF).to_pandas().sort_values("decile")
    cs = got["cum_share"].to_numpy()
    assert np.all(np.diff(cs) > 0)
    assert cs[-1] == 1.0
    # Lorenz convexity: decile cents non-decreasing when ranked by spend
    assert np.all(np.diff(got["cents"].to_numpy()) >= 0)
