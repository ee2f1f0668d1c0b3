"""Random-input typed-hash gate for the allocation/distribution batch.

Hypothesis drives small adversarial orders/lineitem tables (orders with
no lineitems, lineitems with no order, equal quantities → remainder
ties, all-equal spends → degenerate bucket widths, single-customer
deciles) through BOTH the Ray pipeline and its DuckDB oracle — the
driver's exact compare on inputs the fixtures can't reach.  Domain
contracts from TESTDATA.md hold: prices are positive 2-dp doubles,
quantities ≥ 1 (ln/ratio kernels are defined on that domain).
"""

import os

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings

import __ray_entry__ as entry

_PRI = ["1-URGENT", "2-HIGH", "3-MEDIUM"]


@st.composite
def orders_lineitem(draw):
    n_orders = draw(st.integers(min_value=2, max_value=40))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    # force a healthy share of keys ≡ 0 (mod 16) so the prorate sample
    # is non-empty; keep others arbitrary
    keys = np.arange(1, n_orders + 1, dtype=np.int64) * 8
    n_prices = draw(st.integers(min_value=1, max_value=6))
    prices = np.round(rng.uniform(0.01, 5000.0, size=n_prices), 2)
    orders = pd.DataFrame({
        "o_orderkey": keys,
        "o_custkey": rng.integers(1, max(2, n_orders // 3), size=n_orders).astype(np.int64),
        "o_totalprice": prices[rng.integers(0, n_prices, size=n_orders)],
        "o_orderpriority": np.array(_PRI, object)[rng.integers(0, 3, size=n_orders)],
    })
    rows = []
    for k in keys:
        if rng.random() < 0.15:
            continue  # order with no lineitems
        n_li = int(rng.integers(1, 7))
        # equal quantities with prob → exact remainder ties on frac
        q = (np.full(n_li, int(rng.integers(1, 51)), np.int64)
             if rng.random() < 0.5 else rng.integers(1, 51, size=n_li))
        for i in range(n_li):
            rows.append((int(k), i + 1, float(q[i])))
    # a few orphan lineitems (no matching order)
    for i in range(int(rng.integers(0, 3))):
        rows.append((int(keys.max() + 16 + 16 * i), 1, float(rng.integers(1, 51))))
    if not rows:
        # domain contract: the lineitem TABLE is never empty (an empty
        # parquet yields zero blocks, which carry no schema into the
        # join — the documented Ray framework artifact, not a kernel
        # path; a block merely FILTERED to empty keeps li_prep's schema)
        rows.append((int(keys[0]), 1, 1.0))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber", "l_quantity"])
    li["l_linenumber"] = li["l_linenumber"].astype(np.int32)
    return orders, li


def _typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    # value semantics for signed zeros: the random harness hits exact
    # epsilon ties where one engine's float path lands on -0.0 and the
    # other's on +0.0 (equal values, different bit patterns — pandas
    # hashes bits); the driver's fixture SFs never produce such ties
    import numpy as _np
    for c in df.columns:
        if df[c].dtype.kind == "f":
            v = df[c].to_numpy()
            df[c] = _np.where(v == 0, 0.0, v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


def _run_compare(name, sf, views):
    got = entry.queries()[name](sf).to_pandas()
    con = duckdb.connect()
    for v in views:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM '{sf}/{v}.parquet'")
    want = con.sql(entry.oracle_sql()[name]).arrow().to_pandas()
    con.close()
    assert len(got) == len(want)
    if len(got) == 0:
        return got
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], (dict(got.dtypes.astype(str)),
                          dict(want.dtypes.astype(str)))
    assert g[1] == w[1]
    return got


@pytest.mark.parametrize(
    "name", ["prorate_totalprice_lineitems", "geomean_price_per_priority",
             "lorenz_decile_revenue"])
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(frames=orders_lineitem())
def test_random_orders_match_oracle(name, frames, tmp_path_factory):
    orders, li = frames
    sf = str(tmp_path_factory.mktemp("sf"))
    orders.to_parquet(os.path.join(sf, "orders.parquet"), index=False)
    li.to_parquet(os.path.join(sf, "lineitem.parquet"), index=False)
    got = _run_compare(name, sf, ["orders", "lineitem"])
    if name == "prorate_totalprice_lineitems" and len(got):
        # the allocation invariant must hold on EVERY random input
        sums = got.groupby("l_orderkey")["alloc_cents"].sum()
        t = orders.set_index("o_orderkey")["o_totalprice"]
        expect = (t.loc[sums.index] * 100).round().astype(np.int64)
        assert (sums == expect).all()
