"""Resample/matching/attribution batch — typed-hash pins at sf0.001,
FIFO invariants, and a random-lineitem property gate for the FIFO
interval kernel."""

import os

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

BATCH = ["interp_resample_hourly", "fifo_lot_consumption", "attribution_linear"]


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
def test_resample_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_fifo_invariants():
    got = entry.queries()["fifo_lot_consumption"](SF).to_pandas()
    assert (got["matched_q"] <= got["sell_q"]).all()
    assert (got["matched_q"] <= got["buy_q"]).all()
    # matched is exactly min(sell, buy): total sell demand consumes the
    # interval-clamped lots completely whenever supply suffices
    assert (got["matched_q"] == np.minimum(got["sell_q"], got["buy_q"])).all()


@st.composite
def fifo_lineitem(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n_parts = draw(st.integers(min_value=1, max_value=5))
    pk = rng.integers(0, n_parts, size=n).astype(np.int64) * 8  # all %8==0
    # coarse shipdates → duplicate-date tie-breaks via (orderkey, linenumber)
    sd = pd.to_datetime(rng.integers(0, 5, size=n) * 86_400_000_000,
                        unit="us").astype("datetime64[us]")
    return pd.DataFrame({
        "l_partkey": pk,
        "l_orderkey": rng.integers(1, 20, size=n).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, size=n).astype(np.int32),
        "l_quantity": rng.integers(1, 51, size=n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1.0, 9000.0, size=n), 2),
        "l_returnflag": np.array(["A", "N", "R"], object)[
            rng.integers(0, 3, size=n)],
        "l_shipdate": sd,
    })


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(frame=fifo_lineitem())
def test_fifo_random_match_oracle(frame, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("sf"))
    frame.to_parquet(os.path.join(sf, "lineitem.parquet"), index=False)
    got = entry.queries()["fifo_lot_consumption"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(entry.oracle_sql()["fifo_lot_consumption"]).arrow().to_pandas()
    con.close()
    assert len(got) == len(want)
    if len(got) == 0:
        return
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], (dict(got.dtypes.astype(str)),
                          dict(want.dtypes.astype(str)))
    assert g[1] == w[1]
