"""Higher-moment grouped stats: limb-sum exactness + typed-hash gate
parity (the driver's compare) for skew/kurtosis and grouped regression."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entry
from agr_loader_ray.pipelines.stats_queries import _limb_cols, _limb_total

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def test_limb_split_roundtrip_exact():
    rng = np.random.default_rng(7)
    # partial sums near the int64 ceiling, incl. 0 and maxima
    s = np.concatenate([
        rng.integers(0, np.iinfo(np.int64).max, 1000),
        np.array([0, 1, (1 << 62) + 12345, np.iinfo(np.int64).max]),
    ]).astype(np.int64)
    cols = _limb_cols("s", s)
    t = pa.table({"s_hi": cols["s_hi"], "s_lo": cols["s_lo"]})
    assert _limb_total(t, "s") == [int(v) for v in s]


def test_limb_sum_exceeds_int64_exact():
    # two partials whose true total overflows int64: limb sums must
    # recombine to the exact Python-int total
    a = np.array([(1 << 62) + 987654321, (1 << 62) + 123456789], np.int64)
    cols = _limb_cols("s", a)
    t = pa.table({
        "s_hi": pa.array([int(cols["s_hi"][0].as_py()
                              + cols["s_hi"][1].as_py())]),
        "s_lo": pa.array([int(cols["s_lo"][0].as_py()
                              + cols["s_lo"][1].as_py())]),
    })
    assert _limb_total(t, "s") == [int(a[0]) + int(a[1])]


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


@pytest.mark.parametrize("name", ["skew_kurt_value_per_type",
                                  "regr_price_on_qty"])
def test_moment_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def test_skew_kurt_matches_scipy_style_reference():
    """Closed-form moment math vs a direct population skew/kurt on the
    raw rounded values (numerical sanity, independent of the oracle)."""
    qs = entry.queries()
    got = qs["skew_kurt_value_per_type"](SF).to_pandas()
    raw = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    x = np.trunc(raw["value"].to_numpy()
                 + np.sign(raw["value"].to_numpy()) * 0.5)
    raw = raw.assign(x=x)
    for _, row in got.iterrows():
        v = raw.loc[raw["event_type"] == row["event_type"], "x"].to_numpy()
        m2 = ((v - v.mean()) ** 2).mean()
        sk = ((v - v.mean()) ** 3).mean() / m2 ** 1.5
        ku = ((v - v.mean()) ** 4).mean() / m2 ** 2 - 3.0
        assert abs(row["skew_v"] - sk) < 1e-9
        assert abs(row["kurt_v"] - ku) < 1e-9
