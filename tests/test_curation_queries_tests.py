"""Curation/stats batch (pipelines/curation_queries.py) — typed-hash
gate pins at sf0.001 (the exact driver compare: sorted columns, mergesort
row order, dtype-sensitive pandas value hash) plus kernel unit checks.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

BATCH = [
    "ngram_novelty_scores",
    "user_journey_paths",
    "except_all_type_bags",
    "ttr_per_lang",
    "zipf_slope_terms",
    "ols_price_on_qty_disc",
    "quality_rules_audit",
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
def test_curation_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_flat_tokens_drops_empties_preserves_order():
    from agr_loader_ray.pipelines.curation_queries import _flat_tokens

    t = pa.table({"text": ["a  b", "", "c"]})
    flat, parent = _flat_tokens(t)
    assert flat.to_pylist() == ["a", "b", "c"]
    assert parent.to_pylist() == [0, 0, 2]


def test_det3_np_matches_numpy_det():
    from agr_loader_ray.pipelines.curation_queries import _det3_np

    rng = np.random.default_rng(7)
    m = rng.integers(-50, 50, size=(3, 3)).astype(np.int64)
    got = _det3_np(*m.ravel())
    want = round(float(np.linalg.det(m.astype(np.float64))))
    assert int(got) == int(want)
