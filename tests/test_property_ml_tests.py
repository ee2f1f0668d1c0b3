"""Random-input typed-hash gate for the round-4 ML operator batch
(semdedup_prune, pca_power_component, symspell_edit1_pairs,
item_item_cf_topk) — the VERDICT r3 item-10 harness style extended to
the newest family.

Adversarial shapes the fixed fixtures can't reach: duplicate embedding
vectors (cosine exactly 1.0 inside a cell), fewer rows than seed
count, single-character and shared-prefix names (deletion variants
collide across many names), repeated (order, part) lineitem rows, and
single-item baskets (zero pair fan-out)."""

import os

import duckdb
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings

import __ray_entry__ as entry

EMB_QUERIES = ["semdedup_prune", "pca_power_component"]


@st.composite
def embeddings64_table(draw):
    """Integer-lattice dim-64 embeddings (the ml_queries grid dim) with
    deliberate duplicates; zero vectors nudged (the oracle's sqrt(0)
    denominator is a semantic gap, not the property under test) and at
    least two distinct rows (a constant table makes the PCA scatter
    matrix all-zero, which pca_power_component rejects by contract)."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n = draw(st.integers(min_value=4, max_value=24))
    mat = rng.integers(-2, 3, size=(n, 64)).astype(np.float32)
    for i in range(n):
        if rng.integers(0, 4) == 0 and i > 0:
            mat[i] = mat[rng.integers(0, i)]  # exact duplicate vector
        if not mat[i].any():
            mat[i, 0] = 1.0
    if all(np.array_equal(mat[i], mat[0]) for i in range(n)):
        mat[-1, 0] += 1.0
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in mat],
                              pa.list_(pa.float32())),
    })


_STEMS = ["rose", "rosy", "rise", "ruse", "blush", "plush", "flush",
          "a", "b", "ab", "ba", "misty", "musty", "dusty"]


@st.composite
def part_names_table(draw):
    """Name domains dense in edit-1 neighborhoods: stems, their
    single-edit mutations, duplicates, and single characters."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n = draw(st.integers(min_value=3, max_value=40))
    names = []
    for _ in range(n):
        base = _STEMS[rng.integers(0, len(_STEMS))]
        kind = rng.integers(0, 4)
        if kind == 0:
            names.append(base)
        elif kind == 1 and len(base) > 1:       # deletion
            j = int(rng.integers(0, len(base)))
            names.append(base[:j] + base[j + 1:])
        elif kind == 2:                          # substitution
            j = int(rng.integers(0, len(base)))
            names.append(base[:j] + "xyz"[int(rng.integers(0, 3))]
                         + base[j + 1:])
        else:                                    # insertion
            j = int(rng.integers(0, len(base) + 1))
            names.append(base[:j] + "q" + base[j:])
    return pa.table({"p_name": pa.array(names, pa.string())})


@st.composite
def lineitem_baskets_table(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n_orders = draw(st.integers(min_value=1, max_value=12))
    ok, pk = [], []
    for o in range(n_orders):
        k = int(rng.integers(1, 6))
        parts = rng.integers(0, 9, size=k)
        for p in parts:
            ok.append(o)
            pk.append(int(p))
            if rng.integers(0, 3) == 0:          # duplicate (order, part)
                ok.append(o)
                pk.append(int(p))
    return pa.table({"l_orderkey": pa.array(np.array(ok, np.int64)),
                     "l_partkey": pa.array(np.array(pk, np.int64))})


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


def _oracle(sf: str, table: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM '{sf}/{table}.parquet'")
    want = con.sql(entry.oracle_sql()[name]).arrow().to_pandas()
    con.close()
    return want


def _compare(got, want):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == len(want)
    if len(got) == 0:
        return
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], (dict(got.dtypes.astype(str)),
                          dict(want.dtypes.astype(str)))
    assert g[1] == w[1]


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(tbl=embeddings64_table())
def test_random_embeddings_ml_match_oracle(name, tbl, tmp_path_factory,
                                           ray_session):
    sf = str(tmp_path_factory.mktemp("sf"))
    pq.write_table(tbl, os.path.join(sf, "embeddings.parquet"))
    _compare(entry.queries()[name](sf), _oracle(sf, "embeddings", name))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(tbl=part_names_table())
def test_random_names_symspell_match_oracle(tbl, tmp_path_factory,
                                            ray_session):
    sf = str(tmp_path_factory.mktemp("sf"))
    pq.write_table(tbl, os.path.join(sf, "part.parquet"))
    _compare(entry.queries()["symspell_edit1_pairs"](sf),
             _oracle(sf, "part", "symspell_edit1_pairs"))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(tbl=lineitem_baskets_table())
def test_random_baskets_cf_match_oracle(tbl, tmp_path_factory, ray_session):
    sf = str(tmp_path_factory.mktemp("sf"))
    pq.write_table(tbl, os.path.join(sf, "lineitem.parquet"))
    _compare(entry.queries()["item_item_cf_topk"](sf),
             _oracle(sf, "lineitem", "item_item_cf_topk"))
