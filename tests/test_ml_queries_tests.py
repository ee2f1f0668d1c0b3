"""Brute-force / oracle cross-checks for the round-4 ML operator batch
(semdedup, streaming PCA, SymSpell edit-1 blocking, item-item CF).

Every test recomputes the expected result with an INDEPENDENT method
(naive numpy/pandas, or the DuckDB oracle with the driver's typed
hash) — never the pipeline's own kernels.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

NEW = ["semdedup_prune", "pca_power_component",
       "symspell_edit1_pairs", "item_item_cf_topk", "ann_recall_eval",
       "unigram_surprise_scores", "stl_weekday_seasonal",
       "logreg_gd_weights"]


def _typed_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return (tuple(str(df[c].dtype) for c in df.columns),
            int(pd.util.hash_pandas_object(df, index=False).sum()))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", NEW)
def test_typed_hash_vs_oracle(name, con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def _grid():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    X = pc.list_flatten(t["embedding"].combine_chunks()) \
        .to_numpy(zero_copy_only=False).reshape(len(ids), -1).astype(np.float64)
    g = X * 1000
    Xi = np.trunc(g + np.sign(g) * 0.5)
    srt = np.argsort(ids)
    return ids[srt], Xi[srt]


def test_semdedup_matches_naive_numpy():
    from agr_loader_ray.pipelines.ml_queries import _SEM_K, _SEM_THETA
    ids, Xi = _grid()
    seeds = Xi[:_SEM_K]
    d = ((Xi[:, None, :] - seeds[None, :, :]) ** 2).sum(2)
    a = d.argmin(1)
    s = np.sqrt((Xi * Xi).sum(1))
    want = {}
    for c in range(_SEM_K):
        m = a == c
        G, sg = Xi[m], s[m]
        S = np.trunc((G @ G.T) / np.outer(sg, sg) * 1e6
                     + np.sign((G @ G.T)) * 0.5) / 1e6
        pruned = np.triu(S >= _SEM_THETA, 1).any(axis=0)
        want[c] = (int(m.sum()), int(pruned.sum()))
    got = entry.queries()["semdedup_prune"](SF).to_pandas()
    assert list(got["c"]) == sorted(want)
    for _, r in got.iterrows():
        assert (r["n_vecs"], r["n_pruned"]) == want[int(r["c"])]
    assert got["n_pruned"].sum() > 0  # the threshold actually bites


def test_pca_matches_direct_covariance_power_iteration():
    _, Xi = _grid()
    X = Xi.astype(np.int64)
    n = len(X)
    S = X.T @ X
    sv = X.sum(0)
    B = np.int64(n) * S - np.outer(sv, sv)
    mb = int(np.abs(B).max())
    C = np.trunc(B.astype(np.float64) * 1e6 / mb
                 + np.sign(B) * 0.5).astype(np.int64)
    v = np.ones(64, np.int64)
    for _ in range(2):
        w = C @ v
        x = w.astype(np.float64) * 1e6 / int(np.abs(w).max())
        v = np.trunc(x + np.sign(x) * 0.5).astype(np.int64)
    got = entry.queries()["pca_power_component"](SF)
    got = got.sort_values("i").reset_index(drop=True)
    assert np.array_equal(got["v"].to_numpy(), v)
    # the quantized vector is genuinely directional, not the init vector
    assert got["v"].abs().max() == 1_000_000


def test_symspell_matches_bruteforce_all_pairs():
    names = sorted(set(pq.read_table(f"{SF}/part.parquet",
                                     columns=["p_name"])["p_name"].to_pylist()))
    from agr_loader_ray.pipelines.relational_queries import _levenshtein_pairs
    a_l, b_l = [], []
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            if abs(len(na) - len(nb)) <= 1:
                a_l.append(na)
                b_l.append(nb)
    d = _levenshtein_pairs(a_l, b_l)
    want = sorted((a, b) for a, b, dd in zip(a_l, b_l, d) if dd == 1)
    got = entry.queries()["symspell_edit1_pairs"](SF).to_pandas()
    assert sorted(zip(got["name_a"], got["name_b"])) == want
    assert (got["dist"] == 1).all()


def test_item_item_cf_matches_pandas_bruteforce():
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    b = li.drop_duplicates()
    deg = b.groupby("l_partkey").size()
    m = b.merge(b, on="l_orderkey")
    m = m[m["l_partkey_x"] != m["l_partkey_y"]]
    co = m.groupby(["l_partkey_x", "l_partkey_y"]).size().reset_index(name="n")
    co = co[co["n"] >= 2]
    sim_raw = co["n"].to_numpy().astype(np.float64) / (
        np.sqrt(deg.loc[co["l_partkey_x"]].to_numpy().astype(np.float64))
        * np.sqrt(deg.loc[co["l_partkey_y"]].to_numpy().astype(np.float64)))
    co["sim"] = np.trunc(sim_raw * 1e6 + 0.5) / 1e6
    co = co.sort_values(["l_partkey_x", "sim", "n", "l_partkey_y"],
                        ascending=[True, False, False, True], kind="mergesort")
    co["rn"] = co.groupby("l_partkey_x").cumcount()
    want = co[co["rn"] < 3]
    got = entry.queries()["item_item_cf_topk"](SF).to_pandas() \
        .sort_values(["item", "neighbor"]).reset_index(drop=True)
    want = want.rename(columns={"l_partkey_x": "item", "l_partkey_y": "neighbor",
                                "n": "n_co"})[["item", "neighbor", "n_co", "sim"]] \
        .sort_values(["item", "neighbor"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n_co": np.int64}),
                                  want.astype({"n_co": np.int64}),
                                  check_dtype=False)


def test_bounded_side_guard_raises():
    from agr_loader_ray.functions.bounds import (BoundedSideError,
                                                 assert_bounded)

    assert assert_bounded(10, "x", limit=10) == 10
    with pytest.raises(BoundedSideError, match="driver bound"):
        assert_bounded(11, "x", limit=10)
