"""Scale-path correctness: the distributed median's histogram-refine loop
and the (hash, lang) dedup key — cases the sf fixtures alone don't force.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import agr_loader_ray.pipelines.queries as Q


def _write_sf(tmp_path, tables: dict[str, pa.Table]) -> str:
    d = tmp_path / "sf"
    d.mkdir()
    for name, t in tables.items():
        pq.write_table(t, str(d / f"{name}.parquet"))
    return str(d)


def _events_table(values: np.ndarray, types: np.ndarray) -> pa.Table:
    n = len(values)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(np.arange(n) % 7, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "ts": pa.array(
                np.datetime64("2024-01-01", "us") + np.arange(n).astype("timedelta64[s]")
            ),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )


def _median_got(sf_dir):
    res = Q.QUERIES["median_value_per_type"](sf_dir)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return df.sort_values("event_type").reset_index(drop=True)


def _median_want(values, types):
    df = pd.DataFrame({"event_type": types, "value": values})
    g = df.groupby("event_type")["value"]
    return pd.DataFrame(
        {
            "event_type": sorted(df["event_type"].unique()),
            "med_value": [float(np.median(g.get_group(t).to_numpy()))
                          for t in sorted(df["event_type"].unique())],
            "n": [int(g.get_group(t).size) for t in sorted(df["event_type"].unique())],
        }
    )


def test_median_histogram_refine_path(tmp_path, monkeypatch):
    """Force the multi-round histogram path with a tiny pull bound."""
    monkeypatch.setattr(Q, "_BOUNDARY_LIMIT", 8)
    rng = np.random.default_rng(7)
    # heavy ties + negatives + a hot cluster inside one bucket
    vals = np.concatenate(
        [
            rng.normal(0, 1, 4000),
            np.full(3000, 0.125),          # hot single value (bucket narrow loop)
            rng.uniform(-1e6, 1e6, 3000),  # wide range incl. negatives
        ]
    )
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, len(vals))]
    sf = _write_sf(tmp_path, {"events": _events_table(vals, types)})
    got = _median_got(sf)
    want = _median_want(vals, types)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_median_even_odd_and_all_equal(tmp_path, monkeypatch):
    monkeypatch.setattr(Q, "_BOUNDARY_LIMIT", 4)
    vals = np.array([1.0, 2.0, 3.0, 4.0,      # even group → interpolated
                     5.0, 6.0, 7.0,           # odd group
                     9.0, 9.0, 9.0, 9.0, 9.0])  # all-equal group
    types = np.array(["e"] * 4 + ["o"] * 3 + ["q"] * 5)
    sf = _write_sf(tmp_path, {"events": _events_table(vals, types)})
    got = _median_got(sf)
    want = _median_want(vals, types)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_median_sign_boundary_keys(tmp_path, monkeypatch):
    """Negative and positive float keys span the int64 sign boundary."""
    monkeypatch.setattr(Q, "_BOUNDARY_LIMIT", 2)
    vals = np.array([-1e300, -5.0, -1e-300, 0.0, 1e-300, 5.0, 1e300])
    types = np.array(["x"] * 7)
    sf = _write_sf(tmp_path, {"events": _events_table(vals, types)})
    got = _median_got(sf)
    assert got["med_value"].iloc[0] == 0.0
    assert int(got["n"].iloc[0]) == 7


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["src1"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def test_dedup_exact_text_lang_in_key(tmp_path):
    """Same text under different langs must keep one survivor PER LANG
    (oracle partitions by (norm_text, lang)); the old hash-only key merged
    them."""
    import duckdb

    rows = [
        (1, "Hello World", "en"),
        (2, "hello world", "en"),    # dup of 1 after normalization
        (3, "Hello World", "fr"),    # same text, different lang → survives
        (4, "  hello world ", "fr"), # dup of 3 after normalization
        (5, "unique text", "en"),
    ]
    sf = _write_sf(tmp_path, {"documents": _docs_table(rows)})
    got = Q.QUERIES["dedup_exact_text"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(Q.ORACLE_SQL["dedup_exact_text"]).arrow().to_pandas()
    got = got.sort_values("lang").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("lang").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # both langs survive with exactly one hello-world each
    assert set(got["lang"]) == {"en", "fr"}
    assert int(got.set_index("lang").loc["fr", "n_docs"]) == 1


def test_median_all_equal_above_pull_limit(tmp_path, monkeypatch):
    """All-equal group larger than the pull bound resolves with NO value
    pull (degenerate-range shortcut)."""
    monkeypatch.setattr(Q, "_BOUNDARY_LIMIT", 4)
    vals = np.full(100, 3.75)
    types = np.array(["q"] * 100)
    sf = _write_sf(tmp_path, {"events": _events_table(vals, types)})
    got = _median_got(sf)
    assert got["med_value"].iloc[0] == 3.75 and int(got["n"].iloc[0]) == 100


def test_key_to_float_roundtrip():
    from agr_loader_ray.pipelines.queries import _float_keys, _key_to_float

    vals = np.array([-1e300, -1.5, -0.0, 0.0, 1e-300, 2.5, 1e300])
    for v in vals:
        k = int(_float_keys(np.array([v]))[0])
        assert _key_to_float(k) == v or (v == 0.0 and _key_to_float(k) == 0.0)


def test_closure_auto_dispatch_equivalence():
    """closure_auto(BFS path) ≡ closure_path_doubling on the same
    multi-parent DAG; threshold forces each path."""
    import pyarrow as pa

    import ray.data
    from agr_loader_ray.stages import closure as C

    k = np.arange(2, 400)
    child = np.concatenate([k, k[k % 3 == 0]])
    parent = np.concatenate([k // 2, k[k % 3 == 0] // 3])
    edges = ray.data.from_arrow(pa.table({
        "child": pa.array(child, pa.int64()),
        "parent": pa.array(parent, pa.int64()),
    }))

    via_bfs = C.closure_auto(edges).to_pandas()
    assert len(via_bfs) > 0

    old = C.BROADCAST_EDGE_LIMIT
    try:
        C.BROADCAST_EDGE_LIMIT = 0  # force the doubling path
        via_doubling = C.closure_auto(edges, packable=True).to_pandas()
    finally:
        C.BROADCAST_EDGE_LIMIT = old

    a = set(zip(via_bfs["node"], via_bfs["ancestor"]))
    b = set(zip(via_doubling["node"], via_doubling["ancestor"]))
    assert a == b


def test_closure_doubling_all_dispatch_paths():
    """Semi-naive doubling ≡ brute-force BFS on a multi-parent DAG for
    every dispatch combination: packable × (broadcast-delta, join
    fallback) — the join path is forced with broadcast_delta_limit=0."""
    import pyarrow as pa

    import ray.data
    from agr_loader_ray.stages import closure as C

    k = np.arange(2, 300)
    child = np.concatenate([k, k[k % 3 == 0]])
    parent = np.concatenate([k // 2, k[k % 3 == 0] // 3])
    pm: dict[int, list[int]] = {}
    for c_, p_ in zip(child.tolist(), parent.tolist()):
        pm.setdefault(c_, []).append(p_)
    want = set()
    for n in set(child.tolist()):
        seen: set[int] = set()
        stack = list(pm.get(n, []))
        while stack:
            a = stack.pop()
            if a in seen:
                continue
            seen.add(a)
            stack.extend(pm.get(a, []))
        want |= {(n, a) for a in seen}

    edges_t = pa.table({"child": pa.array(child, pa.int64()),
                        "parent": pa.array(parent, pa.int64())})
    for packable in (True, False):
        for lim in (C.BROADCAST_DELTA_LIMIT, 0):
            got = C.closure_path_doubling(
                ray.data.from_arrow(edges_t), packable=packable,
                broadcast_delta_limit=lim).to_pandas()
            assert set(zip(got["node"], got["ancestor"])) == want, (packable, lim)


def test_closure_bfs_vectorized_matches_brute_force():
    """Level-synchronized CSR BFS ≡ per-node brute force, including nodes
    absent from the edge vocabulary (no parents → no rows) and diamond
    re-convergence (each ancestor exactly once per node)."""
    import pyarrow as pa

    import ray.data
    from agr_loader_ray.stages import closure as C

    # diamond + chain + multi-parent: 10→{8,9}, 8→7, 9→7, 7→1; 20 isolated
    child = np.array([10, 10, 8, 9, 7, 30], dtype=np.int64)
    parent = np.array([8, 9, 7, 7, 1, 10], dtype=np.int64)
    edges_t = pa.table({"child": pa.array(child), "parent": pa.array(parent)})
    nodes = ray.data.from_arrow(pa.table({
        "node": pa.array([10, 7, 30, 999], pa.int64())}))
    got = C.closure_broadcast_bfs(nodes, edges_t).to_pandas()
    pairs = set(zip(got["node"], got["ancestor"]))
    assert pairs == {
        (10, 8), (10, 9), (10, 7), (10, 1),
        (7, 1),
        (30, 10), (30, 8), (30, 9), (30, 7), (30, 1),
    }
    # exactly-once: no duplicated (node, ancestor) rows from the diamond
    assert len(got) == len(pairs)


# ---------------------------------------------------------------------------
# Size-dispatched similarity queries: the blocked (no-broadcast) route
# must hash-match the broadcast route on the same input (VERDICT r3 #1).
# ---------------------------------------------------------------------------

def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def test_embedding_near_dup_blocked_equals_broadcast():
    from agr_loader_ray.pipelines.text_queries import embedding_near_dup_pairs

    sf = "/root/testdata/sf0.01"
    bc = _canon(embedding_near_dup_pairs(sf, mode="broadcast").to_pandas())
    bl = _canon(embedding_near_dup_pairs(sf, mode="blocked").to_pandas())
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, bl)


def test_mutual_topk_blocked_equals_broadcast():
    from agr_loader_ray.pipelines.linkage_queries import mutual_topk_pairs

    sf = "/root/testdata/sf0.01"
    bc = _canon(mutual_topk_pairs(sf, mode="broadcast").to_pandas())
    bl = _canon(mutual_topk_pairs(sf, mode="blocked").to_pandas())
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, bl)


def test_knn_edges_blocked_exact_vs_numpy():
    """Blocked k-NN edges on a synthetic table (many blocks forced) match
    an O(n^2) numpy reference with the (sim DESC, dst ASC) tie-break."""
    import ray.data as rd

    from agr_loader_ray.stages.similarity import (knn_edges_blocked,
                                                  round_half_away)

    rng = np.random.default_rng(11)
    n, d, k = 160, 8, 3
    mat = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.permutation(np.arange(100, 100 + 2 * n, 2)).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(mat),
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    got = (knn_edges_blocked(ds, k=k, n_blocks=7).to_pandas()
           .sort_values(["src", "sim", "dst"],
                        ascending=[True, False, True])
           .reset_index(drop=True))

    m = mat.astype(np.float64)
    nn = np.linalg.norm(m, axis=1)
    srt = np.argsort(ids)
    ids_s, mn = ids[srt], (m / nn[:, None])[srt]
    sims = round_half_away((m @ mn.T) / nn[:, None], 6)
    rows = []
    for i in range(n):
        s = sims[i].copy()
        s[np.searchsorted(ids_s, ids[i])] = -np.inf
        order = np.lexsort((ids_s, -s))[:k]
        for j in order:
            rows.append((ids[i], ids_s[j], s[j]))
    want = (pd.DataFrame(rows, columns=["src", "dst", "sim"])
            .sort_values(["src", "sim", "dst"], ascending=[True, False, True])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# Size-dispatched graph peels: the distributed routes (edges / node set
# never driver-resident) must match the driver routes (VERDICT r3 #4).
# ---------------------------------------------------------------------------

def test_kcore_distributed_peel_equals_driver():
    from agr_loader_ray.pipelines.graph_queries import kcore_nodes

    sf = "/root/testdata/sf0.01"
    drv = _canon(kcore_nodes(sf).to_pandas())
    dist = _canon(kcore_nodes(sf, driver_edge_limit=0).to_pandas())
    assert len(drv) > 0
    pd.testing.assert_frame_equal(drv, dist)


def test_dag_depth_sharded_bfs_equals_driver(tmp_path):
    from agr_loader_ray.pipelines.timeseries_queries import dag_depth_levels

    sf = "/root/testdata/sf0.01"
    drv = _canon(dag_depth_levels(sf).to_pandas())
    dist = _canon(dag_depth_levels(sf, driver_node_limit=0).to_pandas())
    assert len(drv) > 0
    pd.testing.assert_frame_equal(drv, dist)

    # sparse key set: root key 1 absent, so BFS must proceed through the
    # forced {2, 3} level-1 seeds; unreachable keys emit no rows
    keys = np.array([2, 3, 6, 13, 27, 999], np.int64)  # 13: 13//2=6 reach
    part = pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array([f"p{k}" for k in keys], pa.string()),
        "p_brand": pa.array(["B"] * len(keys), pa.string()),
        "p_retailprice": pa.array([1.0] * len(keys), pa.float64()),
    })
    sf2 = _write_sf(tmp_path, {"part": part})
    drv2 = _canon(dag_depth_levels(sf2).to_pandas())
    dist2 = _canon(dag_depth_levels(sf2, driver_node_limit=0).to_pandas())
    pd.testing.assert_frame_equal(drv2, dist2)
