"""Typed-hash gate pins (the driver's exact compare) for the round-3
late-session operator batch, at sf0.001 so the suite stays fast."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

PINNED = [
    "linenumber_gap_audit",
    "multimodal_image_resize",
    "bm25_topk_docs",
    "fk_childless_orders",
    "cusum_alarm_counts",
    "kmeans_int_clusters",
    "relational_division_users",
    "event_trigram_topk",
    "grouping_sets_order_stats",
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
def test_r3c_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def test_fk_childless_join_path_equals_broadcast_path():
    from agr_loader_ray.pipelines.relational_queries import fk_childless_orders

    a = fk_childless_orders(SF).to_pandas().reset_index(drop=True)
    b = fk_childless_orders(SF, broadcast_limit=0) \
        .to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()], check_dtype=True)
