"""Ray pipeline vs DuckDB oracle equality for every registered query.

Mirrors the driver's correctness gate: run QUERIES[name](sf_dir) and
ORACLE_SQL[name] on the same parquet tables, compare row count, schema
(column names) and values order-insensitively.
"""

import duckdb
import pandas as pd
import pytest

import agr_loader_ray.pipelines.interactions  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.protein  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.variants  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.text_queries  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.stats_queries  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.sketch_queries  # noqa: F401  (registers queries)
import agr_loader_ray.pipelines.relational_queries  # noqa: F401  (registers queries)
from agr_loader_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def duck_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # go through Arrow (like the driver) so decimal128/hugeint results keep
    # their type instead of being silently lowered to float64 by .df()
    return con.sql(sql).arrow().to_pandas()


def compare(got: pd.DataFrame, want: pd.DataFrame):
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    # the driver's value hash is dtype-sensitive: a DuckDB decimal128 vs an
    # engine int64 hash-mismatches even when values are equal — catch it here
    for c in got.columns:
        assert got[c].dtype.kind == want[c].dtype.kind, (
            c, got[c].dtype, want[c].dtype,
            "dtype-kind mismatch: CAST the oracle aggregate (driver hash is typed)",
        )
    key = list(got.columns)
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLE_SQL)))
def test_query_matches_oracle(name):
    got = _to_pandas(QUERIES[name](SF_DIR))
    want = duck_oracle(ORACLE_SQL[name], SF_DIR)
    compare(got, want)


def test_every_query_has_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_levenshtein_pairs_matches_reference():
    from agr_loader_ray.pipelines.relational_queries import _levenshtein_pairs

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    pairs = [("kitten", "sitting"), ("", "abc"), ("abc", ""), ("same", "same"),
             ("a", "b"), ("red widget", "blue widget"), ("ab", "ba"),
             ("small ring", "small gizmo"), ("x" * 30, "x" * 29 + "y")]
    got = _levenshtein_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    want = [ref(a, b) for a, b in pairs]
    assert list(got) == want
