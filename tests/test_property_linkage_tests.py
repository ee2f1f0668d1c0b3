"""Random-corpus typed-hash gate for the sketch-dedup and embedding
linkage families (the VERDICT r3 item-10 extension: linkage/PPJoin got
the first harness in ``test_property_textsim_tests``; this adds the
MinHash/SimHash candidate+verify surface and the cosine-similarity
pair queries, including a forced run of each size-dispatched query's
BLOCKED scale path on the same random input).

Adversarial shapes the fixed fixtures can't reach: exact-duplicate
documents (hot LSH buckets), single-edit near-duplicates, docs shorter
than the shingle width (zero banded rows — the empty-schema edge),
duplicate embedding vectors (cosine exactly 1.0, rank ties broken by
id), and integer-lattice embeddings keeping rounded cosines away from
the round(…, 6) boundary so Ray/DuckDB float summation order can't
flip the 6th decimal."""

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

DOC_QUERIES = [
    "minhash_near_dup",
    "simhash_near_dup",
    "minhash_verified_pairs",
    "snm_candidate_pairs",
]

EMB_QUERIES = [
    "embedding_near_dup_pairs",
    "mutual_topk_pairs",
]

_WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
          "dog", "data", "lake", "épée", "übung", "stream", "shuffle"]


@st.composite
def documents_frame(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n = draw(st.integers(min_value=4, max_value=32))
    texts = []
    for _ in range(n):
        kind = rng.integers(0, 5)
        if kind == 0 and texts:
            texts.append(texts[rng.integers(0, len(texts))])  # exact dup
        elif kind == 1 and texts:
            base = texts[rng.integers(0, len(texts))]
            j = int(rng.integers(0, max(len(base), 1)))
            texts.append(base[:j] + "x" + base[j + 1:])       # near-dup
        elif kind == 2:
            texts.append("ab"[: int(rng.integers(0, 3))])     # < shingle k
        else:
            k = int(rng.integers(1, 12))
            texts.append(" ".join(
                _WORDS[w] for w in rng.integers(0, len(_WORDS), size=k)))
    langs = np.array(["en", "de"], object)[rng.integers(0, 2, size=n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": np.array(texts, object),
        "lang": langs,
        "source": np.array(["web"] * n, object),
        "n_chars": np.array([len(t) for t in texts], np.int64),
    })


@st.composite
def embeddings_table(draw):
    """Integer-lattice embeddings (dim 8, coords in [-2, 2]) with
    deliberate exact-duplicate vectors; all-zero vectors are nudged
    (DuckDB's list_cosine_similarity NaNs on a zero vector — a
    legitimate semantic gap, not the property under test)."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    n = draw(st.integers(min_value=4, max_value=24))
    mat = rng.integers(-2, 3, size=(n, 8)).astype(np.float32)
    for i in range(n):
        if rng.integers(0, 4) == 0 and i > 0:
            mat[i] = mat[rng.integers(0, i)]  # exact duplicate vector
        if not mat[i].any():
            mat[i, 0] = 1.0
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 3, size=n).astype(np.int32)),
    })


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
        return  # emptiness agreement IS the property (schema drops on empty)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], (dict(got.dtypes.astype(str)),
                          dict(want.dtypes.astype(str)))
    assert g[1] == w[1]


@pytest.mark.parametrize("name", DOC_QUERIES)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(frame=documents_frame())
def test_random_documents_sketch_match_oracle(name, frame, tmp_path_factory,
                                              ray_session):
    sf = str(tmp_path_factory.mktemp("sf"))
    frame.to_parquet(os.path.join(sf, "documents.parquet"), index=False)
    _compare(entry.queries()[name](sf), _oracle(sf, "documents", name))


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(tbl=embeddings_table())
def test_random_embeddings_match_oracle(name, tbl, tmp_path_factory,
                                        ray_session):
    sf = str(tmp_path_factory.mktemp("sf"))
    pq.write_table(tbl, os.path.join(sf, "embeddings.parquet"))
    _compare(entry.queries()[name](sf), _oracle(sf, "embeddings", name))


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(tbl=embeddings_table())
def test_random_embeddings_blocked_path_match_oracle(name, tbl,
                                                     tmp_path_factory,
                                                     ray_session):
    """Force the size-dispatched queries down their BLOCKED (100 TB)
    path on the same random input — the broadcast/blocked equivalence
    the r3 verdict asked to pin (size-dispatch of the two former
    broadcast-matrix queries)."""
    from agr_loader_ray.pipelines.linkage_queries import mutual_topk_pairs
    from agr_loader_ray.pipelines.text_queries import embedding_near_dup_pairs

    fn = {"embedding_near_dup_pairs": embedding_near_dup_pairs,
          "mutual_topk_pairs": mutual_topk_pairs}[name]
    sf = str(tmp_path_factory.mktemp("sf"))
    pq.write_table(tbl, os.path.join(sf, "embeddings.parquet"))
    _compare(fn(sf, mode="blocked"), _oracle(sf, "embeddings", name))
