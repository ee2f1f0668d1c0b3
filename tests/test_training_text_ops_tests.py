"""Tokenizer-training pair counts, token-familiarity scores (both attach
paths), and incremental new-batch dedup: typed-hash gate parity plus
path-equivalence and unicode-safety units."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry
from agr_loader_ray.pipelines.text_queries import token_familiarity_scores

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


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


@pytest.mark.parametrize("name", ["bpe_merge_pairs",
                                  "token_familiarity_scores",
                                  "incremental_dedup_new_docs"])
def test_training_text_query_typed_hash(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    got = qs[name](SF).to_pandas()
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0]
    assert g[1] == w[1]


def test_familiarity_join_path_equals_broadcast_path():
    """broadcast_limit=0 forces the explode+hash-join scale path; results
    must be identical to the broadcast-dict path."""
    a = token_familiarity_scores(SF).to_pandas().reset_index(drop=True)
    b = token_familiarity_scores(SF, broadcast_limit=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()], check_dtype=True)


def test_bpe_pair_packing_unicode_safe(tmp_path):
    """Non-ASCII codepoints survive the packed-int64 round trip: counts
    over a synthetic unicode corpus match a naive Python counter."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["héllo wörld", "héllo héllo", "日本語 テスト", "ab", "日本"]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": list(range(len(texts))), "text": texts,
        "lang": ["x"] * len(texts), "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts]}), d / "documents.parquet")

    got = entry.queries()["bpe_merge_pairs"](str(d)).to_pandas()
    naive = collections.Counter()
    for t in texts:
        for i in range(len(t) - 1):
            naive[t[i:i + 2]] += 1
    top = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(map(tuple, got[["pair", "cnt"]].itertuples(index=False))) == top
