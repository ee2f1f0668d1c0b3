"""Typed-hash gate pins for the linkage batch (sorted-neighborhood
blocking, mutual-kNN pairs, weekday seasonality) at sf0.001, plus a
brute-force cross-check of the SNM window semantics."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

PINNED = [
    "snm_candidate_pairs",
    "mutual_topk_pairs",
    "seasonality_weekday_index",
    "covered_time_per_user",
    "golden_record_attrs",
    "ppjoin_pairs",
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
def test_linkage_query_typed_hash(name, oracle_con, ray_session):
    qs, oracles = entry.queries(), entry.oracle_sql()
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_snm_window_brute_force(ray_session):
    """Distributed halo-exchange pairing equals a single-process sort +
    sliding window, including pairs that straddle rank-block borders."""
    import pyarrow.parquet as pq

    from agr_loader_ray.pipelines.linkage_queries import snm_candidate_pairs

    # tiny block size forces MANY halo crossings
    got = snm_candidate_pairs(SF, window=2, block=16).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs["key"] = docs["text"].str.slice(0, 12)
    docs = docs.sort_values(["key", "doc_id"], kind="mergesort").reset_index(drop=True)
    want = set()
    for d in (1, 2):
        for i in range(len(docs) - d):
            if docs["key"].iloc[i][:4] == docs["key"].iloc[i + d][:4]:
                want.add((int(docs["doc_id"].iloc[i]),
                          int(docs["doc_id"].iloc[i + d])))
    assert set(zip(got["doc_a"], got["doc_b"])) == want


def test_ppjoin_equals_brute_force(ray_session):
    """Prefix filtering loses NOTHING: the PPJoin pair set equals the
    brute-force all-pairs exact-Jaccard set at the same threshold."""
    import pyarrow.parquet as pq

    from agr_loader_ray.pipelines.linkage_queries import ppjoin_pairs
    from agr_loader_ray.stages.dedup import jaccard_ngram

    got = ppjoin_pairs(SF, threshold=0.6, k=5).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["text"].str.len() >= 5]
    rows = list(zip(docs["doc_id"], docs["text"]))
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            lo, hi = (a, b) if a[0] < b[0] else (b, a)
            jac = jaccard_ngram(lo[1], hi[1], k=5)
            if jac >= 0.6:
                want[(int(lo[0]), int(hi[0]))] = jac
    got_map = {(int(r.id_a), int(r.id_b)): r.jaccard
               for r in got.itertuples()}
    assert got_map.keys() == want.keys()
    for p, jac in want.items():
        assert got_map[p] == jac


def test_ppjoin_exchange_attach_path_equals_broadcast():
    """The >2M-distinct-shingle scale path (tagged-union + one h-keyed
    exchange attach; replaced Dataset.join, which crawls on per-row
    Python hashing at sf0.1 cardinality) must produce the identical
    pair set as the broadcast attach."""
    import pandas as pd

    from agr_loader_ray.pipelines.linkage_queries import ppjoin_pairs

    a = (ppjoin_pairs(SF).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    b = (ppjoin_pairs(SF, broadcast_limit=0).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
