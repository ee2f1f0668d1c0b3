"""Sketch-op verification against exact baselines (rows-only driver gate
is backed by these exactness/recall tests — SURVEY §5 strategy)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from agr_loader_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    _shingle_hashes,
    jaccard_ngram,
    minhash_lsh_candidates,
    resolve_duplicate_groups,
    simhash_near_dup_pairs,
)


def _docs():
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through the field "
        "until it reaches the river bank where it stops to drink some water quietly"
    )
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("quick", "swift")},          # near-dup of 0
        {"doc_id": 2, "text": base},                                     # exact dup of 0
        {"doc_id": 3, "text": "completely different content about spark ray data pipelines and arrow batches in distributed execution engines with backpressure"},
        {"doc_id": 4, "text": "another unrelated document mentioning parquet manifests epochs tombstones and schema evolution in lake architectures"},
    ]
    return rows


def test_shingle_hashes_deterministic():
    a = _shingle_hashes("hello world", 5)
    b = _shingle_hashes("hello world", 5)
    assert (a == b).all()
    assert len(a) == len("hello world".encode()) - 4


def test_minhash_estimates_jaccard():
    rows = _docs()
    mh = MinHasher(num_perm=128)
    s0, s1 = mh.signature(rows[0]["text"]), mh.signature(rows[1]["text"])
    est = (s0 == s1).mean()
    true = jaccard_ngram(rows[0]["text"], rows[1]["text"])
    assert abs(est - true) < 0.15
    s3 = mh.signature(rows[3]["text"])
    assert (s0 == s3).mean() < 0.2


def test_minhash_lsh_finds_near_dups():
    ds = ray.data.from_items(_docs())
    pairs = minhash_lsh_candidates(ds, num_perm=64, bands=16).to_pandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].to_numpy()}
    assert (0, 2) in got          # exact dup always found
    assert (0, 1) in got or (1, 2) in got   # near-dup found
    assert (0, 3) not in got and (3, 4) not in got


def test_simhash_near_dup_pairs():
    ds = ray.data.from_items(_docs())
    pairs = simhash_near_dup_pairs(ds, max_hamming=3).to_pandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].to_numpy()}
    assert (0, 2) in got          # identical docs: hamming 0
    assert (3, 4) not in got


def test_simhash_identical_same_sig():
    sh = SimHasher()
    assert sh.signature("same text here") == sh.signature("same text here")


def test_resolve_duplicate_groups_union_find():
    labels = resolve_duplicate_groups([(1, 2), (2, 3), (10, 11)])
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10


def test_label_propagation_matches_union_find():
    """Distributed min-label propagation ≡ driver union-find on random
    pair graphs (chains force multi-round propagation)."""
    import pyarrow as pa

    from agr_loader_ray.stages.dedup import (
        resolve_duplicate_groups,
        resolve_duplicate_groups_distributed,
    )

    rng = np.random.default_rng(11)
    # random components + a long chain (diameter ~ 12) + an isolated pair
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 200, size=(150, 2)) if a != b]
    pairs += [(1000 + i, 1001 + i) for i in range(12)]
    pairs += [(5000, 5001)]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]

    want = resolve_duplicate_groups(pairs)

    ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    got_df = resolve_duplicate_groups_distributed(ds).to_pandas()
    got = dict(zip(got_df["doc_id"], got_df["group"]))
    assert got == want


def test_lsh_no_collisions_returns_empty():
    """Genuinely distinct random texts: no LSH bucket collides; the
    semi-join prefilter must short-circuit to an empty pair set."""
    import pyarrow as pa

    from agr_loader_ray.stages.dedup import minhash_lsh_candidates

    rng = np.random.default_rng(3)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    texts = ["".join(rng.choice(alphabet, 120)) for _ in range(20)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(20), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = minhash_lsh_candidates(ds)
    # schema is lazy since the single-exchange rewrite (typed-empty seed
    # unioned ahead of the groupby) — fetch executes the tiny pipeline
    assert out.schema(fetch_if_missing=True).names == ["id_a", "id_b"]
    assert out.count() == 0


def test_verify_pairs_jaccard():
    """Verified pairs ⊆ candidates; scores equal direct jaccard; only
    ≥ threshold survive."""
    import pyarrow as pa

    from agr_loader_ray.stages.dedup import (
        jaccard_ngram,
        minhash_lsh_candidates,
        verify_pairs_jaccard,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    texts = [base, base + " x", base + " yy", "completely different text about shipping logistics"]
    docs_tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                         "text": pa.array(texts, pa.string())})
    docs = ray.data.from_arrow(docs_tbl)
    cand = minhash_lsh_candidates(docs).materialize()
    cand_pairs = {(r["id_a"], r["id_b"]) for r in cand.take_all()}
    out = verify_pairs_jaccard(cand, docs, threshold=0.5).to_pandas()
    for _, r in out.iterrows():
        pair = (int(r["id_a"]), int(r["id_b"]))
        assert pair in cand_pairs
        assert r["jaccard"] == jaccard_ngram(texts[pair[0]], texts[pair[1]])
        assert r["jaccard"] >= 0.5
    # the three near-identical docs must all verify against each other
    assert {(0, 1), (0, 2), (1, 2)} <= {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}


def test_sub_k_shingle_fallback_matches_oracle_sql():
    """Sub-k docs hash via the SAME code-point polynomial (one window,
    shorter length) on both sides — the minhash-family oracles cover
    every doc with no length(text) >= k exclusion."""
    import duckdb

    from agr_loader_ray.pipelines.sketch_sql import _shingle_ctes
    from agr_loader_ray.stages.dedup import _shingle_hashes

    docs = ["", "a", "ab", "abcd", "abcde", "héllo wörld", "ぁあ"]
    con = duckdb.connect()
    con.sql("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(docs):
        con.sql("INSERT INTO d VALUES (?, ?)", params=[i, t])
    sql = f"WITH {_shingle_ctes(5, source='d')} " \
          "SELECT doc_id, h FROM shh ORDER BY doc_id, h"
    got_sql = {}
    for doc_id, h in con.sql(sql).fetchall():
        got_sql.setdefault(doc_id, []).append(int(h) % (1 << 64))
    for i, t in enumerate(docs):
        want = sorted(int(x) for x in _shingle_hashes(t, 5))
        assert sorted(got_sql[i]) == want, (i, t)
