"""Substring-containment dedup + BOM rollup: typed-hash gate parity and
a synthetic corpus exercising mid-token (char-offset) containment, which
token-shingle candidate generators would miss."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry
from agr_loader_ray.pipelines.sketch_queries import (_first_hash_batch,
                                                     _window_hashes_batch)

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


@pytest.mark.parametrize("name", ["substring_containment_pairs",
                                  "bom_cost_rollup"])
def test_typed_hash_parity(name, oracle_con):
    qs, oracles = entry.queries(), entry.oracle_sql()
    got = qs[name](SF).to_pandas()
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want)
    assert _typed_hash(got) == _typed_hash(want)


def test_containment_mid_token_occurrence(tmp_path):
    """'low fast table scan' occurs inside '... slow fast table scan ...'
    starting mid-token: the char-window candidate generator must find it."""
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5], np.int64),
        "text": [
            "low fast table scan",                         # inside doc 2 mid-token
            "the very slow fast table scan of the lake",   # container
            "completely unrelated content goes here",
            "identical twin document body text here",      # == doc 5
            "identical twin document body text here",
        ],
        "lang": ["en"] * 5, "source": ["t"] * 5,
        "n_chars": np.array([0] * 5, np.int64),
    })
    sf = str(tmp_path)
    docs.to_parquet(os.path.join(sf, "documents.parquet"))
    got = entry.queries()["substring_containment_pairs"](sf).to_pandas()
    pairs = set(zip(got["contained_id"], got["container_id"]))
    assert (1, 2) in pairs          # mid-token char-offset containment
    assert (4, 5) in pairs          # exact dup counted once, id order
    assert (5, 4) not in pairs
    assert all(a != b for a, b in pairs)


def test_window_hash_no_cross_doc_windows():
    """Windows that straddle two documents must not be emitted: a pair of
    short docs whose concatenation contains a third doc's prefix must not
    create a candidate."""
    t = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["abcdefgh12345678", "ZYXWVUTS87654321"]),
    })
    out = _window_hashes_batch(t).to_pandas()
    # doc 10 has exactly 1 window (len 16), doc 11 exactly 1
    assert (out.groupby("container_id").size() == 1).all()
    first = _first_hash_batch(t).to_pandas()
    assert set(first["contained_id"]) == {10, 11}
    # the doc's own first-window hash equals its (only) window hash
    m = first.merge(out, left_on=["contained_id", "h"],
                    right_on=["container_id", "h"])
    assert len(m) == 2


def test_bom_rollup_diamond_counts_once():
    """In the k→k//2 / k→k//3 DAG, node 6 reaches ancestor 1 via both
    3 and 2 — n_desc for ancestor 1 must count node 6 once.  Verified
    against a driver-side closure on sf0.001."""
    got = entry.queries()["bom_cost_rollup"](SF).to_pandas()
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_retailprice"])
    keys = part["p_partkey"].to_numpy(np.int64)
    cents = np.round(part["p_retailprice"].to_numpy() * 100).astype(np.int64)
    price = dict(zip(keys, cents))
    parents = {}
    for k in keys:
        ps = set()
        if k >= 2:
            ps.add(k // 2)
        if k >= 3 and k % 3 == 0:
            ps.add(k // 3)
        parents[k] = ps
    from collections import defaultdict
    desc = defaultdict(set)
    for k in keys:
        stack, seen = [k], set()
        while stack:
            cur = stack.pop()
            for p in parents.get(cur, set()) if cur in parents else set():
                if p not in seen:
                    seen.add(p)
                    stack.append(p)
        for a in seen:
            desc[a].add(k)
    ref = pd.DataFrame(
        [(a, len(ds), sum(price[d] for d in ds))
         for a, ds in desc.items()],
        columns=["ancestor", "n_desc", "subtree_cents"],
    ).sort_values("ancestor").reset_index(drop=True)
    got = got.sort_values("ancestor").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_containment_broadcast_attach_equivalence():
    """The hybrid verify dispatch (broadcast pair-index under the 2M
    bound / full keyed text attach above it) must produce identical
    pairs on the same input — the size-dispatch equivalence pin the
    other hybrid queries carry."""
    from agr_loader_ray.pipelines.sketch_queries import (
        substring_containment_pairs)

    a = substring_containment_pairs(SF, mode="broadcast").to_pandas() \
        .sort_values(["contained_id", "container_id"]).reset_index(drop=True)
    b = substring_containment_pairs(SF, mode="attach").to_pandas() \
        .sort_values(["contained_id", "container_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
