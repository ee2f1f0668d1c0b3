"""Round-3 training-data operators: context-window packing, repetition
stats, PII scrub, repeat-turn QA — asserted with the driver's exact
typed-hash compare (sorted columns, mergesort rows, dtype-sensitive
pandas value hash) plus an independent pure-Python greedy reference for
the packing semantics.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

NEW_OPS = [
    "pack_context_windows",
    "token_repetition_stats",
    "pii_scrub_counts",
    "repeat_turn_counts",
    "decontaminate_overlap",
    "left_outer_order_counts",
    "pivot_event_type_counts",
    "kmv_distinct_estimate",
    "rolling_sum4_per_user",
    "quartiles_value_per_type",
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


@pytest.mark.parametrize("name", NEW_OPS)
def test_training_op_typed_hash(name, oracle_con, ray_session):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    res = qs[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    want = oracle_con.sql(oracles[name]).arrow().to_pandas()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _typed_hash(got), _typed_hash(want)
    assert g[0] == w[0], f"{name}: dtypes {g[0]} != {w[0]}"
    assert g[1] == w[1], f"{name}: value hash mismatch"


def test_pack_semantics_vs_greedy_reference(ray_session):
    """The searchsorted bin kernel ≡ the sequential greedy definition,
    including oversized docs (own bin) and budget-exact fits."""
    from agr_loader_ray.pipelines.text_queries import (PACK_BUDGET, PACK_SHARDS,
                                                       pack_context_windows)

    got = pack_context_windows(SF).to_pandas()
    # independent reference: sequential greedy per shard
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs["n_tokens"] = docs["text"].str.split(" ").str.len()
    docs["shard"] = docs["doc_id"] % PACK_SHARDS
    frames = []
    for shard, g in docs.sort_values("doc_id").groupby("shard"):
        cum, b, bins = 0, 0, []
        for n in g["n_tokens"]:
            if cum + n <= PACK_BUDGET and cum > 0:
                cum += n
            elif cum == 0:
                cum = n
            else:
                b += 1
                cum = n
            bins.append(b)
        frames.append(pd.DataFrame({"doc_id": g["doc_id"], "bin_id": bins}))
    ref = pd.concat(frames)
    merged = got.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert len(merged) == len(got) == len(ref)
    assert (merged["bin_id"] == merged["bin_id_ref"]).all()
    # every bin within budget unless it is a single oversized doc
    per_bin = got.groupby(["shard", "bin_id"]).agg(
        total=("n_tokens", "sum"), n=("n_tokens", "size"))
    bad = per_bin[(per_bin["total"] > PACK_BUDGET) & (per_bin["n"] > 1)]
    assert bad.empty


def test_decontam_join_path_equivalent(oracle_con, ray_session):
    """broadcast_limit=0 forces the distributed left_semi path; it must
    produce the identical typed-hash result as the broadcast path."""
    import pyarrow.compute as pc

    from agr_loader_ray.functions.tables import read_table
    from agr_loader_ray.stages.decontam import contaminated_docs

    docs = read_table(SF, "documents", columns=["doc_id", "text", "source"])

    def side(bench):
        op = pc.equal if bench else pc.not_equal
        return docs.map_batches(
            lambda t, op=op: t.filter(op(t["source"], "src0"))
                              .select(["doc_id", "text"]),
            batch_format="pyarrow", zero_copy_batch=True)

    got = contaminated_docs(side(False), side(True), k=4,
                            broadcast_limit=0).to_pandas()
    want = oracle_con.sql(
        entry.oracle_sql()["decontaminate_overlap"]).arrow().to_pandas()
    assert _typed_hash(got) == _typed_hash(want)


def test_ngram_hash_kernel_vs_python():
    """token_ngram_hashes ≡ per-doc Python shingling on a handcrafted
    batch with short docs (< k tokens), repeats, and empty-ish rows."""
    import pyarrow as pa

    from agr_loader_ray.stages.decontam import token_ngram_hashes

    texts = ["a b c d e f", "a b c", "x x x x x", "q w e r"]
    doc_idx, h = token_ngram_hashes(pa.array(texts), k=4)
    # doc 0: 3 windows; doc 1: 0; doc 2: 2 (identical); doc 3: 1
    assert list(np.bincount(doc_idx, minlength=4)) == [3, 0, 2, 1]
    # identical windows hash identically ('x x x x' twice)
    d2 = h[doc_idx == 2]
    assert d2[0] == d2[1]
    # same window text in different docs hashes identically
    t2 = ["a b c d", "z z a b c d"]
    di2, h2 = token_ngram_hashes(pa.array(t2), k=4)
    assert h2[di2 == 0][0] == h2[di2 == 1][-1]


def test_greedy_pack_bins_property():
    """hypothesis: the searchsorted kernel ≡ the sequential greedy
    definition on adversarial inputs (exact fits, oversized docs,
    zero-length edge, long runs of equal sizes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from agr_loader_ray.stages.text import greedy_pack_bins

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=700), max_size=60),
           st.integers(min_value=1, max_value=600))
    def check(toks, budget):
        got = greedy_pack_bins(np.array(toks, dtype=np.int64), budget)
        cum, b, ref = 0, 0, []
        for n in toks:
            if cum == 0 or cum + n <= budget:
                cum += n
            else:
                b += 1
                cum = n
            ref.append(b)
        assert list(got) == ref

    check()


def test_kmv_estimate_accuracy(oracle_con, ray_session):
    """The KMV estimate lands within the sketch's expected relative
    error (~1/sqrt(k-1) ≈ 12.6% at k=64; allow 3σ) of the exact
    distinct count — the sketch is a real estimator, not a pass-through."""
    import __ray_entry__ as e

    got = e.queries()["kmv_distinct_estimate"](SF).to_pandas()
    exact = oracle_con.sql(
        "SELECT event_type, count(DISTINCT user_id) AS nd "
        "FROM events GROUP BY event_type").df()
    m = got.merge(exact, on="event_type")
    rel = (m["n_distinct_est"] - m["nd"]).abs() / m["nd"]
    assert (rel <= 3 / np.sqrt(63)).all(), m


def test_repetition_bounds(ray_session):
    from agr_loader_ray.pipelines.text_queries import token_repetition_stats

    df = token_repetition_stats(SF).to_pandas()
    assert (df["n_distinct_tokens"] <= df["n_tokens"]).all()
    assert (df["n_distinct_tokens"] > 0).all()


def test_pii_scrub_monotonic(ray_session):
    """Redacting k matches changes length by sum(len('[PII]') - len(match));
    spot-check one doc end-to-end in pure Python."""
    import re

    from agr_loader_ray.pipelines.text_queries import (_PII_PATTERN,
                                                       pii_scrub_counts)

    df = pii_scrub_counts(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    for did in list(docs.index[:5]):
        text = docs.loc[did, "text"]
        want_n = len(re.findall(_PII_PATTERN, text))
        want_len = len(re.sub(_PII_PATTERN, "[PII]", text))
        assert df.loc[did, "n_redacted"] == want_n
        assert df.loc[did, "scrubbed_len"] == want_len


def test_quantiles_histogram_refine_path(ray_session, monkeypatch):
    """Shrinking the pull bound + bucket count forces multiple histogram
    refine rounds; the result must equal the single-pass sort answer."""
    import pyarrow as pa
    import ray.data as rd

    import agr_loader_ray.stages.quantiles as qmod

    monkeypatch.setattr(qmod, "_BOUNDARY_LIMIT", 8)
    monkeypatch.setattr(qmod, "_BUCKETS", 4)

    rng = np.random.default_rng(7)
    groups = np.repeat(["a", "b"], 5000)
    keys = np.concatenate([
        rng.integers(-2**62, 2**62, 5000),   # wide range: many rounds
        rng.integers(0, 50, 5000),            # heavy ties
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": pa.array(groups), "k": pa.array(keys)}))
    res = qmod.exact_group_quantiles(ds, "g", "k",
                                     quantiles=((1, 4), (1, 2), (3, 4)))
    for g, vals in (("a", keys[:5000]), ("b", keys[5000:])):
        s = np.sort(vals)
        n = len(s)
        for qi, (num, den) in enumerate(((1, 4), (1, 2), (3, 4))):
            rank = qmod.quantile_disc_rank(num, den, n)
            assert res[g][qi] == s[rank], (g, qi)
