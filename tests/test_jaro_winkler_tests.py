"""Bitset Jaro-Winkler kernel: property check vs a direct per-pair
reference implementation (random strings exercise window clamps, ties,
transpositions, zero-match pairs), plus the typed-hash gate pin."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry
from agr_loader_ray.pipelines.linkage_queries import (_JW_THRESHOLD,
                                                      _jw_pairs_kernel)

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _jaro_ref(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    md = max(max(la, lb) // 2 - 1, 0)
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i, ca in enumerate(a):
        for j in range(max(0, i - md), min(lb, i + md + 1)):
            if not bm[j] and b[j] == ca:
                bm[j] = True
                am[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t, k = 0, 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jw_ref(a: str, b: str) -> float:
    j = _jaro_ref(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def _ref_pairs(ents):
    out = []
    for i in range(len(ents)):
        for j in range(i + 1, len(ents)):
            s = _jw_ref(ents[i], ents[j])
            if s >= _JW_THRESHOLD:
                out.append((ents[i], ents[j], s))
    return sorted(out)


def test_kernel_matches_reference_on_random_strings():
    rng = np.random.default_rng(42)
    alpha = np.array(list("abcdeXY #12"))
    ents = sorted({
        "".join(rng.choice(alpha, rng.integers(1, 28)))
        for _ in range(120)
    })
    ents = np.array(ents, object)
    got = _jw_pairs_kernel(ents)
    got_rows = sorted(zip(got["ent_a"], got["ent_b"], got["jw"]))
    want = _ref_pairs(list(ents))
    assert len(got_rows) == len(want)
    for g, w in zip(got_rows, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == w[2]  # bit-identical doubles


def test_kernel_near_duplicate_cluster():
    """Hand-built near-dups: every score must be the reference's, and
    the obvious near-identical pair must survive the threshold."""
    ents = np.array(sorted([
        "small bolt ECONOMY Brand#12",
        "small bolt ECONOMY Brand#13",
        "small bolt PROMO Brand#12",
        "large anvil STANDARD Brand#9",
    ]), object)
    got = _jw_pairs_kernel(ents)
    pairs = set(zip(got["ent_a"], got["ent_b"]))
    assert ("small bolt ECONOMY Brand#12", "small bolt ECONOMY Brand#13") in pairs
    for a, b, s in zip(got["ent_a"], got["ent_b"], got["jw"]):
        assert s == _jw_ref(a, b) >= _JW_THRESHOLD


def test_jaro_winkler_pairs_typed_hash():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    got = qs["jaro_winkler_pairs"](SF).to_pandas()
    want = con.sql(oracles["jaro_winkler_pairs"]).arrow().to_pandas()
    con.close()

    def th(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
        return (tuple(str(df[c].dtype) for c in df.columns),
                int(pd.util.hash_pandas_object(df, index=False).sum()))

    assert len(got) == len(want) > 0
    assert th(got) == th(want)


def test_kernel_all_equal_length_no_pad():
    """Every string exactly L bytes: no pad class exists, and the
    smallest real char class must NOT be zeroed (the lut[0] alias)."""
    ents = np.array(sorted(["aabbcc", "aabbcd", "zzaabb", "aabbce"]), object)
    got = _jw_pairs_kernel(ents)
    got_rows = sorted(zip(got["ent_a"], got["ent_b"], got["jw"]))
    want = _ref_pairs(list(ents))
    assert len(got_rows) == len(want)
    for g, w in zip(got_rows, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]


def test_jw_kernel_non_ascii_matches_duckdb_bytes():
    """DuckDB's jaro_winkler_similarity is BYTE-wise (probed:
    'héllo' vs 'hello' = 0.84, the 6-byte reading).  The kernel must
    agree on non-ASCII input."""
    ents = np.array(sorted(["héllo wörld", "hello world", "héllo wurld"]),
                    object)
    got = _jw_pairs_kernel(ents)
    con = duckdb.connect()
    for a, b, s in zip(got["ent_a"], got["ent_b"], got["jw"]):
        want = con.sql("select jaro_winkler_similarity(?, ?)",
                       params=[a, b]).fetchone()[0]
        assert s == want
    # byte-level reference agrees too (jw over encoded bytes)
    for a, b, s in zip(got["ent_a"], got["ent_b"], got["jw"]):
        assert s == _jw_ref(a.encode(), b.encode())


def test_levenshtein_non_ascii_matches_duckdb_bytes():
    """DuckDB levenshtein('café','cafe') = 2 — byte-wise.  The DP must
    agree AND not crash on non-ASCII (the former codepoint-length /
    byte-buffer shape mismatch)."""
    from agr_loader_ray.pipelines.relational_queries import _levenshtein_pairs

    a = ["café", "naïve", "héllo", "abc", "",  "ぁa"]
    b = ["cafe", "naive", "hello", "abd", "é", "aぁ"]
    got = _levenshtein_pairs(a, b)
    con = duckdb.connect()
    for x, y, d in zip(a, b, got):
        want = con.sql("select levenshtein(?, ?)", params=[x, y]).fetchone()[0]
        assert d == want, (x, y, d, want)
