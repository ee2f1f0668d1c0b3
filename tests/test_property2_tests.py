"""Property-based tests (hypothesis) for round-2 pure kernels:
codon translation, cartesian list product, float ordering keys,
camelCase munge, date cascade."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from agr_loader_ray.functions.codon import (
    STOP_CODONS,
    reverse_complement,
    translate,
    translate_cds_checked,
    translate_protein,
)
from agr_loader_ray.stages.expand import cartesian_product_lists, dedup_list_values

dna = st.text(alphabet="ACGT", min_size=0, max_size=60)


@given(dna)
def test_translate_length_invariant(seq):
    assert len(translate(seq)) == len(seq) // 3


@given(dna)
def test_revcomp_involution(seq):
    assert reverse_complement(reverse_complement(seq)) == seq


@given(dna)
def test_cds_checked_consistent_with_plain(seq):
    out = translate_cds_checked(seq)
    if out is not None:
        # cds mode: plain translation of the same seq is M-normalized +
        # trailing stop; body must agree after the start codon
        plain = translate(seq)
        assert plain.endswith("*")
        assert out[1:] == plain[1:-1]
        assert out[0] == "M"


@given(dna, st.sampled_from(["+", "-"]))
def test_translate_protein_total(seq, strand):
    # never raises, and '-' equals translating the revcomp on '+'
    assert translate_protein(seq, strand) == translate_protein(
        reverse_complement(seq) if strand == "-" else seq, "+"
    )


@given(st.sampled_from(sorted(STOP_CODONS)), dna)
def test_internal_stop_rejected(stop, body):
    seq = "ATG" + stop + body[: (len(body) // 3) * 3] + "TAA"
    assert translate_cds_checked(seq) is None  # stop right after start


lists = st.lists(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=3), min_size=0, max_size=4),
    min_size=1, max_size=6,
)


@given(lists, lists)
@settings(max_examples=50)
def test_cartesian_sizes_and_values(la, lb):
    n = min(len(la), len(lb))
    la, lb = la[:n], lb[:n]
    t = pa.table({
        "k": pa.array(list(range(n)), pa.int64()),
        "la": pa.array(la, pa.list_(pa.string())),
        "lb": pa.array(lb, pa.list_(pa.string())),
    })
    out = cartesian_product_lists(t, "la", "lb")
    assert out.num_rows == sum(len(a) * len(b) for a, b in zip(la, lb))
    # every output pair must exist in its row's product (and count matches)
    got = list(zip(out["k"].to_pylist(), out["a"].to_pylist(), out["b"].to_pylist()))
    want = [(i, x, y) for i, (a, b) in enumerate(zip(la, lb)) for x in a for y in b]
    assert sorted(got) == sorted(want)


@given(lists)
@settings(max_examples=50)
def test_dedup_list_values_idempotent(la):
    arr = pa.array(la, pa.list_(pa.string()))
    once = dedup_list_values(arr)
    twice = dedup_list_values(once)
    assert once.to_pylist() == twice.to_pylist()
    for orig, ded in zip(la, once.to_pylist()):
        assert set(ded) == set(orig)
        assert len(ded) == len(set(orig))


floats = st.floats(allow_nan=False, width=64)


@given(st.lists(floats, min_size=2, max_size=50))
@settings(max_examples=100)
def test_float_keys_order_preserving(vals):
    from agr_loader_ray.pipelines.queries import _float_keys

    v = np.asarray(vals, dtype=np.float64)
    k = _float_keys(v)
    # same order as the floats themselves (ties allowed either way)
    vi, ki = np.argsort(v, kind="stable"), np.argsort(k, kind="stable")
    assert (np.sort(v)[np.argsort(np.arange(len(v)))] is not None)
    assert ((v[vi][1:] >= v[vi][:-1]).all())
    assert ((k[ki][1:] >= k[ki][:-1]).all())
    # pairwise: v[i] < v[j]  ⟹  key[i] < key[j]
    for i in range(min(len(v), 10)):
        for j in range(min(len(v), 10)):
            if v[i] < v[j]:
                assert k[i] < k[j]


@given(st.lists(st.text(alphabet="abc-", min_size=1, max_size=12), min_size=1, max_size=8))
@settings(max_examples=50)
def test_camel_case_reassembles_pieces(keys):
    from agr_loader_ray.functions.text_scalars import camel_case

    out = camel_case(pa.array(keys, pa.string()), "-").to_pylist()
    for k, o in zip(keys, out):
        pieces = k.split("-")
        want = "".join(p.capitalize() for p in pieces)
        want = (want[0].lower() + want[1:]) if want else want
        assert o == want


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1,
                max_size=300),
       st.sampled_from([(1, 4), (1, 2), (3, 4), (9, 10), (1, 10), (99, 100)]))
@settings(max_examples=200, deadline=None)
def test_cont_quantile_ranks_match_numpy_linear(vals, q):
    """The (num, den, 'lo'/'hi') bracketing ranks + the documented
    interpolation formula reproduce numpy's linear (PERCENTILE_CONT)
    method exactly on the sorted array."""
    import numpy as np

    from agr_loader_ray.stages.quantiles import quantile_rank

    num, den = q
    a = np.sort(np.asarray(vals, dtype=np.int64))
    n = len(a)
    lo = a[quantile_rank((num, den, "lo"), n)]
    hi = a[quantile_rank((num, den, "hi"), n)]
    frac = ((n - 1) * num % den) / float(den)
    got = float(lo) + (hi - lo) * frac
    want = float(np.percentile(a, 100.0 * num / den, method="linear"))
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9)


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_ntile_bucket_sizes_convention(vals):
    """NTILE(4) bucket-size arithmetic: first n%4 buckets get ceil(n/4),
    sizes are non-increasing, and every row lands in exactly one tile."""
    import numpy as np

    n = len(vals)
    i = np.arange(n)
    base, rem = n // 4, n % 4
    big = rem * (base + 1)
    tile = np.where(i < big,
                    i // max(base + 1, 1) + 1,
                    rem + (i - big) // max(base, 1) + 1)
    sizes = np.bincount(tile, minlength=5)[1:]
    expected_buckets = min(4, n)
    assert (sizes > 0).sum() == expected_buckets
    nonzero = sizes[sizes > 0]
    assert (np.diff(nonzero) <= 0).all()
    assert nonzero.max() - nonzero.min() <= 1
    assert sizes.sum() == n
