"""MITAB 2.7 parser (S10) + cartesian expansion (J3) unit tests with
adversarial literal lines — quoted fields, pipe multi-values, in-row
duplicates, unresolvable ids, missing columns' defaults, comment rows.
"""

import pyarrow as pa

from agr_loader_ray.sources.mitab import file_date, parse_mitab_batch
from agr_loader_ray.stages.expand import cartesian_product_lists, dedup_list_values


def _line(**kw) -> str:
    row = ["-"] * 25
    defaults = {
        0: "uniprotkb:P1", 1: "uniprotkb:Q1",
        6: 'psi-mi:"MI:0018"(two hybrid)', 8: "pubmed:123",
        9: "taxon:7227(fly)", 10: "taxon:10090(mouse)",
        11: 'psi-mi:"MI:0915"(physical association)',
        12: 'psi-mi:"MI:0469"(intact)',
    }
    for i, v in defaults.items():
        row[i] = v
    for i, v in kw.items():
        row[int(i)] = v
    return "\t".join(row)


def _parse(lines):
    return parse_mitab_batch(pa.table({"text": pa.array(lines, pa.string())}))


def test_comments_and_basic_row():
    out = _parse(["# File generated (UTC): 2024-01-01", _line()])
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["detection_method"] == "MI:0018"
    assert r["source_database"] == "MI:0469"
    assert r["aggregation_database"] == "MI:0670"  # IMEx default
    assert r["taxon_id_1"] == "NCBITaxon:7227"
    assert r["taxon_id_2"] == "NCBITaxon:10090"
    assert r["interactor_a_role"] == "MI:0499"  # '-' → unspecified default


def test_swissprot_rewrite_and_dedup():
    # swiss-prot rewrites to uniprotkb and then duplicates collapse
    out = _parse([_line(**{"0": "uniprot/swiss-prot:P9|uniprotkb:P9|genbank:G9"})])
    assert out["a_ids"].to_pylist() == [["uniprotkb:P9", "genbank:G9"]]


def test_unresolvable_interactor_drops_row():
    out = _parse([_line(**{"0": "refseq:R1|ensembl:E2"})])
    assert out.num_rows == 0


def test_missing_publication_drops_row():
    assert _parse([_line(**{"8": "-"})]).num_rows == 0
    assert _parse([_line(**{"8": "doi:10.1/xyz"})]).num_rows == 0


def test_taxon_self_interaction_fallback():
    r = _parse([_line(**{"10": "-"})]).to_pylist()[0]
    assert r["taxon_id_2"] == r["taxon_id_1"] == "NCBITaxon:7227"


def test_selfaggregating_source_dbs():
    r = _parse([_line(**{"12": 'psi-mi:"MI:0478"(flybase)'})]).to_pylist()[0]
    assert r["aggregation_database"] == "MI:0478"


def test_detection_default_on_missing():
    r = _parse([_line(**{"6": "-"})]).to_pylist()[0]
    assert r["detection_method"] == "MI:0686"


def test_file_date(tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text("# x\n# File generated (UTC): 2023-05-05 01:02:03\n" + _line() + "\n")
    assert file_date(str(p)) == "2023-05-05 01:02:03"


def test_cartesian_product_order_and_sizes():
    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "la": pa.array([["a1", "a2"], ["x"]], pa.list_(pa.string())),
        "lb": pa.array([["b1", "b2", "b3"], []], pa.list_(pa.string())),
    })
    out = cartesian_product_lists(t, "la", "lb")
    assert out.num_rows == 6  # 2×3 + 1×0
    assert out["a"].to_pylist() == ["a1", "a1", "a1", "a2", "a2", "a2"]
    assert out["b"].to_pylist() == ["b1", "b2", "b3", "b1", "b2", "b3"]
    assert out["k"].to_pylist() == [1] * 6


def test_dedup_list_values_first_seen_order():
    arr = pa.array([["b", "a", "b", "a"], [], ["z"]], pa.list_(pa.string()))
    out = dedup_list_values(arr)
    assert out.to_pylist() == [["b", "a"], [], ["z"]]
