"""Source-format tests: stanza/OBO, GFF-style attributes, XML, FASTA."""

import os

import pyarrow as pa

import ray.data

from agr_loader_ray.sources.attributes import (
    parse_kv_attributes,
    read_tabular_attributes,
    read_xml_records,
)
from agr_loader_ray.sources.fasta import FastaStore, SequenceSlice, reverse_complement
from agr_loader_ray.sources.stanza import parse_stanza_text, read_stanza

OBO = """format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
is_a: GO:0048308 ! organelle inheritance
is_a: GO:0048311

[Typedef]
id: part_of

[Term]
id: GO:0000002
name: mitochondrial genome maintenance
is_obsolete: true
"""

GFF = """##gff-version 3
#!assembly GRCz11
chr1\tsrc\tgene\t100\t900\t.\t+\t.\tID=gene1;Name=fgf8a
chr1\tsrc\tmRNA\t100\t900\t.\t+\t.\tID=tx1;Parent=gene1
badline
chr2\tsrc\texon\t150\t300\t.\t-\t.\tID=ex1;Parent=tx1
"""

XML = """<root><doc id="1"><title>alpha</title></doc><doc id="2"><title>beta</title></doc></root>"""

FASTA = """>chr1 test
ACGTACGTACGTACGTACGT
ACGTACGTACGTACGTACGT
>chr2
TTTTGGGGCCCCAAAA
"""


def test_parse_stanza_repeated_keys_and_typedef_skip():
    recs = parse_stanza_text(OBO)
    assert len(recs) == 2
    assert recs[0]["id"] == "GO:0000001"
    assert recs[0]["is_a"] == ["GO:0048308", "GO:0048311"]  # list promotion
    assert recs[1]["is_obsolete"] == "true"


def test_read_stanza_dataset(tmp_path):
    p = tmp_path / "go.obo"
    p.write_text(OBO)
    df = read_stanza(str(p)).to_pandas()
    assert set(df["id"]) == {"GO:0000001", "GO:0000002"}


def test_parse_kv_attributes_vectorized():
    col = pa.chunked_array([["ID=g1;Name=abc", "Name=xyz", "other=1"]])
    out = parse_kv_attributes(col, ["ID", "Name"])
    assert out["ID"].to_pylist() == ["g1", None, None]
    assert out["Name"].to_pylist() == ["abc", "xyz", None]


def test_read_gff_style(tmp_path):
    p = tmp_path / "x.gff3"
    p.write_text(GFF)
    cols = "seqid source type start end score strand phase attributes".split()
    df = read_tabular_attributes(
        str(p), cols, attr_column="attributes", attr_keys=["ID", "Parent"]
    ).to_pandas()
    assert len(df) == 3  # comments + malformed line dropped
    assert df.loc[df["type"] == "gene", "ID"].iloc[0] == "gene1"
    assert df.loc[df["type"] == "exon", "Parent"].iloc[0] == "tx1"


def test_read_xml_records(tmp_path):
    p = tmp_path / "r.xml"
    p.write_text(XML)
    df = read_xml_records(str(p), "doc", ["@id", "title"]).to_pandas()
    assert sorted(df["id"]) == ["1", "2"]
    assert sorted(df["title"]) == ["alpha", "beta"]


def test_fasta_store_and_slice_stage(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(FASTA)
    store = FastaStore(str(p))
    assert store.slice("chr1", 1, 4) == "ACGT"
    assert store.slice("chr2", 5, 8) == "GGGG"
    assert store.slice("chr2", 15, 99) == "AA"  # clamped
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAGG") == "CCTT"

    rows = pa.table(
        {
            "chrom": pa.array(["chr1", "chr2"]),
            "start": pa.array([5, 5], pa.int64()),
            "end": pa.array([8, 8], pa.int64()),
            "strand": pa.array(["+", "-"]),
        }
    )
    out = (
        ray.data.from_arrow(rows)
        .map_batches(
            SequenceSlice, fn_constructor_args=(str(p), 4),
            batch_format="pyarrow", concurrency=2,
        )
        .to_pandas()
        .sort_values("chrom")
    )
    assert out.iloc[0]["seq"] == "ACGT"
    assert out.iloc[0]["upstream"] == "ACGT"
    assert out.iloc[1]["seq"] == reverse_complement("GGGG")


def test_parse_obo_header_camel_and_lists():
    from agr_loader_ray.sources.stanza import parse_obo_header

    text = (
        "format-version: 1.2\n"
        'saved-by: "someone"\n'
        "subsetdef: a sub\n"
        "subsetdef: b sub\n"
        "default-namespace: gene_ontology\n"
        "\n"
        "[Term]\nid: GO:1\n"
    )
    h = parse_obo_header(text)
    assert h["formatVersion"] == "1.2"
    assert h["savedBy"] == "'someone'"          # quote rewrite
    assert h["subsetdef"] == ["a sub", "b sub"]  # repeated → list
    assert h["defaultNamespace"] == "gene_ontology"
    assert "id" not in h                          # stops at the stanza
