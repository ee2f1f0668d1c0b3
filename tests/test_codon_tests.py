"""Codon translation vs known standard-table facts + CDS-mode semantics."""

from agr_loader_ray.functions.codon import (
    CODON_TABLE,
    reverse_complement,
    translate,
    translate_cds_checked,
    translate_protein,
)


def test_codon_table_known_entries():
    known = {
        "TTT": "F", "TTA": "L", "TCT": "S", "TAT": "Y", "TGT": "C",
        "TAA": "*", "TAG": "*", "TGA": "*", "TGG": "W",
        "CTT": "L", "CCT": "P", "CAT": "H", "CAA": "Q", "CGT": "R",
        "ATT": "I", "ATG": "M", "ACT": "T", "AAT": "N", "AAA": "K",
        "AGT": "S", "AGA": "R", "GTT": "V", "GCT": "A", "GAT": "D",
        "GAA": "E", "GGT": "G",
    }
    for c, a in known.items():
        assert CODON_TABLE[c] == a, c
    assert len(CODON_TABLE) == 64


def test_translate_plain():
    assert translate("ATGGCCTAA") == "MA*"
    assert translate("atggcc") == "MA"          # case-insensitive
    assert translate("ATGGC") == "M"            # trailing partial codon dropped
    assert translate("NNNATG") == "XM"          # unknown codon → X


def test_cds_mode():
    assert translate_cds_checked("ATGGCCTAA") == "MA"   # stop stripped
    assert translate_cds_checked("TTGGCCTAA") == "MA"   # alt start → M
    assert translate_cds_checked("ATGTAAGCCTAA") is None  # internal stop
    assert translate_cds_checked("GCCGCCTAA") is None   # no start codon
    assert translate_cds_checked("ATGGCCGCC") is None   # no stop codon
    assert translate_cds_checked("ATGGCCTA") is None    # len % 3 != 0


def test_translate_protein_strand():
    # '-' strand: revcomp first; revcomp('TTAGGCCAT') = 'ATGGCCTAA' → CDS ok
    assert translate_protein("TTAGGCCAT", "-") == "MA"
    # '+' strand CDS violation → plain-translate fallback with '*'
    assert translate_protein("ATGTAAGCCTAA", "+") == "M*A*"
    assert reverse_complement("ATGC") == "GCAT"
