"""Codon translation — SURVEY §2.8 / protein assembly support.

Emulates the reference's Biopython usage
(``/root/reference/src/etl/protein_sequence_etl.py:79-104``
``translate_protein``): reverse-complement on '-' strand, then
``Seq.translate(table='Standard', to_stop=False, cds=True)`` with a
fallback to ``cds=False`` on ``TranslationError``.  Standard (NCBI
table 1) codon table, no external deps.

``cds=True`` semantics (Biopython contract): length % 3 == 0, first
codon is a valid start (ATG/TTG/CTG → always emitted as 'M'), last
codon is a stop (stripped from the output), no internal stop codon;
any violation raises — here: falls through to the plain translation,
which maps stops to '*' and unknown codons to 'X'.
"""

from __future__ import annotations

from itertools import product

_BASES = "TCAG"
_AA = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
CODON_TABLE: dict[str, str] = {
    "".join(c): _AA[i] for i, c in enumerate(product(_BASES, _BASES, _BASES))
}
START_CODONS = ("TTG", "CTG", "ATG")
STOP_CODONS = ("TAA", "TAG", "TGA")

_COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")


def reverse_complement(seq: str) -> str:
    return seq.translate(_COMPLEMENT)[::-1]


def _codons(seq: str) -> list[str]:
    return [seq[i:i + 3] for i in range(0, len(seq) - len(seq) % 3, 3)]


def translate(seq: str) -> str:
    """Plain translation (cds=False): stops are '*', unknown codons 'X'."""
    return "".join(CODON_TABLE.get(c, "X") for c in _codons(seq.upper()))


def translate_cds_checked(seq: str) -> str | None:
    """Biopython ``translate(cds=True)`` emulation; None on violation."""
    s = seq.upper()
    if not s or len(s) % 3 != 0:
        return None
    cods = _codons(s)
    if cods[0] not in START_CODONS or cods[-1] not in STOP_CODONS:
        return None
    body = cods[1:-1]
    if any(c in STOP_CODONS for c in body):
        return None
    return "M" + "".join(CODON_TABLE.get(c, "X") for c in body)


def translate_protein(cds_sequence: str, strand: str) -> str:
    """The reference's translate_protein: revcomp on '-', cds=True with
    cds=False fallback (protein_sequence_etl.py:79-104)."""
    seq = reverse_complement(cds_sequence) if strand == "-" else cds_sequence
    out = translate_cds_checked(seq)
    return out if out is not None else translate(seq)
