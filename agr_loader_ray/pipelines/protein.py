"""Protein assembly query: ordered CDS concat + codon translation.

Mirrors the reference's protein-sequence load
(``/root/reference/src/etl/protein_sequence_etl.py:125-205``): CDS
pieces arrive per transcript, are ordered by start position
(``order by transcriptPrimaryKey, CDSStartPosition``), concatenated,
and translated (revcomp on '-' strand, Biopython cds=True semantics
with a plain-translation fallback) — SURVEY J5 sort-within-group
assembly + §2.8 codon translation.

The CDS pieces are synthesized deterministically from ``part`` (same
rule the SQL oracle reconstructs) and emitted SCRAMBLED so only a real
sort-within-group assembly produces the right protein.  The oracle
translates via a generated 64-branch codon CASE + string_agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.codon import CODON_TABLE, translate_protein
from ..functions.tables import read_table
from ..stages.partition import PART_COL
from .queries import query

_DIGIT_TO_BASE = str.maketrans("0123456789", "ACGTACGTAC")

_CODON_CASE = "CASE codon " + " ".join(
    f"WHEN '{c}' THEN '{a}'" for c, a in sorted(CODON_TABLE.items())
) + " ELSE 'X' END"

_PROTEIN_SQL = f"""
    WITH base AS (
      SELECT p_partkey AS transcript_id,
             'ATG' || translate(lpad(CAST((p_partkey * 7919) % 1000000000 AS VARCHAR),
                                     18, '0'), '0123456789', 'ACGTACGTAC') || 'TAA' AS cds_seq,
             CASE WHEN p_partkey % 2 = 0 THEN '+' ELSE '-' END AS strand
      FROM part
    ), oriented AS (
      SELECT transcript_id, strand, cds_seq,
             CASE WHEN strand = '-'
                  THEN reverse(translate(cds_seq, 'ACGT', 'TGCA'))
                  ELSE cds_seq END AS seq
      FROM base
    ), cod AS (
      -- fixed 24-base construction → always 8 codons
      SELECT transcript_id, strand, cds_seq, i,
             substring(seq, CAST(3 * i + 1 AS INT), 3) AS codon,
             8 AS nc
      FROM oriented, generate_series(0, 7) AS g(i)
    ), aa AS (
      SELECT transcript_id, strand, cds_seq, i, nc, codon,
             {_CODON_CASE} AS a
      FROM cod
    )
    SELECT transcript_id, strand, cds_seq,
           CASE WHEN max(CASE WHEN i = 0 THEN codon END) IN ('ATG', 'TTG', 'CTG')
                 AND max(CASE WHEN i = nc - 1 THEN codon END) IN ('TAA', 'TAG', 'TGA')
                 AND sum(CASE WHEN i > 0 AND i < nc - 1
                              AND codon IN ('TAA', 'TAG', 'TGA') THEN 1 ELSE 0 END) = 0
                THEN 'M' || coalesce(string_agg(CASE WHEN i > 0 AND i < nc - 1 THEN a END,
                                                '' ORDER BY i), '')
                ELSE string_agg(a, '' ORDER BY i) END AS protein
    FROM aa
    GROUP BY transcript_id, strand, cds_seq
"""


@query("protein_translate_cds", _PROTEIN_SQL)
def protein_translate_cds(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey"])
    n_parts = 16

    def make_cds_rows(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        mid = (
            pd.Series(((k * 7919) % 1_000_000_000).astype(str))
            .str.zfill(18).str.translate(_DIGIT_TO_BASE)
        )
        full = ("ATG" + mid + "TAA").to_numpy(dtype=object)
        strand = np.where(k % 2 == 0, "+", "-")
        rows = []
        for i in (2, 0, 1):  # scrambled arrival order — assembly must sort
            piece = np.array([s[i * 8:(i + 1) * 8] for s in full], dtype=object)
            rows.append(pa.table({
                "transcript_id": pa.array(k, pa.int64()),
                "start": pa.array(np.full(len(k), i * 8 + 1), pa.int64()),
                "piece": pa.array(piece, pa.string()),
                "strand": pa.array(strand, pa.string()),
                PART_COL: pa.array((k % n_parts).astype(np.int32), pa.int32()),
            }))
        return pa.concat_tables(rows)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["transcript_id", "start"])
        agg = g.groupby("transcript_id", sort=False).agg(
            cds_seq=("piece", lambda s: "".join(s)),
            strand=("strand", "first"),
        ).reset_index()
        # the reference's guard: non-empty and length % 3 == 0 (ref :206)
        keep = agg["cds_seq"].str.len().mod(3).eq(0) & agg["cds_seq"].str.len().gt(0)
        agg = agg[keep]
        agg["protein"] = [
            translate_protein(s, st) for s, st in zip(agg["cds_seq"], agg["strand"])
        ]
        return agg[["transcript_id", "strand", "cds_seq", "protein"]]

    return (
        ds.map_batches(make_cds_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(PART_COL)
        .map_groups(assemble, batch_format="pandas")
    )
