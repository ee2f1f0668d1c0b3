"""MITAB interaction queries: S10 parser + J3 cartesian expansion.

A deterministic PSI-MI-TAB 2.7 file is synthesized from the ``part``
table (same rule as the SQL oracle reconstructs), parsed by the
vectorized MITAB source (``sources/mitab.py``) and expanded A×B
(``stages/expand.py``).  Reference:
``/root/reference/src/etl/molecular_interaction_etl.py:430-676``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from ..functions.tables import read_small
from .queries import query

OUT_COLS = [
    "interactor_a", "interactor_b", "interaction_type", "detection_method",
    "source_database", "aggregation_database", "taxon_id_1", "taxon_id_2",
    "pub_med_id", "interactor_a_role", "interactor_b_role",
    "interactor_a_type", "interactor_b_type",
]


def synth_mitab_file(sf_dir: str) -> str:
    """Write the deterministic MITAB fixture for ``sf_dir`` (cached)."""
    # tag includes a rule version: bump when the synthesis rule changes so a
    # stale /tmp fixture can never be reused against a newer oracle
    tag = hashlib.sha1(f"{sf_dir}|mitab-v1".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"agr_mitab_{tag}.tsv")
    if os.path.exists(path):
        return path
    keys = read_small(sf_dir, "part", columns=["p_partkey"])["p_partkey"].to_pylist()
    lines = [
        "# File generated (UTC): 2024-01-01 00:00:00",
        "# another comment row",
    ]
    for k in keys:
        a = f"refseq:R{k}" if k % 11 == 0 else (
            f"uniprot/swiss-prot:P{k}" + (f"|genbank:G{k}" if k % 3 == 0 else ""))
        b = f"uniprotkb:Q{k}" + (f"|genbank:H{k}" if k % 2 == 0 else "")
        det = "-" if k % 7 == 0 else f'psi-mi:"MI:001{k % 5}"(method)'
        pub = "-" if k % 13 == 0 else f"pubmed:{9000000 + k}"
        tax1 = 'taxon:7227("fly")' if k % 2 == 1 else "taxon:6239(worm)"
        tax2 = "-" if k % 5 == 0 else "taxon:10090(mouse)"
        itype = 'psi-mi:"MI:0915"(physical association)'
        src = ('psi-mi:"MI:0478"(flybase)', 'psi-mi:"MI:0487"(wormbase)',
               'psi-mi:"MI:0463"(biogrid)', 'psi-mi:"MI:0469"(intact)')[k % 4]
        a_role = "-" if k % 9 == 0 else 'psi-mi:"MI:0501"(enzyme)'
        row = ["-"] * 25
        row[0], row[1], row[6], row[8] = a, b, det, pub
        row[9], row[10], row[11], row[12] = tax1, tax2, itype, src
        row[18], row[19] = a_role, 'psi-mi:"MI:0502"(enzyme target)'
        row[20] = row[21] = 'psi-mi:"MI:0326"(protein)'
        row[24] = f"intact:EBI-{k}"
        lines.append("\t".join(row))
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


@query(
    "mitab_expand_interactions",
    """
    WITH src AS (
      SELECT p_partkey AS k FROM part
      WHERE p_partkey % 11 <> 0 AND p_partkey % 13 <> 0
    ), rows_ AS (
      SELECT k,
        CASE WHEN k % 3 = 0
             THEN ['uniprotkb:P' || CAST(k AS VARCHAR), 'genbank:G' || CAST(k AS VARCHAR)]
             ELSE ['uniprotkb:P' || CAST(k AS VARCHAR)] END AS la,
        CASE WHEN k % 2 = 0
             THEN ['uniprotkb:Q' || CAST(k AS VARCHAR), 'genbank:H' || CAST(k AS VARCHAR)]
             ELSE ['uniprotkb:Q' || CAST(k AS VARCHAR)] END AS lb,
        'MI:0915' AS interaction_type,
        CASE WHEN k % 7 = 0 THEN 'MI:0686'
             ELSE 'MI:001' || CAST(k % 5 AS VARCHAR) END AS detection_method,
        CASE k % 4 WHEN 0 THEN 'MI:0478' WHEN 1 THEN 'MI:0487'
                   WHEN 2 THEN 'MI:0463' ELSE 'MI:0469' END AS source_database,
        CASE k % 4 WHEN 0 THEN 'MI:0478' WHEN 1 THEN 'MI:0487'
                   WHEN 2 THEN 'MI:0463' ELSE 'MI:0670' END AS aggregation_database,
        CASE WHEN k % 2 = 1 THEN 'NCBITaxon:7227' ELSE 'NCBITaxon:6239' END AS taxon_id_1,
        CASE WHEN k % 5 = 0
             THEN CASE WHEN k % 2 = 1 THEN 'NCBITaxon:7227' ELSE 'NCBITaxon:6239' END
             ELSE 'NCBITaxon:10090' END AS taxon_id_2,
        'pubmed:' || CAST(9000000 + k AS VARCHAR) AS pub_med_id,
        CASE WHEN k % 9 = 0 THEN 'MI:0499' ELSE 'MI:0501' END AS interactor_a_role,
        'MI:0502' AS interactor_b_role,
        'MI:0326' AS interactor_a_type,
        'MI:0326' AS interactor_b_type
      FROM src)
    SELECT a.ia AS interactor_a, b.ib AS interactor_b, interaction_type,
           detection_method, source_database, aggregation_database,
           taxon_id_1, taxon_id_2, pub_med_id, interactor_a_role,
           interactor_b_role, interactor_a_type, interactor_b_type
    FROM rows_
    CROSS JOIN UNNEST(la) AS a(ia)
    CROSS JOIN UNNEST(lb) AS b(ib)
    """,
)
def mitab_expand_interactions(sf_dir: str):
    from ..sources.mitab import read_mitab

    path = synth_mitab_file(sf_dir)
    return read_mitab(path).select_columns(OUT_COLS)
