"""HGVS-style keyed string assembly (M10) + YAML species source (S12).

- ``hgvs_variant_names``: the reference's variant-type-keyed HGVS
  nomenclature builder (``/root/reference/src/etl/variation_etl.py:194-237``
  ``get_hgvs_nomenclature``) as a fully vectorized Arrow kernel: a
  per-type template chain over (refseq, positions, ref/var sequences)
  with None→'' coercions and unknown types → empty strings.
- ``yaml_species_synonyms``: species.yaml stanzas (synthesized
  deterministically from ``nation``) → exploded synonyms table via the
  YAML source (``species_etl.py:70-94``).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.tables import read_small, read_table
from .queries import query

_SO_TYPES = ("SO:1000002", "SO:1000008", "SO:0000667",
             "SO:0000159", "SO:0002007", "SO:1000032")


@query(
    "hgvs_variant_names",
    """
    WITH v AS (
      SELECT p_partkey AS variant_id,
             'NC_' || CAST(p_partkey % 23 AS VARCHAR) AS refseq_local,
             (['SO:1000002', 'SO:1000008', 'SO:0000667',
               'SO:0000159', 'SO:0002007', 'SO:1000032', 'SO:9999999'])
               [(p_partkey % 7) + 1] AS variant_type,
             CAST(p_partkey AS VARCHAR) AS start_str,
             CAST(p_partkey + 2 AS VARCHAR) AS end_str,
             CASE WHEN p_partkey % 19 = 0 THEN ''
                  ELSE (['A','C','G','T'])[(p_partkey % 4) + 1] END AS ref_str,
             CASE WHEN p_partkey % 17 = 0 THEN ''
                  ELSE (['T','G','C','A'])[(p_partkey % 4) + 1] END AS var_str,
             'R6' AS assembly,
             CAST(p_partkey % 20 + 1 AS VARCHAR) AS chromosome
      FROM part)
    SELECT variant_id,
           CASE
             WHEN variant_type IN ('SO:1000002', 'SO:1000008')
               THEN refseq_local || ':g.' || start_str || ref_str || '>' || var_str
             WHEN variant_type = 'SO:0000667'
               THEN refseq_local || ':g.' || start_str || '_' || end_str || 'ins' || var_str
             WHEN variant_type = 'SO:0000159'
               THEN refseq_local || ':g.' || start_str || '_' || end_str || 'del'
             WHEN variant_type IN ('SO:0002007', 'SO:1000032')
               THEN refseq_local || ':g.' || start_str || '_' || end_str || 'delins' || var_str
             ELSE '' END AS hgvs,
           CASE
             WHEN variant_type IN ('SO:1000002', 'SO:1000008')
               THEN '(' || assembly || ')' || chromosome || ':' || start_str || ref_str || '>' || var_str
             WHEN variant_type = 'SO:0000667'
               THEN '(' || assembly || ')' || chromosome || ':' || start_str || '_' || end_str || 'ins' || var_str
             WHEN variant_type = 'SO:0000159'
               THEN '(' || assembly || ')' || chromosome || ':' || start_str || '_' || end_str || 'del'
             WHEN variant_type IN ('SO:0002007', 'SO:1000032')
               THEN '(' || assembly || ')' || chromosome || ':' || start_str || '_' || end_str || 'delins' || var_str
             ELSE '' END AS hgvs_synonym
    FROM v
    """,
)
def hgvs_variant_names(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def kernel(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        vt = np.array(_SO_TYPES + ("SO:9999999",), dtype=object)[k % 7]
        refseq = np.char.add("NC_", (k % 23).astype(str)).astype(object)
        start = k.astype(str).astype(object)
        end = (k + 2).astype(str).astype(object)
        bases_r = np.array(["A", "C", "G", "T"], dtype=object)[k % 4]
        bases_v = np.array(["T", "G", "C", "A"], dtype=object)[k % 4]
        ref = np.where(k % 19 == 0, "", bases_r).astype(object)  # None → '' (ref :210-215)
        var = np.where(k % 17 == 0, "", bases_v).astype(object)
        chrom = (k % 20 + 1).astype(str).astype(object)

        head = refseq + ":g." + start
        syn_head = "(" + np.full(len(k), "R6", dtype=object) + ")" + chrom + ":" + start
        point = head + ref + ">" + var
        syn_point = syn_head + ref + ">" + var
        ins = head + "_" + end + "ins" + var
        syn_ins = syn_head + "_" + end + "ins" + var
        dele = head + "_" + end + "del"
        syn_del = syn_head + "_" + end + "del"
        delins = head + "_" + end + "delins" + var
        syn_delins = syn_head + "_" + end + "delins" + var

        is_point = (vt == "SO:1000002") | (vt == "SO:1000008")
        is_ins = vt == "SO:0000667"
        is_del = vt == "SO:0000159"
        is_delins = (vt == "SO:0002007") | (vt == "SO:1000032")
        hgvs = np.select([is_point, is_ins, is_del, is_delins],
                         [point, ins, dele, delins], default="")
        syn = np.select([is_point, is_ins, is_del, is_delins],
                        [syn_point, syn_ins, syn_del, syn_delins], default="")
        return pa.table({
            "variant_id": t["p_partkey"],
            "hgvs": pa.array(hgvs, pa.string()),
            "hgvs_synonym": pa.array(syn, pa.string()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def synth_species_yaml(sf_dir: str) -> str:
    """Deterministic species.yaml from the nation table (cached)."""
    # rule-versioned tag: a stale /tmp fixture can never meet a newer oracle
    tag = hashlib.sha1(f"{sf_dir}|species-v1".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"agr_species_{tag}.yaml")
    if os.path.exists(path):
        return path
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    lines = []
    for k, name in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()):
        lines += [
            f"- taxonId: \"NCBITaxon:{k}\"",
            f"  fullName: \"{name}\"",
            f"  shortName: \"N{k}\"",
            "  commonNames:",
            f"    - \"{name.lower()}\"",
            f"    - \"nation{k}\"",
            "  primaryDataProvider:",
            f"    dataProviderFullName: \"Provider {k % 3}\"",
            f"    dataProviderShortName: \"P{k % 3}\"",
            f"  phylogenicOrder: {k}",
        ]
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


@query(
    "yaml_species_synonyms",
    """
    SELECT 'NCBITaxon:' || CAST(n_nationkey AS VARCHAR) AS taxonId, lower(n_name) AS synonym
    FROM nation
    UNION ALL
    SELECT 'NCBITaxon:' || CAST(n_nationkey AS VARCHAR), 'nation' || CAST(n_nationkey AS VARCHAR)
    FROM nation
    """,
)
def yaml_species_synonyms(sf_dir: str):
    from ..sources.yaml_tables import species_tables

    path = synth_species_yaml(sf_dir)
    _, synonyms = species_tables(path)
    return ray.data.from_arrow(synonyms)
