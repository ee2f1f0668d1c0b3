"""PSI-MI-TAB 2.7 source — SURVEY S10.

The reference parses a 25-column tab-separated MITAB file row by row
(``/root/reference/src/etl/molecular_interaction_etl.py:430-676``):
``#`` comment rows are skipped (the ``# File generated (UTC): …`` header
is captured as metadata), MI identifiers are pulled from between double
quotes (``re.findall(r'"([^"]*)"', row[i])[0]`` with per-column
defaults), taxon columns get ``NCBITaxon:`` + first digit run with a
``-``→self-interaction fallback, interactor id columns are pipe-separated
multi-values with the ``uniprot/swiss-prot:``→``uniprotkb:`` rewrite,
unresolvable interactors and missing publications drop the row, and the
resolved A×B lists expand cartesian (see ``stages/expand.py``).

Here every column op is a vectorized Arrow kernel inside ``map_batches``
over ``ray.data.read_text`` lines — the file parses in parallel blocks,
no Python per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# column indexes, per the reference's row[...] accesses
COL_A_IDS, COL_B_IDS = 0, 1
COL_DETECTION, COL_PUBLICATION = 6, 8
COL_TAXON_A, COL_TAXON_B = 9, 10
COL_INT_TYPE, COL_SOURCE_DB = 11, 12
COL_A_ROLE, COL_B_ROLE, COL_A_TYPE, COL_B_TYPE = 18, 19, 20, 21

MI_UNSPECIFIED = "MI:0499"          # default role/type (ref :536-538)
MI_DETECTION_DEFAULT = "MI:0686"    # default detection (ref :518)
MI_IMEX = "MI:0670"                 # default aggregation db (ref :508)
# source dbs that aggregate to themselves (ref :510-515)
SELF_AGGREGATING = ("MI:0478", "MI:0487", "MI:0463")

FILE_DATE_RE = re.compile(r"# File generated \(UTC\): (.*)")

# prefixes the (emulated) master crossreference dictionary resolves;
# the reference's dict is keyed by MOD/uniprot/genbank identifiers
RESOLVABLE_PREFIXES = ("uniprotkb:", "genbank:")


def file_date(path: str) -> str | None:
    """The '# File generated (UTC):' header, like the ref's metadata capture."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.startswith("#"):
                break
            m = FILE_DATE_RE.match(line.strip())
            if m:
                return m.group(1)
    return None


def _quoted_mi(col: pa.ChunkedArray, default: str | None) -> pa.ChunkedArray:
    """First "…"-quoted value; missing → default (None → null)."""
    ex = pc.extract_regex(col, pattern=r'"(?P<mi>[^"]*)"')
    mi = pc.struct_field(ex, "mi")
    if default is not None:
        mi = pc.coalesce(mi, pa.scalar(default, pa.string()))
    return mi


def _taxon(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """'taxon:7227(fly)' → 'NCBITaxon:7227'; '-' → null."""
    ex = pc.extract_regex(col, pattern=r"(?P<d>\d+)")
    d = pc.struct_field(ex, "d")
    return pc.if_else(
        pc.is_null(d), pa.scalar(None, pa.string()),
        pc.binary_join_element_wise(pa.scalar("NCBITaxon:"), d, ""),
    )


def _resolved_ids(col: pa.ChunkedArray) -> pa.Array:
    """Pipe-split, swiss-prot rewrite, keep resolvable prefixes, per-row
    dedup — the reference's resolve_identifiers_by_row + list(set(...))."""
    from ..stages.expand import dedup_list_values

    lists = pc.split_pattern(col, "|").combine_chunks()
    flat = pc.replace_substring(lists.values, pattern="uniprot/swiss-prot:",
                                replacement="uniprotkb:")
    keep = pc.starts_with(flat, RESOLVABLE_PREFIXES[0])
    for p in RESOLVABLE_PREFIXES[1:]:
        keep = pc.or_(keep, pc.starts_with(flat, p))
    # rebuild the list with only resolvable values (offset arithmetic)
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep_np = keep.to_numpy(zero_copy_only=False)
    new_counts = np.bincount(row_idx[keep_np], minlength=len(counts)).astype(np.int64)
    new_offsets = np.concatenate(([0], np.cumsum(new_counts)))
    filtered = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), flat.filter(keep)
    )
    return dedup_list_values(filtered)


def parse_mitab_batch(t: pa.Table) -> pa.Table:
    """One Arrow batch of raw MITAB lines → typed, filtered, list-carrying
    rows ready for cartesian expansion."""
    lines = t["text"]
    lines = lines.filter(pc.invert(pc.starts_with(lines, "#")))  # comments
    cols = pc.split_pattern(lines, "\t")

    def col(i: int) -> pa.ChunkedArray:
        return pc.list_element(cols, i)

    pub = col(COL_PUBLICATION)
    # publication required and must match a known pattern (ref :524-531)
    pub_ok = pc.match_substring_regex(pub, r"^pubmed:\d+$")

    taxon1 = _taxon(col(COL_TAXON_A))
    taxon2 = pc.coalesce(_taxon(col(COL_TAXON_B)), taxon1)  # '-' → self (ref :493)

    source_db = _quoted_mi(col(COL_SOURCE_DB), default=None)  # required (ref :504)
    agg = pc.if_else(
        pc.is_in(source_db, value_set=pa.array(SELF_AGGREGATING)),
        source_db, pa.scalar(MI_IMEX, pa.string()),
    )

    a_ids = _resolved_ids(col(COL_A_IDS))
    b_ids = _resolved_ids(col(COL_B_IDS))
    a_n = pc.list_value_length(a_ids)
    b_n = pc.list_value_length(b_ids)

    out = pa.table({
        "a_ids": a_ids,
        "b_ids": b_ids,
        "interaction_type": _quoted_mi(col(COL_INT_TYPE), default=None),
        "detection_method": _quoted_mi(col(COL_DETECTION), MI_DETECTION_DEFAULT),
        "source_database": source_db,
        "aggregation_database": agg,
        "taxon_id_1": taxon1,
        "taxon_id_2": taxon2,
        "pub_med_id": pub,
        "interactor_a_role": _quoted_mi(col(COL_A_ROLE), MI_UNSPECIFIED),
        "interactor_b_role": _quoted_mi(col(COL_B_ROLE), MI_UNSPECIFIED),
        "interactor_a_type": _quoted_mi(col(COL_A_TYPE), MI_UNSPECIFIED),
        "interactor_b_type": _quoted_mi(col(COL_B_TYPE), MI_UNSPECIFIED),
    })
    # drop: unresolved publication, unresolved A or B (ref :524-531, :568-580)
    mask = pc.and_(pub_ok, pc.and_(pc.greater(a_n, 0), pc.greater(b_n, 0)))
    return out.filter(mask)


def expand_interactions(t: pa.Table) -> pa.Table:
    """Cartesian A×B per row (SURVEY J3, ref :599-613)."""
    from ..stages.expand import cartesian_product_lists

    return cartesian_product_lists(t, "a_ids", "b_ids",
                                   out_a="interactor_a", out_b="interactor_b")


def read_mitab(path: str) -> ray.data.Dataset:
    """MITAB file → Dataset of expanded interaction rows."""
    lines = ray.data.read_text(path)
    return (
        lines.map_batches(parse_mitab_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(expand_interactions, batch_format="pyarrow", zero_copy_batch=True)
    )
