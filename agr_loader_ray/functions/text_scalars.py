"""Scalar string kernels from the reference's helper library (SURVEY §2.8).

All vectorized over Arrow string columns with ``pyarrow.compute``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def html_strip(col) -> pa.ChunkedArray:
    """Remove ``<...>`` tags (reference: allele-symbol cleanup,
    ``/root/reference/src/etl/helpers/text_processing_helper.py:8-17``)."""
    return pc.replace_substring_regex(col, pattern="<[^>]*>", replacement="")


def whitespace_purge(col) -> pa.ChunkedArray:
    """``''.join(s.split())`` — strip ALL whitespace (reference: sequence
    normalization, ``/root/reference/src/etl/variation_etl.py:289-296``)."""
    return pc.replace_substring_regex(col, pattern=r"\s+", replacement="")


def url_template(prefix_col, local_col, templates: dict[str, str],
                 default: str = "") -> pa.Array:
    """``[%s]``-style URL templating against a broadcast template dict
    (reference: resourceDescriptors page URLs,
    ``/root/reference/src/etl/helpers/resource_descriptor_helper_2.py:244-336``).

    Unknown prefixes produce ``default`` — the reference counts those in
    miss-counters; callers count with ``pc.equal(out, default)``.
    """
    prefix_col, local_col = _as_array(prefix_col), _as_array(local_col)
    n = len(local_col)
    out = pa.array([default] * n, pa.string())
    for p, t in templates.items():
        head, _, tail = t.partition("[%s]")
        candidate = pc.binary_join_element_wise(
            pa.array([head] * n, pa.string()),
            local_col,
            pa.array([tail] * n, pa.string()),
            "",
        )
        out = pc.if_else(pc.equal(prefix_col, p), candidate, out)
    return out


def camel_case(col, sep: str = "-") -> pa.Array:
    """kebab/space-separated keys → camelCase (reference: OBO header munge,
    ``/root/reference/src/etl/helpers/obo_helper.py:40-42``:
    capitalize each piece, then lowercase the first character)."""
    col = _as_array(col)
    lists = pc.split_pattern(col, sep)
    lists = _as_array(lists)
    cap = pc.utf8_capitalize(pc.list_flatten(lists))
    joined = pc.binary_join(pa.ListArray.from_arrays(lists.offsets, cap), "")
    head = pc.utf8_lower(pc.utf8_slice_codeunits(joined, 0, 1))
    tail = pc.utf8_slice_codeunits(joined, 1, 1 << 30)
    return pc.binary_join_element_wise(head, tail, "")


def json_escape(col) -> pa.ChunkedArray:
    """Escape backslashes and double quotes for JSON string baking."""
    out = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    return pc.replace_substring(out, pattern='"', replacement='\\"')


def json_bake(t: pa.Table, string_cols: list[str], numeric_cols: list[str]) -> pa.Array:
    """Bake row properties into a JSON-object string column (reference:
    ``fields.append(k + ": " + json.dumps(v))`` node-property baking,
    ``/root/reference/src/etl/helpers/etl_helper.py:296-299``)."""
    pieces = []
    for c in string_cols:
        pieces.append(pc.binary_join_element_wise(
            pa.scalar(f'"{c}": "'), json_escape(t[c]), pa.scalar('"'), ""))
    for c in numeric_cols:
        pieces.append(pc.binary_join_element_wise(
            pa.scalar(f'"{c}": '), pc.cast(t[c], pa.string()), ""))
    if not pieces:  # no columns at all → a row of empty objects
        return pa.array(["{}"] * t.num_rows, pa.string())
    body = pieces[0]
    for p in pieces[1:]:
        body = pc.binary_join_element_wise(body, p, ", ")
    return pc.binary_join_element_wise(pa.scalar("{"), body, pa.scalar("}"), "")
