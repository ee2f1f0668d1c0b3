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
