"""Multi-format date-parse cascade (SURVEY M8).

The reference normalizes six-plus messy date-string formats to ISO-8601 Z
(``/root/reference/src/etl/helpers/etl_helper.py:302-340``:
``check_date_format`` — fromisoformat first, then a strptime cascade, with
a ``' CST'`` strip, returning ``%Y-%m-%dT%H:%M:%SZ`` or None).  Here the
cascade is fully vectorized: one ``pc.strptime(..., error_is_null=True)``
per format, folded with ``pc.coalesce`` — no Python per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Ordered like the reference's dtFormat tuple (etl_helper.py:313-319);
# ISO-with-offset is handled by stripping the +00:00 suffix first (the
# reference's fromisoformat branch, applied to the UTC offsets it sees).
DATE_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%d/%m/%Y",
    "%Y/%m/%d",
    "%a %b %d %H:%M:%S %Y",
    "%d:%m:%Y %H:%M",
)


def parse_date_cascade(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Parse messy date strings → timestamp[us]; unparseable → null."""
    s = pc.replace_substring(col, pattern=" CST", replacement="")
    s = pc.replace_substring(s, pattern="+00:00", replacement="")
    parsed = None
    for fmt in DATE_FORMATS:
        p = pc.strptime(s, format=fmt, unit="us", error_is_null=True)
        parsed = p if parsed is None else pc.coalesce(parsed, p)
    return parsed


def to_iso_z(ts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Format timestamps as the reference's default_date_format
    (``%Y-%m-%dT%H:%M:%SZ``, etl_helper.py:17); null stays null."""
    secs = pc.floor_temporal(ts, unit="second").cast(pa.timestamp("s"))
    return pc.strftime(secs, format="%Y-%m-%dT%H:%M:%SZ")
