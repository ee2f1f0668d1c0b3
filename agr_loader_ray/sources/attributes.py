"""Tabular sources with packed attribute columns (GFF3 col-9 / VEP
``;``-separated ``k=v`` / PSI-MI-TAB pipe-lists).

Reference analogues: GFF3 attribute parse
(``/root/reference/src/etl/transcript_etl.py:219-429``), VEP extras
(``/root/reference/src/etl/vep_etl.py:81-142``), PSI-MI-TAB field
extraction (``/root/reference/src/etl/molecular_interaction_etl.py:430-676``).

``read_text`` streams lines (comment lines dropped vectorized), a
``map_batches`` UDF splits fixed columns with Arrow kernels and explodes
the attribute column into typed fields.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def parse_kv_attributes(col: pa.ChunkedArray | pa.Array, keys: list[str],
                        pair_sep: str = ";", kv_sep: str = "=") -> dict[str, pa.Array]:
    """Extract ``keys`` from a packed ``k=v;k=v`` attribute column.

    Vectorized per key with a regex extract (no Python row loop):
    value of ``k`` = first match of ``(?:^|;)k=([^;]*)``.
    """
    out = {}
    for k in keys:
        import re

        pat = f"(?:^|{re.escape(pair_sep)})\\s*{re.escape(k)}{re.escape(kv_sep)}(?P<v>[^{re.escape(pair_sep)}]*)"
        ex = pc.extract_regex(col, pattern=pat)
        out[k] = pc.struct_field(ex, "v")
    return out


def read_tabular_attributes(paths: list[str] | str, column_names: list[str],
                            attr_column: str, attr_keys: list[str],
                            delimiter: str = "\t", comment_prefix: str = "#") -> "ray.data.Dataset":
    """GFF-style reader: fixed tab columns + exploded attribute fields."""

    n_cols = len(column_names)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        keep = pc.invert(pc.starts_with(lines, comment_prefix))
        keep = pc.and_(keep, pc.greater(pc.utf8_length(lines), 0))
        lines = lines.filter(keep)
        split = pc.split_pattern(lines, delimiter, max_splits=n_cols - 1)
        ok = pc.equal(pc.list_value_length(split), n_cols)
        split = split.filter(ok)
        cols = {name: pc.list_element(split, i) for i, name in enumerate(column_names)}
        attrs = parse_kv_attributes(cols[attr_column], attr_keys)
        cols.update(attrs)
        return pa.table(cols)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def read_xml_records(paths: list[str] | str, record_tag: str,
                     fields: list[str]) -> "ray.data.Dataset":
    """XML source (SURVEY S7): whole-file parse per task (``ElementTree``),
    one row per ``record_tag`` element, ``fields`` = child tag texts or
    ``@attr`` attribute lookups."""

    def parse(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        rows = []
        for payload in batch["bytes"].to_pylist():
            root = ET.fromstring(payload.decode("utf-8", "replace"))
            it = root.iter(record_tag)
            for el in it:
                row = {}
                for f in fields:
                    if f.startswith("@"):
                        row[f[1:]] = el.get(f[1:])
                    else:
                        child = el.find(f)
                        row[f] = child.text if child is not None else None
                rows.append(row)
        return pa.Table.from_pylist(rows)

    return ray.data.read_binary_files(paths).map_batches(parse, batch_format="pyarrow")
