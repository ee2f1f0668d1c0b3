"""Stanza-format text source (OBO-style): ``[Term]`` blocks of ``key: value``.

Reference analogue: the OBO parser
(``/root/reference/src/etl/helpers/obo_helper.py:218-278``) — stanza
split, typedef skip, repeated-key → list promotion.  Re-expressed Ray
Data-first: ``read_text`` streams lines; a ``map_batches`` UDF can't see
stanza boundaries across blocks, so the source reads whole files per
task (``read_binary_files`` → parse per file) — ontology files are
small sides (SURVEY A7: <100k edges), sharded BY FILE not by line.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def parse_stanza_text(text: str, stanza_type: str = "Term",
                      skip_types: tuple[str, ...] = ("Typedef",)) -> list[dict]:
    """Parse stanza text → list of dicts (repeated keys promote to lists)."""
    records: list[dict] = []
    cur: dict | None = None
    cur_type: str | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("[") and line.endswith("]"):
            if cur is not None and cur_type == stanza_type:
                records.append(cur)
            cur_type = line[1:-1]
            cur = {} if cur_type not in skip_types else None
            continue
        if cur is None or not line or line.startswith("!"):
            continue
        key, _, value = line.partition(":")
        if not _:
            continue
        key, value = key.strip(), value.split("!", 1)[0].strip()
        if key in cur:  # repeated key → list promotion
            if not isinstance(cur[key], list):
                cur[key] = [cur[key]]
            cur[key].append(value)
        else:
            cur[key] = value
    if cur is not None and cur_type == stanza_type:
        records.append(cur)
    return records


def read_stanza(paths: list[str] | str, stanza_type: str = "Term",
                columns: list[str] | None = None) -> "ray.data.Dataset":
    """Dataset of stanza records from OBO-style files (one parse task per
    file; list-valued fields JSON-encoded unless single)."""
    import json

    cols = columns

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for payload in batch["bytes"].to_pylist():
            for rec in parse_stanza_text(payload.decode("utf-8", "replace"), stanza_type):
                if cols:
                    rec = {k: rec.get(k) for k in cols}
                rows.append(
                    {k: json.dumps(v) if isinstance(v, list) else v for k, v in rec.items()}
                )
        return pa.Table.from_pylist(rows)

    return ray.data.read_binary_files(paths).map_batches(parse, batch_format="pyarrow")


def parse_obo_header(text: str) -> dict:
    """OBO file header → camelCased dict (the reference's
    ``OBOHelper.get_header``, ``/root/reference/src/etl/helpers/
    obo_helper.py:33-50``): lines before the first blank/comment, keys
    kebab→camelCase, double quotes → single, repeated keys promote to
    lists, singletons unwrap."""
    from collections import defaultdict

    header: dict[str, list[str]] = defaultdict(list)
    for line in text.splitlines():
        if not line.strip() or line[0] == "#" or line.startswith("["):
            break
        k, sep, v = line.rstrip().partition(": ")
        if not sep:
            continue
        camel = "".join(x.capitalize() or "-" for x in k.split("-"))
        camel = camel[0].lower() + camel[1:]
        header[camel].append(str(v.replace('"', "'")))
    return {k: (v[0] if len(v) == 1 else v) for k, v in header.items()}
