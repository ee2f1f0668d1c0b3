"""Single-exchange attach: the repo's join replacement for big×big
key-equality attaches.

``exchange_attach(rows, attach, ...)`` unions the two sides tagged,
hash-partitions ONCE on the key, and merges inside each partition with
a sorted-gather on the native key dtype (pure Arrow/numpy — pandas
would promote uint64 keys to lossy float64) — where ``ray.data.Dataset.join``
hash-partitions with a per-row Python ``hash(tuple)`` loop
(ray/data/_internal/arrow_ops/transform_pyarrow.py hash_partition),
measured unusable at ~10⁷ rows (the ppjoin sf0.1 hang this replaced).
It is also immune to the Ray 2.49 globally-empty-side join crash (an
empty side just contributes no rows to any partition), and one shuffle
cheaper than the join (no second partition pass over the output).

Semantics = inner equi-join against a UNIQUE-key lookup side: rows
whose key has no attach row are dropped; duplicate attach keys raise
(the kernel is a sorted-gather, and every current caller attaches a
per-key lookup table).  Memory per task is (|rows| + |attach|) /
n_partitions — bounded by choosing n_partitions from the data size
(``functions.pools.join_parts``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .partition import stable_hash_strings

_SIDE = "__attach_side"


def _arrow_type(t) -> pa.DataType:
    """Normalize a Ray Dataset schema type to an Arrow DataType.  A
    pandas-derived dataset reports object/str columns as the PYTHON
    class, and numpy dtypes appear for numeric columns — map both to
    the Arrow type Ray's pandas→Arrow conversion will actually produce."""
    if isinstance(t, pa.DataType):
        return t
    if t in (str, object):
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def _names_types(ds) -> tuple[list, list]:
    """(names, types) of a Dataset — robust to the Ray artifact where
    ``schema()`` returns None for a pipeline whose every block is a
    typed EMPTY table (map stages drop empty blocks' schema): peek the
    first materialized block's Arrow schema instead."""
    import ray as _ray

    s = ds.schema()
    if s is not None:
        return list(s.names), list(s.types)
    mat = ds.materialize()
    for b in mat.iter_internal_ref_bundles():
        for r in b.block_refs:
            t = _ray.get(r)
            if not isinstance(t, pa.Table):
                t = pa.Table.from_pandas(t, preserve_index=False)
            return list(t.schema.names), list(t.schema.types)
    raise ValueError("exchange over a zero-block dataset")


def _part_of(col: pa.ChunkedArray, nparts: int) -> np.ndarray:
    """Vectorized partition id of a key column (string or integer)."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = stable_hash_strings(col)
    else:
        h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h ^= h >> np.uint64(33)
        with np.errstate(over="ignore"):
            h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return (h % np.uint64(nparts)).astype(np.int32)


def exchange_attach(rows: "ray.data.Dataset", attach: "ray.data.Dataset",
                    key_col: str, attach_key: str | None = None,
                    nparts: int = 32) -> "ray.data.Dataset":
    """Inner-attach ``attach``'s payload columns onto ``rows`` where
    ``rows[key_col] == attach[attach_key]``, via ONE hash exchange."""
    attach_key = key_col if attach_key is None else attach_key

    row_names, row_tps = _names_types(rows)
    att_names, att_tps = _names_types(attach)
    row_cols = list(row_names)
    payload = [c for c in att_names if c != attach_key]
    clash = set(payload) & set(row_cols)
    if clash:
        raise ValueError(f"attach payload columns collide with rows: {sorted(clash)}")
    att_types = {n: _arrow_type(t) for n, t in zip(att_names, att_tps)}
    row_types = {n: _arrow_type(t) for n, t in zip(row_names, row_tps)}
    out_cols = row_cols + payload

    def tag_rows(t: pa.Table) -> pa.Table:
        # cast to the agreed types so the two union sides' schemas match
        # exactly (Ray's union does not promote)
        cols = {c: t[c].cast(row_types[c]) for c in row_cols}
        for c in payload:
            cols[c] = pa.nulls(t.num_rows, att_types[c])
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["part"] = pa.array(_part_of(t[key_col].combine_chunks(), nparts))
        return pa.table(cols)

    def tag_attach(t: pa.Table) -> pa.Table:
        cols = {}
        for c in row_cols:
            cols[c] = (t[attach_key].cast(row_types[c]) if c == key_col
                       else pa.nulls(t.num_rows, row_types[c]))
        for c in payload:
            cols[c] = t[c].cast(att_types[c])
        cols[_SIDE] = pa.array(np.ones(t.num_rows, np.int8))
        cols["part"] = pa.array(_part_of(t[attach_key].combine_chunks(), nparts))
        return pa.table(cols)

    empty_schema = pa.schema(
        [pa.field(c, row_types.get(c) or att_types[c]) for c in out_cols])

    def merge_part(g: pa.Table) -> pa.Table:
        # PURE-ARROW kernel: pandas would promote int/uint columns that
        # contain the other side's nulls to float64, which is LOSSY for
        # uint64 hash keys — the attach must match on exact native
        # values.  Sorted attach keys + searchsorted gather instead.
        if _SIDE not in g.column_names:  # schema-less all-empty partition
            return empty_schema.empty_table()
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        att = g.filter(pa.array(side == 1))
        base = g.filter(pa.array(side == 0))
        if not att.num_rows or not base.num_rows:
            return empty_schema.empty_table()
        ka = att[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ka, kind="stable")
        ks = ka[order]
        if len(ks) > 1 and (ks[1:] == ks[:-1]).any():
            raise ValueError(
                f"exchange_attach requires unique attach keys on {key_col!r}")
        kb = base[key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, kb)
        pos_c = np.minimum(pos, len(ks) - 1)
        hit = ks[pos_c] == kb
        base_hit = base.filter(pa.array(hit))
        gather = pa.array(order[pos_c[hit]])
        cols = {c: base_hit[c] for c in row_cols}
        for c in payload:
            cols[c] = att[c].combine_chunks().take(gather)
        return pa.table(cols).cast(empty_schema)

    tagged = rows.map_batches(tag_rows, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        attach.map_batches(tag_attach, batch_format="pyarrow",
                           zero_copy_batch=True))
    # task-based bucketing exchange, not groupby(part): the part id is
    # already materialized, so the sort shuffle's sampling + payload
    # comparison sort are pure overhead (stages/exchange.py rationale;
    # ppjoin's sf0.1 attach sort leg measured 20.5 s vs ~4 s)
    from .exchange import exchange_map_groups

    return exchange_map_groups(tagged, "part", merge_part, nparts)


def exchange_semi(rows: "ray.data.Dataset", keys: "ray.data.Dataset",
                  key_col: str, keys_key: str | None = None,
                  anti: bool = False, nparts: int = 32) -> "ray.data.Dataset":
    """Distributed semi (``anti=False``) / anti (``anti=True``) join via
    the same single tagged exchange as ``exchange_attach``: keep rows
    whose key is (not) present in ``keys``.  The key side may contain
    duplicates.  Replaces ``Dataset.join(join_type='left_semi'/'left_anti')``
    on the >broadcast-bound scale paths (same per-row-Python-hash crawl
    and empty-side crash as the inner join)."""
    keys_key = key_col if keys_key is None else keys_key
    row_names, row_tps = _names_types(rows)
    row_cols = list(row_names)
    row_types = {n: _arrow_type(t) for n, t in zip(row_names, row_tps)}
    empty_schema = pa.schema([pa.field(c, row_types[c]) for c in row_cols])

    def tag_rows(t: pa.Table) -> pa.Table:
        cols = {c: t[c].cast(row_types[c]) for c in row_cols}
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["part"] = pa.array(_part_of(t[key_col].combine_chunks(), nparts))
        return pa.table(cols)

    def tag_keys(t: pa.Table) -> pa.Table:
        cols = {c: (t[keys_key].cast(row_types[c]) if c == key_col
                    else pa.nulls(t.num_rows, row_types[c]))
                for c in row_cols}
        cols[_SIDE] = pa.array(np.ones(t.num_rows, np.int8))
        cols["part"] = pa.array(_part_of(t[keys_key].combine_chunks(), nparts))
        return pa.table(cols)

    def filter_part(g: pa.Table) -> pa.Table:
        if _SIDE not in g.column_names:  # schema-less all-empty partition
            return empty_schema.empty_table()
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        base = g.filter(pa.array(side == 0))
        if not base.num_rows:
            return empty_schema.empty_table()
        ks = np.unique(g.filter(pa.array(side == 1))[key_col]
                       .to_numpy(zero_copy_only=False))
        kb = base[key_col].to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, kb), len(ks) - 1)
            member = ks[pos] == kb
        else:
            member = np.zeros(len(kb), bool)
        keep = ~member if anti else member
        return base.filter(pa.array(keep)).select(row_cols).cast(empty_schema)

    tagged = rows.map_batches(tag_rows, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        keys.map_batches(tag_keys, batch_format="pyarrow",
                         zero_copy_batch=True))
    from .exchange import exchange_map_groups

    return exchange_map_groups(tagged, "part", filter_part, nparts)
