"""Reading the committed lake state back as a Ray Dataset (merge-on-read).

Each partition's state is its base file plus any outstanding delta files
(see ``pipelines/engine.py``); the read folds them with the same LWW
kernel the apply path uses, strips tombstone rows (``_deleted``) and
bookkeeping columns, and evolves legacy files to the current schema
(missing columns filled with their registry defaults, widened types
cast).  Added columns are constant-by-default until the WAL schema
itself carries payloads for them, so default-filling at read time is
exact — see ``state/schema_registry.py``.

Parallelism: one read+fold task per partition (``map_batches`` over a
dataset of partition descriptors, batch_size=1).  The verification
export's global sort on ``(conv_id, turn_idx)`` is the cold-path
shuffle (SURVEY §7.4) — never part of the apply hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..schemas import DELETED_COL, OFFSET_COL
from ..stages.fold import lww_last_per_key
from ..state.manifest import LakeManifest
from ..state.schema_registry import SchemaRegistry

_EXTRA = [pa.field(OFFSET_COL, pa.int64()), pa.field(DELETED_COL, pa.bool_())]


def read_lake(lake_root: str, epoch: int | None = None,
              include_tombstones: bool = False,
              columns: list[str] | None = None) -> ray.data.Dataset:
    """Dataset over the lake as of its last commit (or ``epoch``).

    ``columns`` prunes the OUTPUT projection; the merge-on-read fold
    itself always reads key/order/tombstone columns plus the requested
    payloads (never the full row when a 2-column read suffices).
    """
    from .engine import _info_files

    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    manifest.assert_readable(e)
    m = manifest.read_epoch(e)
    registry_dict = dict(m["schema_registry"])
    payload_cols = [n for n, _ in registry_dict["fields"]]
    if columns is not None:
        unknown = set(columns) - set(payload_cols)
        if unknown:
            raise KeyError(f"unknown columns: {sorted(unknown)}")
        payload_cols = [c for c in payload_cols if c in columns]
        # prune the registry to key/order columns + requested payloads so
        # the per-file reads below fetch only those column chunks
        keep = set(payload_cols) | {"conv_id", "turn_idx", "ts"}
        registry_dict["fields"] = [f for f in registry_dict["fields"] if f[0] in keep]
        registry_dict["defaults"] = {
            k: v for k, v in registry_dict.get("defaults", {}).items() if k in keep
        }
        registry_dict["aliases"] = {
            k: v for k, v in registry_dict.get("aliases", {}).items() if k in keep
        }
    defaults = {k: v for k, v in registry_dict.get("defaults", {}).items() if v is not None}
    # renamed columns: old physical files carry a prior name — read those
    # chunks too (the per-file `avail` intersection keeps this exact)
    alias_names = [a for als in registry_dict.get("aliases", {}).values() for a in als]
    file_cols = [n for n, _ in registry_dict["fields"]] + alias_names + [OFFSET_COL, DELETED_COL]

    items = []
    for info in m["partitions"].values():
        files = [manifest.abspath(f) for f in _info_files(info)]
        if files:
            items.append({"files": files})
    if not items:
        return ray.data.from_arrow(
            pa.Table.from_pylist([], schema=SchemaRegistry.from_dict(registry_dict).schema)
        )

    def load_fold(batch: pa.Table) -> pa.Table:
        registry = SchemaRegistry.from_dict(registry_dict)
        outs = []
        for files in batch["files"].to_pylist():
            tables = []
            for f in files:
                avail = set(pq.read_schema(f).names)
                cols = [c for c in file_cols if c in avail]
                tables.append(registry.conform(pq.read_table(f, columns=cols), _EXTRA))
            t = tables[0] if len(tables) == 1 else lww_last_per_key(
                pa.concat_tables(tables), ["conv_id", "turn_idx"], ["ts", OFFSET_COL]
            )
            outs.append(t)
        t = pa.concat_tables(outs)
        if not include_tombstones:
            t = t.filter(pc.equal(t[DELETED_COL], False))
        for name, default in defaults.items():
            i = t.schema.get_field_index(name)
            t = t.set_column(i, name, pc.fill_null(t[name], pa.scalar(default, t[name].type)))
        keep = [*payload_cols, DELETED_COL] if include_tombstones else payload_cols
        return t.select(keep)

    return ray.data.from_items(items).map_batches(
        load_fold, batch_format="pyarrow", batch_size=1
    )


def export_sorted(lake_root: str, epoch: int | None = None) -> ray.data.Dataset:
    """Verification export: stable ``(conv_id, turn_idx)`` ordering
    (north rule; cold path only)."""
    return read_lake(lake_root, epoch=epoch).sort(["conv_id", "turn_idx"])


def _fold_live(manifest: LakeManifest, registry: SchemaRegistry,
               files: list[str]) -> pa.Table:
    """Fold a partition's file list to its live state (keeps bookkeeping
    columns; conforms legacy layouts through the registry's alias chain)."""
    if not files:
        return registry.conform(pa.Table.from_pylist([]), _EXTRA)
    tables = [registry.conform(pq.read_table(manifest.abspath(f)), _EXTRA) for f in files]
    t = tables[0] if len(tables) == 1 else lww_last_per_key(
        pa.concat_tables(tables), ["conv_id", "turn_idx"], ["ts", OFFSET_COL]
    )
    return t.filter(pc.equal(t[DELETED_COL], False))


def change_feed(lake_root: str, epoch: int, images: str = "post") -> ray.data.Dataset:
    """Change-data-feed of one committed epoch: the per-key difference
    between the lake's live state at ``epoch - 1`` and at ``epoch``.

    Emits one row per changed key with ``change_type`` ∈
    {'insert', 'update', 'delete'} plus the full payload — the
    post-image for inserts/updates, the pre-image for deletes — under
    the schema registry AS OF ``epoch`` (renamed/added columns appear
    under their new names even for pre-images).

    Defined on state, not on events: a late event that loses
    last-writer-wins against the existing state changes nothing and is
    NOT emitted (the WAL is the event feed; this is the effect feed —
    the lake-side analogue of Delta Lake's change data feed, computed
    lazily instead of persisted at write time).

    ``images='both'`` switches to Delta-CDF row typing: updates emit TWO
    rows, ``update_preimage`` (old payload) and ``update_postimage``
    (new payload), so downstream incremental view maintenance
    (``pipelines/ivm.py``) can retract the old contribution and add the
    new one without consulting any other state.

    Scale shape: zero shuffle — only partitions whose manifest entry was
    written in ``epoch`` are scanned (untouched partitions are carried
    forward unchanged), one read+fold+diff task per touched partition,
    using the same time-travel file lists ``read_lake`` uses.
    """
    from .engine import _info_files

    manifest = LakeManifest(lake_root)
    manifest.assert_readable(epoch)
    m_post = manifest.read_epoch(epoch)
    registry_dict = m_post["schema_registry"]
    try:
        # the diff needs epoch-1's files too: a vacuumed pre-image must
        # fail loudly, not silently degrade every change to an 'insert'
        if epoch - 1 in manifest.committed_epochs():
            manifest.assert_readable(epoch - 1)
        m_pre = manifest.read_epoch(epoch - 1)
        pre_parts = m_pre["partitions"]
    except FileNotFoundError:
        pre_parts = {}

    items = []
    for p, info in m_post["partitions"].items():
        if info.get("epoch") != epoch:
            continue  # carried forward untouched — cannot contain changes
        items.append({
            "post_files": _info_files(info),
            "pre_files": _info_files(pre_parts.get(p)),
        })

    out_fields = [pa.field("change_type", pa.string())] + list(
        SchemaRegistry.from_dict(registry_dict).schema
    )
    if not items:
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=pa.schema(out_fields)))

    keys = ["conv_id", "turn_idx"]
    if images not in ("post", "both"):
        raise ValueError(f"images must be 'post' or 'both', got {images!r}")
    upd_sides = (
        [("update", "post")] if images == "post"
        else [("update_preimage", "pre"), ("update_postimage", "post")]
    )

    def diff_partition(batch: pa.Table) -> pa.Table:
        registry = SchemaRegistry.from_dict(registry_dict)
        mani = LakeManifest(lake_root)
        payload = [f.name for f in registry.schema]
        outs = []
        for row in batch.to_pylist():
            pre = _fold_live(mani, registry, row["pre_files"])
            post = _fold_live(mani, registry, row["post_files"])
            # classify on the winner offset: same key + same winning
            # offset ⇒ identical state (offsets are unique per event)
            pre_k = pre.select(keys + [OFFSET_COL]).rename_columns(keys + ["__off_pre"])
            post_k = post.select(keys + [OFFSET_COL]).rename_columns(keys + ["__off_post"])
            j = post_k.join(pre_k, keys=keys, join_type="full outer")
            ins = j.filter(pc.is_null(j["__off_pre"])).select(keys)
            dele = j.filter(pc.is_null(j["__off_post"])).select(keys)
            upd = j.filter(pc.and_(
                pc.and_(pc.is_valid(j["__off_pre"]), pc.is_valid(j["__off_post"])),
                pc.not_equal(j["__off_pre"], j["__off_post"]),
            )).select(keys)
            emits = [("insert", ins, post), ("delete", dele, pre)]
            emits[1:1] = [(tag, upd, post if which == "post" else pre)
                          for tag, which in upd_sides]
            for tag, key_t, side in emits:
                if key_t.num_rows == 0:
                    continue
                rows = side.select(payload).join(key_t, keys=keys, join_type="inner")
                rows = rows.select(payload)  # join may reorder columns
                outs.append(rows.add_column(
                    0, "change_type", pa.array([tag] * rows.num_rows, pa.string())))
        if not outs:
            return pa.Table.from_pylist([], schema=pa.schema(out_fields))
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(
        diff_partition, batch_format="pyarrow", batch_size=1
    )


def point_lookup(lake_root: str, conv_id: str, turn_idx: int,
                 epoch: int | None = None, return_stats: bool = False):
    """Serving-path read of ONE key from the committed lake.

    Scale shape — three pruning layers before any bytes are read:

    1. *partition routing*: the manifest records ``n_partitions``, so
       the key hashes straight to its single owning partition (the same
       ``key_hash % n`` the writer used) — 1/n of the lake's files are
       even considered.  Pre-``n_partitions`` lakes fall back to
       scanning every partition's entry (correct, just unpruned).
    2. *bloom data skipping*: each delta file carries a key-hash
       micro-bloom in the manifest (``stages/bloom.py``); deltas whose
       bloom excludes the key are skipped without touching storage —
       the Delta-Lake file-stats idea adapted to hash keys, where
       min/max stats prune nothing.
    3. *parquet row filter*: surviving files are read with a
       ``(conv_id, turn_idx)`` predicate (row-group pruning + only
       matching rows decoded).

    The fold over the handful of surviving rows is the same LWW kernel
    the apply path uses.  → live row dict, or ``None`` (absent or
    deleted); with ``return_stats=True`` → ``(row, stats)`` where stats
    counts files considered/pruned/read.
    """
    import numpy as np

    from ..stages.bloom import bloom_hex_maybe_contains
    from ..stages.partition import key_hash
    from .engine import _info_files

    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    manifest.assert_readable(e)
    m = manifest.read_epoch(e)
    registry = SchemaRegistry.from_dict(m["schema_registry"])
    h = key_hash(np.asarray([conv_id], dtype=object),
                 np.asarray([turn_idx], dtype=np.int64))[0]

    n_parts = m.get("n_partitions")
    if n_parts:
        part_infos = [m["partitions"][p] for p in (str(int(h % np.uint64(n_parts))),)
                      if p in m["partitions"]]
    else:
        part_infos = list(m["partitions"].values())

    stats = {"files_considered": 0, "files_pruned": 0, "files_read": 0}
    tables = []
    for info in part_infos:
        from .engine import _base_files

        deltas = info.get("deltas") or []
        blooms = info.get("delta_blooms") or []
        if len(blooms) != len(deltas):
            blooms = [None] * len(deltas)
        files = [(b, None) for b in _base_files(info)] + \
            list(zip(deltas, blooms))
        for rel, bloom in files:
            stats["files_considered"] += 1
            if bloom is not None and not bloom_hex_maybe_contains(bloom, h):
                stats["files_pruned"] += 1
                continue
            stats["files_read"] += 1
            t = pq.read_table(
                manifest.abspath(rel),
                filters=[("conv_id", "==", conv_id), ("turn_idx", "==", turn_idx)],
            )
            if t.num_rows:
                tables.append(registry.conform(t, _EXTRA))

    if not tables:
        row = None
    else:
        folded = lww_last_per_key(pa.concat_tables(tables),
                                  ["conv_id", "turn_idx"], ["ts", OFFSET_COL])
        live = folded.filter(pc.equal(folded[DELETED_COL], False))
        live = live.drop_columns([OFFSET_COL, DELETED_COL])
        row = live.to_pylist()[0] if live.num_rows else None
    return (row, stats) if return_stats else row


def _rg_intersecting(path: str, lo: str, hi: str) -> tuple[list[int], int]:
    """Row groups of ``path`` whose conv_id [min, max] stats intersect
    [lo, hi] (metadata-only footer read — no data I/O).  Returns
    (row_group_indices, n_pruned); a row group without stats is kept
    (conservative, never unsound)."""
    pf = pq.ParquetFile(path)
    try:
        ci = pf.schema_arrow.names.index("conv_id")
    except ValueError:
        return list(range(pf.num_row_groups)), 0
    keep, pruned = [], 0
    for g in range(pf.num_row_groups):
        st = pf.metadata.row_group(g).column(ci).statistics
        if st is not None and st.has_min_max and (st.max < lo or st.min > hi):
            pruned += 1
        else:
            keep.append(g)
    return keep, pruned


def range_scan(lake_root: str, lo: str, hi: str, epoch: int | None = None,
               with_stats: bool = False):
    """Key-range scan ``lo <= conv_id <= hi`` over the lake with
    row-group data skipping (SURVEY 'prune at the read').

    Hash partitioning scatters a key range across every partition, so
    partition-level pruning is impossible by construction — the skip
    unit is the parquet ROW GROUP: compacted bases are key-sorted
    (``CdcEngine.compact``), so their row-group conv_id min/max stats
    are tight and a narrow range touches O(1) row groups per base;
    unsorted delta files degrade gracefully to full reads (their stats
    span the key space).  Sound for merge-on-read LWW because a skipped
    row group provably contains no row of any key in the range.

    ``with_stats=True`` → ``(dataset, stats_dict)`` with the driver-side
    footer-only pruning counts (the same decision the read tasks make).
    """
    from .engine import _info_files

    if lo > hi:
        raise ValueError(f"empty range: lo={lo!r} > hi={hi!r}")
    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    manifest.assert_readable(e)
    m = manifest.read_epoch(e)
    registry_dict = m["schema_registry"]
    payload_cols = [n for n, _ in registry_dict["fields"]]
    alias_names = [a for als in registry_dict.get("aliases", {}).values() for a in als]
    file_cols = payload_cols + alias_names + [OFFSET_COL, DELETED_COL]

    items = []
    for info in m["partitions"].values():
        files = [manifest.abspath(f) for f in _info_files(info)]
        if files:
            items.append({"files": files})
    if not items:
        ds = ray.data.from_arrow(pa.Table.from_pylist(
            [], schema=SchemaRegistry.from_dict(registry_dict).schema))
        return (ds, {"row_groups_considered": 0, "row_groups_pruned": 0}) \
            if with_stats else ds

    def scan_fold(batch: pa.Table) -> pa.Table:
        registry = SchemaRegistry.from_dict(registry_dict)
        outs = []
        for files in batch["files"].to_pylist():
            tables = []
            for f in files:
                keep, _ = _rg_intersecting(f, lo, hi)
                if not keep:
                    continue
                pf = pq.ParquetFile(f)
                avail = set(pf.schema_arrow.names)
                cols = [c for c in file_cols if c in avail]
                t = pf.read_row_groups(keep, columns=cols)
                tables.append(registry.conform(t, _EXTRA))
            if not tables:
                continue
            t = tables[0] if len(tables) == 1 else lww_last_per_key(
                pa.concat_tables(tables), ["conv_id", "turn_idx"],
                ["ts", OFFSET_COL])
            outs.append(t)
        if not outs:
            return registry.conform(pa.Table.from_pylist([]), _EXTRA) \
                .select(payload_cols)
        t = pa.concat_tables(outs)
        t = t.filter(pc.and_(
            pc.greater_equal(t["conv_id"], pa.scalar(lo)),
            pc.less_equal(t["conv_id"], pa.scalar(hi))))
        t = t.filter(pc.equal(t[DELETED_COL], False))
        return t.select(payload_cols)

    ds = ray.data.from_items(items).map_batches(
        scan_fold, batch_format="pyarrow", batch_size=1)
    if not with_stats:
        return ds
    stats = {"row_groups_considered": 0, "row_groups_pruned": 0,
             "files": 0}
    for it in items:
        for f in it["files"]:
            keep, pruned = _rg_intersecting(f, lo, hi)
            stats["files"] += 1
            stats["row_groups_considered"] += len(keep) + pruned
            stats["row_groups_pruned"] += pruned
    return ds, stats


def _rg_ts_intersecting(path: str, lo_us: int, hi_us: int) -> tuple[list[int], int]:
    """Row groups whose ts [min, max] stats intersect [lo_us, hi_us]
    (footer-only).  Groups without stats are kept (never unsound)."""
    import pandas as pd

    pf = pq.ParquetFile(path)
    try:
        ci = pf.schema_arrow.names.index("ts")
    except ValueError:
        return list(range(pf.num_row_groups)), 0
    keep, pruned = [], 0
    for g in range(pf.num_row_groups):
        st = pf.metadata.row_group(g).column(ci).statistics
        if st is not None and st.has_min_max:
            mn = pd.Timestamp(st.min).value // 1000
            mx = pd.Timestamp(st.max).value // 1000
            if mx < lo_us or mn > hi_us:
                pruned += 1
                continue
        keep.append(g)
    return keep, pruned


def _to_us(x) -> int:
    import pandas as pd

    if isinstance(x, (int,)):
        return x
    return int(pd.Timestamp(x).value // 1000)


def time_range_scan(lake_root: str, lo, hi, epoch: int | None = None,
                    with_stats: bool = False):
    """Scan live rows with ``lo <= ts <= hi`` with TIME-based row-group
    skipping (the second pruning dimension — pair with
    ``CdcEngine.compact(cluster="zorder")`` so key- and time-range scans
    both skip).

    Soundness under merge-on-read: ts pruning on a partition with
    outstanding deltas is UNSOUND (a pruned base row with a later ts
    could be the LWW winner over an in-range delta row, so skipping it
    would emit a superseded version).  Partitions whose manifest shows
    no deltas therefore prune (their folded base holds exactly one row
    per key); partitions with deltas fall back to a full fold —
    compaction is what buys the skipping.  ``lo``/``hi``: epoch-µs ints
    or anything ``pd.Timestamp`` accepts.
    """
    from .engine import _info_files

    lo_us, hi_us = _to_us(lo), _to_us(hi)
    if lo_us > hi_us:
        raise ValueError(f"empty range: lo={lo!r} > hi={hi!r}")
    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    manifest.assert_readable(e)
    m = manifest.read_epoch(e)
    registry_dict = m["schema_registry"]
    payload_cols = [n for n, _ in registry_dict["fields"]]
    alias_names = [a for als in registry_dict.get("aliases", {}).values() for a in als]
    file_cols = payload_cols + alias_names + [OFFSET_COL, DELETED_COL]

    items = []
    for info in m["partitions"].values():
        files = [manifest.abspath(f) for f in _info_files(info)]
        if files:
            items.append({"files": files,
                          "prunable": not info.get("deltas")})
    if not items:
        ds = ray.data.from_arrow(pa.Table.from_pylist(
            [], schema=SchemaRegistry.from_dict(registry_dict).schema))
        return (ds, {"row_groups_considered": 0, "row_groups_pruned": 0,
                     "partitions_full_read": 0}) if with_stats else ds

    lo_ts = pa.scalar(np.datetime64(lo_us, "us"), pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi_us, "us"), pa.timestamp("us"))

    def scan_fold(batch: pa.Table) -> pa.Table:
        registry = SchemaRegistry.from_dict(registry_dict)
        outs = []
        for files, prunable in zip(batch["files"].to_pylist(),
                                   batch["prunable"].to_pylist()):
            tables = []
            for f in files:
                if prunable:
                    keep, _ = _rg_ts_intersecting(f, lo_us, hi_us)
                    if not keep:
                        continue
                else:
                    keep = None  # full read: deltas may shadow any row
                pf = pq.ParquetFile(f)
                avail = set(pf.schema_arrow.names)
                cols = [c for c in file_cols if c in avail]
                t = (pf.read_row_groups(keep, columns=cols)
                     if keep is not None else pf.read(columns=cols))
                tables.append(registry.conform(t, _EXTRA))
            if not tables:
                continue
            t = tables[0] if len(tables) == 1 else lww_last_per_key(
                pa.concat_tables(tables), ["conv_id", "turn_idx"],
                ["ts", OFFSET_COL])
            outs.append(t)
        if not outs:
            return registry.conform(pa.Table.from_pylist([]), _EXTRA) \
                .select(payload_cols)
        t = pa.concat_tables(outs)
        t = t.filter(pc.and_(pc.greater_equal(t["ts"], lo_ts),
                             pc.less_equal(t["ts"], hi_ts)))
        t = t.filter(pc.equal(t[DELETED_COL], False))
        return t.select(payload_cols)

    ds = ray.data.from_items(items).map_batches(
        scan_fold, batch_format="pyarrow", batch_size=1)
    if not with_stats:
        return ds
    stats = {"row_groups_considered": 0, "row_groups_pruned": 0,
             "partitions_full_read": 0, "files": 0}
    for it in items:
        if not it["prunable"]:
            stats["partitions_full_read"] += 1
        for f in it["files"]:
            stats["files"] += 1
            if it["prunable"]:
                keep, pruned = _rg_ts_intersecting(f, lo_us, hi_us)
                stats["row_groups_considered"] += len(keep) + pruned
                stats["row_groups_pruned"] += pruned
            else:
                stats["row_groups_considered"] += pq.ParquetFile(f).num_row_groups
    return ds, stats
