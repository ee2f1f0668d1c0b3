"""The CDC apply engine: WAL epoch replay → partitioned Parquet lake.

Ray-Data-first pipeline per epoch (the only hot-path shuffle is the
partition exchange, once per epoch — SURVEY §7.4)::

    read_parquet(wal/epoch=e)                       # streaming block read
      → map_batches(prefold+partition, pyarrow)     # combiner, no shuffle
      → groupby("part").map_groups(merge_apply)     # the exchange + apply
      → take_all()                                  # P manifest rows (tiny)
      → commit epoch manifest (atomic rename)       # the commit point

Reference lifecycle analogue (``/root/reference/src/aggregate_loader.py``):
an epoch ≙ one ETL group run; the group barrier ≙ the epoch commit; the
8-process Neo4jTransactor pool ≙ the partition-parallel merge-apply
tasks; CSV staging + LOAD CSV MERGE ≙ copy-on-write Parquet + manifest.

Scale notes (100 TB / multi-node):
- WAL blocks stream through the object store with backpressure; nothing
  materializes the epoch except the per-partition merge groups.
- ``n_partitions`` bounds per-task memory: partition state ≈
  table_size / P.  Size P so a partition fits a worker heap (defaults
  here are single-node test sizes; a 256-node lake would use P in the
  thousands — P is fixed per lake at creation, like a table's bucket
  count).
- the previous-epoch partition-file map (P entries) is broadcast to
  apply tasks via closure capture; at P ≫ 10^4 move it to ``ray.put``.
- merge-apply is pure Arrow (sort + adjacency filter) — no Python
  row loops.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from ..schemas import DELETED_COL, OFFSET_COL, TRANSCRIPT_SCHEMA
from ..stages.fold import lww_last_per_key
from ..stages.partition import PART_COL, add_partition_column, stable_hash_strings
from ..state.manifest import LakeManifest
from ..state.schema_registry import SchemaRegistry

_EXTRA_FIELDS = [pa.field(OFFSET_COL, pa.int64()), pa.field(DELETED_COL, pa.bool_())]


def _live_checksum(tbl: pa.Table) -> str:
    """Order-insensitive content checksum of live rows (lineage).

    Sum (mod 2^64) of stable row hashes over (conv_id, turn_idx, text) —
    vectorized, deterministic across processes.  Engine analogue of the
    reference's node-count regression gate
    (``/root/reference/src/etl/node_count_etl.py:20-78``), strengthened
    from counts to content.
    """
    if tbl.num_rows == 0:
        return "0"
    conv = tbl["conv_id"].to_numpy(zero_copy_only=False).astype(object)
    turn = tbl["turn_idx"].to_numpy(zero_copy_only=False)
    text = tbl["text"].to_numpy(zero_copy_only=False).astype(object)
    h = stable_hash_strings(conv) ^ stable_hash_strings(text)
    t = np.where(np.asarray(turn) == None, -1, turn).astype(np.int64)  # noqa: E711
    h = h ^ (t.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        return format(int(h.sum(dtype=np.uint64)), "x")


def _shuffle_blocks(total_bytes: int) -> int:
    """Input block count for the partition exchange.

    The sort-based shuffle's cost grows with map-blocks × reduce-blocks
    object transfers (200×200 small blocks measured 24 s wall for 20 s
    of CPU on one node); coalescing the read to ~1 block per CPU with a
    256 MiB floor made the same exchange 5× faster.  Scales with both
    cluster size and data volume.
    """
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    by_bytes = -(-total_bytes // (256 << 20))
    return max(ncpu, by_bytes)


def _count_u_on_missing(events: pa.Table, base: pa.Table | None) -> int:
    """Count update events targeting keys absent from the partition base.

    The reference's ``MATCH (x {primaryKey}) MERGE …`` silently drops
    rows whose key is missing (SURVEY J1); our policy is upsert-anyway
    plus this lineage counter (≙ resolution-statistics counters,
    ``/root/reference/src/etl/molecular_interaction_etl.py:451-454``).
    """
    from ..stages.partition import key_hash

    if "op" not in events.column_names or events.num_rows == 0:
        return 0
    # fold to one winner per key first so the count is invariant to how
    # the pre-fold combiner split blocks (deterministic across replays)
    winners = lww_last_per_key(events, ["conv_id", "turn_idx"], ["ts", OFFSET_COL])
    is_u = pc.equal(winners["op"], "U").to_numpy(zero_copy_only=False)
    if not is_u.any():
        return 0
    if base is None or base.num_rows == 0:
        return int(is_u.sum())
    ev_h = key_hash(winners["conv_id"], winners["turn_idx"])
    base_h = key_hash(base["conv_id"], base["turn_idx"])
    return int((is_u & ~np.isin(ev_h, base_h)).sum())


class _PreFoldPartition:
    """map_batches stage: drop S rows, LWW-prefold within the block,
    normalize to lake layout, add the partition column.

    ``keep_epoch=True`` (catch-up mode) folds within ``(key, epoch)``
    so per-epoch intermediate lake states stay byte-identical to
    sequential application."""

    def __init__(self, n_partitions: int, keep_epoch: bool = False):
        self.n = n_partitions
        self.keep_epoch = keep_epoch

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["op"], "S"))
        key = ["conv_id", "turn_idx"] + (["epoch"] if self.keep_epoch else [])
        if batch.num_rows:
            batch = lww_last_per_key(batch, key, ["ts", "offset"])
        deleted = pc.equal(batch["op"], "D")
        # "op" survives to the merge for the update-on-missing-key metric
        # (the reference's MATCH drops such rows silently — we count them
        # into lineage instead, SURVEY §7.5.4 / A5); dropped before write.
        drop = [] if self.keep_epoch else ["epoch"]
        batch = (batch.drop_columns(drop) if drop else batch).append_column(DELETED_COL, deleted)
        batch = batch.rename_columns(
            [OFFSET_COL if c == "offset" else c for c in batch.column_names]
        )
        return add_partition_column(batch, self.n)


def _make_merge_apply(lake_root: str, epoch: int, registry_dict: dict,
                      prev_files: dict[int, str | None]):
    """Build the per-partition merge-apply group function.

    Runs once per touched partition per epoch.  Exactly-once: the data
    file name is deterministic, written tmp→rename; a staged manifest
    marks completion so retried/resumed epochs skip finished partitions.
    """
    manifest = LakeManifest(lake_root)

    def merge_apply(group: pa.Table) -> pa.Table:
        part = int(group[PART_COL][0].as_py())
        registry = SchemaRegistry.from_dict(registry_dict)

        staged = manifest.read_staged(epoch, part)
        if staged is not None and os.path.exists(manifest.abspath(staged["path"])):
            return pa.Table.from_pylist([staged])

        raw = group.drop_columns([PART_COL])
        events = registry.conform(raw, _EXTRA_FIELDS)  # drops "op"

        base_rel = prev_files.get(part)
        base = None
        if base_rel:
            base = pq.read_table(manifest.abspath(base_rel))
        u_on_missing = _count_u_on_missing(raw, base)
        if base is not None:
            merged = pa.concat_tables([registry.conform(base, _EXTRA_FIELDS), events])
        else:
            merged = events

        merged = lww_last_per_key(merged, ["conv_id", "turn_idx"], ["ts", OFFSET_COL])

        rel = manifest.partition_file(part, epoch)
        abspath = manifest.abspath(rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        tmp = f"{abspath}.tmp.{os.getpid()}"
        pq.write_table(merged, tmp)
        os.replace(tmp, abspath)

        live = merged.filter(pc.equal(merged[DELETED_COL], False))
        info = {
            "part": part,
            "path": rel,
            "rows": merged.num_rows,
            "live_rows": live.num_rows,
            "checksum": _live_checksum(live),
            "max_offset": int(pc.max(merged[OFFSET_COL]).as_py()),
            "u_on_missing": u_on_missing,
            "epoch": epoch,
        }
        manifest.write_staged(epoch, part, info)
        return pa.Table.from_pylist([info])

    return merge_apply


def _make_catchup_apply(lake_root: str, epochs: list[int],
                        registries_by_epoch: dict[int, dict],
                        prev_files: dict[int, str | None]):
    """Catch-up merge-apply: one shuffle for a whole epoch backlog.

    The group holds ALL events of partition ``part`` for ``epochs``
    (epoch column retained; pre-folded within (key, epoch) only), and
    applies them epoch by epoch — writing the same per-epoch
    copy-on-write file + staged manifest a sequential replay would, so
    lineage, resume points and final bytes are identical while the
    all-to-all exchange is paid once per backlog instead of once per
    epoch (8 pending epochs ⇒ 8× fewer shuffles).
    """
    manifest = LakeManifest(lake_root)

    def merge_apply(group: pa.Table) -> pa.Table:
        part = int(group[PART_COL][0].as_py())
        group = group.drop_columns([PART_COL])
        epoch_np = group["epoch"].to_numpy(zero_copy_only=False)

        cur_file = prev_files.get(part)
        base: pa.Table | None = None  # in-memory state (avoids re-reading)
        out_rows: list[dict] = []
        for e in epochs:
            staged = manifest.read_staged(e, part)
            if staged is not None and os.path.exists(manifest.abspath(staged["path"])):
                out_rows.append(staged)
                cur_file, base = staged["path"], None
                continue
            raw = group.filter(pa.array(epoch_np == e)).drop_columns(["epoch"])
            if raw.num_rows == 0:
                continue  # partition untouched this epoch: carry forward
            registry = SchemaRegistry.from_dict(registries_by_epoch[e])
            if base is None and cur_file:
                base = pq.read_table(manifest.abspath(cur_file))
            u_on_missing = _count_u_on_missing(raw, base)
            ev = registry.conform(raw, _EXTRA_FIELDS)  # drops "op"
            if base is not None:
                merged = pa.concat_tables(
                    [registry.conform(base, _EXTRA_FIELDS), ev]
                )
            else:
                merged = ev
            merged = lww_last_per_key(merged, ["conv_id", "turn_idx"], ["ts", OFFSET_COL])

            rel = manifest.partition_file(part, e)
            abspath = manifest.abspath(rel)
            os.makedirs(os.path.dirname(abspath), exist_ok=True)
            tmp = f"{abspath}.tmp.{os.getpid()}"
            pq.write_table(merged, tmp)
            os.replace(tmp, abspath)

            live = merged.filter(pc.equal(merged[DELETED_COL], False))
            info = {
                "part": part,
                "path": rel,
                "rows": merged.num_rows,
                "live_rows": live.num_rows,
                "checksum": _live_checksum(live),
                "max_offset": int(pc.max(merged[OFFSET_COL]).as_py()),
                "u_on_missing": u_on_missing,
                "epoch": e,
            }
            manifest.write_staged(e, part, info)
            out_rows.append(info)
            cur_file, base = rel, merged
        if not out_rows:
            return pa.Table.from_pylist(
                [], schema=pa.schema([pa.field("part", pa.int64())])
            )
        return pa.Table.from_pylist(out_rows)

    return merge_apply


class CdcEngine:
    """A transcript lake + its WAL replay driver.

    >>> eng = CdcEngine("/tmp/lake", n_partitions=32)
    >>> eng.replay("/tmp/wal")          # applies all uncommitted epochs
    >>> from agr_loader_ray.pipelines.export import export_sorted
    """

    def __init__(self, lake_root: str, n_partitions: int = 32,
                 base_schema: pa.Schema = TRANSCRIPT_SCHEMA):
        self.manifest = LakeManifest(lake_root)
        self.n_partitions = n_partitions
        self.base_schema = base_schema
        os.makedirs(lake_root, exist_ok=True)

    # -- WAL introspection --------------------------------------------------
    @staticmethod
    def wal_epochs(wal_root: str) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(wal_root)
            if d.startswith("epoch=") and os.path.isdir(os.path.join(wal_root, d))
        )

    def _load_registry(self) -> SchemaRegistry:
        d = self.manifest.current_schema_registry()
        return SchemaRegistry.from_dict(d) if d else SchemaRegistry(self.base_schema)

    # -- apply --------------------------------------------------------------
    def apply_epoch(self, wal_root: str, epoch: int) -> dict:
        """Apply one epoch (idempotent; skips if already committed)."""
        t0 = time.perf_counter()
        if os.path.exists(self.manifest.epoch_manifest_path(epoch)):
            return {"epoch": epoch, "skipped": True, "sec": 0.0, "events": 0}

        epoch_dir = os.path.join(wal_root, f"epoch={epoch}")
        registry = self._load_registry()
        prev_parts = self.manifest.current_partitions()
        prev_files = {p: info.get("path") for p, info in prev_parts.items()}

        # Schema events: tiny, read driver-side with predicate+column
        # pushdown, applied in offset order BEFORE the data apply — the
        # epoch-level barrier (SURVEY §7.5.3).
        s_tbl = pads.dataset(epoch_dir).to_table(
            filter=pc.equal(pc.field("op"), "S"), columns=["offset", "schema_change"]
        ).sort_by("offset")
        for change in s_tbl["schema_change"].to_pylist():
            registry.apply(json.loads(change))
        registry_dict = registry.to_dict()

        # event count from parquet footers (cheap) — never a full read
        n_events = sum(
            pq.read_metadata(os.path.join(epoch_dir, f)).num_rows
            for f in os.listdir(epoch_dir)
            if f.endswith(".parquet")
        )

        seg_files = [
            os.path.join(epoch_dir, f)
            for f in sorted(os.listdir(epoch_dir)) if f.endswith(".parquet")
        ]
        total_bytes = sum(os.path.getsize(p) for p in seg_files)
        ds = ray.data.read_parquet(
            seg_files, override_num_blocks=min(len(seg_files), _shuffle_blocks(total_bytes))
        )
        ds = ds.map_batches(
            _PreFoldPartition(self.n_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        apply_fn = _make_merge_apply(self.manifest.lake_root, epoch, registry_dict, prev_files)
        rows = ds.groupby(PART_COL).map_groups(apply_fn, batch_format="pyarrow").take_all()

        # Commit: carry forward untouched partitions, publish atomically.
        parts = dict(prev_parts)
        max_off = max((r["max_offset"] for r in rows), default=None)
        min_off = None
        for r in rows:
            parts[r["part"]] = {k: r.get(k, 0) for k in ("path", "rows", "live_rows", "checksum", "max_offset", "u_on_missing", "epoch")}
        self.manifest.commit_epoch(
            epoch, registry_dict, parts,
            (min_off, max_off) if max_off is not None else None,
        )
        return {
            "epoch": epoch,
            "skipped": False,
            "sec": time.perf_counter() - t0,
            "events": n_events,
            "touched_partitions": len(rows),
        }

    def _epoch_schema_events(self, wal_root: str, epoch: int) -> list[dict]:
        """S-event payloads of one epoch, in offset order (driver-side,
        predicate+column pushdown — tiny)."""
        epoch_dir = os.path.join(wal_root, f"epoch={epoch}")
        s_tbl = pads.dataset(epoch_dir).to_table(
            filter=pc.equal(pc.field("op"), "S"), columns=["offset", "schema_change"]
        ).sort_by("offset")
        return [json.loads(c) for c in s_tbl["schema_change"].to_pylist()]

    def apply_epochs(self, wal_root: str, epochs: list[int]) -> dict:
        """Catch-up apply: a contiguous backlog of epochs in ONE shuffle.

        Produces byte-identical per-epoch lake files and manifests as
        sequential ``apply_epoch`` calls (verified by tests) — only the
        number of all-to-all exchanges changes.  Commits epoch manifests
        in order at the end; a crash before commit resumes instantly
        from the staged per-partition manifests.
        """
        t0 = time.perf_counter()
        epochs = [e for e in epochs
                  if not os.path.exists(self.manifest.epoch_manifest_path(e))]
        if not epochs:
            return {"epochs": [], "events": 0, "sec": 0.0}

        registry = self._load_registry()
        prev_parts = self.manifest.current_partitions()
        prev_files = {p: info.get("path") for p, info in prev_parts.items()}

        registries_by_epoch: dict[int, dict] = {}
        n_events = 0
        epoch_dirs = []
        for e in epochs:
            for ch in self._epoch_schema_events(wal_root, e):
                registry.apply(ch)
            registries_by_epoch[e] = registry.to_dict()
            d = os.path.join(wal_root, f"epoch={e}")
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    path = os.path.join(d, f)
                    epoch_dirs.append(path)
                    n_events += pq.read_metadata(path).num_rows
        total_bytes = sum(os.path.getsize(p) for p in epoch_dirs)

        ds = ray.data.read_parquet(
            epoch_dirs, override_num_blocks=min(len(epoch_dirs), _shuffle_blocks(total_bytes))
        )
        ds = ds.map_batches(
            _PreFoldPartition(self.n_partitions, keep_epoch=True),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        apply_fn = _make_catchup_apply(
            self.manifest.lake_root, epochs, registries_by_epoch, prev_files
        )
        rows = [
            r for r in
            ds.groupby(PART_COL).map_groups(apply_fn, batch_format="pyarrow").take_all()
            if r.get("path")
        ]

        # Commit each epoch in order (carry forward untouched partitions).
        parts = dict(prev_parts)
        stats = []
        for e in epochs:
            erows = [r for r in rows if r["epoch"] == e]
            for r in erows:
                parts[r["part"]] = {
                    k: r.get(k, 0)
                    for k in ("path", "rows", "live_rows", "checksum", "max_offset", "u_on_missing", "epoch")
                }
            max_off = max((r["max_offset"] for r in erows), default=None)
            self.manifest.commit_epoch(
                e, registries_by_epoch[e], parts,
                (None, max_off) if max_off is not None else None,
            )
            stats.append({"epoch": e, "skipped": False, "touched_partitions": len(erows)})
        return {"epochs": stats, "events": n_events, "sec": time.perf_counter() - t0}

    def replay(self, wal_root: str, upto_epoch: int | None = None,
               catchup: bool = True, max_catchup: int = 64) -> dict:
        """Replay all WAL epochs not yet committed (resumable).

        ``catchup=True`` (default) applies the pending backlog in batched
        shuffles of up to ``max_catchup`` epochs; ``catchup=False`` forces
        one shuffle per epoch (same bytes, more exchanges).  On restart
        after a crash, committed epochs are skipped via their manifests
        and a partially-applied epoch resumes from its staged
        per-partition manifests — the exactly-once path (SURVEY §7.5.1).
        """
        t0 = time.perf_counter()
        pending = [
            e for e in self.wal_epochs(wal_root)
            if (upto_epoch is None or e <= upto_epoch)
        ]
        stats: list[dict] = []
        events = 0
        if catchup:
            todo = [e for e in pending
                    if not os.path.exists(self.manifest.epoch_manifest_path(e))]
            stats.extend(
                {"epoch": e, "skipped": True, "sec": 0.0} for e in pending if e not in todo
            )
            for i in range(0, len(todo), max_catchup):
                r = self.apply_epochs(wal_root, todo[i : i + max_catchup])
                stats.extend(r["epochs"])
                events += r["events"]
        else:
            for e in pending:
                s = self.apply_epoch(wal_root, e)
                stats.append(s)
                events += s["events"]
        sec = time.perf_counter() - t0
        return {
            "epochs": stats,
            "events_applied": events,
            "sec": sec,
            "events_per_sec": events / sec if sec > 0 else 0.0,
        }
