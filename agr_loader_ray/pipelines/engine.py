"""The CDC apply engine: WAL epoch replay → partitioned Parquet lake.

Ray-Data-first pipeline (the only hot-path shuffle is the partition
exchange — SURVEY §7.4)::

    read_parquet(wal epochs, coalesced blocks)      # streaming block read
      → map_batches(prefold+partition, pyarrow)     # LWW combiner, no shuffle
      → groupby("part").map_groups(merge_apply)     # the exchange + apply
      → take_all()                                  # P manifest rows (tiny)
      → commit epoch manifests (atomic rename)      # the commit points

Reference lifecycle analogue (``/root/reference/src/aggregate_loader.py``):
an epoch ≙ one ETL group run; the group barrier ≙ the epoch commit; the
8-process Neo4jTransactor pool ≙ the partition-parallel merge-apply
tasks; CSV staging + LOAD CSV MERGE ≙ Parquet deltas + manifest.

Storage model — **merge-on-read with threshold compaction** (Hudi/Delta
MOR style, see PAPERS.md):

- each epoch writes, per touched partition, a *delta* file holding only
  that epoch's folded events (insert/update rows + tombstones);
- when a partition accumulates ``compact_every`` deltas, the next apply
  *compacts*: base + deltas + events fold into a new base file;
- reads (``pipelines/export.py``) fold base + deltas per partition.

``compact_every=1`` degenerates to pure copy-on-write (every epoch is a
compaction — exact per-epoch live counts/checksums, higher write cost).
The default (4) bounds write amplification: per-epoch write ∝ events,
full-state rewrite only every k-th epoch — the property that keeps a
10^10-event replay from rewriting the whole table each micro-batch.

Scale notes (100 TB / multi-node):
- WAL blocks stream with backpressure; shuffle input is coalesced to
  ~1 block/CPU with a 256 MiB floor (see ``_shuffle_blocks``).
- ``n_partitions`` bounds per-task memory (state/P per compaction task);
  fixed per lake like a bucket count — thousands on a real cluster.
- the previous-epoch partition map (P entries) is broadcast to apply
  tasks via closure capture; at P ≫ 10^4 move it to ``ray.put``.
- merge-apply is pure Arrow (sort + adjacency filter) — no row loops.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from ..schemas import DELETED_COL, OFFSET_COL, TRANSCRIPT_SCHEMA
from ..stages.fold import lww_last_per_key, lww_winner_indices
from ..stages.partition import PART_COL, add_partition_column, stable_hash_strings
from ..state.manifest import LakeManifest
from ..state.schema_registry import SchemaRegistry

_EXTRA_FIELDS = [pa.field(OFFSET_COL, pa.int64()), pa.field(DELETED_COL, pa.bool_())]

#: sentinels for "not computed this epoch" (delta writes) — kept typed so
#: manifest rows always share one Arrow schema across partitions
NO_COUNT = -1
NO_CHECKSUM = ""

#: reserved partition id for poison events (SURVEY §4.1: bounded
#: quarantine instead of the reference's unbounded requeue,
#: ``/root/reference/src/transactors/neo4j_transactor.py:108-118``).
#: Rows that fail validation ride the SAME exchange as good rows but
#: land in a quarantine sink + manifest counter, never in the lake.
QUARANTINE_PART = -1


class TransientApplyError(RuntimeError):
    """A merge-apply failure worth retrying (flaky I/O, injected chaos
    fault).  The apply tasks run with ``retry_exceptions=[this]`` and a
    BOUNDED ``max_retries`` — the provable version of the reference's
    unbounded requeue-and-sleep loop
    (``/root/reference/src/transactors/neo4j_transactor.py:108-118``,
    SURVEY §4.1).  Retries are safe because every apply write is
    idempotent: staged per-partition manifests short-circuit re-applied
    work and data files publish under deterministic names."""


def _consume_failpoint(path: "str | None") -> None:
    """Chaos-test seam: raise a TransientApplyError once (marker file is
    atomically consumed — ``os.remove`` succeeds in exactly one task) or
    persistently (marker named ``*.always`` is never consumed)."""
    if not path:
        return
    if path.endswith(".always"):
        if os.path.exists(path):
            raise TransientApplyError("injected persistent fault")
        return
    try:
        os.remove(path)
    except FileNotFoundError:
        return
    raise TransientApplyError("injected transient fault")

_VALID_OPS = pa.array(["I", "U", "D"])


def _morton_spread_2d(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of ``x`` to even bit positions (uint64)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _zorder_cluster(tbl: pa.Table, bits: int = 21) -> pa.Table:
    """Reorder rows by the Morton (Z-order) interleave of
    (conv_id dense rank, ts) — multi-dimensional clustering so row-group
    min/max stats stay useful for BOTH key-range and time-range pruning.
    Pure layout: the table's rows are unchanged, only their order."""
    if tbl.num_rows == 0:
        return tbl

    def scale(v: np.ndarray) -> np.ndarray:
        # map [0, vmax] into [0, 2^bits): divide down when the domain is
        # wide (no overflowing multiply), stretch up when it is narrow
        top = np.int64((1 << bits) - 1)
        vmax = max(int(v.max()), 1)
        if vmax > top:
            return v // np.int64(vmax // top + 1)
        return v * np.int64(top // vmax)

    # EQUI-DEPTH (rank) mapping for both dimensions, not min-max linear:
    # a handful of far outliers (late events) would otherwise compress
    # the bulk into one bucket and kill pruning.  Rank order preserves
    # value order, so row-group min/max stats stay sound and tight.
    conv = tbl["conv_id"].to_numpy(zero_copy_only=False)
    _, rank = np.unique(conv, return_inverse=True)
    ts = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    _, ts_rank = np.unique(ts, return_inverse=True)
    a = scale(rank.astype(np.int64))
    b = scale(ts_rank.astype(np.int64))
    z = _morton_spread_2d(a) | (_morton_spread_2d(b) << np.uint64(1))
    order = np.argsort(z, kind="stable")
    return tbl.take(pa.array(order))


def _invalid_event_mask(batch: pa.Table) -> pa.Array:
    """True where an event can NEVER be applied (poison): null key
    components, null LWW ordering fields, or an unknown op.  Vectorized;
    evaluated once per block before the pre-fold."""
    m = pc.is_null(batch["conv_id"])
    for col in ("turn_idx", "ts", "offset"):
        m = pc.or_(m, pc.is_null(batch[col]))
    m = pc.or_(m, pc.invert(pc.fill_null(pc.is_in(batch["op"], value_set=_VALID_OPS), False)))
    return m


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


from ray.data.datasource.parquet_meta_provider import ParquetMetadataProvider


class _NoPrefetchParquetMeta(ParquetMetadataProvider):
    """Skip Ray's remote parquet-footer prefetch for the replay read.

    The driver has ALREADY read every segment's footer locally (event
    counts, byte sizes) before building the dataset, and block
    splitting is pinned via ``override_num_blocks`` — the prefetch's
    remote metadata tasks only re-fetch the same footers at ~0.5-0.7 s
    per replay (≈15% of the 32-CPU leg's floor, measured)."""

    def prefetch_file_metadata(self, fragments, **ray_remote_args):
        return None


_NO_PREFETCH_META = _NoPrefetchParquetMeta()


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


def _slices_by_part(block: pa.Table, nslots: int) -> tuple:
    """Slice one prefolded block into per-partition sub-tables.

    One stable int32 argsort on the ``part`` column (values in
    [-1, nparts); slot 0 is the quarantine stream) and ``nslots``
    zero-copy slices of the part-ordered table.  Unlike the sort-based
    shuffle there is no boundary-sampling pass and no comparison sort of
    the payload — the partition id is already materialized, so the
    exchange is pure bucketing (measured 3× faster than
    ``groupby(part)`` on the 16 M-event bench WAL)."""
    part = block[PART_COL].to_numpy(zero_copy_only=False)
    if len(part) == 0 or (part[1:] >= part[:-1]).all():
        # prefold emits part-ordered blocks (fused gather): slice
        # zero-copy, no payload re-sort.  A block concatenated from
        # multiple prefold outputs loses the order and takes the sort.
        t = block
        slot = part + 1  # QUARANTINE_PART (-1) → slot 0
    else:
        order = np.argsort(part, kind="stable")
        t = block.take(pa.array(order))
        slot = part[order] + 1
    bounds = np.searchsorted(slot, np.arange(nslots + 1))
    return tuple(
        t.slice(bounds[s], bounds[s + 1] - bounds[s]) for s in range(nslots)
    )


@ray.remote
def _split_block_by_part(block: pa.Table, nslots: int) -> tuple:
    """Standalone split task (Dataset-fed exchange path): called with
    ``.options(num_returns=nslots)`` so each slice becomes its own
    object — a reduce task fetches ONLY its partition's bytes, which is
    what keeps the pattern shuffle-shaped on a multi-node cluster
    (per-slice transfers, no broadcast)."""
    return _slices_by_part(block, nslots)


@ray.remote
def _map_prefold_split(paths: list[str], prefold, nslots: int) -> tuple:
    """FUSED shuffle map task: read one group of sealed WAL segments,
    prefold, and bucket into per-partition slices — all in ONE task.

    Fusing read+prefold+split removes two per-replay costs the
    Dataset-fed path pays: the streaming-executor startup (~0.5 s per
    ``apply_epochs``, pure fixed cost that dominates the 32-CPU leg's
    wall time) and one full plasma round-trip of the prefolded payload
    (Ray Data stores the prefold output block, then the split task
    re-fetches it just to re-store the slices).  Segment files are
    sealed and schema-stable (schema changes ride the stream as op='S'
    rows, never as parquet schema drift), so a plain ``pq.read_table``
    per file is the whole read path.  Retries are safe: reads are
    deterministic and the task is pure."""
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    return _slices_by_part(prefold(tbl), nslots)


def _group_files_by_bytes(files: list[str], nblocks: int) -> list[list[str]]:
    """Contiguous, byte-balanced grouping of WAL segment files into
    ``nblocks`` map-task inputs.  Contiguity keeps each group's rows in
    (epoch, offset) order — the same stable order the Dataset read
    yields — so reduce-side concatenation order stays deterministic."""
    sizes = [os.path.getsize(p) for p in files]
    total = sum(sizes)
    nblocks = max(1, min(nblocks, len(files)))
    target = total / nblocks
    groups: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for p, s in zip(files, sizes):
        cur.append(p)
        acc += s
        if acc >= target * (len(groups) + 1) and len(groups) < nblocks - 1:
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _reduce_apply_part(apply_fn, *slices: pa.Table) -> list[dict]:
    """Reduce side of the task-based partition exchange: concatenate one
    partition's slices (block order — the same stable order the sort
    shuffle yields) and run the merge-apply kernel.  Empty partitions
    return no rows, matching ``groupby`` semantics (absent groups are
    never materialized)."""
    tabs = [s for s in slices if s.num_rows]
    if not tabs:
        return []
    out = apply_fn(pa.concat_tables(tabs).combine_chunks())
    return out.to_pylist() if isinstance(out, pa.Table) else list(out)


def _task_exchange_apply(files: list[str], nblocks: int, prefold,
                         n_partitions: int, apply_fn,
                         apply_retries: int) -> list[dict]:
    """Partition exchange as raw Ray tasks over the sealed WAL segments.

    Map side: ``nblocks`` fused read+prefold+split tasks
    (:func:`_map_prefold_split`), each fanning out ``n_partitions + 1``
    per-partition slices as separate objects.  Reduce side: one task per
    partition gathers its slices and runs the same ``apply_fn`` the
    ``groupby(part).map_groups`` path uses.  Semantics are identical —
    every row of a partition reaches exactly one apply call, in stable
    (epoch, offset) block order — but the sort shuffle's sampling pass,
    payload comparison sort, streaming-executor startup and the extra
    plasma round-trip of the prefolded payload are all gone (16 M-event
    replay exchange: 2.7 s → 1.0 s for the split rewrite, a further
    ~0.8 s fixed cost for the read+prefold fusion, measured).  The
    reduce barrier (all maps before any apply) is inherent to the
    exchange, same as the shuffle it replaces.

    Partitioning assumption: ``n_partitions`` is fixed per lake (a
    bucket count), so the reduce fan-in is bounded by the map block
    count — object count is O(blocks × parts), the same envelope as
    Ray's shuffle map outputs.  At cluster scale the scheduler bounds
    map concurrency by CPUs and the object store spills excess slices,
    exactly like native shuffle map outputs."""
    nslots = n_partitions + 1
    split = _map_prefold_split.options(num_returns=nslots)
    reduce_opts = ({"max_retries": apply_retries,
                    "retry_exceptions": [TransientApplyError]}
                   if apply_retries else {})
    reduce = _reduce_apply_part.options(**reduce_opts)
    apply_ref = ray.put(apply_fn)
    prefold_ref = ray.put(prefold)
    per_block = [split.remote(g, prefold_ref, nslots)
                 for g in _group_files_by_bytes(files, nblocks)]
    out = ray.get([
        reduce.remote(apply_ref, *[refs[s] for refs in per_block])
        for s in range(nslots)
    ])
    return [row for part_rows in out for row in part_rows]


def _count_u_on_missing(winners: pa.Table, existing_keys: np.ndarray | None) -> int:
    """Count per-key LWW winners that are updates on keys absent from the
    current partition state.

    The reference's ``MATCH (x {primaryKey}) MERGE …`` silently drops
    rows whose key is missing (SURVEY J1); our policy is upsert-anyway
    plus this lineage counter (≙ resolution-statistics counters,
    ``/root/reference/src/etl/molecular_interaction_etl.py:451-454``).
    """
    from ..stages.partition import key_hash

    if "op" not in winners.column_names or winners.num_rows == 0:
        return 0
    is_u = pc.equal(winners["op"], "U").to_numpy(zero_copy_only=False)
    if not is_u.any():
        return 0
    if existing_keys is None or len(existing_keys) == 0:
        return int(is_u.sum())
    ev_h = key_hash(winners["conv_id"], winners["turn_idx"])
    return int((is_u & ~np.isin(ev_h, existing_keys)).sum())


class _PreFoldPartition:
    """map_batches stage: drop S rows, LWW-prefold within the block,
    normalize to lake layout, add the partition column.

    ``keep_epoch=True`` (catch-up mode) folds within ``(key, epoch)``
    so per-epoch lake deltas stay byte-identical to sequential
    application."""

    def __init__(self, n_partitions: int, keep_epoch: bool = False,
                 constraints: list | None = None):
        self.n = n_partitions
        self.keep_epoch = keep_epoch
        self.constraints = constraints or []

    def _to_lake_layout(self, batch: pa.Table) -> pa.Table:
        deleted = pc.fill_null(pc.equal(batch["op"], "D"), False)
        # "op" survives to the merge for the update-on-missing-key metric
        # (the reference's MATCH drops such rows silently — we count them
        # into lineage instead, SURVEY §7.5.4 / A5); dropped before write.
        drop = [] if self.keep_epoch else ["epoch"]
        batch = (batch.drop_columns(drop) if drop else batch).append_column(DELETED_COL, deleted)
        return batch.rename_columns(
            [OFFSET_COL if c == "offset" else c for c in batch.column_names]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # keep null-op rows: they are poison, not schema events
        batch = batch.filter(pc.fill_null(pc.not_equal(batch["op"], "S"), True))
        bad_mask = _invalid_event_mask(batch)
        bad = batch.filter(bad_mask)
        batch = batch.filter(pc.invert(bad_mask))
        if self.constraints:
            # declarative CHECK constraints (state/constraints.py): I/U
            # rows violating any rule join the quarantine stream BEFORE
            # the fold, so a violating later-ts update can never shadow
            # a valid event in the LWW order
            from ..state.constraints import constraint_violations

            viol = constraint_violations(batch, self.constraints)
            if viol is not None and pc.any(viol).as_py():
                viol_rows = batch.filter(viol)
                batch = batch.filter(pc.invert(viol))
                bad = (pa.concat_tables([bad, viol_rows])
                       if bad.num_rows else viol_rows)
        key = ["conv_id", "turn_idx"] + (["epoch"] if self.keep_epoch else [])
        idx = (lww_winner_indices(batch, key, ["ts", "offset"])
               if batch.num_rows > 1 else None)
        if idx is not None:
            # fused part-ordered gather: hash only the winners' KEY
            # columns (narrow takes), stable-argsort the int32 part ids,
            # and pay ONE full-payload take that lands already ordered by
            # partition — the downstream split task then slices zero-copy
            # instead of re-sorting the whole payload (one fewer
            # full-table gather per block; the 32-CPU replay leg is
            # memory-bus-bound, so saved bytes are saved wall time).
            # Within a partition the row order is identical to the
            # unfused path (stable sort over key-code-ordered winners),
            # so lake bytes are unchanged (exchange equivalence suite).
            from ..stages.partition import key_hash

            ii = pa.array(idx)
            part_w = (key_hash(batch["conv_id"].take(ii),
                               batch["turn_idx"].take(ii))
                      % np.uint64(self.n)).astype(np.int32)
            ord2 = np.argsort(part_w, kind="stable")
            winners = batch.take(pa.array(idx[ord2]))
            out = self._to_lake_layout(winners).append_column(
                PART_COL, pa.array(part_w[ord2], pa.int32()))
        else:
            if batch.num_rows:
                batch = lww_last_per_key(batch, key, ["ts", "offset"])
            out = add_partition_column(self._to_lake_layout(batch), self.n)
        if bad.num_rows:
            # poison rows ride the same exchange under the reserved
            # partition id (-1 = slot 0: PREPENDED so the block stays
            # part-ascending for the zero-copy split); the merge stage
            # diverts them to the sink
            bad_out = self._to_lake_layout(bad).append_column(
                PART_COL, pa.array(np.full(bad.num_rows, QUARANTINE_PART, np.int32)))
            out = pa.concat_tables([bad_out.select(out.column_names), out])
        return out


def _base_files(info: dict | None) -> list[str]:
    """Base file(s) of a partition info entry — a single path for the
    common case, a LIST when compaction split a large partition into
    size-bounded parts (disjoint key ranges of one sorted snapshot)."""
    base = (info or {}).get("base")
    if not base:
        return []
    return list(base) if isinstance(base, (list, tuple)) else [base]


def _info_files(info: dict | None) -> list[str]:
    """Relative data files of a partition info entry, base first."""
    if not info:
        return []
    return _base_files(info) + list(info.get("deltas") or [])


class _PartitionApplier:
    """Applies one epoch's folded events to one partition (delta write or
    compaction), shared by the sequential and catch-up paths so the two
    produce byte-identical files and manifests."""

    def __init__(self, lake_root: str, compact_every: int, commit_io=None):
        self.manifest = LakeManifest(lake_root, commit_io)
        self.compact_every = compact_every

    def _read_conformed(self, rel: str, registry: SchemaRegistry) -> pa.Table:
        return registry.conform(pq.read_table(self.manifest.abspath(rel)), _EXTRA_FIELDS)

    def _existing_keys(self, info: dict | None) -> np.ndarray | None:
        """uint64 key hashes of the partition's current state — reads ONLY
        the key columns (column pruning: ~16 B/row vs full text rows)."""
        from ..stages.partition import key_hash

        files = _info_files(info)
        if not files:
            return None
        parts = []
        for rel in files:
            t = pq.read_table(self.manifest.abspath(rel), columns=["conv_id", "turn_idx"])
            parts.append(key_hash(t["conv_id"], t["turn_idx"]))
        return np.concatenate(parts)

    def apply_one(self, part: int, epoch: int, raw: pa.Table,
                  prev_info: dict | None, registry: SchemaRegistry,
                  existing_keys: np.ndarray | None = None) -> tuple[dict, np.ndarray | None]:
        """``raw``: this epoch's pre-folded events for ``part`` in lake
        layout plus the ``op`` column.  Returns ``(info, winner_keys)``
        where the second element is the partition's UPDATED key-hash set
        (None when the staged fast path was taken — re-derive lazily).

        ``existing_keys``: current key-hash set of the partition, or
        None → read lazily from files.  Callers applying several epochs
        carry it forward (``existing ∪ winner_keys``) so the key-column
        file scans happen once per replay, not once per epoch (measured:
        per-epoch delta-file key scans made low compaction frequencies
        SLOWER than frequent ones)."""
        staged = self.manifest.read_staged(epoch, part)
        if staged is not None and all(
            os.path.exists(self.manifest.abspath(f)) for f in _info_files(staged)
        ):
            return staged, None

        from ..stages.partition import key_hash

        winners = lww_last_per_key(raw, ["conv_id", "turn_idx"], ["ts", OFFSET_COL])
        ev = registry.conform(winners, _EXTRA_FIELDS)  # drops "op"
        wk = key_hash(winners["conv_id"], winners["turn_idx"])

        prev_deltas = list(prev_info.get("deltas") or []) if prev_info else []
        prev_base = prev_info.get("base") if prev_info else None
        compact = len(prev_deltas) + 1 > self.compact_every or (
            prev_base is None and not prev_deltas and self.compact_every == 1
        )
        if self.compact_every == 1:
            compact = True

        if existing_keys is None:
            existing_keys = self._existing_keys(prev_info)
        u_on_missing = _count_u_on_missing(winners, existing_keys)

        if compact:
            tables = [self._read_conformed(rel, registry)
                      for rel in _base_files(prev_info) + prev_deltas]
            merged = pa.concat_tables([*tables, ev]) if tables else ev
            merged = lww_last_per_key(merged, ["conv_id", "turn_idx"], ["ts", OFFSET_COL])
            # base files are key-sorted: parquet row-group min/max stats on
            # conv_id become selective (point_lookup predicate pushdown) and
            # key runs compress better; cost is a per-partition local sort
            merged = merged.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            rel = os.path.join(f"part={part}", f"base-epoch={epoch}.parquet")
            self._write(rel, merged)
            live = merged.filter(pc.equal(merged[DELETED_COL], False))
            info = {
                "part": part, "base": rel, "deltas": [], "delta_blooms": [],
                "rows": merged.num_rows, "live_rows": live.num_rows,
                "checksum": _live_checksum(live), "delta_rows": ev.num_rows,
                "max_offset": int(pc.max(merged[OFFSET_COL]).as_py()),
                "u_on_missing": u_on_missing, "epoch": epoch,
            }
        else:
            from ..stages.bloom import bloom_hex_from_hashes

            rel = os.path.join(f"part={part}", f"delta-epoch={epoch}.parquet")
            self._write(rel, ev)
            prev_rows = prev_info.get("rows", 0) if prev_info else 0
            # per-delta key-hash micro-bloom → manifest data skipping for
            # point lookups (bases are always read; old lakes without
            # blooms just skip the pruning).  Aligned with "deltas".
            prev_blooms = list(prev_info.get("delta_blooms") or []) if prev_info else []
            if len(prev_blooms) != len(prev_deltas):
                prev_blooms = [None] * len(prev_deltas)
            info = {
                "part": part, "base": prev_base, "deltas": prev_deltas + [rel],
                "delta_blooms": prev_blooms + [bloom_hex_from_hashes(wk)],
                "rows": prev_rows + ev.num_rows, "live_rows": NO_COUNT,
                "checksum": NO_CHECKSUM, "delta_rows": ev.num_rows,
                "max_offset": int(pc.max(ev[OFFSET_COL]).as_py()),
                "u_on_missing": u_on_missing, "epoch": epoch,
            }
        self.manifest.write_staged(epoch, part, info)
        new_existing = wk if existing_keys is None else np.union1d(existing_keys, wk)
        return info, new_existing

    def _write(self, rel: str, tbl: pa.Table,
               row_group_size: int | None = None) -> None:
        # all data-file publishes go through the commit-I/O seam (atomic
        # rename locally; single-shot PUT on object stores — commit_io.py)
        self.manifest.commit_io.publish_table(self.manifest.abspath(rel), tbl,
                                              row_group_size=row_group_size)


def _manifest_row_table(rows: list[dict]) -> pa.Table:
    """Manifest rows → one consistently-typed Arrow table (base and
    deltas are list<string> — base may be multiple size-bounded parts;
    sentinel-typed counters — no schema drift across groups)."""
    if not rows:
        return pa.table({"part": pa.array([], pa.int64())})
    rows = [{**r, "base": _base_files(r)} for r in rows]
    schema = pa.schema(
        [
            pa.field("part", pa.int64()),
            pa.field("base", pa.list_(pa.string())),
            pa.field("deltas", pa.list_(pa.string())),
            pa.field("delta_blooms", pa.list_(pa.string())),
            pa.field("rows", pa.int64()),
            pa.field("live_rows", pa.int64()),
            pa.field("checksum", pa.string()),
            pa.field("delta_rows", pa.int64()),
            pa.field("max_offset", pa.int64()),
            pa.field("u_on_missing", pa.int64()),
            pa.field("epoch", pa.int64()),
            # per-reason quarantine counts, JSON-encoded (quarantine rows
            # only; null elsewhere) — dicts can't ride an Arrow schema
            pa.field("reasons", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _quarantine_reasons(raw: pa.Table, constraints: list) -> list:
    """Per-row reason labels for a parked quarantine block.  ``raw`` is
    in lake layout (offset renamed); map it back for the shared
    structural mask, then let declaration order attribute the rest."""
    from ..state.constraints import violation_reasons

    renamed = raw.rename_columns(
        ["offset" if c == OFFSET_COL else c for c in raw.column_names])
    return violation_reasons(renamed, constraints or [],
                             invalid_mask=_invalid_event_mask(renamed))


def _make_catchup_apply(lake_root: str, epochs: list[int],
                        registries_by_epoch: dict[int, dict],
                        prev_parts: dict[int, dict], compact_every: int,
                        commit_io=None, constraints: list | None = None,
                        failpoint: "str | None" = None):
    """Catch-up merge-apply: one shuffle for a whole epoch backlog.

    The group holds ALL events of partition ``part`` for ``epochs``
    (epoch column retained; pre-folded within (key, epoch) only), and
    applies them epoch by epoch — writing the same per-epoch delta /
    compaction files and staged manifests a sequential replay would, so
    lineage, resume points and final bytes are identical while the
    all-to-all exchange is paid once per backlog instead of once per
    epoch.
    """
    applier = _PartitionApplier(lake_root, compact_every, commit_io)

    def merge_apply(group: pa.Table) -> pa.Table:
        _consume_failpoint(failpoint)
        part = int(group[PART_COL][0].as_py())
        group = group.drop_columns([PART_COL])
        epoch_np = group["epoch"].to_numpy(zero_copy_only=False)

        if part == QUARANTINE_PART:
            # poison sink: park the rows (deterministic per-epoch file,
            # idempotent on retry) + a lineage row; never applied
            out_rows = []
            for e in epochs:
                raw = group.filter(pa.array(epoch_np == e)).drop_columns(["epoch"])
                if raw.num_rows == 0:
                    continue
                staged = applier.manifest.read_staged(e, QUARANTINE_PART)
                if staged is None:
                    rel = os.path.join("quarantine", f"epoch={e}.parquet")
                    # attribute each parked row to its reason (structural
                    # invalid_event or the first violated constraint) —
                    # written into the file for the operator, counted
                    # into lineage for the manifest
                    labels = _quarantine_reasons(raw, constraints)
                    reasons: dict[str, int] = {}
                    for lb in labels:
                        if lb is not None:
                            reasons[lb] = reasons.get(lb, 0) + 1
                    applier._write(rel, raw.append_column(
                        "_reason", pa.array(labels, pa.string())))
                    offs = pc.max(raw[OFFSET_COL]).as_py()
                    staged = {
                        "part": QUARANTINE_PART, "base": rel, "deltas": [],
                        "rows": raw.num_rows, "live_rows": NO_COUNT,
                        "checksum": NO_CHECKSUM, "delta_rows": raw.num_rows,
                        "max_offset": -1 if offs is None else int(offs),
                        "u_on_missing": 0, "epoch": e,
                        "reasons": json.dumps(reasons, sort_keys=True),
                    }
                    applier.manifest.write_staged(e, QUARANTINE_PART, staged)
                out_rows.append(staged)
            return _manifest_row_table(out_rows)

        info = prev_parts.get(part)
        existing: "np.ndarray | None" = None
        out_rows: list[dict] = []
        for e in epochs:
            raw = group.filter(pa.array(epoch_np == e)).drop_columns(["epoch"])
            if raw.num_rows == 0:
                continue  # partition untouched this epoch: carry forward
            registry = SchemaRegistry.from_dict(registries_by_epoch[e])
            try:
                info, existing = applier.apply_one(part, e, raw, info,
                                                   registry, existing)
            except OSError as err:
                # flaky-filesystem faults are worth the bounded retry;
                # anything else fails fast (a real bug must surface)
                raise TransientApplyError(
                    f"I/O fault applying part {part} epoch {e}") from err
            out_rows.append(info)
        return _manifest_row_table(out_rows)

    return merge_apply


class CdcEngine:
    """A transcript lake + its WAL replay driver.

    >>> eng = CdcEngine("/tmp/lake", n_partitions=32)
    >>> eng.replay("/tmp/wal")          # applies all uncommitted epochs
    >>> from agr_loader_ray.pipelines.export import export_sorted
    """

    def __init__(self, lake_root: str, n_partitions: int = 32,
                 base_schema: pa.Schema = TRANSCRIPT_SCHEMA,
                 compact_every: int = 4, commit_io=None, lease=None,
                 apply_retries: int = 2, failpoint: "str | None" = None,
                 exchange: str = "task"):
        #: bounded per-task retry budget for TransientApplyError (flaky
        #: I/O / chaos faults) — SURVEY §4.1's answer to the reference's
        #: unbounded requeue; 0 disables.  ``failpoint`` is the
        #: chaos-test marker path (see _consume_failpoint).
        self.apply_retries = apply_retries
        self.failpoint = failpoint
        #: partition-exchange strategy: "task" (default — raw-task
        #: split/reduce over the prefold Dataset's blocks, no sort
        #: shuffle; see _task_exchange_apply) or "dataset"
        #: (groupby(part).map_groups — the generic Ray Data path, kept
        #: as a fallback and equivalence check).
        if exchange not in ("task", "dataset"):
            raise ValueError(f"exchange must be 'task' or 'dataset', got {exchange!r}")
        self.exchange = exchange
        self.commit_io = commit_io
        self.manifest = LakeManifest(lake_root, commit_io)
        self.n_partitions = n_partitions
        self.base_schema = base_schema
        self.compact_every = max(1, compact_every)
        self.lease = lease
        os.makedirs(lake_root, exist_ok=True)

    def _check_writer(self) -> None:
        """Single-writer guard (state/lease.py): leased engines must
        still hold their fencing token; lease-less engines may write
        only while no live foreign lease exists.  Called at the start
        of every mutating entry point AND immediately before each
        manifest commit, so a zombie writer cannot commit over its
        successor."""
        from ..state.lease import check_no_foreign_lease

        check_no_foreign_lease(self.manifest.lake_root, self.lease)

    # -- declarative row constraints (state/constraints.py) ------------------
    def set_constraints(self, constraints: list[dict]) -> dict:
        """Install (replace) the lake's CHECK-constraint rule set.

        Validated now, enforced on every subsequent replay: I/U events
        violating a rule are diverted to the quarantine sink with a
        per-constraint reason and counted into the epoch manifest's
        lineage (``quarantine.reasons``).  The rule set is versioned
        monotonically and persisted at the lake root, and the governing
        version is stamped into each epoch manifest it affected
        (``constraints_version``).  Reference analogue: Cerberus input
        validation before load (data_file_manager.py:120-137) + ad-hoc
        skip-rules (SURVEY M4) — made declarative, versioned, bounded.
        """
        from ..state.constraints import publish_constraints

        self._check_writer()
        return publish_constraints(self.manifest.lake_root, constraints,
                                   self.manifest.commit_io)

    def constraints_state(self) -> dict:
        """→ {"version": int, "constraints": [...]}; version 0 ≙ none."""
        from ..state.constraints import load_constraints

        return load_constraints(self.manifest.lake_root)

    def redrive_quarantine(self) -> dict:
        """Dead-letter redrive: re-apply parked quarantine events that
        pass the CURRENT rule set (the DLQ-reprocess half of the
        validate-then-load loop — fix the constraints, then redrive).

        Eligible rows (structurally valid + passing every current
        constraint + not previously redriven) are replayed as ONE new
        epoch through the normal apply machinery, so LWW placement,
        lineage and exactly-once bookkeeping are the standard late-data
        path.  Still-violating rows stay parked in their original
        files.  Redriven offsets are recorded in ``_REDRIVEN.json``
        AFTER the epoch commit (at-least-once: a crash in between
        re-redrives the same events, which is state-idempotent — same
        (key, ts, offset) rows fold to the same winner).

        The redrive epoch number is ``last_committed + 1``.  Redrive a
        lake only after its source WAL is fully ingested: a WAL that
        later grows an epoch with this number cannot be applied under
        that number.  The collision is DETECTED, not silent — the epoch
        is reserved in ``_REDRIVEN.json`` before apply and its manifest
        is stamped ``redrive: true``, and ``replay()`` raises when a
        pending WAL epoch number matches a redrive-committed epoch
        instead of skipping the WAL epoch's events.
        """
        import shutil
        import tempfile

        from ..state.constraints import constraint_violations

        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            return {"redriven": 0, "epoch": None, "still_parked": 0}
        qfiles: list[str] = []
        for e in self.manifest.committed_epochs():
            q = self.manifest.read_epoch(e).get("quarantine")
            if q:
                qfiles.extend(q.get("files", []))
        if not qfiles:
            return {"redriven": 0, "epoch": None, "still_parked": 0}

        redriven_path = os.path.join(self.manifest.lake_root, "_REDRIVEN.json")
        already: set[int] = set()
        redrive_epochs: set[int] = set()
        if os.path.exists(redriven_path):
            with open(redriven_path) as fh:
                rj = json.load(fh)
            already = set(rj["offsets"])
            redrive_epochs = set(rj.get("epochs", []))

        tbls = []
        for rel in sorted(set(qfiles)):
            t = pq.read_table(self.manifest.abspath(rel))
            t = t.drop_columns([c for c in ("_reason", DELETED_COL)
                                if c in t.column_names])
            t = t.rename_columns(
                ["offset" if c == OFFSET_COL else c for c in t.column_names])
            tbls.append(t)
        parked = pa.concat_tables(tbls, promote_options="default")
        ok = np.asarray(pc.invert(_invalid_event_mask(parked))
                        .to_numpy(zero_copy_only=False), bool)
        cons = self.constraints_state()["constraints"]
        viol = constraint_violations(parked, cons)
        if viol is not None:
            ok &= ~np.asarray(viol.to_numpy(zero_copy_only=False), bool)
        offs = parked["offset"].to_numpy(zero_copy_only=False)
        done = np.isin(offs, np.fromiter(already, np.int64, len(already)))
        eligible = parked.filter(pa.array(ok & ~done))
        still = int((~ok & ~done).sum())
        if eligible.num_rows == 0:
            return {"redriven": 0, "epoch": None, "still_parked": still}

        epoch = last + 1
        # Reserve the epoch number BEFORE applying (offsets unchanged, so
        # a crash here still re-redrives the same events): replay()'s
        # collision guard must be armed even if we die between the epoch
        # commit and the post-commit offsets publish below.
        redrive_epochs.add(epoch)
        self.manifest.commit_io.publish_json(
            redriven_path, {"offsets": sorted(already),
                            "epochs": sorted(redrive_epochs)})
        # quarantine files carry no epoch column (dropped at park time) —
        # the redrive epoch is this new one
        eligible = eligible.append_column(
            "epoch", pa.array(np.full(eligible.num_rows, epoch, np.int32)))
        wal_tmp = tempfile.mkdtemp(prefix="agr_redrive_wal_")
        try:
            edir = os.path.join(wal_tmp, f"epoch={epoch}")
            os.makedirs(edir)
            with open(os.path.join(wal_tmp, "_WAL_SEALED_MODE"), "w"):
                pass
            pq.write_table(eligible, os.path.join(edir, "segment-0000.parquet"))
            with open(os.path.join(edir, "_SEALED"), "w"):
                pass

            r = self.apply_epochs(wal_tmp, [epoch],
                                  manifest_extras={"redrive": True})
        finally:
            shutil.rmtree(wal_tmp, ignore_errors=True)
        new_offsets = sorted(already | set(
            int(o) for o in eligible["offset"].to_pylist()))
        self.manifest.commit_io.publish_json(
            redriven_path, {"offsets": new_offsets,
                            "epochs": sorted(redrive_epochs)})
        return {"redriven": eligible.num_rows, "epoch": epoch,
                "still_parked": still, "events": r["events"]}

    # -- WAL introspection --------------------------------------------------
    @staticmethod
    def wal_epochs(wal_root: str, trust_unsealed: bool = False,
                   missing_ok: bool = False) -> list[int]:
        """Epochs safe to consume.

        An epoch directory is *sealed* once the writer drops a ``_SEALED``
        sentinel as its last write (``wal/generator.py``).  Tailers must
        only apply sealed epochs: applying a half-written epoch would
        commit its manifest and then skip the late segments forever.

        Sealed-mode is EXPLICIT, not inferred: our writer drops a
        root-level ``_WAL_SEALED_MODE`` marker *before* its first epoch
        directory, so a concurrent tailer polling mid-write never sees
        "zero sentinels ⇒ assume all sealed" and swallows a half-written
        epoch 0 (the inference race).  Foreign at-rest WALs (no marker,
        no sentinels anywhere) are readable only with an explicit
        ``trust_unsealed=True`` — the caller asserts nothing is writing.
        """
        if not os.path.isdir(wal_root):
            # a tailer may legitimately start watching before the writer
            # has created the WAL root (binlog-tail startup race) — that
            # caller passes missing_ok=True and gets "no epochs yet".
            # One-shot replay/verify keep the default and fail loudly on
            # a typo'd path instead of reporting success with 0 events.
            if missing_ok:
                return []
            raise FileNotFoundError(
                f"WAL root {wal_root!r} does not exist (pass missing_ok=True "
                "only for tail loops racing the writer's first epoch)")
        dirs = {
            int(d.split("=", 1)[1]): os.path.join(wal_root, d)
            for d in os.listdir(wal_root)
            if d.startswith("epoch=") and os.path.isdir(os.path.join(wal_root, d))
        }
        sealed_mode = os.path.exists(os.path.join(wal_root, "_WAL_SEALED_MODE"))
        sealed = [e for e, p in dirs.items()
                  if os.path.exists(os.path.join(p, "_SEALED"))]
        if not sealed_mode and not sealed and dirs:
            if trust_unsealed:
                return sorted(dirs)  # foreign sealed-at-rest WAL, asserted
            raise ValueError(
                f"{wal_root} has epoch dirs but no _SEALED sentinels and no "
                "_WAL_SEALED_MODE marker — it may be mid-write; pass "
                "trust_unsealed=True only if nothing is writing it"
            )
        return sorted(sealed)

    def _load_registry(self) -> SchemaRegistry:
        d = self.manifest.current_schema_registry()
        return SchemaRegistry.from_dict(d) if d else SchemaRegistry(self.base_schema)

    def _epoch_schema_events(self, wal_root: str, epoch: int) -> list[dict]:
        """S-event payloads of one epoch, in offset order.

        Fast path: the ``_schema_events.json`` sidecar our WAL writer
        emits (schema changes are rare; scanning every epoch's ``op``
        column on the driver cost ~1 s per 16 M events).  Foreign WALs
        without a sidecar fall back to a predicate+column-pruned scan.
        """
        epoch_dir = os.path.join(wal_root, f"epoch={epoch}")
        sidecar = os.path.join(epoch_dir, "_schema_events.json")
        if os.path.exists(sidecar):
            with open(sidecar) as fh:
                rows = json.load(fh)
            return [json.loads(r["schema_change"]) for r in sorted(rows, key=lambda r: r["offset"])]
        s_tbl = pads.dataset(
            epoch_dir, ignore_prefixes=["_", "."]
        ).to_table(
            filter=pc.equal(pc.field("op"), "S"), columns=["offset", "schema_change"]
        ).sort_by("offset")
        return [json.loads(c) for c in s_tbl["schema_change"].to_pylist()]

    @staticmethod
    def _epoch_files(wal_root: str, epoch: int) -> list[str]:
        d = os.path.join(wal_root, f"epoch={epoch}")
        return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]

    # -- apply --------------------------------------------------------------
    def apply_epochs(self, wal_root: str, epochs: list[int],
                     manifest_extras: dict | None = None) -> dict:
        """Apply a contiguous backlog of epochs in ONE shuffle.

        ``manifest_extras`` is merged into each committed epoch's
        manifest (used by redrive_quarantine to durably mark its
        synthetic epochs).

        Produces byte-identical per-epoch lake files and manifests as
        one-epoch-at-a-time application (verified by tests) — only the
        number of all-to-all exchanges changes.  Commits epoch manifests
        in order at the end; a crash before commit resumes instantly
        from the staged per-partition manifests.
        """
        t0 = time.perf_counter()
        epochs = [e for e in epochs
                  if not os.path.exists(self.manifest.epoch_manifest_path(e))]
        if not epochs:
            return {"epochs": [], "events": 0, "sec": 0.0}
        self._check_writer()

        registry = self._load_registry()
        prev_parts = self.manifest.current_partitions()
        last = self.manifest.last_committed_epoch()
        if last is not None:
            mn = self.manifest.read_epoch(last).get("n_partitions")
            if mn is not None and mn != self.n_partitions:
                raise ValueError(
                    f"lake is partitioned {mn}-way but engine was built with "
                    f"n_partitions={self.n_partitions}; construct the engine "
                    f"with the manifest's count or run repartition() first"
                )

        registries_by_epoch: dict[int, dict] = {}
        n_events = 0
        files: list[str] = []
        for e in epochs:
            for ch in self._epoch_schema_events(wal_root, e):
                registry.apply(ch)
            registries_by_epoch[e] = registry.to_dict()
            efiles = self._epoch_files(wal_root, e)
            files.extend(efiles)
            n_events += sum(pq.read_metadata(p).num_rows for p in efiles)
        total_bytes = sum(os.path.getsize(p) for p in files)

        cons_state = self.constraints_state()
        cons = cons_state["constraints"]
        # meta_provider is deprecated upstream but present in the pinned
        # Ray (2.49); if a future Ray removes it, fall back to the
        # default provider (pays the remote footer prefetch again)
        nblocks = min(len(files), _shuffle_blocks(total_bytes))
        prefold = _PreFoldPartition(self.n_partitions, keep_epoch=True,
                                    constraints=cons)
        apply_fn = _make_catchup_apply(
            self.manifest.lake_root, epochs, registries_by_epoch, prev_parts,
            self.compact_every, self.commit_io, constraints=cons,
            failpoint=self.failpoint,
        )
        # bounded retry of transient apply faults (idempotent staged
        # writes make a re-run of the same group converge, not duplicate)
        if self.exchange == "task":
            raw = _task_exchange_apply(
                files, nblocks, prefold, self.n_partitions, apply_fn,
                self.apply_retries)
        else:
            import warnings

            try:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", DeprecationWarning)
                    ds = ray.data.read_parquet(
                        files, override_num_blocks=nblocks,
                        meta_provider=_NO_PREFETCH_META,
                    )
            except TypeError:  # pragma: no cover - future-Ray fallback
                ds = ray.data.read_parquet(files, override_num_blocks=nblocks)
            ds = ds.map_batches(prefold, batch_format="pyarrow",
                                zero_copy_batch=True)
            remote_args = ({"max_retries": self.apply_retries,
                            "retry_exceptions": [TransientApplyError]}
                           if self.apply_retries else {})
            raw = ds.groupby(PART_COL).map_groups(
                apply_fn, batch_format="pyarrow", **remote_args).take_all()
        rows = [r for r in raw if r.get("base") or r.get("deltas")]

        # Commit each epoch in order (carry forward untouched partitions).
        # Quarantine rows are lineage, not state: they join the manifest
        # as a counter + file pointer, never the partition map.
        parts = dict(prev_parts)
        stats = []
        for e in epochs:
            erows = [r for r in rows if r["epoch"] == e and r["part"] != QUARANTINE_PART]
            qrows = [r for r in rows if r["epoch"] == e and r["part"] == QUARANTINE_PART]
            for r in erows:
                # "reasons" is quarantine-row lineage only — keep the
                # partition map free of the always-null column
                parts[r["part"]] = {k: v for k, v in r.items()
                                    if k not in ("part", "reasons")}
            max_off = max((r["max_offset"] for r in erows), default=None)
            quarantine = None
            if qrows:
                reasons: dict[str, int] = {}
                for r in qrows:
                    for name, n in json.loads(r.get("reasons") or "{}").items():
                        reasons[name] = reasons.get(name, 0) + int(n)
                quarantine = {"rows": sum(r["rows"] for r in qrows),
                              "files": [f for r in qrows for f in _base_files(r)],
                              "reasons": reasons}
            self._check_writer()
            extras = dict(manifest_extras or {})
            if cons_state["version"]:
                extras["constraints_version"] = cons_state["version"]
            self.manifest.commit_epoch(
                e, registries_by_epoch[e], parts,
                (None, max_off) if max_off is not None else None,
                quarantine=quarantine, n_partitions=self.n_partitions,
                extras=extras or None,
            )
            stats.append({"epoch": e, "skipped": False, "touched_partitions": len(erows),
                          "quarantined": quarantine["rows"] if quarantine else 0})
        return {"epochs": stats, "events": n_events, "sec": time.perf_counter() - t0}

    def apply_epoch(self, wal_root: str, epoch: int) -> dict:
        """Apply one epoch (idempotent; skips if already committed)."""
        t0 = time.perf_counter()
        if os.path.exists(self.manifest.epoch_manifest_path(epoch)):
            return {"epoch": epoch, "skipped": True, "sec": 0.0, "events": 0}
        r = self.apply_epochs(wal_root, [epoch])
        return {
            "epoch": epoch, "skipped": False, "sec": time.perf_counter() - t0,
            "events": r["events"],
            "touched_partitions": r["epochs"][0]["touched_partitions"] if r["epochs"] else 0,
        }

    def replay(self, wal_root: str, upto_epoch: int | None = None,
               catchup: bool = True, max_catchup: int = 64,
               trust_unsealed: bool = False) -> dict:
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
            e for e in self.wal_epochs(wal_root, trust_unsealed=trust_unsealed)
            if (upto_epoch is None or e <= upto_epoch)
        ]
        todo = [e for e in pending
                if not os.path.exists(self.manifest.epoch_manifest_path(e))]
        self._guard_redrive_collision(set(pending) - set(todo))
        stats: list[dict] = [
            {"epoch": e, "skipped": True, "sec": 0.0} for e in pending if e not in todo
        ]
        events = 0
        step = max_catchup if catchup else 1
        for i in range(0, len(todo), step):
            r = self.apply_epochs(wal_root, todo[i : i + step])
            stats.extend(r["epochs"])
            events += r["events"]
        sec = time.perf_counter() - t0
        return {
            "epochs": stats,
            "events_applied": events,
            "sec": sec,
            "events_per_sec": events / sec if sec > 0 else 0.0,
        }

    def _guard_redrive_collision(self, committed_pending: set[int]) -> None:
        """Refuse to silently skip a WAL epoch whose number was consumed
        by a redrive commit.  ``committed_pending`` is the set of WAL
        epochs that exactly-once bookkeeping is about to skip; if any of
        them is a redrive-reserved epoch, the WAL epoch's events can
        never be applied under that number — data loss — so raise.
        Costs one ``os.path.exists`` when no redrive ever happened."""
        if not committed_pending:
            return
        redriven_path = os.path.join(self.manifest.lake_root, "_REDRIVEN.json")
        if not os.path.exists(redriven_path):
            return
        with open(redriven_path) as fh:
            redrive_epochs = set(json.load(fh).get("epochs", []))
        clash = sorted(committed_pending & redrive_epochs)
        if clash:
            raise ValueError(
                f"WAL epoch(s) {clash} collide with redrive-committed epoch "
                "number(s): the WAL events would be silently skipped by "
                "exactly-once bookkeeping. Redrive only after the source WAL "
                "is fully ingested, or renumber the WAL epochs."
            )

    def tail(self, wal_root: str, poll_interval: float = 1.0,
             idle_rounds: int = 3, max_rounds: int | None = None) -> dict:
        """Tail the WAL directory: apply new epochs as their directories
        appear (the binlog-tail loop; reference analogue: the FMS
        polling + download fan-out, ``aggregate_loader.py:236-247``).

        Returns after ``idle_rounds`` consecutive polls with no new
        epochs (or ``max_rounds`` polls).  Each new batch of epochs is
        applied with the catch-up path and committed exactly-once, so a
        killed tailer resumes where it left off.
        """
        idle = 0
        rounds = 0
        total = {"events_applied": 0, "batches": 0}
        while idle < idle_rounds and (max_rounds is None or rounds < max_rounds):
            rounds += 1
            seen = self.wal_epochs(wal_root, missing_ok=True)
            pending = [
                e for e in seen
                if not os.path.exists(self.manifest.epoch_manifest_path(e))
            ]
            self._guard_redrive_collision(set(seen) - set(pending))
            if pending:
                r = self.apply_epochs(wal_root, pending)
                total["events_applied"] += r["events"]
                total["batches"] += 1
                idle = 0
            else:
                idle += 1
                time.sleep(poll_interval)
        return total

    # -- maintenance --------------------------------------------------------
    def compact(self, drop_tombstones_before_offset: int | None = None,
                row_group_size: int | None = 32_768,
                max_rows_per_file: int | None = None,
                cluster: str = "key") -> dict:
        """Compact every partition with outstanding deltas (maintenance
        pass, e.g. before heavy reads).  Rewrites the CURRENT epoch's
        manifest in place (atomic) with exact live counts/checksums.

        ``drop_tombstones_before_offset``: GC tombstones applied before
        this WAL offset (the late-data watermark — a tombstone must
        outlive the maximum expected event lateness, else an older-ts
        event could resurrect the key; policy documented in README).

        ``cluster``: base-file row layout.  ``"key"`` (default) sorts by
        (conv_id, turn_idx) — tightest conv_id row-group stats, best for
        ``range_scan``.  ``"zorder"`` orders by the Morton interleave of
        (conv_id dense rank, ts) so BOTH key-range and time-range scans
        get useful row-group pruning (``time_range_scan``) — the classic
        multi-dimensional clustering trade.  Either way the base holds
        exactly one folded row per key, so layout never affects
        correctness, only skipping.
        """
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            return {"compacted": 0}
        m = self.manifest.read_epoch(last)
        registry = SchemaRegistry.from_dict(m["schema_registry"])
        parts = {int(p): info for p, info in m["partitions"].items()}
        todo = {
            p: info for p, info in parts.items()
            if info.get("deltas") or drop_tombstones_before_offset is not None
            # a zorder request is an explicit RECLUSTER: rewrite every
            # partition even if delta-free (layout maintenance op)
            or cluster == "zorder"
        }
        if not todo:
            return {"compacted": 0}
        if cluster not in ("key", "zorder"):
            raise ValueError(f"cluster must be 'key' or 'zorder', got {cluster!r}")
        gc_off = drop_tombstones_before_offset
        # bounded row groups keep per-row-group conv_id min/max stats
        # tight on the key-sorted base → range_scan's data skipping
        rg_size = row_group_size
        max_rows = max_rows_per_file
        use_zorder = cluster == "zorder"

        reg_ref = ray.put(registry.to_dict())
        lake_root = self.manifest.lake_root
        commit_io = self.commit_io

        @ray.remote
        def compact_part(part: int, info: dict) -> dict:
            reg = SchemaRegistry.from_dict(ray.get(reg_ref))
            ap = _PartitionApplier(lake_root, 1, commit_io)
            tables = [ap._read_conformed(rel, reg) for rel in _info_files(info)]
            merged = lww_last_per_key(
                pa.concat_tables(tables), ["conv_id", "turn_idx"], ["ts", OFFSET_COL]
            )
            if gc_off is not None:
                stale = pc.and_(
                    pc.equal(merged[DELETED_COL], True),
                    pc.less(merged[OFFSET_COL], pa.scalar(gc_off, pa.int64())),
                )
                merged = merged.filter(pc.invert(stale))
            if use_zorder:
                merged = _zorder_cluster(merged)
            else:
                merged = merged.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            if max_rows and merged.num_rows > max_rows:
                # split the sorted snapshot into size-bounded base parts
                # (disjoint key ranges): a 100 TB partition never has to
                # round-trip through one writer file or one reader task
                rels = []
                for j, lo in enumerate(range(0, merged.num_rows, max_rows)):
                    rel_j = os.path.join(
                        f"part={part}",
                        f"base-epoch={info['epoch']}-c{j}.parquet")
                    ap._write(rel_j, merged.slice(lo, max_rows),
                              row_group_size=rg_size)
                    rels.append(rel_j)
                base: str | list[str] = rels
            else:
                base = os.path.join(f"part={part}",
                                    f"base-epoch={info['epoch']}-c.parquet")
                ap._write(base, merged, row_group_size=rg_size)
            live = merged.filter(pc.equal(merged[DELETED_COL], False))
            return {
                **info, "part": part, "base": base, "deltas": [],
                "delta_blooms": [],
                "rows": merged.num_rows, "live_rows": live.num_rows,
                "checksum": _live_checksum(live),
            }

        results = ray.get([compact_part.remote(p, info) for p, info in todo.items()])
        for r in results:
            parts[r["part"]] = {k: v for k, v in r.items() if k != "part"}
        self._check_writer()
        self.manifest.commit_epoch(last, m["schema_registry"], parts, m.get("wal_offsets"),
                                   n_partitions=m.get("n_partitions"))
        return {"compacted": len(results)}

    def compact_deltas(self, min_deltas: int = 2,
                       row_group_size: int | None = 32_768) -> dict:
        """MINOR compaction: stitch each partition's outstanding delta
        files into ONE delta without rewriting the base.

        The 100 TB rationale: full ``compact`` rewrites the whole base
        (cost ∝ partition size) to bound read amplification, but most
        of a partition's bytes are cold — deltas are the hot tail.
        Stitching bounds merge-on-read fan-in at base+1 files for cost
        ∝ delta bytes only.  LWW last-per-key is associative on
        (ts, offset), so folding the deltas among themselves first
        yields exactly the same merged state; the stitched file keeps
        every surviving row INCLUDING tombstones (the key-hash set and
        late-event resolution are unchanged).  Deterministic output
        names make a crashed/rerun pass idempotent; the manifest swap
        is the same atomic current-epoch rewrite as ``compact``.
        """
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            return {"stitched": 0}
        m = self.manifest.read_epoch(last)
        parts = {int(p): info for p, info in m["partitions"].items()}
        todo = {p: info for p, info in parts.items()
                if len(info.get("deltas") or []) >= max(2, min_deltas)}
        if not todo:
            return {"stitched": 0}

        reg_ref = ray.put(m["schema_registry"])
        lake_root = self.manifest.lake_root
        commit_io = self.commit_io
        rg_size = row_group_size

        @ray.remote
        def stitch_part(part: int, info: dict) -> dict:
            from ..stages.bloom import bloom_hex_from_hashes
            from ..stages.partition import key_hash

            reg = SchemaRegistry.from_dict(ray.get(reg_ref))
            ap = _PartitionApplier(lake_root, 1, commit_io)
            deltas = list(info["deltas"])
            merged = lww_last_per_key(
                pa.concat_tables([ap._read_conformed(rel, reg) for rel in deltas]),
                ["conv_id", "turn_idx"], ["ts", OFFSET_COL],
            )
            # key-sorted like bases: row-group stats stay selective
            merged = merged.sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")])
            rel = os.path.join(
                f"part={part}",
                f"delta-epoch={info['epoch']}-s{len(deltas)}.parquet")
            ap._write(rel, merged, row_group_size=rg_size)
            wk = key_hash(merged["conv_id"], merged["turn_idx"])
            base_rows = sum(
                pq.read_metadata(ap.manifest.abspath(b)).num_rows
                for b in _base_files(info))
            return {
                **info, "part": part, "deltas": [rel],
                "delta_blooms": [bloom_hex_from_hashes(wk)],
                "rows": base_rows + merged.num_rows,
            }

        results = ray.get([stitch_part.remote(p, info) for p, info in todo.items()])
        for r in results:
            parts[r["part"]] = {k: v for k, v in r.items() if k != "part"}
        self._check_writer()
        self.manifest.commit_epoch(last, m["schema_registry"], parts, m.get("wal_offsets"),
                                   n_partitions=m.get("n_partitions"))
        return {"stitched": len(results)}

    def repartition(self, new_n: int) -> dict:
        """Rewrite the lake's ownership partitioning to ``new_n``
        partitions — the operational move when the cluster (or key
        cardinality) outgrows the current partition count.

        One distributed pass: every partition's CURRENT state — live
        rows AND tombstones, offsets intact, so later LWW still resolves
        late events correctly — is folded, re-hashed with the same
        ``key_hash % new_n`` the writers use, exchanged once, and
        written as one key-sorted base per NEW partition.  The rewrite
        commits by REPLACING the latest epoch's manifest atomically
        (same protocol as ``compact``): a crash mid-rewrite leaves the
        old manifest — and therefore the old layout — fully readable,
        and the deterministic output names make a rerun idempotent.
        Subsequent ``apply_epochs`` calls must come from an engine built
        with ``n_partitions=new_n`` (enforced by the manifest guard).
        """
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            raise FileNotFoundError("no committed epoch to repartition")
        m = self.manifest.read_epoch(last)
        lake_root = self.manifest.lake_root
        commit_io = self.commit_io
        reg_ref = ray.put(m["schema_registry"])

        items = [{"files": _info_files(info)}
                 for info in m["partitions"].values()
                 if _info_files(info)]

        def load_fold(batch: pa.Table) -> pa.Table:
            reg = SchemaRegistry.from_dict(ray.get(reg_ref))
            ap = _PartitionApplier(lake_root, 1, commit_io)
            outs = []
            for row in batch.to_pylist():
                tables = [ap._read_conformed(rel, reg) for rel in row["files"]]
                t = tables[0] if len(tables) == 1 else lww_last_per_key(
                    pa.concat_tables(tables), ["conv_id", "turn_idx"],
                    ["ts", OFFSET_COL])
                outs.append(add_partition_column(t, new_n))
            return pa.concat_tables(outs)

        def write_part(g: pa.Table) -> pa.Table:
            part = int(g[PART_COL][0].as_py())
            g = g.drop_columns([PART_COL]).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")])
            ap = _PartitionApplier(lake_root, 1, commit_io)
            rel = os.path.join(f"part={part}",
                               f"base-epoch={last}-r{new_n}.parquet")
            ap._write(rel, g)
            live = g.filter(pc.equal(g[DELETED_COL], False))
            return _manifest_row_table([{
                "part": part, "base": rel, "deltas": [], "delta_blooms": [],
                "rows": g.num_rows, "live_rows": live.num_rows,
                "checksum": _live_checksum(live), "delta_rows": 0,
                "max_offset": int(pc.max(g[OFFSET_COL]).as_py()),
                "u_on_missing": 0, "epoch": last,
            }])

        rows = (
            ray.data.from_items(items)
            .map_batches(load_fold, batch_format="pyarrow", batch_size=1)
            .groupby(PART_COL)
            .map_groups(write_part, batch_format="pyarrow")
        ).take_all()
        new_parts = {r["part"]: {k: v for k, v in r.items() if k != "part"}
                     for r in rows}
        self._check_writer()
        lineage = {k: m[k] for k in ("restored_from", "purge_seq",
                                     "purged_rows") if m.get(k) is not None}
        self.manifest.commit_epoch(last, m["schema_registry"], new_parts,
                                   m.get("wal_offsets"), n_partitions=new_n,
                                   extras=lineage or None)
        self.n_partitions = new_n
        return {"n_partitions": new_n, "partitions_written": len(new_parts)}

    def vacuum(self, retain_epochs: int = 1) -> dict:
        """Retention GC: delete data files reachable ONLY from epochs
        older than the newest ``retain_epochs`` committed ones, giving
        up time travel below that watermark (the Delta/Iceberg VACUUM /
        expire-snapshots move — reference analogue: the loader's
        drop-and-reload storage reclaim, here bounded and incremental).

        Protocol (crash-safe, idempotent):
          1. publish ``_VACUUM.json`` with the new watermark FIRST —
             readers check it before resolving epoch→files, so no
             reader that passed the check can lose a file mid-read;
          2. delete every ``part=*/…parquet`` whose embedded write
             epoch is below the watermark and which no RETAINED
             manifest references (a compacted base written at epoch 2
             that is still epoch 9's base stays).  A crash between
             deletes just leaves garbage a re-run removes.

        Never touches staged/in-flight epochs: those carry write
        epochs > last committed ≥ watermark.
        """
        if retain_epochs < 1:
            raise ValueError("retain_epochs must be >= 1")
        epochs = self.manifest.committed_epochs()
        if not epochs:
            return {"removed_files": 0, "min_readable_epoch": None}
        kept = epochs[-retain_epochs:]
        watermark = kept[0]
        prior = self.manifest.min_readable_epoch()
        if prior is not None and prior > watermark:
            # never move the watermark backwards — files are gone
            watermark = prior
            kept = [e for e in epochs if e >= watermark]

        # savepointed epochs are vacuum-exempt: their file sets stay
        # live no matter how far the watermark advances past them
        pinned = [e for e in sorted(self.manifest.read_savepoints())
                  if e in epochs and e not in kept]
        live: set[str] = set()
        for e in kept + pinned:
            m = self.manifest.read_epoch(e)
            for info in m["partitions"].values():
                live.update(_info_files(info))
            live.update(m.get("quarantine", {}).get("files", []))

        self._check_writer()
        self.manifest.write_vacuum({
            "min_readable_epoch": watermark,
            "retained_epochs": kept,
        })

        epoch_re = re.compile(r"(?:^|-)epoch=(\d+)")
        removed = 0
        removed_bytes = 0
        root = self.manifest.lake_root
        for dirname in sorted(os.listdir(root)):
            full_dir = os.path.join(root, dirname)
            if not (dirname.startswith("part=") and os.path.isdir(full_dir)):
                continue
            for name in sorted(os.listdir(full_dir)):
                if not name.endswith(".parquet"):
                    continue
                rel = os.path.join(dirname, name)
                mobj = epoch_re.search(name)
                if mobj is None or rel in live:
                    continue  # unparseable (conservative) or still live
                # delete anything unreferenced with write epoch <= last
                # committed: pre-watermark history AND current-epoch
                # files orphaned by compact/stitch/purge rewrites (the
                # GDPR second step needs those bytes actually gone);
                # epochs > last committed are in-flight — never touched
                if int(mobj.group(1)) <= epochs[-1]:
                    path = os.path.join(full_dir, name)
                    removed_bytes += os.path.getsize(path)
                    os.remove(path)
                    removed += 1
        # staged manifests of committed pre-watermark epochs are obsolete
        staged_root = os.path.join(self.manifest.manifest_dir, "staged")
        if os.path.isdir(staged_root):
            for name in sorted(os.listdir(staged_root)):
                if name.startswith("epoch="):
                    e = int(name.split("=", 1)[1])
                    if e < watermark and e in epochs:
                        shutil.rmtree(os.path.join(staged_root, name),
                                      ignore_errors=True)
        return {"removed_files": removed, "removed_bytes": removed_bytes,
                "min_readable_epoch": watermark, "retained_epochs": kept,
                "savepoints_pinned": pinned}

    def purge(self, predicate, drop_matching_tombstones: bool = True) -> dict:
        """Physical row erase (the GDPR/right-to-be-forgotten move —
        ``DELETE FROM lake WHERE …`` with actual byte removal, not a
        tombstone).

        ``predicate``: ``pa.Table -> pa.BooleanArray`` over the
        conformed partition state; True rows are REMOVED from the
        rewritten files (live rows and, by default, their tombstones —
        a tombstone's key is itself data).  Every partition is folded
        (base+deltas), filtered, and rewritten as one key-sorted base —
        the same distributed pass and atomic current-epoch manifest
        rewrite as ``compact``, with exact live counts/checksums and a
        ``purged`` lineage counter.  Prior epochs' manifests still
        reference the old files: run ``vacuum(retain_epochs=1)``
        afterwards to destroy the bytes — the documented two-step
        erase.  NOTE: purge is point-in-time — a LATER WAL event for a
        purged key re-inserts it (by design: the WAL is upstream).
        """
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            return {"purged_rows": 0, "partitions": 0}
        m = self.manifest.read_epoch(last)
        registry = SchemaRegistry.from_dict(m["schema_registry"])
        parts = {int(p): info for p, info in m["partitions"].items()}
        todo = {p: info for p, info in parts.items() if _info_files(info)}
        if not todo:
            return {"purged_rows": 0, "partitions": 0}

        reg_ref = ray.put(registry.to_dict())
        lake_root = self.manifest.lake_root
        commit_io = self.commit_io
        drop_tomb = drop_matching_tombstones
        seq = int(m.get("purge_seq", 0)) + 1  # unique file names per purge

        @ray.remote
        def purge_part(part: int, info: dict) -> dict:
            reg = SchemaRegistry.from_dict(ray.get(reg_ref))
            ap = _PartitionApplier(lake_root, 1, commit_io)
            tables = [ap._read_conformed(rel, reg) for rel in _info_files(info)]
            merged = lww_last_per_key(
                pa.concat_tables(tables), ["conv_id", "turn_idx"], ["ts", OFFSET_COL])
            hit = pc.fill_null(predicate(merged), False)
            if not drop_tomb:
                # keep tombstoned rows even when the predicate matches
                hit = pc.and_(hit, pc.equal(merged[DELETED_COL], False))
            n_hit = int(pc.sum(hit).as_py() or 0)
            merged = merged.filter(pc.invert(hit))
            merged = merged.sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")])
            rel = os.path.join(f"part={part}",
                               f"base-epoch={info['epoch']}-p{seq}.parquet")
            ap._write(rel, merged)
            live = merged.filter(pc.equal(merged[DELETED_COL], False))
            return {
                **info, "part": part, "base": rel, "deltas": [],
                "delta_blooms": [], "rows": merged.num_rows,
                "live_rows": live.num_rows, "checksum": _live_checksum(live),
                "purged": n_hit,
            }

        results = ray.get([purge_part.remote(p, info) for p, info in todo.items()])
        purged = 0
        for r in results:
            purged += r.pop("purged")
            parts[r["part"]] = {k: v for k, v in r.items() if k != "part"}
        self._check_writer()
        manifest = {
            "epoch": last,
            "schema_registry": m["schema_registry"],
            "wal_offsets": m.get("wal_offsets"),
            "partitions": {str(p): info for p, info in sorted(parts.items())},
            "purged_rows": purged + int(m.get("purged_rows", 0)),
            "purge_seq": seq,
        }
        if m.get("restored_from") is not None:  # keep lineage chain intact
            manifest["restored_from"] = m["restored_from"]
        if m.get("n_partitions") is not None:
            manifest["n_partitions"] = m["n_partitions"]
        if m.get("quarantine"):
            manifest["quarantine"] = m["quarantine"]
        self.manifest.commit_io.publish_json(
            self.manifest.epoch_manifest_path(last), manifest)
        return {"purged_rows": purged, "partitions": len(results)}

    def savepoint(self, epoch: int | None = None, name: str | None = None) -> dict:
        """Pin a committed epoch's snapshot against vacuum (the
        Hudi SAVEPOINT / Iceberg tagged-snapshot move): the epoch stays
        time-travel-readable and RESTORE-able no matter how far the
        retention watermark advances past it.  Metadata-only — one
        atomic rewrite of ``_SAVEPOINTS.json``; idempotent re-pin
        refreshes the name."""
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            raise FileNotFoundError("no committed epoch to savepoint")
        e = last if epoch is None else int(epoch)
        if e not in self.manifest.committed_epochs():
            raise ValueError(f"epoch {e} is not committed")
        # can't pin what vacuum already deleted
        self.manifest.assert_readable(e)
        sp = self.manifest.read_savepoints()
        sp[e] = {"name": name or f"savepoint-{e}", "created_at_epoch": last}
        self._check_writer()
        self.manifest.write_savepoints(sp)
        return {"epoch": e, **sp[e]}

    def release_savepoint(self, epoch: int) -> dict:
        """Un-pin a savepoint.  If the epoch is below the retention
        watermark its files become garbage at the NEXT vacuum (publish
        order matches vacuum's: the savepoints file is rewritten
        atomically before any delete can observe the release)."""
        self._check_writer()
        sp = self.manifest.read_savepoints()
        e = int(epoch)
        if e not in sp:
            raise KeyError(f"no savepoint at epoch {e}")
        info = sp.pop(e)
        self.manifest.write_savepoints(sp)
        return {"epoch": e, "released": info}

    def restore(self, epoch: int) -> dict:
        """Roll the CURRENT table state back to committed ``epoch``
        (Delta-style RESTORE — the undo for a bad replay or a poisoned
        upstream batch).

        Metadata-only and O(partitions): the LAST epoch's manifest is
        atomically rewritten to reference ``epoch``'s partition map and
        schema registry — no data file moves, no shuffle.  The epoch
        NUMBERING is preserved (no new epoch id is burned), so
        exactly-once replay bookkeeping is untouched: WAL epochs up to
        the last commit stay consumed, and FUTURE WAL epochs apply on
        top of the restored state.  ``restored_from`` is recorded for
        lineage; the vacuum fence rejects restoring below the retention
        watermark (those files are gone).
        """
        self._check_writer()
        last = self.manifest.last_committed_epoch()
        if last is None:
            raise FileNotFoundError("no committed epoch to restore")
        if epoch == last:
            return {"restored_from": epoch, "current_epoch": last,
                    "noop": True}
        self.manifest.assert_readable(epoch)
        src = self.manifest.read_epoch(epoch)       # target snapshot
        cur = self.manifest.read_epoch(last)        # numbering keeper
        manifest = {
            "epoch": last,
            "schema_registry": src["schema_registry"],
            "wal_offsets": cur.get("wal_offsets"),
            "partitions": src["partitions"],
            "restored_from": epoch,
        }
        if cur.get("purge_seq"):  # purge lineage is historical — keep it
            manifest["purge_seq"] = cur["purge_seq"]
            manifest["purged_rows"] = cur.get("purged_rows", 0)
        if cur.get("n_partitions") is not None:
            if src.get("n_partitions") not in (None, cur["n_partitions"]):
                raise ValueError(
                    f"cannot restore across a repartition boundary "
                    f"({src.get('n_partitions')} → {cur['n_partitions']} "
                    "partitions); run repartition() after restore instead")
            manifest["n_partitions"] = cur["n_partitions"]
        self._check_writer()
        self.manifest.commit_io.publish_json(
            self.manifest.epoch_manifest_path(last), manifest)
        return {"restored_from": epoch, "current_epoch": last, "noop": False}

    def clone_to(self, target_root: str) -> dict:
        """Cheap writable CLONE of the lake at its current state (the
        dev/test-sandbox move).

        Copies the manifest chain + vacuum watermark and HARDLINKS
        every referenced data file (falls back to copy across
        devices).  Safe because published data files are immutable:
        every rewrite in this engine goes through the commit-I/O seam
        as write-temp-then-rename, which swaps the directory entry and
        never mutates the shared inode.  The clone has its own
        manifests, lease, and vacuum lifecycle — a vacuum on either
        side only unlinks its own name, the other side's link keeps
        the bytes alive.  On an object store the CommitIO analogue is
        server-side copy of immutable objects.
        """
        if os.path.exists(target_root) and os.listdir(target_root):
            raise FileExistsError(f"clone target {target_root} is not empty")
        os.makedirs(target_root, exist_ok=True)
        src_root = self.manifest.lake_root

        # snapshot the manifest chain first: a concurrent writer's new
        # epoch after this point is simply not part of the clone
        epochs = self.manifest.committed_epochs()
        if not epochs:
            raise FileNotFoundError(f"no committed epoch in {src_root}")
        os.makedirs(os.path.join(target_root, "_manifests"), exist_ok=True)
        live: set[str] = set()
        wm = self.manifest.min_readable_epoch()
        sps = self.manifest.read_savepoints()
        for e in epochs:
            if wm is not None and e < wm and e not in sps:
                continue  # vacuumed below the watermark: not cloneable
            m = self.manifest.read_epoch(e)
            for info in m["partitions"].values():
                live.update(_info_files(info))
            live.update(m.get("quarantine", {}).get("files", []))
            shutil.copy2(self.manifest.epoch_manifest_path(e),
                         os.path.join(target_root, "_manifests",
                                      os.path.basename(
                                          self.manifest.epoch_manifest_path(e))))
        tgt = LakeManifest(target_root, self.commit_io)
        v = self.manifest.read_vacuum()
        if v is not None:
            tgt.write_vacuum(v)
        if sps:
            tgt.write_savepoints(sps)

        linked = copied = 0
        for rel in sorted(live):
            src = os.path.join(src_root, rel)
            dst = os.path.join(target_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
                linked += 1
            except OSError:
                shutil.copy2(src, dst)
                copied += 1
        return {"target": target_root, "epochs": len(epochs),
                "files_linked": linked, "files_copied": copied}

    def sync_to(self, target_root: str) -> dict:
        """Incrementally refresh a CLONE to the source's current state
        (log shipping — the disaster-recovery / read-replica move).

        Ships, for every source epoch at or beyond the replica's last
        committed one, the epoch manifest plus any referenced data
        files the replica lacks (hardlink, copy across devices).  The
        replica's LAST epoch is always re-shipped because ``compact`` /
        ``compact_deltas`` / ``purge`` / ``restore`` rewrite the
        current manifest in place — same epoch id, different file set.
        Files ship BEFORE their manifest (a crashed sync leaves the
        replica's previous consistent state readable; rerun is
        idempotent).  Never deletes on the replica — it runs its own
        vacuum lifecycle.  The source vacuum watermark is propagated
        forward-only (max of the two sides).
        """
        tgt = LakeManifest(target_root, self.commit_io)
        if not os.path.isdir(os.path.join(target_root, "_manifests")):
            return self.clone_to(target_root)
        src_epochs = self.manifest.committed_epochs()
        if not src_epochs:
            raise FileNotFoundError(f"no committed epoch in "
                                    f"{self.manifest.lake_root}")
        tgt_last = tgt.last_committed_epoch()
        wm = self.manifest.min_readable_epoch()
        sps = self.manifest.read_savepoints()
        todo = [e for e in src_epochs
                if ((tgt_last is None or e >= tgt_last)
                    and (wm is None or e >= wm))
                # savepointed history always re-ships missing pieces: a
                # replica may have vacuumed an epoch's files locally
                # BEFORE the source pinned it (the file loop below
                # skips anything already present, so this is cheap)
                or e in sps]

        linked = copied = shipped = 0
        for e in todo:
            m = self.manifest.read_epoch(e)
            need: set[str] = set()
            for info in m["partitions"].values():
                need.update(_info_files(info))
            need.update(m.get("quarantine", {}).get("files", []))
            for rel in sorted(need):
                dst = os.path.join(target_root, rel)
                if os.path.exists(dst):
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                src = os.path.join(self.manifest.lake_root, rel)
                try:
                    os.link(src, dst)
                    linked += 1
                except OSError:
                    shutil.copy2(src, dst)
                    copied += 1
            # manifest last: the replica flips to this epoch atomically
            tgt.commit_io.publish_json(tgt.epoch_manifest_path(e), m)
            shipped += 1

        v = self.manifest.read_vacuum()
        if v is not None:
            tv = tgt.read_vacuum()
            if tv is None or int(v["min_readable_epoch"]) > \
                    int(tv["min_readable_epoch"]):
                tgt.write_vacuum(v)
        if sps:
            # additive union: the replica keeps its own pins, source
            # releases don't propagate (each side runs its own vacuum)
            merged_sp = {**sps, **tgt.read_savepoints()}
            if merged_sp != tgt.read_savepoints():
                tgt.write_savepoints(merged_sp)
        return {"target": target_root, "epochs_shipped": shipped,
                "files_linked": linked, "files_copied": copied}


def lake_metrics(lake_root: str) -> dict:
    """Run-level metrics from the manifest chain (the reference's final
    timing/count report, ``/root/reference/src/aggregate_loader.py:258-267``
    + NodeCount summary): per-epoch applied offsets, rows, u_on_missing,
    live totals where exact (compacted partitions)."""
    manifest = LakeManifest(lake_root)
    epochs = manifest.committed_epochs()
    out = {"epochs": [], "last_epoch": epochs[-1] if epochs else None}
    for e in epochs:
        m = manifest.read_epoch(e)
        parts = m["partitions"].values()
        out["epochs"].append(
            {
                "epoch": e,
                "partitions": len(m["partitions"]),
                "rows": sum(p["rows"] for p in parts),
                "live_rows_exact": sum(
                    p["live_rows"] for p in parts if p["live_rows"] != NO_COUNT
                ),
                "compacted_partitions": sum(1 for p in parts if not p.get("deltas")),
                "u_on_missing": sum(p.get("u_on_missing", 0) for p in parts),
                "quarantined": m.get("quarantine", {}).get("rows", 0),
                "schema_version": m["schema_registry"]["version"],
                "max_offset": m.get("wal_offsets", [None, None])[1] if m.get("wal_offsets") else None,
            }
        )
    return out


def lake_history(lake_root: str) -> list[dict]:
    """DESCRIBE HISTORY: one row per committed epoch with the operation
    lineage the manifests carry — replay vs maintenance rewrites
    (restore/purge annotate the CURRENT manifest in place), schema
    version, counts, quarantine, vacuum watermark.  Metadata-only."""
    manifest = LakeManifest(lake_root)
    wm = manifest.min_readable_epoch()
    sps = manifest.read_savepoints()
    out = []
    for e in manifest.committed_epochs():
        m = manifest.read_epoch(e)
        parts = list(m["partitions"].values())
        ops = ["replay"]
        if e in sps:
            ops.append(f"savepoint({sps[e]['name']})")
        if m.get("restored_from") is not None:
            ops.append(f"restore(from={m['restored_from']})")
        if m.get("purge_seq"):
            ops.append(f"purge(seq={m['purge_seq']}, "
                       f"rows={m.get('purged_rows', 0)})")
        if parts and all(not p.get("deltas") for p in parts):
            ops.append("compacted")
        out.append({
            "epoch": e,
            "operations": ops,
            "schema_version": m["schema_registry"]["version"],
            "n_partitions": m.get("n_partitions"),
            "rows": sum(p["rows"] for p in parts),
            "data_files": sum(len(_info_files(p)) for p in parts),
            "quarantined": m.get("quarantine", {}).get("rows", 0),
            "readable": wm is None or e >= wm or e in sps,
        })
    return out


def verify_lake(lake_root: str, epoch: int | None = None) -> dict:
    """Audit: recompute per-partition live counts + content checksums
    from the data files and compare against the committed manifest
    (NodeCount-style regression audit,
    ``/root/reference/src/etl/node_count_etl.py:20-78`` — here content
    hashes, not just counts).  Partitions with outstanding deltas carry
    sentinel lineage and are reported as ``unverifiable`` (compact first
    for a full audit).  One Ray task per partition.
    """
    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    m = manifest.read_epoch(e)
    lake = lake_root

    @ray.remote
    def audit(part: int, info: dict) -> dict:
        tables = [pq.read_table(os.path.join(lake, rel)) for rel in _info_files(info)]
        if not tables:
            return {"part": part, "ok": info.get("live_rows", 0) in (0, NO_COUNT)}
        merged = tables[0] if len(tables) == 1 else lww_last_per_key(
            pa.concat_tables(tables, promote_options="permissive"),
            ["conv_id", "turn_idx"], ["ts", OFFSET_COL],
        )
        live = merged.filter(pc.equal(merged[DELETED_COL], False))
        if info.get("deltas"):
            return {"part": part, "ok": None}  # unverifiable without compaction
        return {
            "part": part,
            "ok": live.num_rows == info["live_rows"]
            and _live_checksum(live) == info["checksum"],
        }

    results = ray.get(
        [audit.remote(int(p), info) for p, info in m["partitions"].items()]
    )
    ok = [r for r in results if r["ok"] is True]
    bad = [r["part"] for r in results if r["ok"] is False]
    unverifiable = [r["part"] for r in results if r["ok"] is None]
    return {
        "epoch": e,
        "verified": len(ok),
        "corrupt_partitions": bad,
        "unverifiable": unverifiable,
        "ok": not bad,
    }


def lake_diff(lake_a: str, lake_b: str, epoch_a: int | None = None,
              epoch_b: int | None = None) -> dict:
    """Replication verification: partition-level content diff between
    two lakes (primary vs replica / clone) — the Merkle-walk pattern.

    Level 1 is manifest-only: two fully-compacted partitions with equal
    committed (live_rows, checksum) lineage match WITHOUT touching data
    bytes.  Only partitions the manifests cannot prove equal (deltas
    outstanding, sentinel lineage, or differing manifest entries) are
    re-folded and content-hashed, one Ray task per partition, each
    hashing ONLY its own partition's files.  Returns the differing
    partition ids — the exact set a repair `sync_to` must re-ship.
    """
    ma, mb = LakeManifest(lake_a), LakeManifest(lake_b)
    ea = ma.last_committed_epoch() if epoch_a is None else epoch_a
    eb = mb.last_committed_epoch() if epoch_b is None else epoch_b
    if ea is None or eb is None:
        raise FileNotFoundError("both lakes need a committed epoch to diff")
    man_a, man_b = ma.read_epoch(ea), mb.read_epoch(eb)
    na, nb = man_a.get("n_partitions"), man_b.get("n_partitions")
    if na != nb:
        # partition maps don't align — row-level diff would need a full
        # re-key; report the structural mismatch instead
        return {"equal": False, "partitioning_mismatch": (na, nb),
                "differing_partitions": None}

    pa_map = {int(p): i for p, i in man_a["partitions"].items()}
    pb_map = {int(p): i for p, i in man_b["partitions"].items()}
    all_parts = sorted(set(pa_map) | set(pb_map))

    def _proved_equal(ia: dict | None, ib: dict | None) -> bool:
        if ia is None and ib is None:
            return True
        if ia is None or ib is None:
            return False
        if ia.get("deltas") or ib.get("deltas"):
            return False
        ca, cb = ia.get("checksum"), ib.get("checksum")
        return (ca == cb and ca not in (None, NO_CHECKSUM)
                and ia.get("live_rows") == ib.get("live_rows"))

    pending = [p for p in all_parts
               if not _proved_equal(pa_map.get(p), pb_map.get(p))]

    @ray.remote
    def content(lake: str, info: dict | None) -> tuple:
        tables = [pq.read_table(os.path.join(lake, rel))
                  for rel in _info_files(info)]
        if not tables:
            return (0, "0")
        merged = tables[0] if len(tables) == 1 else lww_last_per_key(
            pa.concat_tables(tables, promote_options="permissive"),
            ["conv_id", "turn_idx"], ["ts", OFFSET_COL],
        )
        live = merged.filter(pc.equal(merged[DELETED_COL], False))
        return (live.num_rows, _live_checksum(live))

    refs = []
    for p in pending:
        refs.append((p, content.remote(lake_a, pa_map.get(p)),
                     content.remote(lake_b, pb_map.get(p))))
    differing = []
    for p, ra, rb in refs:
        a, b = ray.get(ra), ray.get(rb)
        if a != b:
            differing.append({"part": p, "rows_a": a[0], "rows_b": b[0]})
    return {
        "equal": not differing,
        "epoch_a": ea, "epoch_b": eb,
        "manifest_proved": len(all_parts) - len(pending),
        "content_checked": len(pending),
        "differing_partitions": [d["part"] for d in differing],
        "detail": differing,
    }
