"""Optimistic concurrency control: MULTI-writer epoch commits.

The lease (``state/lease.py``) serializes writers pessimistically — one
holder mutates, everyone else waits.  OCC is the other standard
lakehouse protocol (Delta/Iceberg commit loop, see PAPERS.md): writers
prepare partition files concurrently against a read snapshot, then race
to publish the next epoch manifest with an atomic put-if-absent.  The
loser re-reads the new head and either

- REBASES: its touched partitions are disjoint from every epoch
  committed since its base → re-target the commit onto the new head
  (data files need no rewrite: the manifest's ``path`` field decouples
  file names from epoch numbers — OCC files are named by writer+tag),
- or ABORTS with ``OccConflictError``: an intervening epoch touched an
  overlapping partition, so the writer's snapshot-derived file is stale
  and must be rebuilt from the new state.

Crash-safe retry: every commit attempt carries the writer's token; a
retry that finds its own token in the target manifest treats the commit
as already-won (exactly-once across writer restarts).

Do not mix protocols on one lake: either a lease holder mutates, or OCC
writers do.  Readers are unaffected — OCC manifests have the exact
shape ``LakeManifest.commit_epoch`` publishes, plus an ``occ`` lineage
block (writer, token, base_epoch, touched).

Reference analogue: the reference serializes whole ETL stages through a
transactor queue (``/root/reference/src/transactors/neo4j_transactor.py``)
— partition-level OCC is the finer-grained, coordination-free contract a
distributed lake needs.
"""

from __future__ import annotations

import os
from typing import Any

from .manifest import LakeManifest


class OccConflictError(RuntimeError):
    """An intervening commit touched one of this writer's partitions."""


def _touched_partitions(manifest: dict, epoch: int) -> set[int]:
    """Partitions written BY ``epoch`` (not carried forward): explicit
    ``occ.touched`` when present, else every partition whose info stamps
    this epoch as its last write (the engine's convention)."""
    occ = manifest.get("occ")
    if occ and occ.get("touched") is not None:
        return {int(p) for p in occ["touched"]}
    return {int(p) for p, info in manifest["partitions"].items()
            if info.get("epoch") == epoch}


class OccWriter:
    """One optimistic writer.  Usage::

        w = OccWriter(lake_root, "writer-a")
        base = w.snapshot_epoch()
        # ... write partition files via w.publish_partition(...) ...
        w.commit(base, {part: info, ...})
    """

    def __init__(self, lake_root: str, writer_id: str, commit_io=None):
        self.manifest = LakeManifest(lake_root, commit_io)
        self.writer_id = writer_id

    # ---- snapshot ----------------------------------------------------------
    def snapshot_epoch(self) -> int | None:
        return self.manifest.last_committed_epoch()

    def snapshot_partitions(self) -> dict[int, dict]:
        return self.manifest.current_partitions()

    # ---- data files ----------------------------------------------------------
    def partition_file(self, part: int, tag: str) -> str:
        """Writer-unique data-file name: rebases never rewrite bytes."""
        return os.path.join(f"part={part}", f"occ-{self.writer_id}-{tag}.parquet")

    def publish_partition(self, part: int, tag: str, tbl) -> str:
        rel = self.partition_file(part, tag)
        self.manifest.commit_io.publish_table(self.manifest.abspath(rel), tbl)
        return rel

    # ---- commit loop ---------------------------------------------------------
    def commit(self, base_epoch: int | None, touched: dict[int, dict],
               token: str | None = None, max_retries: int = 16,
               extras: dict[str, Any] | None = None) -> dict:
        """Publish ``touched`` (part → partition-info) as the next epoch.

        First-writer-wins per epoch number via put-if-absent; on losing,
        rebase over disjoint commits or raise ``OccConflictError``.
        ``token`` makes retries after a crash idempotent (pass the same
        token; default derives a fresh one)."""
        if token is None:
            token = os.urandom(8).hex()
        mine = set(touched)
        base = base_epoch
        for _ in range(max_retries):
            head = self.manifest.last_committed_epoch()
            # conflict scan over everything committed since our base
            if head is not None and (base is None or head > base):
                lo = -1 if base is None else base
                for e in self.manifest.committed_epochs():
                    if e <= lo:
                        continue
                    man = self.manifest.read_epoch(e)
                    occ = man.get("occ") or {}
                    if occ.get("token") == token:
                        return man  # crash-retry: we already committed
                    theirs = _touched_partitions(man, e)
                    if theirs & mine:
                        raise OccConflictError(
                            f"writer {self.writer_id}: partitions "
                            f"{sorted(theirs & mine)} were rewritten by "
                            f"epoch {e} (writer "
                            f"{occ.get('writer', '<lease/engine>')}) after "
                            f"base {base}; re-read and rebuild")
                base = head  # rebased: everything since base is disjoint
            target = 0 if head is None else head + 1
            current = self.manifest.current_partitions()
            merged = {**current, **{int(p): dict(info, epoch=target)
                                    for p, info in touched.items()}}
            man = {
                "epoch": target,
                "schema_registry": self.manifest.current_schema_registry(),
                "wal_offsets": None,
                "partitions": {str(p): merged[p] for p in sorted(merged)},
                "occ": {"writer": self.writer_id, "token": token,
                        "base_epoch": base, "touched": sorted(mine)},
            }
            if extras:
                man.update(extras)
            if self.manifest.commit_io.publish_json_if_absent(
                    self.manifest.epoch_manifest_path(target), man):
                return man
            # lost the race for `target` — maybe to our own crashed self
            committed = self.manifest.read_epoch(target)
            if (committed.get("occ") or {}).get("token") == token:
                return committed
        raise OccConflictError(
            f"writer {self.writer_id}: gave up after {max_retries} "
            "commit races — the lake is hotter than the retry budget")
