"""Epoch-fenced commit manifests for the Parquet lake.

Reference analogue: per-load ``Load:Entity`` / ``ModFileMetadata``
lineage nodes (``/root/reference/src/etl/helpers/etl_helper.py:279-299``,
``/root/reference/src/etl/bgi_etl.py:166-179``) and the node-count
regression gate (``/root/reference/src/etl/node_count_etl.py:20-78``).
Here lineage IS the commit protocol (Delta-Lake-style, see PAPERS.md):

Layout under ``lake_root``::

    part=<p>/epoch=<e>.parquet          copy-on-write partition snapshots
    _manifests/staged/epoch=<e>/part=<p>.json   per-partition staged manifest
    _manifests/epoch=<e>.json           epoch COMMIT point (atomic rename)

Exactly-once under at-least-once task retries:

- data files have deterministic names and are written tmp → ``os.replace``
  (idempotent: a retried task re-produces the identical file);
- a partition's staged manifest is written (atomically) only after its
  data file — a present staged manifest ⇒ the data file is complete, so
  a resumed epoch skips that partition (per-partition resume);
- the epoch manifest is written last, after all partitions, and is the
  single commit point: an epoch is applied iff ``epoch=<e>.json`` exists.
  Replayed epochs are detected and skipped (≙ MERGE idempotency,
  ``/root/reference/src/etl/bgi_etl.py:99-116``).

Each epoch manifest records the full partition map (untouched partitions
carry forward their previous file), the schema-registry state, per-
partition row counts / checksums / max applied offset — the lineage the
north rule requires.
"""

from __future__ import annotations

import json
import os
from typing import Any

_EPOCH_RE_PREFIX = "epoch="


def _atomic_write_json(path: str, obj: Any) -> None:
    """Default-commit-IO JSON publish (derived/corpus manifest sidecars)."""
    from .commit_io import DEFAULT_COMMIT_IO

    DEFAULT_COMMIT_IO.publish_json(path, obj)


class LakeManifest:
    """Driver-side view of a lake's commit log (cheap, picklable).

    ``commit_io``: the atomic-publish implementation (default POSIX
    rename; inject ``ObjectStoreCommitIO`` for single-shot-PUT stores —
    every manifest/staged write routes through it)."""

    def __init__(self, lake_root: str, commit_io=None):
        from .commit_io import DEFAULT_COMMIT_IO

        self.lake_root = lake_root
        self.manifest_dir = os.path.join(lake_root, "_manifests")
        self.commit_io = commit_io or DEFAULT_COMMIT_IO

    # ---- epoch commits ----------------------------------------------------
    def epoch_manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"{_EPOCH_RE_PREFIX}{epoch}.json")

    def committed_epochs(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith(_EPOCH_RE_PREFIX) and name.endswith(".json"):
                out.append(int(name[len(_EPOCH_RE_PREFIX):-5]))
        return sorted(out)

    def last_committed_epoch(self) -> int | None:
        es = self.committed_epochs()
        return es[-1] if es else None

    def read_epoch(self, epoch: int) -> dict:
        with open(self.epoch_manifest_path(epoch)) as fh:
            return json.load(fh)

    def commit_epoch(self, epoch: int, schema_registry: dict, partitions: dict[int, dict],
                     wal_offsets: tuple[int, int] | None,
                     quarantine: dict | None = None,
                     n_partitions: int | None = None,
                     extras: dict | None = None) -> dict:
        """Atomically publish epoch ``epoch``.  ``partitions`` maps
        part-id → {"path": rel_path|None, "rows": n, "live_rows": n,
        "checksum": hex, "max_offset": o, "epoch": last_write_epoch}.
        ``quarantine``: poison-event lineage ({"rows": n, "files": [...]})
        — recorded, never part of the partition map."""
        manifest = {
            "epoch": epoch,
            "schema_registry": schema_registry,
            "wal_offsets": wal_offsets,
            "partitions": {str(p): info for p, info in sorted(partitions.items())},
        }
        if quarantine:
            manifest["quarantine"] = quarantine
        if n_partitions is not None:
            # lets readers route a key straight to its partition
            # (point_lookup) without knowing the engine config
            manifest["n_partitions"] = n_partitions
        if extras:
            # lineage fields carried through in-place rewrites
            # (restore/purge/repartition must never lose history)
            manifest.update(extras)
        self.commit_io.publish_json(self.epoch_manifest_path(epoch), manifest)
        return manifest

    # ---- per-partition staging (intra-epoch resume) -----------------------
    def staged_path(self, epoch: int, part: int) -> str:
        return os.path.join(self.manifest_dir, "staged", f"epoch={epoch}", f"part={part}.json")

    def read_staged(self, epoch: int, part: int) -> dict | None:
        p = self.staged_path(epoch, part)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            return None

    def write_staged(self, epoch: int, part: int, info: dict) -> None:
        self.commit_io.publish_json(self.staged_path(epoch, part), info)

    # ---- data files -------------------------------------------------------
    def partition_file(self, part: int, epoch: int) -> str:
        """Deterministic data-file name (idempotent across task retries)."""
        return os.path.join(f"part={part}", f"epoch={epoch}.parquet")

    def abspath(self, rel: str) -> str:
        return os.path.join(self.lake_root, rel)

    def current_partitions(self) -> dict[int, dict]:
        """Partition map as of the last committed epoch ({} if none)."""
        last = self.last_committed_epoch()
        if last is None:
            return {}
        m = self.read_epoch(last)
        return {int(p): info for p, info in m["partitions"].items()}

    def current_schema_registry(self) -> dict | None:
        last = self.last_committed_epoch()
        if last is None:
            return None
        return self.read_epoch(last)["schema_registry"]

    # ---- vacuum (data-file retention) --------------------------------------
    def vacuum_marker_path(self) -> str:
        return os.path.join(self.manifest_dir, "_VACUUM.json")

    def read_vacuum(self) -> dict | None:
        p = self.vacuum_marker_path()
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def min_readable_epoch(self) -> int | None:
        """Oldest epoch whose data files are guaranteed present (None =
        never vacuumed, all committed epochs readable)."""
        v = self.read_vacuum()
        return None if v is None else int(v["min_readable_epoch"])

    def assert_readable(self, epoch: int) -> None:
        """Raise if ``epoch``'s data files may have been vacuumed.

        Readers MUST call this before resolving an epoch manifest to
        file paths: the vacuum protocol publishes the watermark BEFORE
        deleting, so a reader that checks first can never race a
        concurrent vacuum into reading a half-deleted snapshot.
        Savepointed epochs stay readable below the watermark — vacuum
        pins their file sets."""
        w = self.min_readable_epoch()
        if w is not None and epoch < w and epoch not in self.read_savepoints():
            raise ValueError(
                f"epoch {epoch} was vacuumed (min readable epoch: {w}); "
                "time-travel below the retention watermark is gone")

    def write_vacuum(self, obj: dict) -> None:
        self.commit_io.publish_json(self.vacuum_marker_path(), obj)

    # ---- savepoints (vacuum-exempt pinned snapshots) ------------------------
    def savepoints_path(self) -> str:
        return os.path.join(self.manifest_dir, "_SAVEPOINTS.json")

    def read_savepoints(self) -> dict[int, dict]:
        """epoch → {name, created_at_epoch} for every pinned snapshot."""
        p = self.savepoints_path()
        if not os.path.exists(p):
            return {}
        with open(p) as fh:
            return {int(k): v for k, v in json.load(fh).items()}

    def write_savepoints(self, sp: dict[int, dict]) -> None:
        self.commit_io.publish_json(
            self.savepoints_path(), {str(k): sp[k] for k in sorted(sp)})
