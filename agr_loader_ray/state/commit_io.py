"""Commit I/O seam: how lake bytes become visible atomically.

The engine's exactly-once story rests on two primitives (SURVEY §2.1 K1
— the reference's CSV-then-transactional-commit split,
``/root/reference/src/transactors/neo4j_transactor.py:117-142``):

1. ``publish_table`` / ``publish_json`` — write payload bytes so the
   final name appears all-or-nothing.
2. Uniqueness of the final name per (epoch, partition) — so replaying a
   crashed epoch re-publishes the SAME bytes under the SAME name
   (idempotent overwrite), never a partial file under a committed name.

``LocalCommitIO`` implements the contract with tmp → ``os.replace`` —
atomic on POSIX when lake_root is a local or shared-POSIX-rename
filesystem (NFS/lustre/EFS).  On an object store (S3/GCS) replace the
implementation with single-shot PUTs (objects appear atomically; no
rename needed) — the deterministic-name + manifest-last protocol is
transport-independent.  The engine and manifests route every publish
through this seam so a multi-node deployment swaps ONE class, not the
commit protocol.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq


class LocalCommitIO:
    """POSIX rename-based atomic publish (single node / shared POSIX fs)."""

    def publish_table(self, path: str, tbl: pa.Table) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def publish_json(self, path: str, obj: Any) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)


DEFAULT_COMMIT_IO = LocalCommitIO()
