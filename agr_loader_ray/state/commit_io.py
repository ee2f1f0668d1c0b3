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

    def publish_table(self, path: str, tbl: pa.Table,
                      row_group_size: int | None = None) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)

    def publish_json(self, path: str, obj: Any) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def publish_json_if_absent(self, path: str, obj: Any) -> bool:
        """Atomic create-exclusive publish — the OCC commit primitive.

        Returns True iff THIS call made ``path`` visible; False if the
        name already existed (another writer won the race).  POSIX
        ``os.link`` fails with EEXIST atomically; the loser's temp file
        is removed and the committed content is untouched."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.occ.{os.getpid()}.{id(obj)}"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


DEFAULT_COMMIT_IO = LocalCommitIO()


class FakeObjectStoreClient:
    """Local stand-in for an object store: ``put(key, bytes)`` makes the
    object visible all-or-nothing (emulated with a temp file + rename —
    the atomicity a real store's single-shot PUT provides natively).
    Overwrites are idempotent, matching the engine's deterministic-name
    retry contract.  Picklable (workers hold only the root path)."""

    def __init__(self, root: str):
        self.root = root

    def put(self, key: str, data: bytes) -> None:
        path = os.path.join(self.root, key.lstrip("/"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.put.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)  # the "PUT became visible" instant

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Conditional PUT (S3 ``If-None-Match: *`` / GCS precondition
        generation=0 semantics): succeeds iff the key does not exist."""
        path = os.path.join(self.root, key.lstrip("/"))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.cput.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class ObjectStoreCommitIO:
    """Single-shot-PUT commit I/O for object stores (S3/GCS semantics).

    Serializes the full payload in memory and hands it to the client in
    ONE put — objects appear atomically, so no rename step exists or is
    needed.  Combined with deterministic final names (idempotent
    overwrite on retry) and manifest-written-last, the commit protocol
    is identical to ``LocalCommitIO`` — swap the class, keep the engine.

    ``client`` needs one method: ``put(key: str, data: bytes)``.  Keys
    are the absolute lake paths (the engine's name scheme already
    encodes epoch/partition uniqueness).
    """

    def __init__(self, client):
        self.client = client

    def publish_table(self, path: str, tbl: pa.Table,
                      row_group_size: int | None = None) -> None:
        sink = pa.BufferOutputStream()
        pq.write_table(tbl, sink, row_group_size=row_group_size)
        self.client.put(path, sink.getvalue().to_pybytes())

    def publish_json(self, path: str, obj: Any) -> None:
        self.client.put(path, json.dumps(obj).encode("utf-8"))

    def publish_json_if_absent(self, path: str, obj: Any) -> bool:
        return self.client.put_if_absent(path, json.dumps(obj).encode("utf-8"))
