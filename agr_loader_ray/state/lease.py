"""Single-writer lease with fencing tokens for the lake.

The reference serializes all writes through one transactor process
(src/transactors/neo4j_transactor.py's single queue); a distributed
lake needs an explicit coordination primitive instead.  This is the
standard lease-with-fencing-token design: one ``_WRITER_LEASE.json``
at the lake root holding ``(owner, token, expires_at)``.

- ``acquire`` succeeds when the lease is free, expired, or already
  ours; every acquisition increments the monotonic fencing ``token``.
- ``assert_held`` re-reads the file and fails if the lease was lost
  (expired and taken over: the token moved on) — callers invoke it at
  the start of a write AND immediately before each manifest commit,
  so a paused/zombie writer cannot commit over a successor.

On POSIX the read-then-write pair is best-effort (two writers racing
the same free lease within one fsync window can both "win"); a real
object-store deployment backs this with a conditional put
(If-None-Match / CAS on the token) through the same CommitIO seam
used for manifests.  The protection that matters operationally —
fencing a STALE writer that lost its lease — is exact either way,
because the stale writer's token check fails deterministically.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

LEASE_FILE = "_WRITER_LEASE.json"


class LeaseHeldError(RuntimeError):
    """Another writer holds a live lease on this lake."""


class LeaseLostError(RuntimeError):
    """This writer's lease expired and was taken over (fencing)."""


def read_lease(lake_root: str) -> dict | None:
    path = os.path.join(lake_root, LEASE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class WriterLease:
    """One writer's handle on the lake's exclusive-writer lease.

    ``clock`` is injectable for tests (defaults to wall time).
    """

    def __init__(self, lake_root: str, owner: str, ttl_s: float = 60.0,
                 clock: Callable[[], float] = time.time, commit_io=None):
        from .commit_io import DEFAULT_COMMIT_IO

        self.lake_root = lake_root
        self.owner = owner
        self.ttl_s = float(ttl_s)
        self.clock = clock
        self.commit_io = commit_io or DEFAULT_COMMIT_IO
        self.token: int | None = None

    @property
    def path(self) -> str:
        return os.path.join(self.lake_root, LEASE_FILE)

    def _write(self, token: int) -> None:
        # through the commit-I/O seam like every other lake publish
        # (single-shot PUT / conditional-put on object stores)
        os.makedirs(self.lake_root, exist_ok=True)
        self.commit_io.publish_json(self.path, {
            "owner": self.owner,
            "token": token,
            "expires_at": self.clock() + self.ttl_s,
        })
        self.token = token

    def acquire(self) -> int:
        """Take the lease; returns the fencing token.  Raises
        ``LeaseHeldError`` while another owner's lease is live."""
        cur = read_lease(self.lake_root)
        if cur is not None and cur["expires_at"] > self.clock() \
                and cur["owner"] != self.owner:
            raise LeaseHeldError(
                f"lake {self.lake_root} is held by {cur['owner']!r} "
                f"(token {cur['token']}) for another "
                f"{cur['expires_at'] - self.clock():.0f}s")
        self._write((cur["token"] + 1) if cur is not None else 1)
        return self.token

    def renew(self) -> None:
        """Extend a lease we still hold (heartbeat)."""
        self.assert_held()
        self._write(self.token)

    def assert_held(self) -> None:
        """Fencing check: fail unless the on-disk lease is ours, at our
        token, and unexpired."""
        if self.token is None:
            raise LeaseLostError("lease was never acquired")
        cur = read_lease(self.lake_root)
        if cur is None or cur["owner"] != self.owner \
                or cur["token"] != self.token:
            raise LeaseLostError(
                f"writer {self.owner!r} (token {self.token}) lost the lease "
                f"to {cur and cur['owner']!r} (token {cur and cur['token']})")
        if cur["expires_at"] <= self.clock():
            raise LeaseLostError(
                f"writer {self.owner!r} lease expired "
                f"{self.clock() - cur['expires_at']:.0f}s ago; renew() before "
                "writing or another writer may already own the lake")

    def release(self) -> None:
        """Drop the lease if we still hold it (idempotent).  The file
        stays behind with ``expires_at`` in the past — deleting it
        would reset the fencing token counter, and tokens must be
        monotonic for the lifetime of the lake."""
        try:
            self.assert_held()
        except LeaseLostError:
            self.token = None
            return
        self.commit_io.publish_json(self.path, {
            "owner": self.owner, "token": self.token, "expires_at": 0.0})
        self.token = None


def check_no_foreign_lease(lake_root: str, lease: WriterLease | None,
                           clock: Callable[[], float] = time.time) -> None:
    """Engine-side guard: a lease-less writer may proceed only when no
    LIVE lease exists (opt-in coordination — un-leased lakes stay
    zero-config); a leased writer must still hold its token."""
    if lease is not None:
        lease.assert_held()
        return
    cur = read_lease(lake_root)
    if cur is not None and cur["expires_at"] > clock():
        raise LeaseHeldError(
            f"lake {lake_root} has a live writer lease "
            f"(owner {cur['owner']!r}); construct the engine with that "
            "lease or wait for expiry")
