"""Loud invariants for driver-resident sides.

Several pipelines fold a PROVABLY bounded side on the driver (a
vocabulary, a catalog, a date span, a dirty-key set under size
dispatch).  Those bounds are data-model claims; this guard converts
them into invariants: if a "bounded" side ever exceeds the limit, the
pipeline fails loudly instead of silently growing driver memory —
at 100 TB the failure mode to fear is the quiet one.
"""

from __future__ import annotations

#: default ceiling for driver-resident row counts: 50M rows of small
#: scalars is ~1-2 GB — far above every legitimate bounded side, far
#: below what would threaten a driver heap.
DRIVER_BOUND = 50_000_000


class BoundedSideError(RuntimeError):
    """A side documented as driver-bounded exceeded its bound."""


def assert_bounded(n: int, what: str, limit: int = DRIVER_BOUND) -> int:
    """Assert a driver-resident side's row count is under ``limit``.

    Returns ``n`` so calls can be inlined in expressions."""
    if n > limit:
        raise BoundedSideError(
            f"{what}: {n} rows exceeds the documented driver bound "
            f"({limit}) — the 'bounded side' assumption is violated; "
            "route this stage through a distributed exchange instead")
    return n
