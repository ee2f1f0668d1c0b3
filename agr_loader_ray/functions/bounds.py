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


class PackOverflowError(RuntimeError):
    """A key pair exceeded the bit budget of a packed int64 key."""


def checked_pack(hi, lo, bits: int, what: str):
    """Pack two non-negative int64 numpy arrays into one int64 key as
    ``(hi << bits) | lo`` with a LOUD range guard.

    Packing is only lossless when ``0 <= lo < 2**bits`` and
    ``0 <= hi < 2**(63 - bits)``; outside those ranges the OR silently
    merges distinct pairs (e.g. TPC-H partkey passes 2**31 near
    SF~1e4).  This converts that quiet corruption into an error at the
    exact batch that violates the budget, so a 100 TB run fails fast
    instead of producing wrong distinct-pair counts.
    """
    import numpy as np

    bits = int(bits)
    if len(lo):
        lo_min, lo_max = int(lo.min()), int(lo.max())
        hi_min, hi_max = int(hi.min()), int(hi.max())
        if lo_min < 0 or lo_max >= (1 << bits):
            raise PackOverflowError(
                f"{what}: low key range [{lo_min}, {lo_max}] exceeds the "
                f"{bits}-bit pack budget — distinct pairs would collide")
        if hi_min < 0 or hi_max >= (1 << (63 - bits)):
            raise PackOverflowError(
                f"{what}: high key range [{hi_min}, {hi_max}] exceeds the "
                f"{63 - bits}-bit pack budget — keys would overflow int64")
    return (hi.astype(np.int64) << np.int64(bits)) | lo.astype(np.int64)
