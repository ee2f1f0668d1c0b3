"""Deterministic synthetic WAL generator (FIXTURES.md §2/§3).

Produces ``wal_root/epoch=<e>/segment-<k>.parquet`` files of change
events over conversation-transcript records.  Fully seeded and
vectorized (numpy) so the same spec always yields byte-identical event
streams — the engine-side analogue of the reference's fixed TEST_SET
corpus (``/root/reference/src/test/test_object.py:12-413``): a known
input whose final state the tests assert against.

No external data; everything is synthesized from the seed.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import WAL_SCHEMA

#: on-disk WAL layout version; bump whenever generate_wal's directory
#: contract changes (sentinels, markers, sidecars) so cached fixtures
#: from an older generator regenerate instead of being reused
WAL_FORMAT = 2

_BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed origin
_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "python", "browser", "calculator"])


@dataclass(frozen=True)
class WalSpec:
    """Parameters of one deterministic WAL (hashable → cacheable)."""

    n_events: int = 5_000
    n_convs: int = 200
    n_epochs: int = 1
    segments_per_epoch: int = 2
    seed: int = 42
    update_frac: float = 0.0
    delete_frac: float = 0.0
    #: Zipf exponent for conv_id frequency; None → uniform (t3-skew uses 1.2).
    zipf_a: float | None = None
    #: fraction of events whose ts is pushed far backwards (late data)
    out_of_order_frac: float = 0.0
    #: fraction of events whose ts collides with another event (offset tie-break)
    dup_ts_frac: float = 0.0
    max_turns: int = 64
    text_len: int = 80
    #: number of rows padded to ~64 KiB to exercise wide rows
    wide_rows: int = 0
    #: schema-change events: (position in [0,1) of the stream, JSON string)
    schema_events: tuple[tuple[float, str], ...] = field(default_factory=tuple)


# Fixture tiers (FIXTURES.md §3).  t4-resume replays t2 with a forced
# kill between epochs — same WAL, different driver behavior (tests).
T1_SMOKE = WalSpec(n_events=5_000, n_convs=200, n_epochs=1)
T2_CORRECTNESS = WalSpec(
    n_events=60_000,
    n_convs=2_000,
    n_epochs=8,
    update_frac=0.20,
    delete_frac=0.08,
    out_of_order_frac=0.10,
    dup_ts_frac=0.05,
    schema_events=(
        (0.4, json.dumps({"kind": "add_column", "name": "lang", "type": "string", "default": None})),
        (0.7, json.dumps({"kind": "widen", "name": "turn_idx", "to": "int64"})),
    ),
)
T3_SKEW = WalSpec(
    n_events=600_000,
    n_convs=20_000,
    n_epochs=8,
    update_frac=0.25,
    delete_frac=0.05,
    zipf_a=1.2,
    out_of_order_frac=0.05,
    dup_ts_frac=0.02,
)


def _zipf_conv_indices(rng: np.random.Generator, n: int, n_convs: int, a: float) -> np.ndarray:
    """Zipf(a) draw folded into [0, n_convs); index 0 is the hot key.

    Overflow ranks wrap with modulo (NOT clamp-to-last — clamping would
    concentrate the whole tail mass on one synthetic hotspot)."""
    ranks = rng.zipf(a, size=n)
    return ((ranks - 1) % n_convs).astype(np.int64)


def build_events(spec: WalSpec) -> pa.Table:
    """Build the full event stream as one Arrow table (offset-ordered)."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    if spec.zipf_a is not None:
        conv_idx = _zipf_conv_indices(rng, n, spec.n_convs, spec.zipf_a)
    else:
        conv_idx = rng.integers(0, spec.n_convs, size=n)
    turn_idx = rng.integers(0, spec.max_turns, size=n).astype(np.int32)

    p = rng.random(n)  # op codes derived below (D / U / I cut points)

    # ts: monotone-ish in offset with jitter; late/duplicate fractions
    ts = _BASE_TS_US + np.arange(n, dtype=np.int64) * 1_000 + rng.integers(0, 500, size=n)
    late = rng.random(n) < spec.out_of_order_frac
    ts[late] -= rng.integers(10_000_000, 100_000_000, size=int(late.sum()))
    dup = rng.random(n) < spec.dup_ts_frac
    ts[dup] = (ts[dup] // 1_000_000) * 1_000_000  # coarse-rounded → collisions

    role_codes = rng.integers(0, len(_ROLES), size=n)
    tool_codes = rng.integers(0, len(_TOOLS), size=n)

    # String assembly runs through Arrow C++ kernels (gather on a tiny
    # dictionary + cast + join), NOT np.char/object arrays — np.char's
    # per-element unicode ufuncs made generation the bench bottleneck
    # (~15 min for 16 M events; this path is ~20x faster), while the rng
    # draw order and every formatted byte stay identical.
    import pyarrow.compute as pc

    def _gather(values: np.ndarray, codes: np.ndarray) -> pa.Array:
        return pc.take(pa.array(values.tolist(), pa.string()),
                       pa.array(codes.astype(np.int64)))

    offs = np.arange(n, dtype=np.int64)
    op_codes = np.where(p < spec.delete_frac, 0,
                        np.where(p < spec.delete_frac + spec.update_frac, 1, 2))
    op_pa = _gather(np.array(["D", "U", "I"]), op_codes)
    role_pa = _gather(_ROLES, role_codes)
    is_tool = pc.equal(role_pa, "tool")
    tool_pa = pc.if_else(is_tool, _gather(_TOOLS, tool_codes),
                         pa.scalar("", pa.string()))

    def _int_str(a: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(a), pa.string())

    pad = ("".join(rng.choice(list("abcdefgh ij klmnop qrstu vwxyz"),
                              size=spec.text_len - 30))
           if spec.text_len > 40 else None)

    # build the wide string columns in row slices: a single string Array
    # caps at 2 GiB of offsets+data (ArrowCapacityError at 32 M events);
    # chunked columns keep every chunk well under it
    _SLICE = 4_000_000
    conv_chunks, text_chunks = [], []
    for lo in range(0, n, _SLICE):
        hi = min(lo + _SLICE, n)
        conv_c = pc.binary_join_element_wise(
            "conv-",
            pc.utf8_lpad(_int_str(conv_idx[lo:hi].astype(np.int64)), 8, "0"),
            "")
        text_c = pc.binary_join_element_wise(
            "turn ", _int_str(turn_idx[lo:hi].astype(np.int64)), " of ",
            conv_c, " @", _int_str(offs[lo:hi]), "")
        if pad is not None:
            text_c = pc.binary_join_element_wise(text_c, " " + pad, "")
        conv_chunks.append(conv_c)
        text_chunks.append(text_c)
    conv_pa = pa.chunked_array(conv_chunks)
    text_pa = pa.chunked_array(text_chunks)

    tbl_cols: dict[str, pa.Array] = {
        "offset": pa.array(offs, pa.int64()),
        "epoch": pa.array(np.zeros(n, np.int32)),  # assigned below
        "op": op_pa,
        "conv_id": conv_pa,
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": role_pa,
        "text": text_pa,
        "tool": tool_pa,
        "ts": pa.array(ts, pa.timestamp("us")),
        "schema_change": _gather(np.array([""]), np.zeros(n, np.int8)),
    }
    tbl = pa.table(tbl_cols, schema=WAL_SCHEMA)

    # Null out payloads for deletes (D carries only key + ts).
    import pyarrow.compute as pc

    is_d = pc.equal(tbl["op"], "D")
    for col in ("role", "text", "tool"):
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(idx, col, pc.if_else(is_d, pa.scalar(None, pa.string()), tbl[col]))

    # Wide rows: pad selected texts to ~64 KiB (FIXTURES.md: a few ≥64KiB).
    if spec.wide_rows:
        import pandas as pd

        wide_pos = rng.choice(n, size=min(spec.wide_rows, n), replace=False)
        texts = tbl["text"].to_pandas()
        blob = "W" * 65_536
        for i in wide_pos:
            if texts.iloc[i] is not None:
                texts.iloc[i] = texts.iloc[i] + blob
        idx = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(idx, "text", pa.Array.from_pandas(texts, type=pa.string()))

    # Inject schema-change events at their stream positions, renumber offsets.
    if spec.schema_events:
        parts, cursor = [], 0
        total = n + len(spec.schema_events)
        for pos, change in sorted(spec.schema_events):
            at = min(int(pos * n), n)
            parts.append(tbl.slice(cursor, at - cursor))
            s_row = pa.table(
                {
                    "offset": pa.array([0], pa.int64()),
                    "epoch": pa.array([0], pa.int32()),
                    "op": pa.array(["S"]),
                    "conv_id": pa.array([None], pa.string()),
                    "turn_idx": pa.array([None], pa.int32()),
                    "role": pa.array([None], pa.string()),
                    "text": pa.array([None], pa.string()),
                    "tool": pa.array([None], pa.string()),
                    "ts": pa.array([_BASE_TS_US + at * 1_000], pa.timestamp("us")),
                    "schema_change": pa.array([change]),
                },
                schema=WAL_SCHEMA,
            )
            parts.append(s_row)
            cursor = at
        parts.append(tbl.slice(cursor))
        tbl = pa.concat_tables(parts)
        idx = tbl.schema.get_field_index("offset")
        tbl = tbl.set_column(idx, "offset", pa.array(np.arange(total, dtype=np.int64)))

    # Epoch = contiguous offset ranges (micro-batch windows, SURVEY §2.9).
    total = tbl.num_rows
    per = -(-total // spec.n_epochs)
    epoch = (np.arange(total, dtype=np.int64) // per).astype(np.int32)
    idx = tbl.schema.get_field_index("epoch")
    tbl = tbl.set_column(idx, "epoch", pa.array(epoch, pa.int32()))
    return tbl


def generate_wal(out_dir: str, spec: WalSpec = T1_SMOKE, overwrite: bool = False) -> dict:
    """Write the WAL to ``out_dir/epoch=<e>/segment-<k>.parquet``.

    Returns a small metadata dict.  Idempotent: if ``out_dir`` already
    holds a ``_WAL_META.json`` matching the spec, generation is skipped
    (reference analogue: skip-if-downloaded,
    ``/root/reference/src/files/download.py:44-46``).
    """
    meta_path = os.path.join(out_dir, "_WAL_META.json")
    spec_key = json.dumps(spec.__dict__, default=str, sort_keys=True)
    if not overwrite and os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("spec_key") == spec_key and meta.get("format") == WAL_FORMAT:
            return meta

    tbl = build_events(spec)
    # a different spec may leave stale segment files behind — regenerate
    # into a clean directory
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # declare sealed-mode BEFORE the first epoch dir exists: a concurrent
    # tailer then requires per-epoch _SEALED sentinels from its very first
    # poll (no "zero sentinels ⇒ assume at-rest" inference race)
    with open(os.path.join(out_dir, "_WAL_SEALED_MODE"), "w") as fh:
        fh.write("")
    epochs = tbl["epoch"].to_numpy(zero_copy_only=False)
    n_epochs = int(epochs.max()) + 1
    for e in range(n_epochs):
        edir = os.path.join(out_dir, f"epoch={e}")
        os.makedirs(edir, exist_ok=True)
        lo, hi = np.searchsorted(epochs, [e, e + 1])
        etbl = tbl.slice(lo, hi - lo)
        k = max(1, spec.segments_per_epoch)
        per = -(-etbl.num_rows // k)
        for s in range(k):
            seg = etbl.slice(s * per, per)
            if seg.num_rows == 0 and s > 0:
                continue
            pq.write_table(seg, os.path.join(edir, f"segment-{s:04d}.parquet"))
        # sidecar: S events in offset order, so the apply driver never has
        # to scan the epoch's op column (rare events, tiny file)
        import pyarrow.compute as _pc

        s_rows = etbl.filter(_pc.equal(etbl["op"], "S"))
        side = [
            {"offset": o, "schema_change": c}
            for o, c in zip(s_rows["offset"].to_pylist(), s_rows["schema_change"].to_pylist())
        ]
        with open(os.path.join(edir, "_schema_events.json"), "w") as fh:
            json.dump(side, fh)
        # seal the epoch LAST: tailers only consume epochs with the
        # sentinel, so a concurrently-written epoch can never be applied
        # half-full and then skipped forever (manifest existence = committed)
        with open(os.path.join(edir, "_SEALED"), "w") as fh:
            fh.write("")

    meta = {
        "spec_key": spec_key,
        "format": WAL_FORMAT,
        "n_events": tbl.num_rows,
        "n_epochs": n_epochs,
        "out_dir": out_dir,
    }
    with open(meta_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    os.replace(meta_path + ".tmp", meta_path)
    return meta
