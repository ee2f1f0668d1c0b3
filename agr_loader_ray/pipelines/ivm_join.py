"""Incrementally-maintained JOIN view over two CDC lakes.

The binary-join member of the IVM family (``ivm.py`` maintains
aggregates, ``inverted.py`` postings, ``vector_ivm.py`` the ANN index):
keep ``J = A_live JOIN B_live ON conv_id`` current epoch-by-epoch from
both tables' change feeds instead of recomputing the join.

Maintenance rule (dirty-key recomputation — the self-maintainable form
of Gupta & Mumick's delta rules when both sides co-partition on the
join key): an epoch's dirty keys are the convs appearing in EITHER
table's change feed; only those convs' join rows are recomputed (from
epoch-pinned lake reads restricted to the dirty set) and only the
view buckets OWNING dirty convs are rewritten (copy-on-write;
untouched buckets carry forward in the manifest).  Per-epoch cost
tracks churn x per-conv join width, never view size.  Deletes fall
out naturally: a conv whose A-side emptied simply recomputes to zero
rows.

Storage = the ivm.py bucket layout: hash-bucketed parquet keyed by the
SAME conv hash as the lakes, epoch-tagged files, one JSON manifest per
epoch, idempotent (a committed epoch manifest short-circuits).

Scale assumptions (documented): the per-epoch dirty-conv set ships as
one sorted broadcast array (churn-bounded; above
``DIRTY_BROADCAST_LIMIT`` the epoch falls back to a full recompute of
the view — correct, and still incremental in storage); per-conv join
fan-out is bounded by per-conv row counts on each side.

Reference analogue: the reference re-derives every inferred
gene-disease edge per load (gene_disease_ortho_etl.py:119-158); this
maintains the equivalent derived join incrementally (SURVEY §3.2).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.bounds import assert_bounded
from ..stages.partition import stable_hash_strings
from ..state.manifest import _atomic_write_json
from .export import change_feed, read_lake

DIRTY_BROADCAST_LIMIT = 2_000_000

_JOIN_COLS = ["conv_id", "a_turn_idx", "a_role", "b_turn_idx", "b_role"]


def _manifest_path(out_dir: str, epoch: int) -> str:
    return os.path.join(out_dir, "_manifests", f"epoch={epoch}.json")


def _read_manifest(out_dir: str, epoch: int) -> dict | None:
    p = _manifest_path(out_dir, epoch)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _empty_join_df() -> pd.DataFrame:
    return pd.DataFrame({
        "conv_id": pd.Series([], dtype=object),
        "a_turn_idx": pd.Series([], dtype=np.int64),
        "a_role": pd.Series([], dtype=object),
        "b_turn_idx": pd.Series([], dtype=np.int64),
        "b_role": pd.Series([], dtype=object),
    })


def _join_schema() -> pa.Schema:
    return pa.schema([
        ("conv_id", pa.string()),
        ("a_turn_idx", pa.int64()),
        ("a_role", pa.string()),
        ("b_turn_idx", pa.int64()),
        ("b_role", pa.string()),
    ])


def _side_rows(lake_root: str, epoch: int, dirty_sorted: np.ndarray | None,
               side: int, n_buckets: int) -> "ray.data.Dataset":
    """Epoch-pinned read of one lake projected to the join columns,
    restricted to the dirty convs (broadcast probe), tagged + bucketed."""
    ds = read_lake(lake_root, epoch=epoch,
                   columns=["conv_id", "turn_idx", "role"])
    ref = ray.put(dirty_sorted) if dirty_sorted is not None else None

    def prep(t: pa.Table) -> pa.Table:
        if ref is not None:
            want = ray.get(ref)
            h = t["conv_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(want, h)
            pos = np.minimum(pos, max(len(want) - 1, 0))
            keep = (want[pos] == h) if len(want) else np.zeros(len(h), bool)
            t = t.filter(pa.array(keep))
        part = (stable_hash_strings(t["conv_id"])
                % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "role": t["role"],
            "side": pa.array(np.full(t.num_rows, side, np.int8)),
            "gpart": pa.array(part, pa.int32()),
        })

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def _join_kernel(g: pa.Table) -> pd.DataFrame:
    """Per-bucket inner join: sort by (conv, side, turn), segment per
    conv, cartesian a-rows x b-rows via offset math."""
    if g.num_rows == 0:
        return _empty_join_df()
    conv = g["conv_id"].to_numpy(zero_copy_only=False)
    turn = g["turn_idx"].to_numpy(zero_copy_only=False)
    role = g["role"].to_numpy(zero_copy_only=False)
    side = g["side"].to_numpy(zero_copy_only=False)
    conv_u, conv_c = np.unique(conv, return_inverse=True)
    order = np.lexsort((turn, side, conv_c))
    cc, tt, rr, ss = conv_c[order], turn[order], role[order], side[order]
    new_seg = np.r_[True, cc[1:] != cc[:-1]]
    starts = np.flatnonzero(new_seg)
    sizes = np.r_[starts[1:], len(cc)] - starts
    seg_of = np.cumsum(new_seg) - 1
    n0 = np.bincount(seg_of[ss == 0], minlength=len(starts))
    n1 = sizes - n0
    npair = n0 * n1
    total = int(npair.sum())
    if total == 0:
        return _empty_join_df()
    pseg = np.repeat(np.arange(len(starts)), npair)
    within = np.arange(total) - np.repeat(np.r_[0, np.cumsum(npair)[:-1]],
                                          npair)
    i_idx = within // n1[pseg]
    j_idx = within % n1[pseg]
    a_at = starts[pseg] + i_idx
    b_at = starts[pseg] + n0[pseg] + j_idx
    return pd.DataFrame({
        "conv_id": conv_u[cc[a_at]],
        "a_turn_idx": tt[a_at].astype(np.int64),
        "a_role": rr[a_at],
        "b_turn_idx": tt[b_at].astype(np.int64),
        "b_role": rr[b_at],
    })


def _compute_join(lake_a: str, lake_b: str, epoch: int,
                  dirty_sorted: np.ndarray | None,
                  n_buckets: int) -> "ray.data.Dataset":
    from ..stages.exchange import exchange_map_groups

    tagged = _side_rows(lake_a, epoch, dirty_sorted, 0, n_buckets).union(
        _side_rows(lake_b, epoch, dirty_sorted, 1, n_buckets))

    def kernel(g: pa.Table) -> pa.Table:
        df = _join_kernel(g)
        part = int(g["gpart"][0].as_py()) if g.num_rows else -1
        t = pa.Table.from_pandas(df, preserve_index=False,
                                 schema=_join_schema())
        return t.append_column(
            "gpart", pa.array(np.full(t.num_rows, part, np.int32)))

    return exchange_map_groups(tagged, "gpart", kernel, n_buckets)


def _publish(out_dir: str, epoch: int, n_buckets: int,
             bucket_frames: dict[int, pd.DataFrame],
             carry: dict[str, dict] | None, counters: dict) -> dict:
    partitions: dict[str, dict] = dict(carry or {})
    for part, df in bucket_frames.items():
        rel = os.path.join(f"part={part}", f"epoch={epoch}.parquet")
        path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        df = df.sort_values(["conv_id", "a_turn_idx", "b_turn_idx"],
                            kind="mergesort").reset_index(drop=True)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(df[_JOIN_COLS],
                                            preserve_index=False,
                                            schema=_join_schema()), tmp)
        os.replace(tmp, path)
        partitions[str(part)] = {"file": rel, "rows": int(len(df))}
    for p in range(n_buckets):
        partitions.setdefault(str(p), {"file": None, "rows": 0})
    info = {"source_epoch": epoch, "n_buckets": n_buckets,
            "partitions": partitions, "counters": counters}
    _atomic_write_json(_manifest_path(out_dir, epoch), info)
    return info


def maintain_join_epoch(lake_a: str, lake_b: str, out_dir: str, epoch: int,
                        n_buckets: int = 16) -> dict:
    """Advance the join view to ``epoch`` (idempotent; resume-safe)."""
    done = _read_manifest(out_dir, epoch)
    if done is not None:
        return done
    prev = _read_manifest(out_dir, epoch - 1)

    # dirty convs this epoch = convs changed in EITHER lake
    dirty: set = set()
    for lake in (lake_a, lake_b):
        cdf = change_feed(lake, epoch, images="post")
        for b in cdf.map_batches(
                lambda t: pa.table({"conv_id": pc.unique(
                    t["conv_id"].combine_chunks())}),
                batch_format="pyarrow", zero_copy_batch=True) \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            dirty.update(b["conv_id"].to_pylist())
            assert_bounded(len(dirty), "ivm_join dirty-conv set")

    if prev is None or len(dirty) > DIRTY_BROADCAST_LIMIT:
        # first epoch, or churn past the broadcast bound: full recompute
        out = _compute_join(lake_a, lake_b, epoch, None, n_buckets)
        frames: dict[int, pd.DataFrame] = {
            p: _empty_join_df() for p in range(n_buckets)}
        held = 0
        for b in out.iter_batches(batch_size=1 << 20, batch_format="pandas"):
            held = assert_bounded(held + len(b),
                                  "ivm_join full-recompute view fold")
            for part, g in b.groupby("gpart"):
                frames[int(part)] = pd.concat(
                    [frames[int(part)], g[_JOIN_COLS]], ignore_index=True)
        return _publish(out_dir, epoch, n_buckets, frames, None,
                        {"mode": "full", "changed_convs": len(dirty),
                         "buckets_rewritten": n_buckets})

    if not dirty:
        return _publish(out_dir, epoch, n_buckets, {}, prev["partitions"],
                        {"mode": "noop", "changed_convs": 0,
                         "buckets_rewritten": 0})

    dirty_sorted = np.sort(np.array(sorted(dirty), dtype=object))
    new_rows = _compute_join(lake_a, lake_b, epoch, dirty_sorted, n_buckets)
    dirty_parts = np.unique(
        (stable_hash_strings(dirty_sorted) % np.uint64(n_buckets))
        .astype(np.int32))
    fresh: dict[int, pd.DataFrame] = {int(p): _empty_join_df()
                                      for p in dirty_parts}
    held = 0
    for b in new_rows.iter_batches(batch_size=1 << 20, batch_format="pandas"):
        held = assert_bounded(held + len(b),
                              "ivm_join dirty-bucket recompute fold")
        for part, g in b.groupby("gpart"):
            fresh[int(part)] = pd.concat(
                [fresh[int(part)], g[_JOIN_COLS]], ignore_index=True)

    dirty_set = set(dirty)
    frames: dict[int, pd.DataFrame] = {}
    for part in (int(p) for p in dirty_parts):
        ent = prev["partitions"].get(str(part), {"file": None})
        if ent["file"]:
            old = pq.read_table(os.path.join(out_dir, ent["file"])) \
                .to_pandas()
            held = assert_bounded(held + len(old),
                                  "ivm_join dirty-bucket rewrite fold")
            old = old[~old["conv_id"].isin(dirty_set)]
        else:
            old = _empty_join_df()
        frames[part] = pd.concat([old, fresh[part]], ignore_index=True)
    carry = {p: e for p, e in prev["partitions"].items()
             if int(p) not in frames}
    return _publish(out_dir, epoch, n_buckets, frames, carry,
                    {"mode": "incremental", "changed_convs": len(dirty),
                     "buckets_rewritten": len(frames)})


def maintain_join(lake_a: str, lake_b: str, out_dir: str,
                  epochs: list[int], n_buckets: int = 16) -> list[dict]:
    return [maintain_join_epoch(lake_a, lake_b, out_dir, e, n_buckets)
            for e in sorted(epochs)]


def read_join(out_dir: str, epoch: int) -> "ray.data.Dataset":
    info = _read_manifest(out_dir, epoch)
    if info is None:
        raise FileNotFoundError(f"no join-view manifest for epoch {epoch}")
    files = [os.path.join(out_dir, e["file"])
             for e in info["partitions"].values() if e["file"]]
    if not files:
        return ray.data.from_arrow(_join_schema().empty_table())
    # columns pinned: the part=N/epoch=M path layout would otherwise be
    # hive-inferred into two extra columns
    return ray.data.read_parquet(files, columns=_JOIN_COLS)
