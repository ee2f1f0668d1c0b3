"""CDF-maintained inverted index: token → (conv_id, turn_idx, tf)
postings over the live transcript text, kept current per epoch from the
lake's change-data-feed — the search-index counterpart of the
``pipelines/ivm.py`` aggregate view.

Reference analogue (SURVEY §3.2): the reference rebuilds its search
artifacts wholesale after every load; here each epoch folds only that
epoch's changes.

Design — the index is itself a tiny MOR lake, with an ADDITIVE merge
instead of LWW:

- postings are hash-bucketed by TOKEN (the read key), not by the lake's
  (conv_id, turn_idx) — maintenance re-keys the change stream once;
- every epoch appends one DELTA SEGMENT per touched bucket holding net
  ``(token, conv_id, turn_idx, d_tf)`` rows (adds from
  insert/update_postimage images, retractions from
  delete/update_preimage — a token edited away cancels exactly);
  tf-SUM is self-maintainable, so there is NO repair scan at all;
- a read folds a bucket's segments with one grouped sum and drops
  ``tf ≤ 0``; ``compact_index`` folds segments into a new base so the
  read amplification stays bounded (the LSM pattern — copy-on-write
  bucket REWRITE per epoch would be wrong here: one changed turn
  scatters its tokens across every bucket, so per-epoch cost must track
  CHURN, not index size).

Per-epoch manifests make maintenance resumable and idempotent, exactly
like the lake's own commit protocol.

Limitation (same as ivm.py, documented): a schema rename of ``text``
would require re-bootstrap; additive evolution is transparent.
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

from ..state.manifest import LakeManifest, _atomic_write_json
from ..stages.partition import stable_hash_strings
from .export import change_feed

_IDX_COLS = ["token", "conv_id", "turn_idx", "tf"]
_SEG_COLS = ["token", "conv_id", "turn_idx", "d_tf"]

_ADD_TYPES = ("insert", "update_postimage")

_SEG_SCHEMA = pa.schema([
    ("token", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),
    ("d_tf", pa.int64()),
    ("gpart", pa.int32()),
])


def _manifest_path(out_dir: str, epoch: int) -> str:
    return os.path.join(out_dir, "_manifests", f"epoch={epoch}.json")


def _read_manifest(out_dir: str, epoch: int) -> dict | None:
    p = _manifest_path(out_dir, epoch)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def maintain_epoch(lake_root: str, out_dir: str, epoch: int,
                   n_buckets: int = 16) -> dict:
    """Fold epoch ``epoch``'s change feed into per-bucket delta segments
    (epoch 0 needs no special bootstrap: its feed is pure inserts)."""
    if epoch > 0:
        prev = _read_manifest(out_dir, epoch - 1)
        if prev is None:
            raise FileNotFoundError(f"index not maintained at epoch {epoch - 1}")
        n_buckets = prev["n_buckets"]
        prev_parts = prev["partitions"]
    else:
        prev_parts = {str(p): {"segments": []} for p in range(n_buckets)}

    cdf = change_feed(lake_root, epoch, images="both")

    def delta_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=_SEG_SCHEMA)
        sign = pc.if_else(
            pc.is_in(t["change_type"], value_set=pa.array(_ADD_TYPES)),
            pa.scalar(1, pa.int64()), pa.scalar(-1, pa.int64()))
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        parent = parent.filter(keep)
        pairs = pa.table({
            "token": flat.filter(keep),
            "conv_id": t["conv_id"].take(parent),
            "turn_idx": pc.cast(t["turn_idx"].take(parent), pa.int64()),
            "d_tf": sign.take(parent),
        })
        # net delta per posting: pre/post images of an unchanged token
        # cancel HERE, before the exchange
        g = pairs.group_by(["token", "conv_id", "turn_idx"]).aggregate(
            [("d_tf", "sum")])
        g = g.filter(pc.not_equal(g["d_tf_sum"], 0))
        part = (stable_hash_strings(g["token"]) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"token": g["token"], "conv_id": g["conv_id"],
                         "turn_idx": g["turn_idx"],
                         "d_tf": pc.cast(g["d_tf_sum"], pa.int64()),
                         "gpart": pa.array(part, pa.int32())})

    def write_kernel(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["gpart"].iloc[0])
        net = (g.groupby(["token", "conv_id", "turn_idx"], sort=False)
               ["d_tf"].sum().reset_index())
        net = net[net["d_tf"] != 0]
        if net.empty:
            return pd.DataFrame({"part": [part], "rows": [0], "file": [None]})
        rel = os.path.join(f"part={part}", f"seg-epoch={epoch}.parquet")
        path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        net = net.sort_values(["token", "conv_id", "turn_idx"],
                              kind="mergesort").reset_index(drop=True)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(net[_SEG_COLS], preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"part": [part], "rows": [int(len(net))], "file": [rel]})

    res = (
        cdf.map_batches(delta_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart")
        .map_groups(write_kernel, batch_format="pandas")
    ).to_pandas()

    partitions = {p: {"segments": list(i.get("segments") or [])}
                  for p, i in prev_parts.items()}
    touched = 0
    for r in res.itertuples():
        if r.file:
            partitions[str(r.part)]["segments"].append(r.file)
            touched += 1
    info = {"source_epoch": epoch, "n_buckets": n_buckets,
            "partitions": partitions,
            "counters": {"postings_delta": int(res["rows"].sum()),
                         "buckets_touched": touched}}
    _atomic_write_json(_manifest_path(out_dir, epoch), info)
    return info


def maintain_index(lake_root: str, out_dir: str, n_buckets: int = 16) -> list[dict]:
    """Bring the index up to the lake's last committed epoch (resumable:
    already-maintained epochs — manifest present — are skipped)."""
    last = LakeManifest(lake_root).last_committed_epoch()
    if last is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    infos = []
    for e in range(last + 1):
        info = _read_manifest(out_dir, e)
        if info is None:
            info = maintain_epoch(lake_root, out_dir, e, n_buckets)
        infos.append(info)
    return infos


def _fold_segments(tables: list[pa.Table]) -> pa.Table:
    t = pa.concat_tables(tables)
    g = t.group_by(["token", "conv_id", "turn_idx"]).aggregate([("d_tf", "sum")])
    g = g.filter(pc.greater(g["d_tf_sum"], 0))
    return pa.table({"token": g["token"], "conv_id": g["conv_id"],
                     "turn_idx": g["turn_idx"],
                     "tf": pc.cast(g["d_tf_sum"], pa.int64())})


def read_index(out_dir: str, epoch: int | None = None) -> ray.data.Dataset:
    """Dataset over the postings as of ``epoch`` (default latest):
    merge-on-read — one fold task per bucket over its segment chain."""
    if epoch is None:
        epochs = [int(f.split("=")[1].split(".")[0])
                  for f in os.listdir(os.path.join(out_dir, "_manifests"))]
        epoch = max(epochs)
    manifest = _read_manifest(out_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"index not maintained at epoch {epoch}")
    items = [{"segments": i["segments"]}
             for i in manifest["partitions"].values() if i["segments"]]
    empty = pa.table({"token": pa.array([], pa.string()),
                      "conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64())})
    if not items:
        return ray.data.from_arrow(empty)

    def fold(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            tabs = [pq.read_table(os.path.join(out_dir, rel))
                    for rel in row["segments"]]
            folded = _fold_segments(tabs)
            if folded.num_rows:
                outs.append(folded)
        return pa.concat_tables(outs) if outs else empty

    return ray.data.from_items(items).map_batches(
        fold, batch_format="pyarrow", batch_size=1)


def compact_index(out_dir: str) -> dict:
    """Fold every bucket's segment chain into one base segment (bounds
    read amplification; the manifest for the latest epoch is REWRITTEN
    in place, atomically, like the lake's own compaction)."""
    epochs = [int(f.split("=")[1].split(".")[0])
              for f in os.listdir(os.path.join(out_dir, "_manifests"))]
    epoch = max(epochs)
    manifest = _read_manifest(out_dir, epoch)

    @ray.remote
    def compact_bucket(p: str, segs: list[str]) -> tuple[str, str]:
        tabs = [pq.read_table(os.path.join(out_dir, rel)) for rel in segs]
        folded = _fold_segments(tabs)
        base = pa.table({"token": folded["token"], "conv_id": folded["conv_id"],
                         "turn_idx": folded["turn_idx"], "d_tf": folded["tf"]})
        rel = os.path.join(f"part={p}", f"seg-epoch={epoch}-c.parquet")
        path = os.path.join(out_dir, rel)
        tmp = path + ".tmp"
        pq.write_table(base, tmp)
        os.replace(tmp, path)  # deterministic name → idempotent on retry
        return p, rel

    todo = {p: i["segments"] for p, i in manifest["partitions"].items()
            if len(i["segments"]) > 1}
    done = ray.get([compact_bucket.remote(p, segs) for p, segs in todo.items()])
    for p, rel in done:
        manifest["partitions"][p] = {"segments": [rel]}
    _atomic_write_json(_manifest_path(out_dir, epoch), manifest)
    return {"compacted_buckets": len(done)}
