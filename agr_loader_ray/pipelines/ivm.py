"""Incremental view maintenance (IVM): keep a derived table current
epoch-by-epoch from the lake's change-data-feed instead of recomputing.

Reference analogue (SURVEY §3.2): the reference re-runs its second-pass
ETLs over the whole store after every load
(``/root/reference/src/etl/gene_disease_ortho_etl.py:119-158`` re-derives
every inferred edge per run).  Here the derived ``conversation_stats``
table is maintained from ``export.change_feed(images='both')`` deltas —
the classic materialized-view algorithm (self-maintainable aggregates +
dirty-group re-aggregation, per Gupta & Mumick's incremental view
maintenance survey and Delta Lake's CDF-driven MERGE pattern):

- ``insert`` / ``update_postimage`` rows ADD their contribution,
  ``delete`` / ``update_preimage`` rows RETRACT theirs — SUM/COUNT
  aggregates fold deltas directly, no other state consulted;
- MAX(``last_ts``) is not self-maintainable under retraction: a group
  whose retracted row carried the current max is DIRTY and its max is
  re-aggregated exactly — from one projected ``(conv_id, ts)`` lake scan
  restricted (hybrid broadcast / ``left_semi``) to the convs that
  retracted anything this epoch;
- the stats table itself NEVER shuffles: it lives as hash-bucketed
  Parquet (same ownership partitioning as the lake), each epoch rewrites
  only buckets owning changed convs (copy-on-write; untouched buckets
  carry forward in the manifest), and the only exchange is over the
  delta+repair stream, which is bounded by the epoch's churn — at
  10^10-row scale an epoch's maintenance cost tracks its change volume,
  not the view size.

Limitation (documented, standard for materialized views): the view is
defined over registry-current column names; a schema event RENAMING a
source column of the view requires re-bootstrap (additive evolution —
new columns, drops of non-source columns — is transparent).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..state.manifest import LakeManifest, _atomic_write_json
from ..stages.partition import stable_hash_strings
from .derived import conversation_stats
from .export import change_feed, read_lake

#: membership sets up to this many removal convs ship as one sorted
#: numpy hash array (``ray.put`` once, ``np.isin`` per batch); above it
#: the repair scan restricts via a distributed ``left_semi`` join — the
#: same dispatch (and rationale) as ``stages/decontam.py``.
REPAIR_BROADCAST_LIMIT = 2_000_000

_ADD_TYPES = ("insert", "update_postimage")
_RETRACT_TYPES = ("delete", "update_preimage")

_STATS_COLS = ["conv_id", "total_chars", "n_turns", "n_tool_turns", "last_ts"]


def _delta_schema(ts_type: pa.DataType) -> pa.Schema:
    return pa.schema([
        ("conv_id", pa.string()),
        ("kind", pa.int8()),           # 0 = aggregate delta, 1 = max repair
        ("d_chars", pa.int64()),
        ("d_turns", pa.int64()),
        ("d_tool", pa.int64()),
        ("post_max", ts_type),
        ("removed_max", ts_type),
        ("repair_ts", ts_type),
        ("gpart", pa.int32()),
    ])


def _gpart(conv_id: pd.Series, n_buckets: int) -> np.ndarray:
    return (stable_hash_strings(conv_id.to_numpy()) % np.uint64(n_buckets)).astype(np.int32)


def _manifest_path(out_dir: str, epoch: int) -> str:
    return os.path.join(out_dir, "_manifests", f"epoch={epoch}.json")


def _read_manifest(out_dir: str, epoch: int) -> dict | None:
    p = _manifest_path(out_dir, epoch)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_bucket(df: pd.DataFrame, out_dir: str, part: int, epoch: int) -> dict:
    """Atomically publish one bucket file; returns its manifest entry."""
    rel = os.path.join(f"part={part}", f"epoch={epoch}.parquet")
    path = os.path.join(out_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df = df.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(df[_STATS_COLS], preserve_index=False), tmp)
    os.replace(tmp, path)
    return {"file": rel, "rows": int(len(df))}


def bootstrap_stats(lake_root: str, out_dir: str, n_buckets: int = 16) -> dict:
    """Full-compute epoch 0 of the view into its bucketed layout."""
    ds = conversation_stats(lake_root, epoch=0)

    def add_part(t: pa.Table) -> pa.Table:
        part = (stable_hash_strings(t["conv_id"]) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("gpart", pa.array(part, pa.int32()))

    def write_kernel(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["gpart"].iloc[0])
        info = _write_bucket(g, out_dir, part, epoch=0)
        return pd.DataFrame({"part": [part], "rows": [info["rows"]],
                             "file": [info["file"]], "repaired": [0]})

    rows = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gpart").map_groups(write_kernel, batch_format="pandas")
        .to_pandas()
    )
    partitions = {str(r.part): {"file": r.file, "rows": int(r.rows)}
                  for r in rows.itertuples()}
    # buckets with zero conversations still need (empty) entries so the
    # reader and later epochs see a total layout
    for p in range(n_buckets):
        partitions.setdefault(str(p), {"file": None, "rows": 0})
    info = {"source_epoch": 0, "n_buckets": n_buckets, "partitions": partitions,
            "counters": {"changed_convs": int(rows["rows"].sum()), "repaired": 0,
                         "buckets_rewritten": int((rows["rows"] > 0).sum())}}
    _atomic_write_json(_manifest_path(out_dir, 0), info)
    return info


def _repair_stream(lake_root: str, epoch: int, cdf: ray.data.Dataset,
                   ts_type: pa.DataType, n_buckets: int) -> ray.data.Dataset | None:
    """Per-conv alive MAX(ts) partials for every conv that retracted a row
    this epoch (exact repair source for the non-self-maintainable MAX)."""
    schema = _delta_schema(ts_type)
    import pyarrow.compute as pc

    retract = cdf.map_batches(
        lambda t: t.filter(pc.is_in(t["change_type"],
                                    value_set=pa.array(_RETRACT_TYPES))).select(["conv_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    removal = retract.unique("conv_id")
    if not removal:
        return None

    lake = read_lake(lake_root, epoch=epoch, columns=["conv_id", "ts"])
    if len(removal) <= REPAIR_BROADCAST_LIMIT:
        want = ray.put(np.sort(stable_hash_strings(np.asarray(removal, dtype=object))))

        def member_filter(t: pa.Table, _ref=want) -> pa.Table:
            h = stable_hash_strings(t["conv_id"])
            return t.filter(pa.array(np.isin(h, ray.get(_ref))))

        scoped = lake.map_batches(member_filter, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        from ..stages.attach import exchange_semi

        keys = ray.data.from_arrow(pa.table({"conv_id": pa.array(removal, pa.string())}))
        scoped = exchange_semi(lake, keys, "conv_id")

    def partial_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        g = t.group_by("conv_id").aggregate([("ts", "max")]).to_pandas()
        n = len(g)
        nat = pd.Series(pd.NaT, index=g.index, dtype=f"datetime64[{ts_type.unit}]")
        out = pd.DataFrame({
            "conv_id": g["conv_id"], "kind": np.int8(1),
            "d_chars": np.int64(0), "d_turns": np.int64(0), "d_tool": np.int64(0),
            "post_max": nat, "removed_max": nat,
            "repair_ts": g["ts_max"],
            "gpart": _gpart(g["conv_id"], n_buckets),
        })
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return scoped.map_batches(partial_max, batch_format="pyarrow", zero_copy_batch=True)


def maintain_epoch(lake_root: str, out_dir: str, epoch: int) -> dict:
    """Advance the view from ``epoch - 1`` to ``epoch`` by folding the
    epoch's change feed (one bounded exchange; touched buckets only)."""
    prev = _read_manifest(out_dir, epoch - 1)
    if prev is None:
        raise FileNotFoundError(f"view not maintained at epoch {epoch - 1}")
    n_buckets = prev["n_buckets"]
    prev_parts = prev["partitions"]

    cdf = change_feed(lake_root, epoch, images="both").materialize()
    sample = cdf.schema()
    ts_type = sample.base_schema.field("ts").type
    schema = _delta_schema(ts_type)

    def delta_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        df = t.select(["change_type", "conv_id", "role", "text", "ts"]).to_pandas()
        sign = np.where(df["change_type"].isin(_ADD_TYPES), 1, -1).astype(np.int64)
        chars = df["text"].str.len().fillna(0).astype(np.int64)
        tool = (df["role"] == "tool").astype(np.int64)
        ts_add = df["ts"].where(sign > 0)
        ts_rem = df["ts"].where(sign < 0)
        g = (
            pd.DataFrame({
                "conv_id": df["conv_id"], "d_chars": sign * chars,
                "d_turns": sign, "d_tool": sign * tool,
                "post_max": ts_add, "removed_max": ts_rem,
            })
            .groupby("conv_id", sort=False)
            .agg(d_chars=("d_chars", "sum"), d_turns=("d_turns", "sum"),
                 d_tool=("d_tool", "sum"), post_max=("post_max", "max"),
                 removed_max=("removed_max", "max"))
            .reset_index()
        )
        g["kind"] = np.int8(0)
        g["repair_ts"] = pd.Series(pd.NaT, index=g.index,
                                   dtype=f"datetime64[{ts_type.unit}]")
        g["gpart"] = _gpart(g["conv_id"], n_buckets)
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    stream = cdf.map_batches(delta_partial, batch_format="pyarrow", zero_copy_batch=True)
    repair = _repair_stream(lake_root, epoch, cdf, ts_type, n_buckets)
    if repair is not None:
        stream = stream.union(repair)

    def merge_kernel(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["gpart"].iloc[0])
        deltas = (
            g[g["kind"] == 0]
            .groupby("conv_id", sort=False)
            .agg(d_chars=("d_chars", "sum"), d_turns=("d_turns", "sum"),
                 d_tool=("d_tool", "sum"), post_max=("post_max", "max"),
                 removed_max=("removed_max", "max"))
        )
        rep = g[g["kind"] == 1].groupby("conv_id", sort=False)["repair_ts"].max()
        old_info = prev_parts.get(str(part)) or {}
        if old_info.get("file"):
            old = pq.read_table(os.path.join(out_dir, old_info["file"])).to_pandas()
        else:
            old = pd.DataFrame({c: pd.Series(dtype=d) for c, d in zip(
                _STATS_COLS, ["object", "int64", "int64", "int64",
                              f"datetime64[{ts_type.unit}]"])})
        m = old.set_index("conv_id").join(deltas, how="outer").join(rep, how="left")
        for c, d in (("total_chars", "d_chars"), ("n_turns", "d_turns"),
                     ("n_tool_turns", "d_tool")):
            m[c] = (m[c].fillna(0) + m[d].fillna(0)).astype(np.int64)
        dirty = m["last_ts"].notna() & (m["removed_max"] == m["last_ts"])
        cand = m[["last_ts", "post_max"]].max(axis=1)
        m["last_ts"] = cand.mask(dirty, m["repair_ts"])
        m["__repaired"] = dirty
        m = m[m["n_turns"] > 0].reset_index()
        info = _write_bucket(m, out_dir, part, epoch)
        return pd.DataFrame({"part": [part], "rows": [info["rows"]],
                             "file": [info["file"]],
                             "repaired": [int(m["__repaired"].sum())],
                             "changed": [int(len(deltas))]})

    res = stream.groupby("gpart").map_groups(merge_kernel, batch_format="pandas").to_pandas()

    partitions = dict(prev_parts)  # copy-on-write: untouched buckets carry forward
    for r in res.itertuples():
        partitions[str(r.part)] = {"file": r.file, "rows": int(r.rows)}
    info = {"source_epoch": epoch, "n_buckets": n_buckets, "partitions": partitions,
            "counters": {"changed_convs": int(res["changed"].sum()),
                         "repaired": int(res["repaired"].sum()),
                         "buckets_rewritten": int(len(res))}}
    _atomic_write_json(_manifest_path(out_dir, epoch), info)
    return info


def maintain_stats(lake_root: str, out_dir: str, n_buckets: int = 16) -> list[dict]:
    """Bring the view up to the lake's last committed epoch (resumable:
    epochs already maintained — manifest present — are skipped)."""
    last = LakeManifest(lake_root).last_committed_epoch()
    if last is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    infos = []
    for e in range(last + 1):
        info = _read_manifest(out_dir, e)
        if info is None:
            info = (bootstrap_stats(lake_root, out_dir, n_buckets) if e == 0
                    else maintain_epoch(lake_root, out_dir, e))
        infos.append(info)
    return infos


def read_stats(out_dir: str, epoch: int | None = None) -> ray.data.Dataset:
    """Dataset over the maintained view as of ``epoch`` (default: latest)."""
    if epoch is None:
        epochs = [int(f.split("=")[1].split(".")[0])
                  for f in os.listdir(os.path.join(out_dir, "_manifests"))]
        epoch = max(epochs)
    manifest = _read_manifest(out_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"view not maintained at epoch {epoch}")
    files = [os.path.join(out_dir, i["file"])
             for i in manifest["partitions"].values() if i.get("file")]
    # columns pinned: the part=<p> path component must not be hive-inferred
    # into the schema
    return ray.data.read_parquet(files, columns=_STATS_COLS)
