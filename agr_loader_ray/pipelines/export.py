"""Reading the committed lake state back as a Ray Dataset.

Tombstone rows (``_deleted``) and bookkeeping columns are stripped;
legacy partition files written before a schema change are evolved at
read time (missing columns null-filled by the pyarrow dataset scanner,
then constant defaults applied, widened types cast).  Added columns are
constant-by-default until the WAL schema itself carries payloads for
them, so ``fill_null(default)`` at read time is exact — see
``state/schema_registry.py``.

The verification export's global sort on ``(conv_id, turn_idx)`` is the
cold-path shuffle (SURVEY §7.4) — never part of the apply hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schemas import DELETED_COL, OFFSET_COL
from ..state.manifest import LakeManifest
from ..state.schema_registry import SchemaRegistry

_EXTRA = [pa.field(OFFSET_COL, pa.int64()), pa.field(DELETED_COL, pa.bool_())]


def read_lake(lake_root: str, epoch: int | None = None,
              include_tombstones: bool = False) -> ray.data.Dataset:
    """Dataset over the lake as of its last commit (or ``epoch``)."""
    manifest = LakeManifest(lake_root)
    e = manifest.last_committed_epoch() if epoch is None else epoch
    if e is None:
        raise FileNotFoundError(f"no committed epoch in {lake_root}")
    m = manifest.read_epoch(e)
    registry = SchemaRegistry.from_dict(m["schema_registry"])
    files = [manifest.abspath(info["path"]) for info in m["partitions"].values() if info.get("path")]
    physical = pa.schema([*registry.schema, *_EXTRA])
    defaults = {k: v for k, v in registry.defaults.items() if v is not None}
    payload_cols = registry.schema.names

    ds = ray.data.read_parquet(files, schema=physical)

    def finalize(batch: pa.Table) -> pa.Table:
        if not include_tombstones:
            batch = batch.filter(pc.equal(batch[DELETED_COL], False))
        for name, default in defaults.items():
            i = batch.schema.get_field_index(name)
            batch = batch.set_column(
                i, name, pc.fill_null(batch[name], pa.scalar(default, batch[name].type))
            )
        if include_tombstones:
            return batch.select([*payload_cols, DELETED_COL])
        return batch.select(payload_cols)

    return ds.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def export_sorted(lake_root: str, epoch: int | None = None) -> ray.data.Dataset:
    """Verification export: stable ``(conv_id, turn_idx)`` ordering
    (north rule; cold path only)."""
    return read_lake(lake_root, epoch=epoch).sort(["conv_id", "turn_idx"])
