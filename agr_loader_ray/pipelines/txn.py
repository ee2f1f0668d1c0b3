"""Multi-table atomic transactions over the CDC engine.

A production binlog carries changes for SEVERAL tables interleaved in
one stream, and downstream consumers expect *transactional visibility*:
epoch N is either visible for ALL tables or for none.  This module adds
that layer on top of ``CdcEngine`` without touching its single-table
commit protocol:

- ``combine_wals``: fixture-side merge of per-table WALs into one
  binlog with a ``table`` column (epoch-aligned, sealed-mode layout).
- ``demux_wal``: the streaming binlog-demux stage — one Ray Data filter
  pass per table per epoch, preserving epoch structure, schema-event
  sidecars and seal sentinels; idempotent per epoch (sealed targets are
  skipped), crash-safe (write-temp-then-rename, seal LAST).
- ``TxnReplay``: per-epoch cross-table apply under a write-ahead INTENT
  marker with presumed-roll-forward recovery.  The intent is published
  (atomic rename) BEFORE any table's epoch commit; a crash between
  commits leaves the marker, and ``recover()`` re-drives the missing
  commits (``apply_epoch`` is idempotent and skips committed epochs).
  ``snapshot()`` is the consistent read fence: the min common committed
  epoch across tables — a reader pinning every table to that epoch can
  never observe a half-committed transaction.

Reference provenance: the reference loads many ETLs under one
"release" and gates publication on all of them completing
(src/aggregate_loader.py run-list semantics); re-expressed here as
epoch-fenced cross-table atomicity rather than a monolithic run.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..state.manifest import _atomic_write_json
from .engine import CdcEngine
from .export import read_lake

TABLE_COL = "table"


# ---------------------------------------------------------------------------
# combined-binlog fixtures
# ---------------------------------------------------------------------------
def combine_wals(table_wals: dict[str, str], out_root: str) -> dict:
    """Merge per-table WALs (same epoch numbering) into one combined
    binlog: each epoch dir holds one segment per table with a ``table``
    column appended; schema-event sidecars gain a ``table`` field."""
    if os.path.isdir(out_root):
        shutil.rmtree(out_root)
    os.makedirs(out_root)
    with open(os.path.join(out_root, "_WAL_SEALED_MODE"), "w") as fh:
        fh.write("")

    all_epochs = sorted({
        e for root in table_wals.values()
        for e in CdcEngine.wal_epochs(root)
    })
    n_rows = 0
    for e in all_epochs:
        edir = os.path.join(out_root, f"epoch={e}")
        os.makedirs(edir)
        side: list[dict] = []
        for name, root in sorted(table_wals.items()):
            if e not in CdcEngine.wal_epochs(root):
                continue
            files = CdcEngine._epoch_files(root, e)
            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            tbl = tbl.append_column(
                TABLE_COL, pa.array([name] * tbl.num_rows, pa.string()))
            pq.write_table(tbl, os.path.join(edir, f"segment-{name}.parquet"))
            n_rows += tbl.num_rows
            sc = os.path.join(root, f"epoch={e}", "_schema_events.json")
            if os.path.exists(sc):
                with open(sc) as fh:
                    side.extend({**r, TABLE_COL: name} for r in json.load(fh))
        with open(os.path.join(edir, "_schema_events.json"), "w") as fh:
            json.dump(side, fh)
        with open(os.path.join(edir, "_SEALED"), "w") as fh:
            fh.write("")
    return {"epochs": all_epochs, "rows": n_rows, "tables": sorted(table_wals)}


def demux_wal(combined_root: str, out_roots: dict[str, str]) -> dict:
    """Split a combined multi-table binlog into per-table WALs.

    One streaming Ray filter pass per (table, epoch): read the epoch's
    segments, keep the table's rows, drop the ``table`` column, publish
    write-temp-then-rename, then sidecar, then ``_SEALED`` — the same
    seal-last discipline as the WAL writer, so an engine tailing the
    demuxed WAL can run concurrently with the demux itself.  Idempotent:
    epochs already sealed in the target are skipped.
    """
    epochs = CdcEngine.wal_epochs(combined_root)
    done: dict[str, list[int]] = {}
    for name, out_root in sorted(out_roots.items()):
        os.makedirs(out_root, exist_ok=True)
        marker = os.path.join(out_root, "_WAL_SEALED_MODE")
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("")
        done[name] = []
        for e in epochs:
            edir = os.path.join(out_root, f"epoch={e}")
            if os.path.exists(os.path.join(edir, "_SEALED")):
                continue
            files = CdcEngine._epoch_files(combined_root, e)
            ds = ray.data.read_parquet(files)
            sub = ds.map_batches(
                lambda t, name=name: t.filter(
                    pc.equal(t[TABLE_COL], name)).drop_columns([TABLE_COL]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            tmp = edir + ".__demux_tmp__"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            sub.write_parquet(tmp)
            if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
                # a table with zero rows this epoch still needs a valid
                # (empty) segment so the engine can commit the epoch
                sch = pq.read_schema(files[0])
                sch = sch.remove(sch.get_field_index(TABLE_COL))
                pq.write_table(sch.empty_table(), os.path.join(
                    tmp, "segment-empty.parquet"))
            if os.path.isdir(edir):
                shutil.rmtree(edir)  # crash remnant without _SEALED
            os.replace(tmp, edir)
            sc = os.path.join(combined_root, f"epoch={e}",
                              "_schema_events.json")
            side = []
            if os.path.exists(sc):
                with open(sc) as fh:
                    side = [{k: v for k, v in r.items() if k != TABLE_COL}
                            for r in json.load(fh)
                            if r.get(TABLE_COL) == name]
            with open(os.path.join(edir, "_schema_events.json"), "w") as fh:
                json.dump(side, fh)
            with open(os.path.join(edir, "_SEALED"), "w") as fh:
                fh.write("")
            done[name].append(e)
    return {"epochs_demuxed": done}


# ---------------------------------------------------------------------------
# the transaction coordinator
# ---------------------------------------------------------------------------
class TxnReplay:
    """Cross-table atomic epoch replay (write-ahead intent + roll-forward).

    Commit protocol per epoch E (presumed roll-forward):
      1. publish ``_TXN_INTENT.json`` = {epoch: E, tables: pending}
         (atomic rename) — the write-ahead record;
      2. ``apply_epoch(E)`` on every pending table's engine (each commit
         is the engine's own atomic manifest rename);
      3. append to ``_TXN_LOG.jsonl`` and remove the intent marker.
    A crash at any point leaves either no intent (epoch fully invisible
    or fully visible) or an intent whose commits ``recover()`` re-drives
    idempotently.  Readers use ``snapshot()`` — the min common committed
    epoch — so partially-committed epochs are never observable.
    """

    INTENT = "_TXN_INTENT.json"
    LOG = "_TXN_LOG.jsonl"

    def __init__(self, txn_root: str, engines: dict[str, CdcEngine],
                 wal_roots: dict[str, str]):
        if set(engines) != set(wal_roots):
            raise ValueError("engines and wal_roots must cover the same tables")
        self.txn_root = txn_root
        self.engines = dict(engines)
        self.wal_roots = dict(wal_roots)
        os.makedirs(txn_root, exist_ok=True)

    # -- intent bookkeeping -------------------------------------------------
    @property
    def _intent_path(self) -> str:
        return os.path.join(self.txn_root, self.INTENT)

    def pending_intent(self) -> dict | None:
        if not os.path.exists(self._intent_path):
            return None
        with open(self._intent_path) as fh:
            return json.load(fh)

    def _log(self, entry: dict) -> None:
        with open(os.path.join(self.txn_root, self.LOG), "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def txn_log(self) -> list[dict]:
        p = os.path.join(self.txn_root, self.LOG)
        if not os.path.exists(p):
            return []
        with open(p) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    # -- recovery -----------------------------------------------------------
    def recover(self) -> dict:
        """Roll a pending intent forward: re-drive the missing epoch
        commits (idempotent), then clear the marker."""
        intent = self.pending_intent()
        if intent is None:
            return {"recovered": False}
        e = int(intent["epoch"])
        redone = []
        for name in intent["tables"]:
            eng = self.engines[name]
            if not os.path.exists(eng.manifest.epoch_manifest_path(e)):
                eng.apply_epoch(self.wal_roots[name], e)
                redone.append(name)
        self._log({"epoch": e, "tables": intent["tables"],
                   "recovered": redone})
        os.unlink(self._intent_path)
        return {"recovered": True, "epoch": e, "redone": redone}

    # -- replay -------------------------------------------------------------
    def replay(self, upto_epoch: int | None = None) -> dict:
        self.recover()
        per_table = {n: set(CdcEngine.wal_epochs(r))
                     for n, r in self.wal_roots.items()}
        epochs = sorted(set().union(*per_table.values()))
        if upto_epoch is not None:
            epochs = [e for e in epochs if e <= upto_epoch]
        stats = []
        for e in epochs:
            pending = [
                n for n in sorted(self.engines)
                if e in per_table[n]
                and not os.path.exists(
                    self.engines[n].manifest.epoch_manifest_path(e))
            ]
            if not pending:
                continue
            _atomic_write_json(self._intent_path,
                               {"epoch": e, "tables": pending})
            for n in pending:
                self.engines[n].apply_epoch(self.wal_roots[n], e)
            self._log({"epoch": e, "tables": pending, "recovered": []})
            os.unlink(self._intent_path)
            stats.append({"epoch": e, "tables": pending})
        return {"txns": stats}

    # -- consistent reads ---------------------------------------------------
    def snapshot(self) -> dict[str, int]:
        """Per-table read epoch of the latest CONSISTENT snapshot: the
        min common committed epoch (None values if any table is empty)."""
        lasts = {n: eng.manifest.last_committed_epoch()
                 for n, eng in self.engines.items()}
        if any(v is None for v in lasts.values()):
            return {n: None for n in lasts}
        fence = min(lasts.values())
        return {n: fence for n in lasts}

    def read(self, table: str, **kw) -> "ray.data.Dataset":
        """Dataset over ``table`` pinned to the consistent snapshot."""
        epoch = self.snapshot()[table]
        if epoch is None:
            raise ValueError("no consistent snapshot committed yet")
        return read_lake(self.engines[table].manifest.lake_root,
                         epoch=epoch, **kw)
