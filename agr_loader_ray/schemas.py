"""Arrow schemas for the transcript lake and the WAL change-event log.

The reference infers CSV schemas from the first record of each batch
(``/root/reference/src/transactors/csv_transactor.py:41-45``); here every
logical table has an explicit ``pyarrow.Schema`` and schema changes are
first-class WAL events (see ``state/schema_registry.py``).

Shapes follow FIXTURES.md §1/§2 (authoritative, from BASELINE.json
``input_hint``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# transcripts — the materialized lake table.  PK = (conv_id, turn_idx).
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

#: primary-key columns (reference analogue: Neo4j ``primaryKey``
#: uniqueness constraints, /root/reference/src/etl/helpers/neo4j_helper.py:59-126)
KEY_COLS = ["conv_id", "turn_idx"]

#: LWW comparator columns — events for one key are applied in
#: ``(ts, offset)`` order, offset breaking ts ties (FIXTURES.md §2).
ORDER_COLS = ["ts", "offset"]

# ---------------------------------------------------------------------------
# wal_events — the change-event log (engine input).
# op: I insert / U update (full-row upsert) / D delete / S schema change.
# ---------------------------------------------------------------------------
WAL_SCHEMA = pa.schema(
    [
        pa.field("offset", pa.int64()),
        pa.field("epoch", pa.int32()),
        pa.field("op", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("schema_change", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Internal lake-partition schema: transcript columns + bookkeeping columns
# kept so that late-arriving events still LWW-compare correctly against
# committed rows, and deletes survive as tombstones (reference analogue:
# DETACH DELETE, /root/reference/src/etl/disease_etl.py:242-248).
# ---------------------------------------------------------------------------
DELETED_COL = "_deleted"
OFFSET_COL = "_offset"


def lake_schema(base: pa.Schema = TRANSCRIPT_SCHEMA) -> pa.Schema:
    """The on-disk partition-file schema for a given transcript schema."""
    return base.append(pa.field(OFFSET_COL, pa.int64())).append(
        pa.field(DELETED_COL, pa.bool_())
    )


def payload_columns(base: pa.Schema = TRANSCRIPT_SCHEMA) -> list[str]:
    """Non-key, non-order payload columns of a transcript schema."""
    skip = set(KEY_COLS) | {"ts"}
    return [n for n in base.names if n not in skip]
