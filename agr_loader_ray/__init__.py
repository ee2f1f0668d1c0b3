"""agr_loader_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the data-processing capabilities of
``alliance-genome/agr_loader`` (reference, read-only at /root/reference)
as a change-event pipeline on Ray Data:

WAL-style change log (insert/update/delete/schema-change events over
conversation-transcript records) → hash-partitioned, last-writer-wins
upsert into a copy-on-write Parquet lake with epoch-fenced, per-partition
manifests (exactly-once, resumable), plus an operator library
(joins, aggregates, dedup, similarity search, text analysis) built on
``ray.data.Dataset`` / ``map_batches`` over zero-copy Arrow batches.

The reference's shape (keyed idempotent MERGE upserts of typed record
batches, per-load lineage nodes — see SURVEY.md §0) maps here to:

- record batch  → ``pyarrow.Table`` block
- MERGE upsert  → per-partition LWW merge-apply (``groupby + map_groups``)
- DETACH DELETE → tombstone rows (``_deleted``) filtered at export
- Load node     → per-epoch / per-partition commit manifest
"""

__version__ = "0.1.0"
