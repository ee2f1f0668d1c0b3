"""Table access helpers for the driver-provided TPC-H-ish testdata.

Reads prune columns at the source (`read_parquet(columns=...)`) so only
needed columns leave storage — at 100 TB a full-width read for a
2-column transform is the first thing that breaks.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> "ray.data.Dataset":
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, **kw)


def read_small(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side eager read of a SMALL (dimension) table for broadcast —
    the reference's YAML-lookup / master-gene-set pattern (SURVEY T3/T4/S12)."""
    return pq.read_table(table_path(sf_dir, name), columns=columns)
