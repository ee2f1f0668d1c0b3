"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module, so
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship CDC pipeline — deterministic synthetic WAL
  replay through the partitioned LWW upsert engine into a Parquet lake,
  returning the sorted final table (smoke scale).
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data ops), each taking ``sf_dir``.
- ``oracle_sql()``: DuckDB oracles for the SQL-expressible subset;
  sketch-based ops (MinHash/SimHash/LSH-ANN, fingerprints) are
  rows-only and verified against exact baselines in tests/.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: replay the t1 WAL (5k events) → lake → sorted export."""
    from agr_loader_ray.pipelines.engine import CdcEngine
    from agr_loader_ray.pipelines.export import export_sorted
    from agr_loader_ray.wal.generator import T1_SMOKE, generate_wal

    wal_root = os.path.join(tempfile.gettempdir(), "agr_entry_wal")
    generate_wal(wal_root, T1_SMOKE)
    lake_root = tempfile.mkdtemp(prefix="agr_entry_lake_")
    eng = CdcEngine(lake_root, n_partitions=16)
    eng.replay(wal_root)
    return export_sorted(lake_root)


def queries() -> dict[str, Callable[[str], Any]]:
    import agr_loader_ray.pipelines.interactions  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.protein  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.variants  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.text_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.stats_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.sketch_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.relational_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.timeseries_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.graph_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.linkage_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.trend_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.curation_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.allocation_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.resample_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.ml_queries  # noqa: F401 (registers)
    from agr_loader_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import agr_loader_ray.pipelines.interactions  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.protein  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.variants  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.text_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.stats_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.sketch_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.relational_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.timeseries_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.graph_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.linkage_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.trend_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.curation_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.allocation_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.resample_queries  # noqa: F401 (registers)
    import agr_loader_ray.pipelines.ml_queries  # noqa: F401 (registers)
    from agr_loader_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
