"""Lake table layer — Iceberg semantics with two backends (SURVEY.md §4.4).

- :class:`~foundry_es_spark.lake.table.LakeTable` — LocalLakeBackend: Parquet
  data files + an atomic JSON commit log. Gives MERGE-INTO-equivalent
  upserts, snapshot isolation, schema evolution (add/rename/widen by stable
  field id, like Iceberg), and epoch fences — so the engine's code paths are
  exercised identically in this sandbox (no Iceberg runtime jar, no network).
- :mod:`~foundry_es_spark.lake.iceberg` — the thin adapter used when an
  `iceberg-spark-runtime` jar IS on the classpath on a real cluster:
  the same operations routed to `MERGE INTO` / `ALTER TABLE` SQL.
"""

from foundry_es_spark.lake.table import LakeTable, LakeField, WIDENINGS
from foundry_es_spark.lake.backend import TableBackend
from foundry_es_spark.lake.iceberg import IcebergBackend

__all__ = ["LakeTable", "LakeField", "WIDENINGS", "TableBackend", "IcebergBackend"]
