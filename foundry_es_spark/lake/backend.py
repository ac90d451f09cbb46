"""The TableFormat seam (SURVEY.md §4.4): one protocol, two backends.

`CdcPipeline` talks ONLY to this surface, so the engine's epoch body is
backend-agnostic: `LocalLakeBackend` (= :class:`~foundry_es_spark.lake.table.LakeTable`,
Parquet + atomic commit log, the sandbox default) and
:class:`~foundry_es_spark.lake.iceberg.IcebergBackend` (real `MERGE INTO` /
`ALTER TABLE` / `rewrite_data_files` SQL against an Iceberg catalog on a
cluster). Keeping the protocol explicit is what makes the local test suite
meaningful evidence for the production path.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class TableBackend(Protocol):
    """Everything the CDC epoch body needs from a sink table."""

    # --- fencing / resume (C5/C6)
    def is_epoch_committed(self, pipeline_id: str, epoch_id: int) -> bool: ...
    def last_epoch(self, pipeline_id: str) -> int: ...
    def fence_epoch_only(self, pipeline_id: str, epoch_id: int, info: dict | None = None) -> None: ...

    # --- schema (C7)
    def schema_fields(self): ...
    def evolve_for_batch(self, batch_schema, rename_map=None) -> None: ...

    # --- writes (S5)
    def overwrite_snapshot(self, df: DataFrame, fence=None) -> None: ...
    def append_delta(self, batch: DataFrame, fence=None, files_per_bucket: int = 1,
                     info=None, pre_partitioned: bool = False) -> dict: ...
    def merge_upsert(self, batch: DataFrame, fence=None, files_per_bucket: int = 1,
                     info=None, touched_buckets: list[int] | None = None) -> dict: ...

    # --- maintenance
    def bucket_delta_generations(self) -> dict[int, int]: ...
    def compact_buckets(self, buckets: list[int], files_per_bucket: int = 1) -> dict: ...

    # --- reads (`buckets` lets C3's state comparison prune to the batch's
    # touched buckets; backends with their own pruning may ignore it)
    def read(self) -> DataFrame: ...
    def read_internal(self, buckets: list[int] | None = None) -> DataFrame: ...


# OPTIONAL backend surface, deliberately outside the protocol: the fused
# task-writer sink (`begin_delta_version` / `commit_delta_files`) is a
# physical strategy of the local parquet backend — on Iceberg the same
# role is played by MERGE INTO with write.merge.mode=merge-on-read, so
# IcebergBackend does not implement it. The pipeline feature-detects it
# with hasattr() and falls back to append_delta otherwise; anything the
# epoch body REQUIRES must live in TableBackend above.
FUSED_SINK_METHODS = ("begin_delta_version", "commit_delta_files")


def supports_fused_sink(backend) -> bool:
    return all(hasattr(backend, m) for m in FUSED_SINK_METHODS)
