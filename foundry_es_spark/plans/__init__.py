"""Pipeline assembly — the epoch body and batch replay (SURVEY.md §3.2)."""

from foundry_es_spark.plans.dedup_maintain import (
    DedupMaintainConfig,
    IncrementalDedupPipeline,
)
from foundry_es_spark.plans.derived import DerivedConfig, DerivedTablePipeline
from foundry_es_spark.plans.routed import Route, RoutedPipeline
from foundry_es_spark.plans.pipeline import (
    AuditFailed,
    CdcPipeline,
    PipelineConfig,
    offsets_from_footers,
)

__all__ = [
    "AuditFailed",
    "Route",
    "RoutedPipeline",
    "CdcPipeline",
    "PipelineConfig",
    "offsets_from_footers",
    "DerivedConfig",
    "DerivedTablePipeline",
    "DedupMaintainConfig",
    "IncrementalDedupPipeline",
]
