"""Pipeline assembly — the epoch body and batch replay (SURVEY.md §3.2)."""

from foundry_es_spark.plans.pipeline import CdcPipeline, PipelineConfig

__all__ = ["CdcPipeline", "PipelineConfig"]
