"""Structured Streaming front-end (SURVEY.md §3.2 lifecycle 1)."""

from foundry_es_spark.streaming.run import run_stream

__all__ = ["run_stream"]
