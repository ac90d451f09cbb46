"""Streaming replay: file-source `readStream` → `foreachBatch(epoch body)`.

The reference's ActiveMQ consumer loop [F-ES: consumers — UNVERIFIED,
SURVEY.md §0] becomes a Structured Streaming micro-batch query:

- source: the partitioned event-log directory as a file stream (locally;
  on a cluster the same pipeline body hangs off `format("kafka")` — see
  `foundry_es_spark.sources`), `maxFilesPerTrigger` bounding epoch size;
- body: `CdcPipeline.apply_epoch(batch_df, batch_id)` — identical code to
  batch replay, so streaming == batch equivalence is a testable property;
- exactly-once: Structured Streaming's checkpoint gives deterministic
  batch replay on restart, and the sink-side epoch fence (committed
  atomically with the data) makes re-delivery of a batch a no-op. Either
  mechanism alone survives a crash; together they cover crash points on
  both sides of the sink commit (SURVEY.md §2.2 C5/C6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from foundry_es_spark.plans import CdcPipeline
from foundry_es_spark.sources.events import read_events_stream


def run_stream(
    spark: SparkSession,
    pipeline: CdcPipeline,
    events_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 64,
    extra_payload: T.StructType | None = None,
    await_termination: bool = False,
    derived: list | None = None,
    continuous: bool = False,
):
    """Start (or resume from `checkpoint_dir`) the streaming replay query.

    ``derived``: optional :class:`~foundry_es_spark.plans.DerivedTablePipeline`
    maintainers refreshed after each trigger's epoch commit — streaming CDC
    fan-out. Safe at every crash point: the maintainer's change-feed cursor
    commits atomically with ITS data, so a crash between the epoch commit
    and a refresh just leaves the derived table one window behind; the next
    trigger (or a standalone `run_derived.py` pass) catches it up.
    Exactly-once on both tables, no coordination needed."""

    # single source of truth for the stream source shape (S1):
    # sources/events.py builds the explicit schema + readStream chain
    stream = read_events_stream(
        spark, events_dir, max_files_per_trigger=max_files_per_trigger,
        extra=extra_payload,
    )

    def _body(batch_df, batch_id: int):
        pipeline.apply_epoch(batch_df, int(batch_id))
        for m in derived or ():
            m.refresh()

    writer = stream.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir
    )
    # availableNow drains the current backlog and exits (bounded replay /
    # tests); continuous keeps the micro-batch query live for new event
    # files — the long-running ingest deployment shape
    writer = writer if continuous else writer.trigger(availableNow=True)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query
