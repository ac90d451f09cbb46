"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

- ``entry``: the flagship — a full CDC replay (SURVEY.md §2.2) of a
  change stream synthesized from sf0.001 ``documents`` through the
  engine (compaction → vectorized normalization → epoch-fenced
  MERGE-equivalent upsert), returning the verified final table state.
- ``queries``/``oracle_sql``: the Layer-B surface (SURVEY.md §2.4
  Q1–Q25) plus the training-data operators (dedup / similarity /
  text analysis / multimodal), from ``foundry_es_spark.queries``.
"""

from __future__ import annotations

import os
import shutil
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_ENTRY = "/root/testdata/sf0.001"
WORK_DIR = "/tmp/foundry_es_entry"


def _doc_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic change stream over the documents table — shared with
    the declarative source registry's `doc_changes` ingest method (see
    foundry_es_spark/fixtures.py:doc_change_events), so a config file
    reproduces this flagship bit-identically."""
    from foundry_es_spark.fixtures import doc_change_events

    return doc_change_events(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the synthesized document change stream through the
    CDC engine and return the verified final state (one row per surviving
    key with its content digest and normalized columns)."""
    from pyspark.sql import functions as F

    from foundry_es_spark.fixtures import write_event_log
    from foundry_es_spark.plans import CdcPipeline, PipelineConfig

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    events_dir = os.path.join(WORK_DIR, "events")
    events = _doc_change_events(spark, SF_ENTRY).withColumn(
        "part", F.pmod(F.xxhash64("repo"), F.lit(4))
    )
    write_event_log(events, events_dir, epoch_size=800)

    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            pipeline_id="entry",
            table_dir=os.path.join(WORK_DIR, "table"),
            n_buckets=8,
        ),
    )
    pipe.replay_event_dir(events_dir)
    return (
        pipe.table.read()
        .select(
            "repo",
            "path",
            "lang",
            "content_sha256",
            "n_lines",
            "n_chars",
            F.col("meta.n_words").alias("n_words"),
        )
        .orderBy("repo", "path")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed column is aliased identically to ``oracle_sql``.
    """
    from foundry_es_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI twins for every SQL-expressible query; hash-specific /
    probabilistic / non-SQL-expressible operators are intentionally absent
    (rows-only check): q8b_approx_distinct, dedup_minhash_lsh,
    dedup_simhash(_pairs), ann_lsh_bucketed, ann_ivf_probe, ann_ivf_pq,
    text_pack_sequences, multimodal_frame_sample."""
    from foundry_es_spark.queries import all_oracles

    return all_oracles()
