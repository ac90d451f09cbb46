"""The CDC epoch body: validate → compact → normalize → evolve → merge.

This is the Spark-native restatement of the reference's
ingest→dispatch→enhance→index state machine (SURVEY.md §3.1): what the
reference runs as per-document status transitions across queue-connected
JVMs is here ONE declarative plan per micro-batch, optimized by Catalyst
as a whole. Exactly-once comes from the lake table's epoch fence being
committed atomically with the data files; lineage / metrics / per-partition
offsets ride inside the same commit record (S6 + C5, SURVEY.md §2.2) and
are exposed back as DataFrames via :meth:`CdcPipeline.lineage` /
:meth:`CdcPipeline.offsets`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from foundry_es_spark.functions.normalize import (
    NORMALIZED_FIELDS,
    with_normalized_columns,
)
from foundry_es_spark.lake import LakeTable
from foundry_es_spark.lake import log as commitlog
from foundry_es_spark.operators.cdc import compact_latest, suppress_unchanged, validate_split
from foundry_es_spark.schema import BASE_SCHEMA

# Envelope columns that never become table columns.
ENVELOPE_COLS = {"seq", "ts", "op", "part", "epoch"}


@dataclass
class PipelineConfig:
    pipeline_id: str
    table_dir: str
    n_buckets: int = 16
    n_parts: int = 8                 # stream partitions for offset tracking
    salt_partitions: int = 0         # C4 two-phase compaction (0 = map-side combine only)
    files_per_bucket: int = 1        # >1 parallelizes writes of hot buckets
    normalize: bool = True           # T1/T2 enhancement stage
    suppress_no_ops: bool = False    # C3 (extra state read per epoch)
    rename_map: dict[str, str] = field(default_factory=dict)  # C7 declared renames
    merge_mode: str = "mor"          # "mor" (delta append + compaction) | "cow" (rewrite touched buckets)
    compact_threshold: int = 8       # mor: compact a bucket once it holds this many files


class CdcPipeline:
    def __init__(self, spark: SparkSession, config: PipelineConfig):
        self.spark = spark
        self.cfg = config

    # ------------------------------------------------------------- table

    def ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.cfg.table_dir):
            return LakeTable(self.spark, self.cfg.table_dir)
        fields = [(f.name, f.dataType.simpleString()) for f in BASE_SCHEMA.fields]
        if self.cfg.normalize:
            fields += NORMALIZED_FIELDS
        return LakeTable.create(
            self.spark, self.cfg.table_dir, fields, n_buckets=self.cfg.n_buckets
        )

    @property
    def table(self) -> LakeTable:
        return self.ensure_table()

    # -------------------------------------------------------- epoch body

    def apply_epoch(self, batch: DataFrame, epoch_id: int) -> dict:
        """Apply one micro-batch / replay chunk as epoch `epoch_id`.

        Idempotent: a fenced epoch is skipped entirely (C5). Safe under
        re-delivery because the merge is additionally seq-conditional.
        """
        table = self.ensure_table()
        if table.is_epoch_committed(self.cfg.pipeline_id, epoch_id):
            return {"epoch": epoch_id, "skipped": True}

        t0 = time.monotonic()
        valid, dead = validate_split(batch)
        n_dead = self._write_dead_letters(dead, epoch_id)

        # C1+C2 — one shuffle; map-side combine collapses hot keys early.
        compacted = compact_latest(
            valid, salt_partitions=self.cfg.salt_partitions
        )

        # C7 — evolve the table to accept this batch's payload shape.
        payload_fields = [f for f in batch.schema.fields if f.name not in ENVELOPE_COLS]
        table.evolve_for_batch(T.StructType(payload_fields), self.cfg.rename_map)

        # T1/T2/T3 — enhancement on the compacted survivors only (far
        # fewer rows than the raw batch when keys are updated repeatedly).
        enriched = with_normalized_columns(compacted) if self.cfg.normalize else compacted

        user_fields = table.schema_fields()
        part_col = (
            F.col("part") if "part" in batch.columns
            else F.pmod(F.xxhash64("repo"), F.lit(self.cfg.n_parts))
        )
        select = []
        for uf in user_fields:
            if uf.name in enriched.columns:
                select.append(F.col(uf.name).cast(uf.type).alias(uf.name))
            else:
                select.append(F.lit(None).cast(uf.type).alias(uf.name))
        merge_batch = enriched.select(
            *select,
            F.col("seq").alias("_seq"),
            F.col("op").alias("_op"),
            part_col.alias("_part"),
        )

        if self.cfg.suppress_no_ops:
            merge_batch = suppress_unchanged(merge_batch, table.read_internal())

        merge_batch = merge_batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # ONE job computes both the global stats and the per-partition
            # offsets (S6/C5): per-part aggregate rows, folded in the driver.
            part_rows = (
                merge_batch.groupBy("_part")
                .agg(
                    F.count("*").alias("n_keys"),
                    F.sum((F.col("_op") == "D").cast("int")).alias("n_deletes"),
                    F.min("_seq").alias("min_seq"),
                    F.max("_seq").alias("max_seq"),
                )
                .collect()
            )
            n_keys = sum(r["n_keys"] for r in part_rows)
            offsets = {
                str(r["_part"]): {"max_seq": r["max_seq"], "n_keys": r["n_keys"]}
                for r in part_rows
            }
            info = {
                "pipeline_id": self.cfg.pipeline_id,
                "epoch": int(epoch_id),
                "n_keys": n_keys,
                "n_deletes": int(sum(r["n_deletes"] or 0 for r in part_rows)),
                "n_dead_letters": n_dead,
                "min_seq": min((r["min_seq"] for r in part_rows), default=None),
                "max_seq": max((r["max_seq"] for r in part_rows), default=None),
                "offsets": offsets,
            }
            if n_keys == 0:
                # nothing to merge — still fence the epoch atomically via a
                # metadata-only commit.
                rec = table._current()
                commitlog.write_commit(
                    table.table_dir,
                    {
                        **rec,
                        "version": rec["version"] + 1,
                        "fences": table._advance_fence(
                            rec["fences"], self.cfg.pipeline_id, epoch_id
                        ),
                        "epoch_info": {**info, "wall_sec": time.monotonic() - t0},
                    },
                )
                return {**info, "skipped": False, "buckets_rewritten": 0}
            if self.cfg.merge_mode == "mor":
                merge_stats = table.append_delta(
                    merge_batch.drop("_part"),
                    fence=(self.cfg.pipeline_id, epoch_id),
                    files_per_bucket=self.cfg.files_per_bucket,
                    info={**info, "wall_sec": time.monotonic() - t0},
                )
            else:
                merge_stats = table.merge_upsert(
                    merge_batch.drop("_part"),
                    fence=(self.cfg.pipeline_id, epoch_id),
                    files_per_bucket=self.cfg.files_per_bucket,
                    info={**info, "wall_sec": time.monotonic() - t0},
                )
        finally:
            merge_batch.unpersist()
        if self.cfg.merge_mode == "mor":
            # Amortized maintenance: compact only buckets whose delta-file
            # count crossed the threshold (driver-side check, no Spark job).
            hot = [
                b
                for b, c in table.bucket_delta_generations().items()
                if c >= self.cfg.compact_threshold
            ]
            if hot:
                merge_stats = {
                    **merge_stats,
                    "compacted": table.compact_buckets(
                        hot, files_per_bucket=self.cfg.files_per_bucket
                    ),
                }
        return {**info, **merge_stats, "skipped": False}

    # ------------------------------------------------------ batch replay

    def replay_event_dir(self, events_dir: str, from_epoch: int | None = None) -> list[dict]:
        """S2 bounded replay of an `epoch=<e>/part=<p>/` event log, resuming
        after the last fenced epoch by default (C6)."""
        table = self.ensure_table()
        start = (
            table.last_epoch(self.cfg.pipeline_id) + 1 if from_epoch is None else from_epoch
        )
        epochs = sorted(
            int(d.split("=")[1])
            for d in os.listdir(events_dir)
            if d.startswith("epoch=")
        )
        results = []
        for e in epochs:
            if e < start:
                continue
            batch = self.spark.read.parquet(os.path.join(events_dir, f"epoch={e}"))
            results.append(self.apply_epoch(batch, e))
        return results

    # ------------------------------------------------- system-table views

    def _epoch_infos(self) -> list[dict]:
        v = commitlog.current_version(self.cfg.table_dir)
        infos = []
        for i in range((v or -1) + 1):
            rec = commitlog.read_commit(self.cfg.table_dir, i)
            info = rec.get("epoch_info")
            if info and info.get("pipeline_id") == self.cfg.pipeline_id:
                infos.append({**info, "table_version": rec["version"]})
        return infos

    def lineage(self) -> DataFrame:
        """S6 lineage/metrics table: one row per committed epoch, from the
        commit log (atomic with the fence by construction)."""
        schema = (
            "pipeline_id string, epoch long, table_version long, n_keys long, "
            "n_deletes long, n_dead_letters long, min_seq long, max_seq long, "
            "wall_sec double, buckets_rewritten long, files_written long"
        )
        rows = [
            {
                k: info.get(k)
                for k in [
                    "pipeline_id", "epoch", "table_version", "n_keys", "n_deletes",
                    "n_dead_letters", "min_seq", "max_seq", "wall_sec",
                    "buckets_rewritten", "files_written",
                ]
            }
            for info in self._epoch_infos()
        ]
        return self.spark.createDataFrame(rows, schema=schema)

    def offsets(self) -> DataFrame:
        """C5/C6 per-partition checkpointed offsets table."""
        rows = []
        for info in self._epoch_infos():
            for part, o in (info.get("offsets") or {}).items():
                rows.append(
                    {
                        "pipeline_id": info["pipeline_id"],
                        "epoch": info["epoch"],
                        "part": int(part),
                        "max_seq": o["max_seq"],
                        "n_keys": o["n_keys"],
                    }
                )
        return self.spark.createDataFrame(
            rows, schema="pipeline_id string, epoch long, part int, max_seq long, n_keys long"
        )

    def dead_letters(self) -> DataFrame:
        d = os.path.join(self.cfg.table_dir, "_sys", "errors")
        if not os.path.isdir(d):
            return self.spark.createDataFrame([], "epoch long")
        return self.spark.read.parquet(d)

    def _write_dead_letters(self, dead: DataFrame, epoch_id: int) -> int:
        n = dead.count()
        if n:
            out = os.path.join(self.cfg.table_dir, "_sys", "errors", f"epoch={epoch_id}")
            dead.write.mode("overwrite").parquet(out)  # idempotent per epoch
        return int(n)
