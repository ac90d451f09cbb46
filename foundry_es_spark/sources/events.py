"""Event-log sources (S1 stream / S2 bounded replay).

The local source is the partitioned Parquet event log; on a real cluster
S1 is Kafka (`spark.readStream.format("kafka")` + `from_json(value)`) —
the jar is absent in this sandbox (BASELINE.md environment), so the Kafka
path is provided but import-gated; everything downstream of the source is
source-agnostic (the epoch body takes a plain DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from foundry_es_spark.schema import EVENT_SCHEMA, event_schema_with


def read_events_batch(
    spark: SparkSession, events_dir: str, extra: T.StructType | None = None
) -> DataFrame:
    """S2: the whole log as a bounded DataFrame (partition columns epoch/part
    discovered from the directory layout). ``extra`` declares evolved payload
    columns so the explicit schema enforces them even when early files lack
    them; without it the schema comes from footer merging."""
    if extra is None:
        return spark.read.option("basePath", events_dir).parquet(events_dir)
    fields = list(event_schema_with(extra).fields) + [
        T.StructField("epoch", T.LongType(), True),
        T.StructField("part", T.LongType(), True),
    ]
    return (
        spark.read.schema(T.StructType(fields))
        .option("basePath", events_dir)
        .parquet(events_dir)
    )


def read_events_seq_range(
    spark: SparkSession, events_dir: str, lo: int, hi: int, epoch_size: int | None = None
) -> DataFrame:
    """S2 bounded slice [lo, hi). When the log layout's epoch size is known,
    the predicate on the `epoch` partition column prunes whole directories
    before any file is opened (partition pruning — check PushedFilters)."""
    df = read_events_batch(spark, events_dir)
    if epoch_size:
        df = df.where(
            (F.col("epoch") >= lo // epoch_size) & (F.col("epoch") <= (hi - 1) // epoch_size)
        )
    return df.where((F.col("seq") >= lo) & (F.col("seq") < hi))


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int = 64,
    extra: T.StructType | None = None,
) -> DataFrame:
    """S1: micro-batch file stream over the event log."""
    fields = list(event_schema_with(extra).fields) + [
        T.StructField("epoch", T.LongType(), True),
        T.StructField("part", T.LongType(), True),
    ]
    return (
        spark.readStream.schema(T.StructType(fields))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", events_dir)
        .parquet(events_dir)
    )


# The schema Spark's Kafka source emits — what decode_kafka_events consumes.
# Kept as DDL so tests can build a batch frame of exactly this shape without
# the kafka jar.
KAFKA_RAW_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_stream_spec(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict:
    """The exact readStream configuration the cluster run issues — split
    out so it is golden-testable without the spark-sql-kafka jar (same
    plan-mode idea as lake/iceberg.py). `max_offsets_per_trigger` is the
    ingestion rate limiter: it bounds each micro-batch so one backlogged
    topic can't produce an epoch larger than the executors' memory budget
    (the streaming-side analogue of the replay CLI's epoch sizing)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(bool(fail_on_data_loss)).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    return {"format": "kafka", "options": opts}


def decode_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka envelope → event rows: pure column logic on the KAFKA_RAW_DDL
    shape, so it is unit-tested on a batch frame without the jar and
    behaves identically under readStream. A value that fails JSON parsing
    yields an all-null event with its source (topic/partition/offset)
    retained — the downstream dead-letter predicate (S7) quarantines it
    with enough provenance to replay the single record."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e"),
        F.col("topic"),
        F.col("partition").cast("long").alias("part"),
        F.col("offset"),
    )
    return parsed.select("e.*", "topic", "part", "offset")


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1 cluster path: Kafka → JSON-decoded event envelope. Requires the
    spark-sql-kafka jar on the classpath (absent locally — BASELINE.md);
    the call raises a clear error instead of failing deep inside Spark.
    Configuration and decode are factored into :func:`kafka_stream_spec`
    and :func:`decode_kafka_events`, both covered by jar-free tests."""
    spec = kafka_stream_spec(
        bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
    )
    try:
        raw = spark.readStream.format(spec["format"]).options(**spec["options"]).load()
    except Exception as exc:  # pragma: no cover - jar absent in sandbox
        raise RuntimeError(
            "Kafka source requires spark-sql-kafka-0-10 on the classpath"
        ) from exc
    return decode_kafka_events(raw)
