"""CDC core operators (SURVEY.md §2.2).

C1 latest-wins compaction + C2 op fold: one shuffle via
``groupBy(key).agg(max_by(struct(*), seq))`` — preferred over
window+row_number at scale because partial aggregation (map-side combine)
collapses hot keys before the shuffle, so a key with 10^6 updates in a
batch ships O(partitions) rows, not 10^6. The optional explicit two-phase
salting (C4) covers engines/configs where a single reduce key would still
concentrate on one task.

Reference analogue: the ingestion service's duplicate/update check and
status classification [F-ES: DocumentIngestionService — UNVERIFIED,
SURVEY.md §0].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from foundry_es_spark.schema import KEY_COLS, VALID_OPS


def validate_split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S7 dead-letter split: malformed events are quarantined, never fail
    the epoch (reference failure queues [F-ES: dispatcher config —
    UNVERIFIED])."""
    valid = (
        F.col("repo").isNotNull()
        & F.col("path").isNotNull()
        & F.col("seq").isNotNull()
        & F.col("op").isin(*VALID_OPS)
        & (F.col("content").isNotNull() | (F.col("op") == "D"))
    )
    return events.where(valid), events.where(~F.coalesce(valid, F.lit(False)))


def compact_latest(
    events: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = "seq",
    salt_partitions: int = 0,
) -> DataFrame:
    """C1+C2: keep only the max-`order_col` event per key; the surviving
    row's op is the net effect (I/U ⇒ upsert, D ⇒ delete) fed to MERGE.

    salt_partitions > 0 adds an explicit two-phase aggregation: local
    max_by within (key, salt) slices, then global max_by per key — the
    hot-key salting demanded by BASELINE.json north_rule even though
    map-side combine already bounds skew for this aggregation shape.
    """
    key_cols = key_cols or KEY_COLS
    payload = F.struct(*[F.col(c) for c in events.columns])
    if salt_partitions > 0:
        salt = F.pmod(F.col(order_col), F.lit(salt_partitions)).alias("_salt")
        local = (
            events.groupBy(*key_cols, salt)
            .agg(F.max_by(payload, F.col(order_col)).alias("r"))
            .select(*key_cols, "r")
        )
        return (
            local.groupBy(*key_cols)
            .agg(F.max_by(F.col("r"), F.col(f"r.{order_col}")).alias("r"))
            .select("r.*")
        )
    return (
        events.groupBy(*key_cols)
        .agg(F.max_by(payload, F.col(order_col)).alias("r"))
        .select("r.*")
    )


def suppress_unchanged(
    batch: DataFrame,
    current_state: DataFrame,
    hash_col: str = "content_sha256",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """C3 no-op suppression: drop upserts whose content hash equals the
    stored row's — cuts MERGE write amplification on re-harvests where
    most records are unchanged. D rows always pass through."""
    key_cols = key_cols or KEY_COLS
    state = current_state.select(*key_cols, F.col(hash_col).alias("_cur_hash"))
    joined = batch.join(state, on=key_cols, how="left")
    changed = (
        (F.col("_op") == "D")
        | F.col("_cur_hash").isNull()
        | (F.col(hash_col) != F.col("_cur_hash"))
    )
    return joined.where(changed).drop("_cur_hash")


def snapshot_diff_events(
    current_state: DataFrame,
    snapshot: DataFrame,
    base_seq: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """C8 deletion-by-absence: keys present in the table but absent from a
    full re-harvest snapshot become D events (reference end-of-batch
    missing-doc flagging [F-ES — UNVERIFIED]). Returned as change events
    so they flow through the normal merge path."""
    key_cols = key_cols or KEY_COLS
    missing = current_state.select(*key_cols).join(
        snapshot.select(*key_cols), on=key_cols, how="left_anti"
    )
    return missing.select(
        (F.lit(base_seq) + F.monotonically_increasing_id()).alias("seq"),
        F.current_timestamp().alias("ts"),
        F.lit("D").alias("op"),
        *[F.col(c) for c in key_cols],
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    )
