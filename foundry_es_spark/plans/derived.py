"""Incremental derived-table maintenance — CDC fan-out over the change feed.

A production CDC engine rarely stops at the replicated table: downstream
consumers maintain *derived* tables (per-repo rollups, dashboards, feature
tables) that must track the source incrementally — rescanning 100 TB per
refresh is not an option. The reference's enhance→transform chain feeds
exactly such downstream views [F-ES: pipeline stages — UNVERIFIED,
SURVEY.md §0]; here the mechanism is Spark-native and lake-native:

- **Source of increments**: :meth:`LakeTable.table_changes` — the
  O(schema-versions) commit-range change feed (one multi-path parquet scan
  per schema version, not per commit).
- **Refresh strategy — partial recompute**: the feed window names the
  *touched repos* (the immutable key prefix every group lives inside);
  ALL groups of those repos are re-aggregated from a bucket-pruned
  selective read of the source snapshot (``read(repos=...)`` opens only
  the touched buckets' files, then parquet min/max row-group stats prune
  within them). Repo-level — not group-tuple-level — pruning is what
  makes deletes and group-changing updates correct: a tombstone carries
  NULL non-key payload and an update only names its NEW group, so the
  old group must be rediscovered from truth. Work per refresh ∝ data of
  the touched repos, never table size.
  Partial recompute sidesteps the retraction bookkeeping a delta-algebra
  maintainer needs (the feed carries post-images only): updates and
  deletes are handled for free because the group is rebuilt from truth.
- **Exactly-once**: the refresh cursor (last consumed source commit
  version) is a table property written in the SAME commit as the merged
  aggregates (``merge_upsert(props_update=...)``). A crash anywhere
  before that commit leaves cursor and data untouched; the retry
  recomputes the same groups from the (possibly newer) snapshot —
  re-aggregation from truth is idempotent and self-healing, so a group
  can never be left stale or doubled.
- **Vanished groups**: a previously-derived group of a touched repo that
  is absent from the recompute (last member deleted or moved group)
  merges as a ``D`` tombstone — deletion-by-absence at the derived level.
- **Scale guard**: when a window touches more repos than
  ``max_selective_groups`` the maintainer switches to a full recompute
  (one scan + overwrite) — past that point one scan is cheaper than many
  selective reads, and the cursor still advances atomically with it.

Iceberg twin: the cursor is a table property (``ALTER TABLE ... SET
TBLPROPERTIES``) set in the same transaction as the MERGE; the feed is the
changelog view (`lake/iceberg.py:table_changes_sql`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from foundry_es_spark.lake import log as commitlog
from foundry_es_spark.lake.table import LakeTable


@dataclass
class DerivedConfig:
    name: str                       # cursor key + fence pipeline id
    derived_dir: str                # derived LakeTable root
    group_cols: list[str] = field(default_factory=lambda: ["repo"])
    n_buckets: int = 16
    max_selective_groups: int = 10_000   # window wider than this → full recompute
    files_per_bucket: int = 1


class DerivedTablePipeline:
    """Maintain ``SELECT group_cols, aggs FROM source GROUP BY group_cols``
    as a lake table, incrementally, from the source's change feed.

    ``agg_exprs``: aliased aggregate Columns evaluated over the source's
    public snapshot (e.g. ``[F.count("*").alias("n_paths"), ...]``).
    The first group col must be ``repo`` (the lake's bucket key), so the
    derived table inherits bucket-pruned selective reads too.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        cfg: DerivedConfig,
        agg_exprs: list[Column],
    ):
        if cfg.group_cols[0] != "repo":
            raise ValueError("first group col must be 'repo' (lake bucket key)")
        self.spark = spark
        self.source = source
        self.cfg = cfg
        self.agg_exprs = agg_exprs

    # ------------------------------------------------------------ plumbing

    @property
    def _cursor_key(self) -> str:
        return f"cdf_cursor:{self.cfg.name}"

    def _aggregate(self, snapshot: DataFrame) -> DataFrame:
        return snapshot.groupBy(*self.cfg.group_cols).agg(*self.agg_exprs)

    def ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.cfg.derived_dir):
            return LakeTable(self.spark, self.cfg.derived_dir)
        # Schema comes from the aggregate plan itself (no row is computed —
        # .schema resolves on the analyzed plan only).
        agg_schema = self._aggregate(self.source.read()).schema
        fields = [(f.name, f.dataType.simpleString()) for f in agg_schema.fields]
        return LakeTable.create(
            self.spark,
            self.cfg.derived_dir,
            fields,
            n_buckets=self.cfg.n_buckets,
            key_cols=tuple(self.cfg.group_cols),
            props={self._cursor_key: "-1"},
        )

    @property
    def table(self) -> LakeTable:
        return self.ensure_table()

    def cursor(self) -> int:
        """Last source commit version folded into the derived table."""
        return int(self.table.properties().get(self._cursor_key, -1))

    # ------------------------------------------------------------- refresh

    def refresh(self) -> dict:
        """Fold all source commits past the cursor into the derived table.

        Returns stats; ``{"refreshed": False}`` when already current."""
        src_cur = commitlog.current_version(self.source.table_dir)
        derived = self.table
        last = self.cursor()
        if src_cur is None or src_cur <= last:
            return {"refreshed": False, "cursor": last}

        from foundry_es_spark.lake.log import SnapshotExpired
        from foundry_es_spark.plans.cursor import window_invalidated

        # A rollback inside the window means the feed contains changes that
        # were later UNDONE (and possibly changes this maintainer already
        # consumed that are now re-applied) — the increment can't be proven
        # from the feed alone, so recompute from truth. O(window) driver
        # JSON reads, same cost class as the feed's own commit-record walk.
        if window_invalidated(self.source.table_dir, last + 1, src_cur):
            return self._full_recompute(derived, src_cur)

        try:
            feed = self.source.table_changes(from_version=last + 1, to_version=src_cur)
            # Touched REPOS, not full group tuples: the repo is the
            # immutable key prefix, so every group a changed row can enter
            # OR leave lives inside its repo. Pruning by the feed's full
            # group tuple was wrong for multi-column group_cols — a delete
            # tombstone carries NULL non-key payload (touched = (R, NULL))
            # and a group-changing update only names the NEW group, so the
            # OLD group was never re-aggregated and stayed stale forever.
            # Recompute every group of the touched repos from truth; work
            # per refresh is still ∝ touched repos' data, never table size.
            repos = sorted(
                r[0] for r in
                feed.select("repo").distinct().limit(
                    self.cfg.max_selective_groups + 1
                ).collect()
            )
        except SnapshotExpired:
            # cursor fell behind the source's retention window — the feed
            # can no longer prove which groups changed, so recompute all
            # (never silently skip history)
            return self._full_recompute(derived, src_cur)
        if not repos:
            # metadata-only source commits (fences, compaction) — advance
            # the cursor without touching data
            self._set_cursor_only(derived, src_cur)
            return {"refreshed": True, "cursor": src_cur, "groups": 0}

        if len(repos) > self.cfg.max_selective_groups:
            return self._full_recompute(derived, src_cur)

        snap = self.source.read(repos=repos)  # bucket-pruned selective read
        agg = self._aggregate(snap)

        # vanished groups: previously-derived groups of the touched repos
        # absent from the recompute (their last member was deleted or moved
        # group). Derived-side selective read — bucket-pruned and tiny.
        prev = derived.read(repos=repos).select(*self.cfg.group_cols)
        gone = prev.join(agg, on=self.cfg.group_cols, how="left_anti")
        agg_cols = [f for f in agg.columns if f not in self.cfg.group_cols]
        gone = gone.select(
            *self.cfg.group_cols,
            *[F.lit(None).cast(agg.schema[c].dataType).alias(c) for c in agg_cols],
        )
        batch = (
            agg.withColumn("_op", F.lit("U"))
            .unionByName(gone.withColumn("_op", F.lit("D")))
            .withColumn("_seq", F.lit(src_cur).cast("long"))
        )
        # NOTE: no epoch fence here — the cursor property IS the watermark
        # (fences collapse contiguous epoch ids; source versions are sparse
        # from the derived table's viewpoint, which would grow fence state).
        stats = derived.merge_upsert(
            batch,
            files_per_bucket=self.cfg.files_per_bucket,
            touched_buckets=sorted(
                derived._buckets_for_repos(repos, derived._current()["n_buckets"])
            ),
            props_update={self._cursor_key: str(src_cur)},
            info={"refreshed_repos": len(repos), "source_from": last + 1,
                  "source_to": src_cur},
        )
        return {
            "refreshed": True,
            "cursor": src_cur,
            "repos": len(repos),
            "mode": "selective",
            **stats,
        }

    def _full_recompute(self, derived: LakeTable, src_cur: int) -> dict:
        agg = self._aggregate(self.source.read())
        derived.overwrite_snapshot(
            agg.withColumn("_seq", F.lit(src_cur).cast("long")),
            props_update={self._cursor_key: str(src_cur)},
        )
        return {"refreshed": True, "cursor": src_cur, "mode": "full"}

    def _set_cursor_only(self, derived: LakeTable, src_cur: int) -> None:
        # OCC-safe: rebases past racing ingest commits (a raw _commit here
        # raised CommitConflict uncaught when the maintenance cron ran
        # alongside live writers)
        derived.update_properties({self._cursor_key: str(src_cur)})

    def read(self) -> DataFrame:
        return self.table.read()
