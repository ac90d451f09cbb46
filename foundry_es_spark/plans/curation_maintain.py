"""Incremental corpus-curation maintenance from the CDC change feed.

plans/dedup_maintain.py proved the pattern for near-dup state; training-
data users also re-FILTER and re-DECONTAMINATE incrementally (r3 verdict
item 4). This maintainer keeps a per-document curation-verdict table —
Gopher quality features + keep flag, and 13-gram contamination counts
against a FIXED eval benchmark — up to date from a
:class:`~foundry_es_spark.lake.table.LakeTable`'s change feed:

- **Verdicts are per-document pure functions** of (text, eval grams), so
  unlike dedup there is no cross-document retraction problem: the refresh
  recomputes verdicts for exactly the changed keys and merges them
  (U upserts + D tombstones) in ONE keyed commit. Work per refresh ∝
  changed rows, never corpus size.
- **Kernels are shared with the batch operators** —
  `queries/textstats.py:gopher_feature_cols` and `decon_tokens`/
  `decon_grams` (key-generic) — so incremental verdicts are bit-identical
  to a batch recompute; the standing invariant (state == batch verdicts
  over the live snapshot) is pinned by tests/test_curation_maintain.py.
- **Scale shape**: the eval gram set is fixed-size and BROADCAST (that is
  what an eval benchmark is); the changed-docs side is width-guarded by
  ``max_delta_keys``; the merge touches only the victims' buckets. The
  100 TB corpus is never scanned on the incremental path.
- **Exactly-once**: the feed cursor is a table property committed
  atomically with the verdict merge (the only commit). A crash anywhere
  before it leaves the cursor behind; the retry re-derives the same
  verdicts and upserts them at the same ``_seq`` — idempotent. Rollback
  or an expired feed window inside the window forces a full rebuild,
  same economics as the dedup and derived-table maintainers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foundry_es_spark.lake import log as commitlog
from foundry_es_spark.lake.log import SnapshotExpired
from foundry_es_spark.lake.table import LakeTable
from foundry_es_spark.plans.cursor import window_invalidated
from foundry_es_spark.plans.feed import net_window, resolve_patches
from foundry_es_spark.queries.textstats import (
    decon_grams,
    decon_tokens,
    gopher_feature_cols,
)

_A = ["repo", "path"]

STATE_FIELDS = [
    ("repo", "string"),
    ("path", "string"),
    ("n_tokens", "bigint"),
    ("avg_token_len_centi", "bigint"),
    ("alpha_bp", "bigint"),
    ("bullet_bp", "bigint"),
    ("unique_line_bp", "bigint"),
    ("keep", "boolean"),
    ("n_grams", "bigint"),
    ("n_hits", "bigint"),
    ("hit_bp", "bigint"),
    ("contaminated", "boolean"),
]


@dataclass
class CurationMaintainConfig:
    name: str                     # cursor key
    state_dir: str                # verdict LakeTable root
    text_col: str = "content"
    k: int = 13                   # decontamination gram width
    n_buckets: int = 16
    max_delta_keys: int = 10_000  # wider window → full rebuild
    files_per_bucket: int = 1


class IncrementalCurationPipeline:
    """Maintain per-document curation verdicts (quality filter +
    decontamination) for a CDC-replicated table, incrementally from its
    change feed.

    ``eval_grams``: (g string) — the DISTINCT k-gram set of the held-out
    eval benchmark. The benchmark is fixed by definition, so the frame
    must be deterministic across refreshes (e.g. read from a pinned
    parquet); it is broadcast on every probe."""

    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        eval_grams: DataFrame,
        cfg: CurationMaintainConfig,
    ):
        self.spark = spark
        self.source = source
        self.eval_grams = eval_grams
        self.cfg = cfg

    # ------------------------------------------------------------ plumbing

    @property
    def _cursor_key(self) -> str:
        return f"curation_cursor:{self.cfg.name}"

    @property
    def state_table(self) -> LakeTable:
        if LakeTable.exists(self.cfg.state_dir):
            return LakeTable(self.spark, self.cfg.state_dir)
        return LakeTable.create(
            self.spark,
            self.cfg.state_dir,
            STATE_FIELDS,
            n_buckets=self.cfg.n_buckets,
            key_cols=("repo", "path"),
            props={self._cursor_key: "-1"},
        )

    def cursor(self) -> int:
        """Last source commit version folded into the verdict state."""
        return int(self.state_table.properties().get(self._cursor_key, -1))

    def state(self) -> DataFrame:
        return self.state_table.read()

    # ------------------------------------------------------------- kernel

    def verdicts(self, docs: DataFrame, broadcast_hits: bool = False) -> DataFrame:
        """Curation verdicts for (repo, path, text) rows — the SAME
        expression trees as the batch operators. Docs shorter than k
        tokens have no k-gram: n_grams = n_hits = hit_bp = 0.

        Plan shape: gopher features AND the gram-position count are pure
        row-wise expressions computed in ONE projection (no join); only
        ``n_hits`` needs the gram explode → broadcast eval probe →
        per-key aggregate, joined back on the key. ``broadcast_hits``:
        the incremental path sets it — the hit side is bounded by
        max_delta_keys there, so the join-back is broadcast by
        construction and the whole verdict plan is exchange-free on the
        big side. The full-rebuild path leaves it to AQE (hits are the
        rare side, but unbounded in principle)."""
        text_col = self.cfg.text_col
        k = self.cfg.k
        feats = gopher_feature_cols(text_col)
        w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        n_grams = F.greatest(F.size(w) - (k - 1), F.lit(0)).cast("bigint")
        base = docs.select(
            *_A,
            *[c.alias(n) for n, c in feats.items()],
            n_grams.alias("n_grams"),
        )
        toks = decon_tokens(docs, k, key_cols=tuple(_A), text_col=text_col)
        hits = (
            decon_grams(toks, k, key_cols=tuple(_A))
            .join(F.broadcast(self.eval_grams.select("g").distinct()), "g")
            .groupBy(*_A)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        )
        if broadcast_hits:
            hits = F.broadcast(hits)
        return base.join(hits, on=_A, how="left").select(
            *_A,
            *[n for n, _ in STATE_FIELDS[2:8]],
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.when(
                F.col("n_grams") > 0,
                F.floor(F.coalesce("n_hits", F.lit(0)) * 10000 / F.col("n_grams")),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("hit_bp"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )

    # ------------------------------------------------------------- refresh

    def refresh(self) -> dict:
        src_cur = commitlog.current_version(self.source.table_dir)
        state_t = self.state_table
        last = self.cursor()
        if src_cur is None or src_cur <= last:
            return {"refreshed": False, "cursor": last}

        if window_invalidated(self.source.table_dir, last + 1, src_cur):
            return self._full_rebuild(src_cur)
        try:
            latest, vic_rows = net_window(
                self.source, self.cfg.text_col, last + 1, src_cur,
                self.cfg.max_delta_keys,
            )
            victims = [(r[0], r[1]) for r in vic_rows]
        except SnapshotExpired:
            return self._full_rebuild(src_cur)
        if not victims:
            self._set_cursor_only(state_t, src_cur)
            return {"refreshed": True, "cursor": src_cur, "keys": 0}
        if len(victims) > self.cfg.max_delta_keys:
            return self._full_rebuild(src_cur)

        patch_keys = [(r[0], r[1]) for r in vic_rows if r["_op"] == "P"]
        if patch_keys:
            latest = resolve_patches(self.source, latest, self.cfg.text_col, patch_keys)

        changed = latest.where(F.col("_op") != "D").drop("_op")
        seq = F.lit(src_cur).cast("long")
        null_cols = [
            F.lit(None).cast(t).alias(n) for n, t in STATE_FIELDS[2:]
        ]
        batch = (
            self.verdicts(changed, broadcast_hits=True)
            .withColumn("_op", F.lit("U"))
            .unionByName(
                latest.where(F.col("_op") == "D")
                .select(*_A, *null_cols)
                .withColumn("_op", F.lit("D"))
            )
            .withColumn("_seq", seq)
        )
        victim_repos = sorted({v[0] for v in victims})
        stats = state_t.merge_upsert(
            batch,
            files_per_bucket=self.cfg.files_per_bucket,
            touched_buckets=sorted(
                state_t._buckets_for_repos(victim_repos, state_t._current()["n_buckets"])
            ),
            props_update={self._cursor_key: str(src_cur)},
            info={"curation_window": [last + 1, src_cur], "delta_keys": len(victims)},
        )
        return {
            "refreshed": True,
            "cursor": src_cur,
            "keys": len(victims),
            "mode": "incremental",
            **stats,
        }

    def _full_rebuild(self, src_cur: int) -> dict:
        snap = self.source.read().select(*_A, self.cfg.text_col)
        self.state_table.overwrite_snapshot(
            self.verdicts(snap).withColumn("_seq", F.lit(src_cur).cast("long")),
            props_update={self._cursor_key: str(src_cur)},
        )
        return {"refreshed": True, "cursor": src_cur, "mode": "full"}

    def _set_cursor_only(self, state_t: LakeTable, src_cur: int) -> None:
        # OCC-safe: rebases past racing ingest commits (same rule as the
        # dedup maintainer's cursor-only commit)
        state_t.update_properties({self._cursor_key: str(src_cur)})
