"""Golden-SQL tests for the IcebergBackend (SURVEY.md §4.4 backend 1).

No Iceberg jar exists in this sandbox, so the backend runs in plan mode and
these tests pin the EXACT statements a cluster deployment issues — create
DDL with bucket partitioning + MoR properties, seq-conditional MERGE INTO,
ALTER TABLE evolution, rewrite_data_files compaction — plus protocol
conformance of both backends (the seam CdcPipeline relies on)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from foundry_es_spark.lake import IcebergBackend, LakeTable, TableBackend

FIELDS = [
    ("repo", "string"), ("path", "string"), ("commit", "string"),
    ("lang", "string"), ("content", "string"),
]


@pytest.fixture()
def be(spark):
    return IcebergBackend(spark, "lake.db.code", n_buckets=32).create(FIELDS)


def test_create_ddl_golden(be):
    create, ident = be.sql_log[0], be.sql_log[1]
    assert create == (
        # identifier fields and the engine-invariant system columns are
        # NOT NULL — Iceberg rejects SET IDENTIFIER FIELDS on nullables
        "CREATE TABLE IF NOT EXISTS lake.db.code (repo STRING NOT NULL, "
        "path STRING NOT NULL, "
        "commit STRING, lang STRING, content STRING, _seq BIGINT NOT NULL, "
        "_op STRING NOT NULL) "
        "USING iceberg PARTITIONED BY (bucket(32, repo)) TBLPROPERTIES ( "
        "'format-version' = '2', 'write.merge.mode' = 'merge-on-read', "
        "'write.update.mode' = 'merge-on-read', 'write.delete.mode' = 'merge-on-read', "
        "'write.distribution-mode' = 'hash', "
        "'write.parquet.compression-codec' = 'zstd', "
        # cluster twin of the local backend's key-fingerprint sets
        # (lake/kfp.py): parquet bloom filter on the partition key
        "'write.parquet.bloom-filter-enabled.column.repo' = 'true', "
        # OCC posture (test_concurrent.py twins): Iceberg's internal CAS
        # retry budget + serializable row-level conflict validation on
        # every write mode — what makes maintenance safe beside ingest
        "'commit.retry.num-retries' = '8', "
        "'commit.retry.min-wait-ms' = '100', "
        "'commit.retry.max-wait-ms' = '60000', "
        "'write.merge.isolation-level' = 'serializable', "
        "'write.update.isolation-level' = 'serializable', "
        "'write.delete.isolation-level' = 'serializable' )"
    )
    assert ident == "ALTER TABLE lake.db.code SET IDENTIFIER FIELDS repo, path"


def test_merge_sql_golden(be):
    sql = be.merge_sql("src")
    assert sql == (
        "MERGE INTO lake.db.code t USING src s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND s._seq > t._seq AND s._op = 'D' THEN DELETE "
        "WHEN MATCHED AND s._seq > t._seq THEN UPDATE SET "
        "t.repo = s.repo, t.path = s.path, t.commit = s.commit, t.lang = s.lang, "
        "t.content = s.content, t._seq = s._seq, t._op = s._op "
        "WHEN NOT MATCHED AND s._op != 'D' THEN INSERT "
        "(repo, path, commit, lang, content, _seq, _op) VALUES "
        "(s.repo, s.path, s.commit, s.lang, s.content, s._seq, s._op)"
    )


def test_merge_patch_sql_golden(be):
    """C9 cluster twin: sparse patches resolve inside the MERGE (matched
    rows coalesce per column, orphan patches are never inserted, applied
    patches store _op='U')."""
    sql = be.merge_patch_sql("src")
    assert sql == (
        "MERGE INTO lake.db.code t USING src s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND s._seq > t._seq AND s._op = 'D' THEN DELETE "
        "WHEN MATCHED AND s._seq > t._seq THEN UPDATE SET "
        "t.repo = s.repo, "
        "t.path = s.path, "
        "t.commit = CASE WHEN s._op = 'P' THEN coalesce(s.commit, t.commit) ELSE s.commit END, "
        "t.lang = CASE WHEN s._op = 'P' THEN coalesce(s.lang, t.lang) ELSE s.lang END, "
        "t.content = CASE WHEN s._op = 'P' THEN coalesce(s.content, t.content) ELSE s.content END, "
        "t._seq = s._seq, t._op = CASE WHEN s._op = 'P' THEN 'U' ELSE s._op END "
        "WHEN NOT MATCHED AND s._op NOT IN ('D', 'P') THEN INSERT "
        "(repo, path, commit, lang, content, _seq, _op) VALUES "
        "(s.repo, s.path, s.commit, s.lang, s.content, s._seq, s._op)"
    )


def test_evolution_statements_golden(be):
    be.evolve_for_batch(
        T.StructType.fromDDL("repo string, path string, commit string, lang string, "
                             "content string, stars int"),
    )
    assert be.sql_log[-1] == "ALTER TABLE lake.db.code ADD COLUMN stars INT"
    be.evolve_for_batch(
        T.StructType.fromDDL("repo string, path string, stars bigint"),
    )
    assert be.sql_log[-1] == "ALTER TABLE lake.db.code ALTER COLUMN stars TYPE BIGINT"
    be.evolve_for_batch(
        T.StructType.fromDDL("repo string, path string, star_count bigint"),
        rename_map={"stars": "star_count"},
    )
    assert "ALTER TABLE lake.db.code RENAME COLUMN stars TO star_count" in be.sql_log
    # illegal narrowing rejected like the local backend
    with pytest.raises(ValueError):
        be.widen_column("star_count", "int")


def test_fence_and_compaction_golden(be):
    assert be.last_epoch("p1") == -1
    be.fence_epoch_only("p1", 7)
    assert be.sql_log[-1] == (
        "ALTER TABLE lake.db.code SET TBLPROPERTIES ('graft.fence.p1' = '7')"
    )
    assert be.is_epoch_committed("p1", 7) and not be.is_epoch_committed("p1", 8)
    be.compact_buckets([3, 9])
    assert be.sql_log[-1] == (
        "CALL lake.system.rewrite_data_files( table => 'db.code', "
        # system.bucket resolves against table columns in the rewrite
        # procedure's where (Iceberg >= 1.4); partition.repo_bucket is
        # metadata-table syntax and would not resolve as a row predicate
        "strategy => 'binpack', where => 'system.bucket(32, repo) IN (3, 9)', "
        # use-starting-sequence-number: rewritten files keep their input's
        # sequence number so a MoR ingest landing mid-rewrite still wins
        # with its newer deletes (the ingest-races-compaction rebase rule)
        "options => map('delete-file-threshold', '1', "
        "'use-starting-sequence-number', 'true') )"
    )


def test_merge_upsert_plan_mode_records_fence(be, spark):
    batch = spark.createDataFrame(
        [("r", "p", "c", "py", "x", 1, "I")],
        "repo string, path string, commit string, lang string, content string, "
        "_seq long, _op string",
    )
    be.merge_upsert(batch, fence=("p1", 0))
    assert any(s.startswith("MERGE INTO lake.db.code") for s in be.sql_log)
    assert be.last_epoch("p1") == 0


def test_both_backends_satisfy_protocol(spark, tmp_path):
    """The seam itself: CdcPipeline depends on TableBackend; both backends
    must be structural instances of it."""
    local = LakeTable.create(spark, str(tmp_path / "t"), FIELDS)
    berg = IcebergBackend(spark, "lake.db.code").create(FIELDS)
    assert isinstance(local, TableBackend)
    assert isinstance(berg, TableBackend)


def test_pipeline_epoch_body_over_iceberg_backend(spark, tmp_path):
    """The seam CLOSED (round-2 item 1): the SAME CdcPipeline epoch body —
    validate → compact → evolve → merge → fence — runs end-to-end against
    an injected IcebergBackend, consuming only the TableBackend protocol.
    Plan mode pins the exact per-epoch statement sequence a cluster
    deployment issues: [create once] → evolve (when needed) → MERGE INTO →
    fence; re-delivery of a fenced epoch issues NOTHING."""
    from pyspark.sql import functions as F

    from foundry_es_spark.fixtures import gen_change_events
    from foundry_es_spark.plans import CdcPipeline, PipelineConfig

    be = IcebergBackend(spark, "lake.db.cdc", n_buckets=8)
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            pipeline_id="ice", table_dir=str(tmp_path / "sys"), n_buckets=8,
            backend=be, normalize=False,
        ),
    )
    ev = gen_change_events(spark, n_events=500, n_keys=100)

    res = pipe.apply_epoch(ev, 0)
    assert res["skipped"] is False and res["n_events"] == 500

    # epoch 0 statement sequence: create DDL (first touch), identifier
    # fields, MERGE INTO, fence — in that exact order, nothing else
    assert len(be.sql_log) == 4, be.sql_log
    assert be.sql_log[0].startswith("CREATE TABLE IF NOT EXISTS lake.db.cdc")
    assert be.sql_log[1] == "ALTER TABLE lake.db.cdc SET IDENTIFIER FIELDS repo, path"
    assert be.sql_log[2] == (
        "MERGE INTO lake.db.cdc t USING graft_merge_src s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND s._seq > t._seq AND s._op = 'D' THEN DELETE "
        "WHEN MATCHED AND s._seq > t._seq THEN UPDATE SET "
        "t.repo = s.repo, t.path = s.path, t.commit = s.commit, t.lang = s.lang, "
        "t.content = s.content, t._seq = s._seq, t._op = s._op "
        "WHEN NOT MATCHED AND s._op != 'D' THEN INSERT "
        "(repo, path, commit, lang, content, _seq, _op) VALUES "
        "(s.repo, s.path, s.commit, s.lang, s.content, s._seq, s._op)"
    )
    assert be.sql_log[3] == (
        "ALTER TABLE lake.db.cdc SET TBLPROPERTIES ('graft.fence.ice' = '0')"
    )

    # epoch 1 carries a new payload column: evolve → MERGE (now with the
    # column) → fence
    n0 = len(be.sql_log)
    evolved = ev.withColumn("n_stars", F.lit(5))
    res1 = pipe.apply_epoch(evolved, 1)
    assert res1["skipped"] is False
    seq = be.sql_log[n0:]
    assert seq[0] == "ALTER TABLE lake.db.cdc ADD COLUMN n_stars INT"
    assert "t.n_stars = s.n_stars" in seq[1] and seq[1].startswith("MERGE INTO")
    assert seq[2] == (
        "ALTER TABLE lake.db.cdc SET TBLPROPERTIES ('graft.fence.ice' = '1')"
    )
    assert len(seq) == 3

    # C5 over the protocol: re-delivering a fenced epoch is a full no-op
    n1 = len(be.sql_log)
    assert pipe.apply_epoch(ev, 0)["skipped"] is True
    assert pipe.apply_epoch(evolved, 1)["skipped"] is True
    assert len(be.sql_log) == n1
    assert be.last_epoch("ice") == 1


def test_drop_column_golden(be):
    be.add_column("n_stars", "int")
    be.drop_column("n_stars")
    assert be.sql_log[-1] == "ALTER TABLE lake.db.code DROP COLUMN n_stars"
    assert "n_stars" not in [f.name for f in be.schema_fields()]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        be.drop_column("repo")


def test_maintenance_golden(be):
    assert be.expire_snapshots_sql(3) == (
        "CALL lake.system.expire_snapshots(table => 'db.code', retain_last => 3)"
    )
    assert be.vacuum_sql() == (
        "CALL lake.system.remove_orphan_files(table => 'db.code')"
    )
    # cluster twin of LakeTable.rollback (metadata-only restore)
    assert be.rollback_sql(987654321) == (
        "CALL lake.system.rollback_to_snapshot("
        "table => 'db.code', snapshot_id => 987654321)"
    )
    n0 = len(be.sql_log)
    be.vacuum(keep_snapshots=2)  # expire to 3 retained + orphan sweep
    assert be.sql_log[n0:] == [
        "CALL lake.system.expire_snapshots(table => 'db.code', retain_last => 3)",
        "CALL lake.system.remove_orphan_files(table => 'db.code')",
    ]


def test_time_travel_and_changelog_golden(be):
    assert be.read_at_version_sql(123456789) == (
        "SELECT repo, path, commit, lang, content FROM lake.db.code "
        "VERSION AS OF 123456789"
    )
    assert be.read_at_version_sql("2026-08-17 00:00:00") == (
        "SELECT repo, path, commit, lang, content FROM lake.db.code "
        "TIMESTAMP AS OF '2026-08-17 00:00:00'"
    )
    assert be.table_changes_sql(100, 200) == (
        "CALL lake.system.create_changelog_view(table => 'db.code', "
        "options => map('start-snapshot-id', '100', 'end-snapshot-id', '200'), "
        "changelog_view => 'graft_changes')"
    )
    # plan mode records the statements without executing
    be.read_at_version(1)
    be.table_changes(1)
    assert any("VERSION AS OF 1" in s for s in be.sql_log)
    assert any("create_changelog_view" in s for s in be.sql_log)


def test_patch_pipeline_dispatches_patch_merge(spark):
    """A patch-enabled pipeline must flip the backend into patch-mode MERGE:
    the plain statement would null-clobber matched rows from sparse 'P'
    sources and insert orphan patches (violating the orphan-no-op rule)."""
    from foundry_es_spark.plans import CdcPipeline, PipelineConfig

    be = IcebergBackend(spark, "lake.db.patchy", n_buckets=8)
    pipe = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="pp", table_dir="", backend=be,
                       normalize=False, patch_ops=True, patch_resolve="merge"),
    )
    assert pipe.ensure_table() is be and be.patch_mode is True
    be.merge_upsert(None)  # plan mode: no source view needed
    stmt = be.sql_log[-1]
    assert "coalesce(s.repo, t.repo)" not in stmt  # keys never coalesce
    assert "CASE WHEN s._op = 'P' THEN coalesce(s.commit, t.commit)" in stmt
    assert "WHEN NOT MATCHED AND s._op NOT IN ('D', 'P')" in stmt

    # without patch_ops the plain statement is kept
    be2 = IcebergBackend(spark, "lake.db.plain", n_buckets=8)
    CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="pl", table_dir="", backend=be2,
                       normalize=False),
    ).ensure_table()
    assert be2.patch_mode is False
    be2.merge_upsert(None)
    assert "WHEN NOT MATCHED AND s._op != 'D'" in be2.sql_log[-1]


def test_source_spec_iceberg_parity_with_hand_wired(spark, tmp_path):
    """VERDICT r4 item 4: a JSON harvest description whose pipeline block
    declares an Iceberg backend must produce EXACTLY the statement stream
    (CREATE → IDENTIFIER FIELDS → per-epoch MERGE INTO → fence, …) the
    hand-wired CdcPipeline issues over the same events — the config layer
    adds no execution path of its own."""
    from foundry_es_spark.fixtures import doc_change_events, write_event_log
    from foundry_es_spark.plans import CdcPipeline, PipelineConfig
    from foundry_es_spark.spec import SourceSpec, run_source

    sf_dir = "/root/testdata/sf0.001"
    fqtn = "lake.db.cdcspec"

    # ---- config-driven: the spec names its Iceberg table in JSON
    spec = SourceSpec(
        source_id="ice_src",
        ingest={"method": "doc_changes", "sf_dir": sf_dir,
                "epoch_size": 800, "parts": 4},
        workflow=["normalize"],
        pipeline={"n_buckets": 8, "backend": {"type": "iceberg", "table": fqtn}},
    )
    pipe_cfg = run_source(spark, spec, str(tmp_path / "w_cfg"))
    cfg_log = list(pipe_cfg.table.sql_log)
    assert any(s.startswith("MERGE INTO") for s in cfg_log)
    assert cfg_log[0].startswith(f"CREATE TABLE IF NOT EXISTS {fqtn}")

    # ---- hand-wired twin: same events, same config, no spec layer
    from pyspark.sql import functions as F

    be = IcebergBackend(spark, fqtn, n_buckets=8)
    events = doc_change_events(spark, sf_dir).withColumn(
        "part", F.pmod(F.xxhash64("repo"), F.lit(4))
    )
    write_event_log(events, str(tmp_path / "events_hand"), epoch_size=800)
    hand = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="ice_src", table_dir=str(tmp_path / "w_hand"),
                       n_buckets=8, normalize=True, backend=be),
    )
    hand.replay_event_dir(str(tmp_path / "events_hand"))
    assert list(be.sql_log) == cfg_log, "config layer must add/alter nothing"

    # exactly-once through the spec layer: the SAME pipeline re-replaying
    # its event dir finds every epoch fenced and issues NOTHING
    n = len(pipe_cfg.table.sql_log)
    pipe_cfg.replay_event_dir(str(tmp_path / "w_cfg" / "events"))
    assert len(pipe_cfg.table.sql_log) == n


def test_source_spec_backend_validation():
    from foundry_es_spark.spec import SourceSpec
    from foundry_es_spark.spec.mapping import MappingError
    import pytest as _pytest

    base = dict(
        source_id="x",
        ingest={"method": "doc_changes", "sf_dir": "/tmp"},
    )
    for bad in (
        {"type": "hive", "table": "a.b.c"},
        {"type": "iceberg"},
        {"type": "iceberg", "table": "a.b.c", "bogus": 1},
        "iceberg",
    ):
        spec = SourceSpec(**base, pipeline={"backend": bad})
        from foundry_es_spark.spec.source import build_pipeline

        with _pytest.raises(MappingError):
            build_pipeline(None, spec, table_dir="/tmp/t")


# --------------------------------------------------------------- OCC twins
# VERDICT r3 item 5: one golden per tests/test_concurrent.py scenario —
# the exact statement/exception sequence the Iceberg path produces under
# the same race the local backend's _publish loop is tested against.
# No jar exists locally, so a scripted catalog stands in: it serves SHOW
# TBLPROPERTIES from the backend's shadow state and raises Iceberg-NAMED
# stand-in exceptions (the _run layer classifies by exception name because
# live clusters surface them Py4J-wrapped, with no importable class).

from types import SimpleNamespace  # noqa: E402

from foundry_es_spark.lake import log as commitlog  # noqa: E402


class CommitFailedException(Exception):
    """Stand-in: catalog CAS lost after Iceberg's internal retry budget."""


class CommitStateUnknownException(Exception):
    """Stand-in: commit outcome unknown (e.g. catalog timeout mid-swap)."""


class ValidationException(Exception):
    """Stand-in: serializable isolation found conflicting files."""


def _scripted_catalog(be, failures=()):
    """Flip ``be`` into execute mode against a scripted catalog. Each
    (substring, exception) in ``failures`` is consumed by the FIRST
    statement containing the substring; everything else succeeds."""
    fails = list(failures)
    executed: list[str] = []

    def _exec(sql):
        executed.append(sql)
        if sql.startswith("SHOW TBLPROPERTIES"):
            return SimpleNamespace(
                collect=lambda: [{"key": k, "value": v} for k, v in be._props.items()]
            )
        for i, (sub, exc) in enumerate(fails):
            if sub in sql:
                fails.pop(i)
                raise exc
        return None

    be._execute = _exec
    be.execute = True
    return executed


def _src(spark):
    return spark.createDataFrame(
        [("r", "p", "c", "py", "x", 1, "I")],
        "repo string, path string, commit string, lang string, content string, "
        "_seq long, _op string",
    )


def test_occ_lost_commit_reissues_merge(be, spark):
    """Twin of test_two_append_writers_interleave: writer A's MERGE loses
    the catalog CAS to writer B (CommitFailedException after Iceberg's own
    commit.retry), then hits an unknown-outcome commit — both are
    re-issued verbatim, safe because every branch is seq-conditional, and
    the epoch lands exactly once with its fence advanced after."""
    executed = _scripted_catalog(be, [
        ("MERGE INTO", CommitFailedException("CAS lost to writer B")),
        ("MERGE INTO", CommitStateUnknownException("catalog timeout")),
    ])
    be.merge_upsert(_src(spark), fence=("A", 0))
    merges = [s for s in executed if s.startswith("MERGE INTO")]
    assert len(merges) == 3 and len(set(merges)) == 1  # re-issued verbatim
    assert be.last_epoch("A") == 0
    # the fence SET came after the LAST (successful) merge attempt
    assert executed.index([s for s in executed if "graft.fence.A" in s][0]) > \
        executed.index(merges[-1])


def test_occ_retry_budget_exhausted_surfaces_conflict(be, spark):
    """A CAS that never wins within the driver budget surfaces as
    ConcurrentWriteConflict (caller re-plans), never as a silent drop —
    and the fence is NOT advanced."""
    be.commit_retries = 2
    _scripted_catalog(be, [
        ("MERGE INTO", CommitFailedException(f"lost {i}")) for i in range(3)
    ])
    with pytest.raises(commitlog.ConcurrentWriteConflict):
        be.merge_upsert(_src(spark), fence=("A", 0))
    assert sum(s.startswith("MERGE INTO") for s in be.sql_log) == 3  # 1 + 2 retries
    assert be.last_epoch("A") == -1


def test_occ_cow_merge_conflict_detected(be, spark):
    """Twin of test_cow_merge_conflict_detected: serializable validation
    rejects the MERGE whose read set a concurrent append invalidated.
    Surfaces as ConcurrentWriteConflict with the fence untouched; the
    caller's re-run (which re-reads the new snapshot) succeeds and fences."""
    _scripted_catalog(be, [("MERGE INTO", ValidationException("conflicting files"))])
    with pytest.raises(commitlog.ConcurrentWriteConflict):
        be.merge_upsert(_src(spark), fence=("A", 0))
    assert be.last_epoch("A") == -1
    be.merge_upsert(_src(spark), fence=("A", 0))  # the re-plan
    assert be.last_epoch("A") == 0


def test_occ_zombie_epoch_aborts_before_merge(be, spark):
    """Twin of test_duplicate_epoch_from_second_writer_is_rejected: when
    another writer already fenced this (pipeline, epoch), the zombie
    driver must issue NOTHING — EpochAlreadyFenced, no MERGE statement."""
    executed = _scripted_catalog(be)
    be.fence_epoch_only("A", 0)  # "the other driver" won
    n = len(be.sql_log)
    with pytest.raises(commitlog.EpochAlreadyFenced):
        be.merge_upsert(_src(spark), fence=("A", 0))
    assert len(be.sql_log) == n  # zero statements from the zombie
    assert not any(s.startswith("MERGE INTO") for s in executed)
    # the next epoch from a healthy writer proceeds normally
    be.merge_upsert(_src(spark), fence=("A", 1))
    assert be.last_epoch("A") == 1


def test_occ_fence_is_monotonic(be):
    """A racing writer that fenced a LATER epoch must not be regressed by
    our lower fence advance (same rule as the local fences' max_epoch)."""
    _scripted_catalog(be)
    be.fence_epoch_only("A", 5)
    n = len(be.sql_log)  # sql_log records issued statements (not the SHOW probes)
    be.fence_epoch_only("A", 3)  # stale writer: no statement, no regress
    assert len(be.sql_log) == n and be.last_epoch("A") == 5
    be.fence_epoch_only("A", 6)
    assert be.last_epoch("A") == 6
    # pipelines' fence keys are disjoint properties — B never clobbers A
    be.fence_epoch_only("B", 0)
    assert be.last_epoch("A") == 6 and be.last_epoch("B") == 0


def test_occ_fence_retry_rechecks_monotonicity(be):
    """ADVICE r4 (medium): a fence SET that loses its first CAS attempt
    must re-check last_epoch before every RE-issue — when a concurrent
    writer fenced a LATER epoch of the same pipeline between attempts,
    replaying the lower SET verbatim would regress the fence and reopen
    the later epoch for double-apply."""
    _scripted_catalog(be)
    orig_exec = be._execute
    state = {"raced": False}

    def _exec(sql):
        if "graft.fence.A" in sql and not state["raced"]:
            state["raced"] = True
            # the racing writer lands epoch 5 while our SET('3') is in
            # flight; our CAS loses
            be._props["graft.fence.A"] = "5"
            raise CommitFailedException("CAS lost to the racing fence")
        return orig_exec(sql)

    be._execute = _exec
    be.fence_epoch_only("A", 3)  # must NOT regress 5 → 3 on retry
    sets = [s for s in be.sql_log if "graft.fence.A" in s]
    assert len(sets) == 1, "the stale SET must not be re-issued"
    assert be.last_epoch("A") == 5, "the racing writer's later fence stands"
    # and a genuinely newer fence still advances normally afterwards
    be.fence_epoch_only("A", 6)
    assert be.last_epoch("A") == 6


def test_occ_classification_by_exception_name(be, spark):
    """ADVICE r4: classification matches the exception's class-name
    surface, not its full repr — a retry-safe CommitFailedException whose
    caused-by chain mentions ValidationException (as Py4J stack traces
    do) must be RETRIED, not surfaced as a conflict."""
    _scripted_catalog(be, [(
        "MERGE INTO",
        CommitFailedException(
            "metadata swap lost\n"
            "Caused by: org.apache.iceberg.exceptions.ValidationException: "
            "found conflicting files (nested, must not trigger conflict path)"
        ),
    )])
    be.merge_upsert(_src(spark), fence=("A", 0))  # retried, then lands
    assert sum(s.startswith("MERGE INTO") for s in be.sql_log) == 2
    assert be.last_epoch("A") == 0


def test_occ_compaction_conflict_replans(be):
    """Twin of test_ingest_races_compaction (maintenance side): a rewrite
    whose input files moved fails validation -> ConcurrentWriteConflict,
    which run_maintain's --concurrent step skips and retries next tick.
    The retry (fresh plan over current files) succeeds."""
    _scripted_catalog(be, [("rewrite_data_files", ValidationException("files moved"))])
    with pytest.raises(commitlog.ConcurrentWriteConflict):
        be.compact_buckets([1, 2])
    be.compact_buckets([1, 2])  # next cron tick
    assert sum("rewrite_data_files" in s for s in be.sql_log) == 2


def test_occ_vacuum_grace_window_golden(be):
    """Twin of test_vacuum_spares_inflight_but_reclaims_stale: the orphan
    sweep carries an older_than grace timestamp so a LIVE writer's not-yet-
    committed files survive; stale (crashed-writer) debris older than the
    grace is reclaimed by the same call."""
    assert be.vacuum_sql(older_than="2026-08-19 00:00:00") == (
        "CALL lake.system.remove_orphan_files(table => 'db.code', "
        "older_than => TIMESTAMP '2026-08-19 00:00:00')"
    )
    n0 = len(be.sql_log)
    be.vacuum(keep_snapshots=2, older_than="2026-08-19 00:00:00")
    assert be.sql_log[n0:] == [
        "CALL lake.system.expire_snapshots(table => 'db.code', retain_last => 3)",
        "CALL lake.system.remove_orphan_files(table => 'db.code', "
        "older_than => TIMESTAMP '2026-08-19 00:00:00')",
    ]
