"""LocalLakeBackend unit tests: create/merge/tombstone/fence/evolution."""

import pytest
from pyspark.sql import functions as F

from foundry_es_spark.lake import LakeTable

FIELDS = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, "
        "_seq long, _op string",
    )


def test_create_and_empty_read(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    assert t.read().count() == 0
    assert [f.name for f in t.spark_schema().fields] == [f[0] for f in FIELDS]


def test_merge_insert_update_delete(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I"),
                                  ("r2", "b", "c0", "py", "x0", 1, "I")]))
    t.merge_upsert(_batch(spark, [("r1", "a", "c1", "py", "v1", 2, "U"),
                                  ("r2", "b", None, None, None, 3, "D")]))
    rows = {(r.repo, r.path): r for r in t.read().collect()}
    assert set(rows) == {("r1", "a")}
    assert rows[("r1", "a")].content == "v1"
    # tombstone retained internally
    assert t.read_internal().where(F.col("_op") == "D").count() == 1


def test_merge_is_seq_conditional(spark, tmp_table):
    """Stale events (lower seq) must not overwrite newer state; equal seq
    re-delivery is a no-op (target wins ties)."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c5", "py", "v5", 5, "U")]))
    t.merge_upsert(_batch(spark, [("r1", "a", "c3", "py", "v3", 3, "U")]))  # stale
    t.merge_upsert(_batch(spark, [("r1", "a", "cX", "py", "vX", 5, "U")]))  # dup seq
    row = t.read().collect()[0]
    assert row.content == "v5" and row.commit == "c5"


def test_epoch_fence(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I")]), fence=("p1", 0))
    assert t.is_epoch_committed("p1", 0)
    assert not t.is_epoch_committed("p1", 1)
    assert t.last_epoch("p1") == 0
    # out-of-order epochs collapse once the gap closes
    t.merge_upsert(_batch(spark, [("r1", "a", "c2", "py", "v2", 2, "U")]), fence=("p1", 2))
    assert t.last_epoch("p1") == 0 and t.is_epoch_committed("p1", 2)
    t.merge_upsert(_batch(spark, [("r1", "a", "c1", "py", "v1", 1, "U")]), fence=("p1", 1))
    assert t.last_epoch("p1") == 2


def test_schema_evolution_add_rename_widen(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I")]))
    t.add_column("meta_license", "string")
    t.add_column("n_stars", "int")
    # old files project nulls for the new columns
    row = t.read().collect()[0]
    assert row.meta_license is None and row.n_stars is None
    # write under the new schema
    b = spark.createDataFrame(
        [("r2", "b", "c0", "py", "x0", "mit", 10, 1, "I")],
        "repo string, path string, commit string, lang string, content string, "
        "meta_license string, n_stars int, _seq long, _op string",
    )
    t.merge_upsert(b)
    t.rename_column("meta_license", "license")
    t.widen_column("n_stars", "bigint")
    rows = {r.repo: r for r in t.read().collect()}
    assert rows["r2"].license == "mit" and rows["r2"].n_stars == 10
    assert rows["r1"].license is None
    assert dict(t.read().dtypes)["n_stars"] == "bigint"
    with pytest.raises(ValueError):
        t.widen_column("n_stars", "int")  # narrowing is illegal


def test_merge_rewrites_only_affected_buckets(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=8)
    big = _batch(
        spark,
        [(f"r{i}", "a", "c0", "py", f"v{i}", i, "I") for i in range(64)],
    )
    t.merge_upsert(big)
    stats = t.merge_upsert(_batch(spark, [("r1", "a", "c1", "py", "w", 100, "U")]))
    assert stats["buckets_rewritten"] == 1
    assert t.read().count() == 64


def test_selective_read_prunes_buckets(spark, tmp_table):
    """read(repos=...) is a bucket-pruned lookup: only the target repos'
    buckets' files are opened (driver-side file-list pruning), results are
    identical to a full read filtered — including through live delta
    generations and a schema add."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=8)
    base = _batch(
        spark,
        [(f"r{i}", f"p{j}", "c0", "py", f"v{i}.{j}", i * 10 + j, "I")
         for i in range(16) for j in range(3)],
    )
    t.merge_upsert(base)
    # live deltas on top (MoR path) + one delete
    t.append_delta(_batch(spark, [("r3", "p0", "c1", "py", "w3", 1000, "U"),
                                  ("r5", "p1", None, None, None, 1001, "D")]))
    t.add_column("n_stars", "int")

    rec = t._current()
    pruned = t._pruned_files(rec, ["r3", "r5"])
    assert 0 < len(pruned) < len(rec["files"]), "bucket pruning must drop files"

    got = {(r.repo, r.path, r.content) for r in t.read(repos=["r3", "r5"]).collect()}
    want = {
        (r.repo, r.path, r.content)
        for r in t.read().where(F.col("repo").isin("r3", "r5")).collect()
    }
    assert got == want
    assert ("r3", "p0", "w3") in got
    assert not any(r == "r5" and p == "p1" for r, p, _ in got)
    # internal read honors the same pruning and keeps the tombstone
    internal = t.read_internal(repos=["r5"])
    assert internal.where(F.col("_op") == "D").count() == 1


def test_selective_read_prunes_files_by_key_bounds(spark, tmp_table):
    """File-level pruning from recorded key bounds: with ONE bucket (bucket
    pruning useless by construction), a selective read still drops files
    whose [rmin, rmax] cannot contain the target repo — decided from commit
    metadata alone. Bounds are recorded by every write path (JVM writer,
    fused compaction writer)."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=1)
    t.merge_upsert(_batch(spark, [("aaa", f"p{j}", "c0", "py", f"a{j}", j, "I")
                                  for j in range(3)]))
    t.append_delta(_batch(spark, [("zzz", f"p{j}", "c0", "py", f"z{j}", 100 + j, "I")
                                  for j in range(3)]))
    rec = t._current()
    assert all(f.get("rmin") and f.get("rmax") for f in rec["files"]), \
        "every writer must record file key bounds"
    only_a = t._pruned_files(rec, ["aaa"])
    only_z = t._pruned_files(rec, ["zzz"])
    assert len(only_a) == 1 and only_a[0]["rmax"] == "aaa"
    assert len(only_z) == 1 and only_z[0]["rmin"] == "zzz"
    # results identical to the unpruned read, through the MoR merge
    assert {r.content for r in t.read(repos=["aaa"]).collect()} == {"a0", "a1", "a2"}
    assert {r.content for r in t.read(repos=["zzz"]).collect()} == {"z0", "z1", "z2"}
    # fused compaction writer records bounds too
    t.compact_buckets([0])
    rec2 = t._current()
    assert all(f.get("rmin") == "aaa" and f.get("rmax") == "zzz" for f in rec2["files"])
    assert {r.content for r in t.read(repos=["zzz"]).collect()} == {"z0", "z1", "z2"}


def test_selective_read_prunes_files_by_key_fingerprints(spark, tmp_table):
    """Key-fingerprint pruning (lake/kfp.py) catches what bounds can't:
    ONE bucket, and every delta file spans [aaa, zzz] — so range pruning
    keeps ALL files for any probe — yet each file holds only its own two
    repos, so the fingerprint set isolates exactly the files that can
    contain the probed key. Every writer path records kfp; a probe for a
    repo in NO file prunes everything without opening one."""
    from foundry_es_spark.lake.kfp import key_fingerprint, kfp_probe

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=1)
    # JVM writer path (merge_upsert -> _write_bucket_data)
    t.merge_upsert(_batch(spark, [("aaa", "p", "c0", "py", "a0", 0, "I"),
                                  ("zzz", "p", "c0", "py", "z0", 1, "I")]))
    # JVM delta path: file spans aaa..zzz but holds neither "mmm" nor "qqq"
    t.append_delta(_batch(spark, [("aab", "p", "c0", "py", "b0", 2, "I"),
                                  ("zzy", "p", "c0", "py", "y0", 3, "I")]))
    # another wide-span delta with different keys
    t.append_delta(_batch(spark, [("aac", "p", "c0", "py", "c0", 4, "I"),
                                  ("zzx", "p", "c0", "py", "x0", 5, "I")]))
    rec = t._current()
    assert all(f.get("kfp") for f in rec["files"]), \
        "every writer must record key fingerprints"
    # bounds alone keep all 3 files for any aab..zzy probe; kfp isolates 1
    assert len(t._pruned_files(rec, ["aab"])) == 1
    assert len(t._pruned_files(rec, ["zzx"])) == 1
    # a key in no file prunes everything driver-side
    assert t._pruned_files(rec, ["mmm"]) == []
    assert t.read(repos=["mmm"]).count() == 0
    # correctness through the MoR merge is unchanged
    assert {r.content for r in t.read(repos=["aab"]).collect()} == {"b0"}
    assert {r.content for r in t.read(repos=["zzx", "aaa"]).collect()} == {"x0", "a0"}
    # fused compaction writer records kfp too (under cap here), and a
    # recorded fingerprint always matches its own key (no false negatives)
    t.compact_buckets([0])
    rec2 = t._current()
    assert all(f.get("kfp") for f in rec2["files"])
    for repo in ("aaa", "aab", "aac", "zzx", "zzy", "zzz"):
        assert kfp_probe(rec2["files"][0]["kfp"], {key_fingerprint(repo)})
    assert {r.content for r in t.read(repos=["zzx"]).collect()} == {"x0"}


def test_time_travel_and_change_feed(spark, tmp_table):
    """read_at_version reproduces historical state; table_changes yields
    the per-commit change rows (MoR delta files) projected to the current
    schema, and compaction — a physical rewrite — adds nothing to the
    feed."""
    from foundry_es_spark.lake import log as commitlog

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.append_delta(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I"),
                                  ("r2", "b", "c0", "py", "x0", 1, "I")]))
    v1 = commitlog.current_version(tmp_table)
    t.append_delta(_batch(spark, [("r1", "a", "c1", "py", "v1", 2, "U"),
                                  ("r2", "b", None, None, None, 3, "D")]))

    # time travel: both rows live at v1; only r1/a live now
    at1 = {(r.repo, r.content) for r in t.read_at_version(v1).collect()}
    assert at1 == {("r1", "v0"), ("r2", "x0")}
    assert {(r.repo, r.content) for r in t.read().collect()} == {("r1", "v1")}

    # change feed: all four change rows, ops and commit versions intact
    feed = t.table_changes().collect()
    assert len(feed) == 4
    assert {(r.repo, r.path, r._op, r._commit_version) for r in feed} == {
        ("r1", "a", "I", v1), ("r2", "b", "I", v1),
        ("r1", "a", "U", v1 + 1), ("r2", "b", "D", v1 + 1),
    }
    # bounded feed
    assert len(t.table_changes(from_version=v1 + 1).collect()) == 2

    # schema evolution mid-feed: old rows project null through field ids
    t.add_column("n_stars", "int")
    b3 = spark.createDataFrame(
        [("r3", "c", "c0", "py", "z0", 10, 7, "I")],
        "repo string, path string, commit string, lang string, content string, "
        "n_stars int, _seq long, _op string",
    )
    t.append_delta(b3.select("repo", "path", "commit", "lang", "content",
                             "n_stars", "_seq", "_op"))
    feed2 = t.table_changes()
    assert "n_stars" in feed2.columns
    stars = {r.repo: r.n_stars for r in feed2.collect()}
    assert stars["r3"] == 10 and stars["r1"] is None

    # compaction is invisible to the feed (physical, not logical)
    n_before = t.table_changes().count()
    t.compact()
    assert t.table_changes().count() == n_before


def test_compact_and_vacuum(spark, tmp_table):
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    for i in range(3):
        t.merge_upsert(_batch(spark, [(f"r{i}", "a", "c0", "py", f"v{i}", i, "I")]))
    before = t.read().count()
    t.compact()
    removed = t.vacuum()
    assert t.read().count() == before
    assert removed >= 1


def test_export_snapshot_manifest_and_time_travel(spark, tmp_table, tmp_path):
    """export_snapshot publishes live rows as plain parquet + _MANIFEST
    (atomic rename, no half-published dir): plain spark.read gets exactly
    the table's live rows with no engine involved; the manifest row count
    and source version are exact; exporting an OLD version equals
    read_at_version; re-export over the same dir is idempotent."""
    import json
    import os

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I"),
                                  ("r2", "b", "c0", "py", "x0", 1, "I")]))
    v1 = t._current()["version"]
    t.merge_upsert(_batch(spark, [("r2", "b", None, None, None, 2, "D"),
                                  ("r3", "c", "c0", "py", "y0", 3, "I")]))

    out = str(tmp_path / "snap")
    stats = t.export_snapshot(out)
    got = sorted((r.repo, r.path, r.content) for r in spark.read.parquet(out).collect())
    assert got == sorted((r.repo, r.path, r.content) for r in t.read().collect())
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["rows"] == stats["rows"] == len(got) == 2  # tombstone excluded
    assert m["source_version"] == t._current()["version"]
    assert not os.path.isdir(out + "._staging")

    # time-travel export: pre-delete version still contains r2/b
    out_old = str(tmp_path / "snap_v1")
    t.export_snapshot(out_old, version=v1)
    old = {(r.repo, r.path) for r in spark.read.parquet(out_old).collect()}
    assert old == {("r1", "a"), ("r2", "b")}

    # idempotent overwrite
    stats2 = t.export_snapshot(out)
    assert stats2["rows"] == stats["rows"]


def test_purge_tombstones_respects_low_watermark(spark, tmp_table):
    """Tombstone GC: D rows at seq <= horizon are dropped by the fused
    compaction rewrite; newer tombstones survive (still needed against
    stale re-delivery), public reads are unchanged, the seq-conditional
    merge contract still holds for post-horizon traffic, and an
    all-tombstone bucket disappears from the file list entirely."""
    import os

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    # k1 deleted early (old tombstone), k2 deleted late (young tombstone),
    # k3 lives; k4 is an isolated key whose bucket holds ONLY a tombstone.
    t.merge_upsert(_batch(spark, [
        ("r1", "a", "c0", "py", "v0", 0, "I"),
        ("r1", "b", "c0", "py", "w0", 1, "I"),
        ("r2", "c", "c0", "py", "x0", 2, "I"),
        ("zz-solo", "d", "c0", "py", "y0", 3, "I"),
    ]))
    t.merge_upsert(_batch(spark, [
        ("r1", "a", None, None, None, 10, "D"),
        ("zz-solo", "d", None, None, None, 11, "D"),
    ]))
    t.merge_upsert(_batch(spark, [("r1", "b", None, None, None, 50, "D")]))
    before = sorted((r.repo, r.path) for r in t.read().collect())
    assert t.read_internal().where(F.col("_op") == "D").count() == 3

    stats = t.purge_tombstones(horizon_seq=20)
    assert stats["buckets_rewritten"] >= 1
    # old tombstones (seq 10, 11) gone; young one (seq 50) retained
    d = {(r.repo, r.path): r._seq
         for r in t.read_internal().where(F.col("_op") == "D").collect()}
    assert d == {("r1", "b"): 50}
    assert sorted((r.repo, r.path) for r in t.read().collect()) == before

    # the purge is a normal commit: vacuum reclaims the pre-GC files and
    # the table stays consistent
    t.vacuum(keep_snapshots=0)
    assert sorted((r.repo, r.path) for r in t.read().collect()) == before

    # post-horizon traffic still merges seq-conditionally: a NEW event on
    # the purged key wins as a legitimate insert
    t.merge_upsert(_batch(spark, [("r1", "a", "c9", "py", "v9", 99, "I")]))
    rows = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert rows[("r1", "a")] == "v9"

    # a bucket holding only purged tombstones vanished from the snapshot
    live_buckets = {f["bucket"] for f in t._current()["files"]}
    from foundry_es_spark.lake.table import bucket_expr
    solo_b = (
        _batch(spark, [("zz-solo", "d", None, None, None, 0, "I")])
        .select(bucket_expr(4).alias("b")).collect()[0]["b"]
    )
    r1_b = (
        _batch(spark, [("r1", "a", None, None, None, 0, "I")])
        .select(bucket_expr(4).alias("b")).collect()[0]["b"]
    )
    if solo_b != r1_b:  # fixture keys may hash-collide into one bucket
        assert solo_b not in live_buckets


def test_vacuum_removes_attempt_debris_in_live_dirs(spark, tmp_table):
    """Round-2 review: lost speculative/retried fused-sink attempts leave
    part-*-a{attempt} files inside COMMITTED version dirs; dir-level vacuum
    never reclaimed them. Vacuum must delete unreferenced files within
    referenced dirs while leaving every snapshot-referenced file alone."""
    import os

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    for i in range(3):
        t.merge_upsert(_batch(spark, [(f"r{i}", "a", "c0", "py", f"v{i}", i, "I")]))
    before = sorted((r.repo, r.content) for r in t.read().collect())

    # plant debris: a fake lost-attempt file beside a live one, plus an
    # empty orphan bucket dir
    rec = t._current()
    live = os.path.join(t.table_dir, rec["files"][0]["path"])
    debris = os.path.join(os.path.dirname(live), "part-00099-a7.parquet")
    with open(debris, "wb") as fh:
        fh.write(b"not really parquet")
    orphan_dir = os.path.join(os.path.dirname(os.path.dirname(live)), "bkt=99")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000-a3.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")

    removed = t.vacuum()
    assert removed >= 2
    assert not os.path.exists(debris)
    assert not os.path.exists(orphan)
    assert os.path.exists(live)
    assert sorted((r.repo, r.content) for r in t.read().collect()) == before


def test_drop_column_and_no_resurrection_on_readd(spark, tmp_table):
    """DROP COLUMN removes the field from the current schema; re-adding the
    same NAME mints a new field id, so pre-drop values never resurrect
    (Iceberg id-not-name projection)."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I"),
                                  ("r2", "b", "c0", "scala", "x0", 1, "I")]))
    t.drop_column("lang")
    assert "lang" not in [f.name for f in t.spark_schema().fields]
    assert {tuple(r) for r in t.read().select("repo", "path", "content").collect()} == {
        ("r1", "a", "v0"), ("r2", "b", "x0")
    }
    t.add_column("lang", "string")
    rows = {r.repo: r.lang for r in t.read().collect()}
    assert rows == {"r1": None, "r2": None}, "old lang values must NOT come back"
    # new writes populate the re-added column; old rows stay null
    t.merge_upsert(
        spark.createDataFrame(
            [("r1", "a", "c1", "v1", "rust", 5, "U")],
            "repo string, path string, commit string, content string, "
            "lang string, _seq long, _op string",
        )
    )
    rows = {r.repo: r.lang for r in t.read().collect()}
    assert rows == {"r1": "rust", "r2": None}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.drop_column("repo")


def test_rebucket_full_rewrite(spark, tmp_table):
    """Partition-spec evolution: rebucket() rewrites into a new bucket
    count in one commit; rows, tombstones, fences, and selective reads are
    preserved, and subsequent merges use the new layout."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.merge_upsert(
        _batch(spark, [(f"r{i}", f"p{j}", "c0", "py", f"v{i}.{j}", i * 10 + j, "I")
                       for i in range(12) for j in range(2)]),
        fence=("pipe", 0),
    )
    t.append_delta(_batch(spark, [("r3", "p0", "c1", "py", "w3", 1000, "U"),
                                  ("r5", "p1", None, None, None, 1001, "D")]))
    before = sorted(tuple(r) for r in t.read().collect())

    stats = t.rebucket(8)
    assert stats["n_buckets"] == 8
    rec = t._current()
    assert rec["n_buckets"] == 8
    assert not any(f.get("delta") for f in rec["files"])  # one base generation
    assert max(f["bucket"] for f in rec["files"]) >= 2  # actually spread wider
    assert sorted(tuple(r) for r in t.read().collect()) == before
    assert t.is_epoch_committed("pipe", 0)  # fences survive

    # tombstone survived the rewrite: re-delivering the dead event loses
    t.merge_upsert(_batch(spark, [("r5", "p1", "c9", "py", "zombie", 900, "U")]))
    assert t.read().where("repo = 'r5' AND path = 'p1'").count() == 0
    # selective read correct in the new layout
    got = sorted(tuple(r) for r in t.read(repos=["r3"]).collect())
    want = sorted(
        tuple(r) for r in t.read().where(F.col("repo") == "r3").collect()
    )
    assert got == want and len(got) == 2


def test_expire_snapshots_and_retained_vacuum(spark, tmp_table):
    """expire_snapshots bounds the commit log; vacuum(keep_snapshots=k)
    keeps the retained snapshots readable; expired access raises
    SnapshotExpired instead of silently skipping history."""
    import pytest as _pytest

    from foundry_es_spark.lake import log as commitlog
    from foundry_es_spark.lake.log import SnapshotExpired

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    for i in range(6):
        t.append_delta(_batch(spark, [("r1", f"p{i}", "c", "py", f"v{i}", i, "I")]))
    head = commitlog.current_version(tmp_table)
    assert head == 6

    removed = t.expire_snapshots(keep_last=3)  # retain versions 4..6
    assert removed == 4  # v0..v3 dropped
    assert commitlog.list_versions(tmp_table) == [4, 5, 6]
    assert commitlog.current_version(tmp_table) == 6

    # retained history still works end-to-end
    assert t.read().count() == 6
    assert t.read_at_version(5).count() == 5
    assert t.table_changes(from_version=5).count() == 2

    # below the floor: loud typed error, for time travel AND the feed
    with _pytest.raises(SnapshotExpired):
        t.read_at_version(2)
    with _pytest.raises(SnapshotExpired):
        t.table_changes(from_version=1).count()

    # vacuum keeping 2 prior snapshots: v4/v5 files survive, reads hold
    t.vacuum(keep_snapshots=2)
    assert t.read_at_version(4).count() == 4
    assert t.read().count() == 6
    # head-only vacuum then reclaims nothing extra here (all files are
    # deltas still referenced by the head snapshot)
    assert t.vacuum() == 0


def test_derived_full_recompute_when_cursor_expired(spark, tmp_table, tmp_path):
    """A derived cursor older than the source's retention window triggers
    the full-recompute fallback (never a silent skip)."""
    from pyspark.sql import functions as F2

    from foundry_es_spark.plans import DerivedConfig, DerivedTablePipeline

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.append_delta(_batch(spark, [("r1", "p0", "c", "py", "v0", 0, "I")]))
    d = DerivedTablePipeline(
        spark, t,
        DerivedConfig(name="x", derived_dir=str(tmp_path / "dx"), n_buckets=2),
        [F2.count("*").alias("n")],
    )
    assert d.refresh()["refreshed"]
    for i in range(1, 5):
        t.append_delta(_batch(spark, [("r2", f"p{i}", "c", "py", f"v{i}", i, "I")]))
    t.expire_snapshots(keep_last=1)  # cursor now below the floor
    stats = d.refresh()
    assert stats["refreshed"] and stats["mode"] == "full"
    got = {(r.repo, r.n) for r in d.read().collect()}
    assert got == {("r1", 1), ("r2", 4)}
    assert d.refresh()["refreshed"] is False


def test_change_feed_over_vacuumed_window_raises_typed(spark, tmp_table, tmp_path):
    """Regression (found by the lifecycle chaos property test): vacuum can
    reclaim a compacted-away delta dir while its commit record survives —
    a change feed over that window must raise SnapshotExpired at PLAN time
    (typed, catchable) instead of PATH_NOT_FOUND at execution, and the
    derived maintainer must recover via full recompute."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from foundry_es_spark.lake.log import SnapshotExpired
    from foundry_es_spark.plans import DerivedConfig, DerivedTablePipeline

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.append_delta(_batch(spark, [("r1", "p0", "c", "py", "v0", 0, "I")]))
    t.compact()   # delta now unreferenced by head
    t.vacuum()    # head-only retention: the delta's dir is reclaimed
    with _pytest.raises(SnapshotExpired):
        t.table_changes(from_version=0)
    # feed windows that only span surviving versions still work
    t.append_delta(_batch(spark, [("r2", "p1", "c", "py", "v1", 1, "I")]))
    assert t.table_changes(from_version=3).count() == 1

    d = DerivedTablePipeline(
        spark, t,
        DerivedConfig(name="v", derived_dir=str(tmp_path / "dv"), n_buckets=2),
        [F2.count("*").alias("n")],
    )
    stats = d.refresh()  # cursor -1 -> expired window -> full recompute
    assert stats["refreshed"] and stats["mode"] == "full"
    assert {(r.repo, r.n) for r in d.read().collect()} == {("r1", 1), ("r2", 1)}


def test_concurrent_writer_conflict(spark, tmp_table):
    """Optimistic concurrency: the raw log still rejects a double-commit
    of one version (the hard-link swap in lake/log.py is the atomicity
    point), while the WRITE paths now REBASE past a concurrent commit
    instead of dying — Iceberg fast-append semantics (this test asserted
    the old die-on-conflict behavior before the OCC layer)."""
    from foundry_es_spark.lake import log as commitlog

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=4)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I")]))
    rec = t._current()
    # writer A commits version v+1
    commitlog.write_commit(tmp_table, {**rec, "version": rec["version"] + 1})
    # writer B (stale view) tries the same raw version: log-level conflict
    with pytest.raises(commitlog.CommitConflict):
        commitlog.write_commit(tmp_table, {**rec, "version": rec["version"] + 1})
    # fused-sink commit races a metadata-only commit that steals its
    # provisional version: the OCC publish rebases onto the next slot
    version, rel = t.begin_delta_version()
    commitlog.write_commit(tmp_table, {**t._current(), "version": version})
    stats = t.commit_delta_files(version, [])
    assert stats["version"] == version + 1  # rebased, not failed
    # an append racing the same interleaving also rebases, with its data
    # dir renamed to the version it actually committed as
    v0 = t._current()["version"]
    commitlog.write_commit(tmp_table, {**t._current(), "version": v0 + 1})
    t.append_delta(_batch(spark, [("r9", "z", "c9", "py", "v9", 9, "I")]))
    rec2 = t._current()
    assert rec2["version"] == v0 + 2
    new = [f for f in rec2["files"] if f["path"].startswith(f"data/c{v0 + 2:08d}/")]
    assert new, "rebased append must land under its final commit's dir"
    assert t.read().count() == 2


def test_commit_log_costs_bounded(spark, tmp_table, monkeypatch):
    """VERDICT r2 item 7: at 10^4 epochs the per-epoch `os.listdir` in
    current_version and the ever-growing schemas dict were O(history)
    driver costs. current_version must resolve from the HEAD pointer
    without listing the log dir, and a commit record's schemas must track
    the LIVE table (current + file-referenced versions), not the full
    evolution history."""
    import json
    import os

    from foundry_es_spark.lake import log as commitlog

    # -- O(1) current_version over 10^4 synthetic versions (no Spark)
    d = os.path.join(tmp_table, "logonly")
    base = {"schema_version": 0, "schemas": {"0": []}, "files": []}
    for v in range(10_000):
        commitlog.write_commit(d, {**base, "version": v})
    real_listdir = os.listdir
    calls = {"log": 0}

    def counting_listdir(p=None):
        if p is not None and os.path.normpath(p) == os.path.normpath(
            commitlog.log_dir(d)
        ):
            calls["log"] += 1
        return real_listdir(p) if p is not None else real_listdir()

    monkeypatch.setattr(os, "listdir", counting_listdir)
    assert commitlog.current_version(d) == 9_999
    assert calls["log"] == 0, "HEAD pointer must avoid the O(n) listing"
    monkeypatch.undo()
    # corrupt HEAD falls back to the listing and still answers
    with open(os.path.join(commitlog.log_dir(d), "HEAD"), "w") as fh:
        fh.write("garbage")
    assert commitlog.current_version(d) == 9_999
    # lagging HEAD (crash between link and HEAD update) probes forward
    with open(os.path.join(commitlog.log_dir(d), "HEAD"), "w") as fh:
        fh.write("9995")
    assert commitlog.current_version(d) == 9_999

    # -- bounded record size: schema churn + compaction must not let dead
    #    schema versions ride forward in every subsequent commit
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=1)
    for i in range(6):
        t.add_column(f"extra_{i}", "int")
        t.append_delta(
            spark.createDataFrame(
                [("r0", "a", "c0", "py", f"v{i}", *[None] * (i + 1), i, "U")],
                "repo string, path string, commit string, lang string, "
                "content string, "
                + ", ".join(f"extra_{j} int" for j in range(i + 1))
                + ", _seq long, _op string",
            )
        )
    t.compact_buckets([0])  # rewrites every file at the current schema
    rec = json.load(
        open(
            os.path.join(
                commitlog.log_dir(tmp_table),
                f"v{t._current()['version']:08d}.json",
            )
        )
    )
    assert set(rec["schemas"]) == {str(rec["schema_version"])}, (
        "dead schema versions must be pruned once no live file needs them"
    )
    # live data and the change feed over pruned history both survive
    assert t.read().collect()[0]["content"] == "v5"
    feed = t.table_changes()
    assert feed.where(F.col("content") == "v0").count() == 1


def test_table_changes_plan_is_o_schema_versions(spark, tmp_table):
    """VERDICT r2 item 4: the change feed over ≥100 commit versions must
    build O(schema-versions) parquet scans — ONE multi-path scan per
    schema version, with _commit_version recovered from the file path —
    and return exactly the rows the per-version loop returned."""
    import re

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    n_versions = 110
    evolve_at = 60
    expected = {}
    for i in range(n_versions):
        if i == evolve_at:
            t.add_column("n_stars", "int")
        if i < evolve_at:
            b = _batch(spark, [(f"r{i}", "a", "c0", "py", f"v{i}", i, "I")])
        else:
            b = spark.createDataFrame(
                [(f"r{i}", "a", "c0", "py", f"v{i}", i, i, "I")],
                "repo string, path string, commit string, lang string, "
                "content string, n_stars int, _seq long, _op string",
            )
        t.append_delta(b)
        expected[f"r{i}"] = i

    assert t._current()["version"] >= n_versions
    feed = t.table_changes()

    # plan inspection: exactly 2 file scans (one per schema version),
    # although >=110 commits contributed files
    plan = feed._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
    assert scans == 2, (scans, plan)

    rows = feed.collect()
    assert len(rows) == n_versions
    # _commit_version recovered from the path equals the append order
    # (version k of the table was committed by append k+1 → strictly
    # increasing with i); spot-check monotonicity and the repo mapping
    by_repo = {r["repo"]: r for r in rows}
    assert set(by_repo) == set(expected)
    vers = [by_repo[f"r{i}"]["_commit_version"] for i in range(n_versions)]
    assert vers == sorted(vers) and len(set(vers)) == n_versions
    # old-schema rows project null n_stars; new-schema rows carry it
    assert by_repo["r10"]["n_stars"] is None
    assert by_repo[f"r{evolve_at}"]["n_stars"] == evolve_at
    # bounded feed still works on the path-derived version column
    tail = t.table_changes(from_version=int(vers[-1]))
    assert tail.count() == 1 and tail.collect()[0]["repo"] == f"r{n_versions-1}"


def test_rollback_restores_state_fences_and_reclaims(spark, tmp_table):
    """rollback(v) = Iceberg rollback_to_snapshot: metadata-only restore of
    data + schema + FENCES (so rollback-then-replay re-applies the undone
    epochs exactly-once), history retained for time travel, undone files
    reclaimable by vacuum, roll-forward and expired targets loud errors."""
    import pytest

    from foundry_es_spark.lake import log as commitlog
    from foundry_es_spark.lake.log import SnapshotExpired

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.append_delta(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I")]),
                   fence=("p", 0))
    v_good = commitlog.current_version(tmp_table)
    good = {(r.repo, r.path, r.content) for r in t.read().collect()}

    # two "bad deploy" epochs: an overwrite and a delete
    t.append_delta(_batch(spark, [("r1", "a", "c1", "py", "BAD", 1, "U")]),
                   fence=("p", 1))
    t.append_delta(_batch(spark, [("r1", "a", None, None, None, 2, "D")]),
                   fence=("p", 2))
    assert t.read().count() == 0
    assert t.is_epoch_committed("p", 2)

    new_head = t.rollback(v_good)
    assert commitlog.current_version(tmp_table) == new_head
    assert {(r.repo, r.path, r.content) for r in t.read().collect()} == good
    # fences reverted: the undone epochs are replayable again
    assert t.is_epoch_committed("p", 0)
    assert not t.is_epoch_committed("p", 1) and not t.is_epoch_committed("p", 2)
    # history retained: the pre-rollback head is still readable
    assert t.read_at_version(new_head - 1).count() == 0
    # undone files reclaimed once their snapshots are expired; state intact
    t.expire_snapshots(keep_last=1)
    assert t.vacuum() > 0
    assert {(r.repo, r.path, r.content) for r in t.read().collect()} == good

    with pytest.raises(ValueError):
        t.rollback(new_head + 5)
    with pytest.raises(SnapshotExpired):
        t.rollback(v_good + 1)  # expired above

    # replay the undone epoch after rollback: applies (not skipped), and a
    # second delivery of it is then fenced — exactly-once restored
    t.append_delta(_batch(spark, [("r1", "a", "c1", "py", "GOOD", 1, "U")]),
                   fence=("p", 1))
    assert t.is_epoch_committed("p", 1)
    assert {r.content for r in t.read().collect()} == {"GOOD"}


def test_describe_is_metadata_only(spark, tmp_table):
    """describe() summarizes the table from the commit record alone — no
    Spark job — and tracks files/generations/stats/fences/retention."""
    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.merge_upsert(_batch(spark, [("r1", "a", "c0", "py", "v0", 0, "I")]),
                   fence=("p", 0))
    t.append_delta(_batch(spark, [("r1", "a", "c1", "py", "v1", 1, "U")]),
                   fence=("p", 1))

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    d = t.describe()
    assert len(tracker.getJobIdsForGroup(None) or []) == before, "ran a job"

    assert d["version"] == 2 and d["n_buckets"] == 2
    assert d["n_delta_files"] == 1 and d["max_delta_generations"] == 1
    assert d["n_files"] == 2
    assert d["files_with_key_bounds"] == 2
    assert d["files_with_key_fingerprints"] == 2
    assert d["physical_rows"] == 2  # incl. superseded/tombstone rows
    assert d["fences"] and d["earliest_retained_version"] == 0
    assert ("repo", "string") in d["schema"]


def test_rollback_across_rebucket_and_schema_evolution(spark, tmp_table):
    """Rollback restores the ENTIRE commit record, so it must compose with
    partition-spec evolution (n_buckets reverts, reads and selective reads
    use the restored layout) and with schema evolution (the schema
    registry reverts; columns added after the rollback mint field ids that
    can collide with rolled-back ones — safe because projection is per
    referenced file, and the undone files are unreferenced)."""
    from foundry_es_spark.lake import log as commitlog

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    t.merge_upsert(_batch(spark, [(f"r{i}", "p", "c0", "py", f"v{i}", i, "I")
                                  for i in range(8)]))
    v_pre = commitlog.current_version(tmp_table)
    pre = {(r.repo, r.content) for r in t.read().collect()}

    t.rebucket(4)
    t.add_column("n_stars", "int")
    b = spark.createDataFrame(
        [("r9", "p", "c1", "py", "v9", 7, 100, "U")],
        "repo string, path string, commit string, lang string, content string, "
        "n_stars int, _seq long, _op string",
    )
    t.merge_upsert(b)
    assert t._current()["n_buckets"] == 4
    assert t.read().count() == 9

    t.rollback(v_pre)
    rec = t._current()
    assert rec["n_buckets"] == 2
    assert "n_stars" not in [f.name for f in t.schema_fields(rec)]
    assert {(r.repo, r.content) for r in t.read().collect()} == pre
    # selective read uses the RESTORED bucket layout
    assert {r.content for r in t.read(repos=["r3"]).collect()} == {"v3"}
    # new evolution after the rollback works and old values never resurrect
    t.add_column("license", "string")
    assert t.read().where(F.col("license").isNotNull()).count() == 0
    b2 = spark.createDataFrame(
        [("r0", "p", "c2", "py", "w0", 50, "mit", "U")],
        "repo string, path string, commit string, lang string, content string, "
        "_seq long, license string, _op string",
    )
    t.merge_upsert(b2)
    rows = {r.repo: r for r in t.read().collect()}
    assert rows["r0"].license == "mit" and rows["r0"].content == "w0"
    assert rows["r3"].license is None


def test_run_maintain_cli(spark, tmp_table, capsys, monkeypatch):
    """The maintenance entrypoint compacts due buckets, expires snapshots,
    vacuums unreferenced files — and never changes WHAT the table says."""
    import json
    import sys

    t = LakeTable.create(spark, tmp_table, FIELDS, n_buckets=2)
    for i in range(4):  # 4 delta generations per touched bucket
        t.append_delta(_batch(spark, [("r1", f"p{i}", "c0", "py", f"v{i}", i, "I")]))
    before = {(r.repo, r.path, r.content) for r in t.read().collect()}

    import run_maintain

    monkeypatch.setattr(sys, "argv", [
        "run_maintain.py", "--table-dir", tmp_table,
        "--compact-threshold", "2", "--keep-snapshots", "1",
    ])
    run_maintain.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compact"]["buckets"], "generations crossed the threshold"
    assert out["after"]["n_delta_files"] == 0
    assert out["after"]["n_files"] < out["before"]["n_files"]
    assert out["vacuumed_files"] > 0
    assert {(r.repo, r.path, r.content) for r in t.read().collect()} == before
