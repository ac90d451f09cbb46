"""Incremental derived-table maintenance (plans/derived.py): CDC fan-out.

Pins the materialized-view contract: after any sequence of source epochs,
refreshes, resumes, and crash-retries, the derived table equals the full
recompute ``SELECT group, aggs FROM source GROUP BY group`` — and each
refresh touches only the groups the change-feed window names.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from foundry_es_spark.fixtures import gen_change_events, write_event_log
from foundry_es_spark.plans import (
    CdcPipeline,
    DerivedConfig,
    DerivedTablePipeline,
    PipelineConfig,
)

def AGGS():
    return [
        F.count("*").alias("n_paths"),
        F.sum(F.length("content")).alias("content_bytes"),
        F.countDistinct("lang").alias("n_langs"),
        F.max("path").alias("max_path"),
    ]


def _expected(source):
    return source.read().groupBy("repo").agg(*AGGS())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp, n_events=4000, n_keys=600, epoch_size=1000):
    ev = gen_change_events(spark, n_events=n_events, n_keys=n_keys, n_repos=12)
    write_event_log(ev, f"{tmp}/events", epoch_size=epoch_size)
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            pipeline_id="src", table_dir=f"{tmp}/src", n_buckets=8, normalize=False
        ),
    )
    return pipe


def _derived(spark, pipe, tmp, **cfg_kw):
    return DerivedTablePipeline(
        spark,
        pipe.table,
        DerivedConfig(name="per_repo", derived_dir=f"{tmp}/derived", n_buckets=8, **cfg_kw),
        AGGS(),
    )


def test_incremental_equals_recompute_per_epoch(spark, tmp_path):
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp)
    d = _derived(spark, pipe, tmp)
    import os

    epochs = sorted(
        int(e.split("=")[1]) for e in os.listdir(f"{tmp}/events") if e.startswith("epoch=")
    )
    for e in epochs:
        batch = spark.read.parquet(f"{tmp}/events/epoch={e}")
        pipe.apply_epoch(batch, e)
        stats = d.refresh()
        assert stats["refreshed"]
        assert _rows(d.read()) == _rows(_expected(pipe.table))
    # cursor tracks the source head
    from foundry_es_spark.lake import log as commitlog

    assert d.cursor() == commitlog.current_version(pipe.table.table_dir)


def test_refresh_is_noop_when_current_and_survives_resume(spark, tmp_path):
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=2000, epoch_size=1000)
    pipe.replay_event_dir(f"{tmp}/events")
    d = _derived(spark, pipe, tmp)
    assert d.refresh()["refreshed"]
    assert d.refresh() == {"refreshed": False, "cursor": d.cursor()}
    # a NEW maintainer object (process restart) resumes from the stored cursor
    d2 = _derived(spark, pipe, tmp)
    assert d2.refresh()["refreshed"] is False
    assert _rows(d2.read()) == _rows(_expected(pipe.table))


def test_crash_retry_is_idempotent(spark, tmp_path):
    """A refresh that computed its window but died before the commit leaves
    cursor AND data untouched; the retry re-folds the same window against
    the live snapshot and converges to truth."""
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=3000, epoch_size=1000)
    pipe.replay_event_dir(f"{tmp}/events")
    d = _derived(spark, pipe, tmp)
    d.refresh()
    before_rows = _rows(d.read())
    before_cursor = d.cursor()

    # simulate the crash window: new source commits exist, a refresh ran the
    # read side but its merge commit never landed → state unchanged
    ev2 = gen_change_events(spark, n_events=1200, n_keys=600, n_repos=12)
    pipe.apply_epoch(ev2.where(F.col("seq") < 600), 100)
    assert d.cursor() == before_cursor
    assert _rows(d.read()) == before_rows

    # retry (same window) — lands exactly once
    s1 = d.refresh()
    assert s1["refreshed"]
    assert _rows(d.read()) == _rows(_expected(pipe.table))
    # re-running after success is a no-op, not a double-apply
    assert d.refresh()["refreshed"] is False
    assert _rows(d.read()) == _rows(_expected(pipe.table))


def test_vanished_group_tombstoned(spark, tmp_path):
    """Deleting every path of a repo removes its derived row (deletion by
    absence at the derived level)."""
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=2000, epoch_size=2000)
    pipe.replay_event_dir(f"{tmp}/events")
    d = _derived(spark, pipe, tmp)
    d.refresh()
    repos = [r["repo"] for r in d.read().select("repo").collect()]
    victim = sorted(repos)[0]
    live = pipe.table.read().where(F.col("repo") == victim)
    assert live.count() > 0

    # delete every live path of the victim repo via normal D events
    dels = live.select(
        (F.lit(10_000_000) + F.pmod(F.xxhash64("path"), F.lit(1000))).alias("seq"),
        F.current_timestamp().alias("ts"),
        F.lit("D").alias("op"),
        "repo", "path",
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
        F.lit(0).alias("part"),
    )
    pipe.apply_epoch(dels, 50)

    stats = d.refresh()
    assert stats["refreshed"]
    got_repos = {r["repo"] for r in d.read().select("repo").collect()}
    assert victim not in got_repos
    assert _rows(d.read()) == _rows(_expected(pipe.table))


def test_selective_refresh_touches_only_changed_groups(spark, tmp_path):
    """Scale shape: a 1-repo window reads only that repo's source buckets
    and rewrites only that repo's derived bucket."""
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=3000, epoch_size=3000)
    pipe.replay_event_dir(f"{tmp}/events")
    d = _derived(spark, pipe, tmp)
    d.refresh()

    one = pipe.table.read().limit(1).collect()[0]
    upd = spark.createDataFrame(
        [(20_000_000, one["repo"], one["path"], "U", one["commit"], one["lang"],
          "patched content", 0)],
        "seq long, repo string, path string, op string, commit string, "
        "lang string, content string, part int",
    ).withColumn("ts", F.current_timestamp())
    pipe.apply_epoch(upd, 60)

    stats = d.refresh()
    assert stats["refreshed"] and stats["repos"] == 1 and stats["mode"] == "selective"
    # only ONE derived bucket rewritten for a one-repo window
    assert stats["buckets_rewritten"] == 1
    assert _rows(d.read()) == _rows(_expected(pipe.table))


def test_wide_window_full_recompute_path(spark, tmp_path):
    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=2000, epoch_size=2000)
    pipe.replay_event_dir(f"{tmp}/events")
    d = _derived(spark, pipe, tmp, max_selective_groups=2)  # force full path
    stats = d.refresh()
    assert stats["refreshed"] and stats["mode"] == "full"
    assert _rows(d.read()) == _rows(_expected(pipe.table))
    assert d.refresh()["refreshed"] is False


def test_streaming_fanout_keeps_derived_current(spark, tmp_path):
    """run_stream(derived=[...]): each trigger's epoch commit is followed by
    a derived refresh — after the stream drains, the rollup equals the full
    recompute (streaming CDC fan-out, exactly-once on both tables)."""
    from foundry_es_spark.streaming import run_stream

    tmp = str(tmp_path)
    pipe = _mk(spark, tmp, n_events=3000, epoch_size=1000)
    d = _derived(spark, pipe, tmp)
    run_stream(
        spark, pipe, f"{tmp}/events", f"{tmp}/ckpt",
        max_files_per_trigger=8, await_termination=True, derived=[d],
    )
    assert pipe.table.read().count() > 0
    assert _rows(d.read()) == _rows(_expected(pipe.table))
    assert d.refresh()["refreshed"] is False  # already current


def test_source_rollback_forces_full_recompute(spark, tmp_path):
    """A rollback inside the refresh window means the change feed contains
    undone (and re-fenceable) commits — the maintainer must recompute from
    truth, never fold the feed. After recompute the derived table equals
    the recompute of the ROLLED-BACK source state and the cursor is
    re-anchored at the new head."""
    import os

    from foundry_es_spark.lake import log as commitlog

    tmp = str(tmp_path)
    pipe = _mk(spark, tmp)
    d = _derived(spark, pipe, tmp)
    epochs = sorted(
        int(e.split("=")[1]) for e in os.listdir(f"{tmp}/events") if e.startswith("epoch=")
    )
    # consume epoch 0, snapshot the good version, then apply the rest
    pipe.apply_epoch(spark.read.parquet(f"{tmp}/events/epoch={epochs[0]}"), epochs[0])
    d.refresh()
    v_good = commitlog.current_version(pipe.table.table_dir)
    good_rows = _rows(_expected(pipe.table))
    for e in epochs[1:]:
        pipe.apply_epoch(spark.read.parquet(f"{tmp}/events/epoch={e}"), e)
    d.refresh()
    assert _rows(d.read()) != good_rows  # derived consumed the later epochs

    pipe.table.rollback(v_good)
    stats = d.refresh()
    assert stats["refreshed"] and stats.get("mode") == "full", stats
    assert _rows(d.read()) == good_rows
    assert d.cursor() == commitlog.current_version(pipe.table.table_dir)
    # and the undone epochs replay cleanly afterwards (fences reverted)
    for e in epochs[1:]:
        r = pipe.apply_epoch(spark.read.parquet(f"{tmp}/events/epoch={e}"), e)
        assert not r["skipped"]
    d.refresh()
    assert _rows(d.read()) == _rows(_expected(pipe.table))


def test_multi_group_cols_delete_and_group_move(spark, tmp_path):
    """Multi-column group_cols regression: a delete tombstone carries NULL
    non-key payload and a group-changing update only names its NEW group,
    so group-tuple-level pruning left the OLD (repo, lang) group stale
    forever. Repo-level recompute must tombstone the emptied group and
    correct both sides of a lang move."""
    from foundry_es_spark.plans.derived import DerivedConfig, DerivedTablePipeline

    tmp = str(tmp_path)
    pipe = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="src", table_dir=f"{tmp}/src", n_buckets=4,
                       normalize=False),
    )

    def ev(rows, epoch):
        df = spark.createDataFrame(
            rows,
            "seq long, repo string, path string, op string, commit string, "
            "lang string, content string, part int",
        ).withColumn("ts", F.timestamp_millis(F.col("seq") * 1000))
        pipe.apply_epoch(df, epoch)

    ev([(0, "r1", "a", "I", "c0", "python", "x", 0),
        (1, "r1", "b", "I", "c0", "python", "y", 0),
        (2, "r1", "c", "I", "c0", "c", "z", 0),
        (3, "r2", "d", "I", "c0", "rust", "w", 0)], 0)

    d = DerivedTablePipeline(
        spark, pipe.table,
        DerivedConfig(name="bylang", derived_dir=f"{tmp}/d",
                      group_cols=["repo", "lang"], n_buckets=4),
        [F.count("*").alias("n_paths")],
    )
    d.refresh()

    def got():
        return sorted(tuple(r) for r in d.read().collect())

    def expect():
        return sorted(
            tuple(r)
            for r in pipe.table.read().groupBy("repo", "lang")
            .agg(F.count("*").alias("n_paths")).collect()
        )

    assert got() == expect()

    # delete the ONLY 'c' doc (tombstone has NULL lang) and move one
    # python doc to 'go' (old group only shrinks, new group appears)
    ev([(10, "r1", "c", "D", None, None, None, 0),
        (11, "r1", "a", "U", "c1", "go", "x2", 0)], 1)
    stats = d.refresh()
    assert stats["mode"] == "selective"
    assert got() == expect()
    rows = dict(((r[0], r[1]), r[2]) for r in got())
    assert ("r1", "c") not in rows, "emptied group must tombstone"
    assert rows[("r1", "python")] == 1 and rows[("r1", "go")] == 1
    assert rows[("r2", "rust")] == 1  # untouched repo untouched
