"""Regression tests for the round-3 judge's advisory findings.

Covers: reliable-checkpoint option in dedup_cluster (identical labels vs
the localCheckpoint default), streaming-harness catalog hygiene (no
q_<uuid> temp views survive a harness run), and symlink-race safety in
the stream-source directory setup.
"""

import os

from foundry_es_spark.queries import dedup, streaming_q

SF = "/root/testdata/sf0.001"


def test_dedup_cluster_reliable_checkpoint_identical_labels(spark, tmp_path):
    """VERDICT r3 item 3: DataFrame.checkpoint() path must yield exactly
    the same (doc_id, cluster_id) labels as the executor-local default."""
    ckpt = str(tmp_path / "ckpt")
    local = {
        (r.doc_id, r.cluster_id) for r in dedup.dedup_cluster(spark, SF).collect()
    }
    reliable = {
        (r.doc_id, r.cluster_id)
        for r in dedup.dedup_cluster(spark, SF, checkpoint_dir=ckpt).collect()
    }
    assert local == reliable and len(local) > 0
    # and the reliable path actually wrote checkpoint data to the dir
    assert any(os.scandir(ckpt))


def test_streaming_harness_drops_memory_sink_tables(spark):
    """VERDICT r3 item 8: repeated harness invocations must not grow the
    catalog with q_<uuid> memory-sink views."""
    before = {t.name for t in spark.catalog.listTables() if t.name.startswith("q_")}
    df1 = streaming_q.q19_stream_tumbling_agg(spark, SF)
    df2 = streaming_q.q19_stream_tumbling_agg(spark, SF)
    # q22/q23c bypass the shared _run_stream helper (their own sink setup)
    # and must detach from the catalog the same way
    df3 = streaming_q.q22_stream_dedup(spark, SF)
    df4 = streaming_q.q23c_stream_stream_join(spark, SF)
    after = {t.name for t in spark.catalog.listTables() if t.name.startswith("q_")}
    assert after == before
    # the returned frames stay readable after their views are dropped
    assert df1.count() == df2.count() > 0
    assert df3.count() > 0 and df4.count() >= 0


def test_events_stream_dir_symlink_race_safe(tmp_path, monkeypatch):
    """Concurrent initialization of the same sf dir must not raise: the
    loser of the symlink race treats EEXIST as success."""
    import foundry_es_spark.queries.streaming_q as sq

    real_symlink = os.symlink
    calls = []

    def racing_symlink(src, dst):
        # simulate another session winning the race between the exists()
        # check and our symlink() call
        real_symlink(src, dst)
        calls.append(dst)
        real_symlink(src, dst)  # raises FileExistsError like the loser sees

    monkeypatch.setattr(os, "symlink", racing_symlink)
    # unique sf string (tmp_path is per-run) -> fresh /tmp dir for this test
    d = sq._events_stream_dir(str(tmp_path / "sf-race"))
    assert os.path.islink(os.path.join(d, "part-0.parquet"))
    assert calls  # the race path actually executed
