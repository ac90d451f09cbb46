"""Coverage for the remaining SURVEY.md §2 operators: S3 snapshot
bootstrap, S4 record-file sources (CSV/JSON/XML), C3 no-op suppression,
C8 deletion-by-absence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from foundry_es_spark.fixtures import gen_base_snapshot, gen_change_events, write_event_log
from foundry_es_spark.operators.cdc import snapshot_diff_events
from foundry_es_spark.plans import CdcPipeline, PipelineConfig
from foundry_es_spark.sources.records import (
    read_csv_records,
    read_json_records,
    read_xml_records,
)


def test_s3_snapshot_bootstrap_then_replay(spark, tmp_path):
    """Initial load via overwrite_snapshot, then incremental events on top."""
    tmp = str(tmp_path)
    snap = gen_base_snapshot(spark, n_rows=300, lines_mod=15)
    pipe = CdcPipeline(spark, PipelineConfig(pipeline_id="b", table_dir=f"{tmp}/t"))
    pipe.table.overwrite_snapshot(snap)
    assert pipe.table.read().count() == 300

    ev = gen_change_events(spark, n_events=2000, n_keys=300, lines_mod=15)
    write_event_log(ev, f"{tmp}/events", epoch_size=1000)
    pipe.replay_event_dir(f"{tmp}/events")
    final = pipe.table.read()
    # every surviving row has normalized columns from the event replay OR
    # nulls from the bootstrap (snapshot rows never saw normalization —
    # they are replaced as events arrive)
    assert final.count() > 0
    assert final.where(F.col("content").isNull()).count() == 0


def test_c3_suppression_equivalent_state(spark, tmp_path):
    """suppress_no_ops drops unchanged re-upserts without changing the
    final state (C3 cuts write amplification on re-harvest)."""
    tmp = str(tmp_path)
    ev = gen_change_events(spark, n_events=3000, n_keys=250, lines_mod=15)
    write_event_log(ev, f"{tmp}/e1", epoch_size=1500)

    def digest(pipe):
        df = pipe.table.read().select("repo", "path", "content_sha256")
        return sorted(tuple(r) for r in df.collect())

    base = CdcPipeline(spark, PipelineConfig(pipeline_id="a", table_dir=f"{tmp}/a"))
    base.replay_event_dir(f"{tmp}/e1")
    sup = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="s", table_dir=f"{tmp}/s", suppress_no_ops=True),
    )
    sup.replay_event_dir(f"{tmp}/e1")
    assert digest(base) == digest(sup)

    # re-deliver the same content as NEW events (new seqs, same bodies) for
    # keys that are still live — suppression must upsert nothing new.
    # (Tombstoned keys legitimately re-upsert: their stored hash is null.)
    live = sup.table.read().select("repo", "path")
    ev2 = ev.withColumn("seq", F.col("seq") + 100000).join(live, ["repo", "path"], "left_semi")
    write_event_log(ev2.where(F.col("op") != "D"), f"{tmp}/e2", epoch_size=100000)
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(f"{tmp}/e2") if d.startswith("epoch=")
    )
    res = [
        sup.apply_epoch(spark.read.parquet(f"{tmp}/e2/epoch={e}"), 100 + i)
        for i, e in enumerate(epochs)
    ]
    assert sum(r["n_keys"] for r in res) == 0  # every upsert suppressed
    assert digest(base) == digest(sup)


def test_c8_deletion_by_absence(spark, tmp_path):
    """Full-batch re-harvest: keys missing from the snapshot become D
    events through the normal merge path."""
    tmp = str(tmp_path)
    ev = gen_change_events(spark, n_events=2000, n_keys=200, lines_mod=15)
    write_event_log(ev, f"{tmp}/events", epoch_size=2000)
    pipe = CdcPipeline(spark, PipelineConfig(pipeline_id="d", table_dir=f"{tmp}/t"))
    pipe.replay_event_dir(f"{tmp}/events")
    before = pipe.table.read()
    n_before = before.count()

    # new harvest only contains half the keys
    keep = before.limit(n_before // 2).select("repo", "path")
    deletes = snapshot_diff_events(pipe.table.read(), keep, base_seq=10_000_000)
    assert deletes.count() == n_before - n_before // 2
    pipe.apply_epoch(deletes, epoch_id=999)
    assert pipe.table.read().count() == n_before // 2


def test_c8_diff_events_deterministic(spark):
    """VERDICT r2 item 6: generated D events must be byte-identical across
    re-runs and physical layouts — seq is a pure function of the key, ts a
    caller-supplied timestamp. (The old monotonically_increasing_id /
    current_timestamp forms diverged on every run.)"""
    state = spark.createDataFrame(
        [(f"r{i}", f"p{i % 7}") for i in range(300)], "repo string, path string"
    )
    snap = state.where(F.pmod(F.xxhash64("repo"), F.lit(3)) == 0)

    def run(cur):
        return sorted(
            tuple(r)
            for r in snapshot_diff_events(
                cur, snap, base_seq=10_000_000, ts_millis=1767225600000
            ).collect()
        )

    a = run(state)
    b = run(state.repartition(13))
    c = run(state.coalesce(1))
    assert a == b == c and len(a) > 0
    seqs = [r[0] for r in a]
    assert len(set(seqs)) == len(seqs), "seqs must be unique"
    # STRICTLY above: the merge is seq-conditional (s._seq > t._seq), so a
    # generated D that TIES base_seq would be dropped when base_seq is the
    # table's current max seq (the natural low watermark)
    assert min(seqs) > 10_000_000, "all seqs strictly above base_seq"
    assert all(r[1] is not None for r in a)


def test_s4_csv_json_xml_sources(spark, tmp_path):
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in")
    with open(f"{tmp}/in/r.csv", "w") as f:
        f.write("repo,path,lang\nr1,a.py,python\nr2,b.c,c\n")
    with open(f"{tmp}/in/r.json", "w") as f:
        f.write('{"repo":"r1","path":"a.py","lang":"python"}\n{"repo":"r2","path":"b.c","lang":"c"}\n')
    with open(f"{tmp}/in/r.xml", "w") as f:
        f.write(
            "<dump><record><repo>r1</repo><path>a.py</path><lang>python</lang></record>"
            "<record><repo>r2</repo><path>b.c</path><lang>c</lang></record></dump>"
        )
    schema = "repo string, path string, lang string"
    csv = read_csv_records(spark, f"{tmp}/in/r.csv", schema).orderBy("repo").collect()
    js = read_json_records(spark, f"{tmp}/in/r.json", schema).orderBy("repo").collect()
    xml = (
        read_xml_records(
            spark, f"{tmp}/in/r.xml", "record", {"repo": "repo", "path": "path", "lang": "lang"}
        )
        .orderBy("repo")
        .collect()
    )
    expect = [("r1", "a.py", "python"), ("r2", "b.c", "c")]
    for rows in (csv, js, xml):
        assert [(r["repo"], r["path"], r["lang"]) for r in rows] == expect


def test_kafka_spec_golden_and_decode_without_jar(spark):
    """S1 Kafka path, jar-free coverage (the VERDICT r2 'untestable'
    residue, narrowed): the readStream configuration is pinned as a golden
    spec, and the envelope decode is exercised on a batch frame of exactly
    the shape Spark's Kafka source emits (KAFKA_RAW_DDL) — valid JSON
    round-trips, malformed JSON yields an all-null event that KEEPS its
    topic/partition/offset provenance for the dead-letter sink."""
    import json

    from foundry_es_spark.sources.events import (
        KAFKA_RAW_DDL,
        decode_kafka_events,
        kafka_stream_spec,
    )

    assert kafka_stream_spec("k1:9092,k2:9092", "changes",
                             max_offsets_per_trigger=2_000_000) == {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "subscribe": "changes",
            "startingOffsets": "earliest",
            "failOnDataLoss": "true",
            "maxOffsetsPerTrigger": "2000000",
        },
    }

    good = json.dumps({"seq": 7, "ts": "2024-01-01T00:00:00", "op": "U",
                       "repo": "r1", "path": "a", "commit": "c1",
                       "lang": "py", "content": "hello"})
    raw = spark.createDataFrame(
        [
            (None, good.encode(), "changes", 3, 42, None, 0),
            (None, b"{not json", "changes", 5, 43, None, 0),
        ],
        KAFKA_RAW_DDL,
    )
    rows = {r["offset"]: r for r in decode_kafka_events(raw).collect()}
    ok = rows[42]
    assert (ok["seq"], ok["op"], ok["repo"], ok["path"], ok["content"]) == \
        (7, "U", "r1", "a", "hello")
    assert (ok["topic"], ok["part"]) == ("changes", 3)
    bad = rows[43]
    assert bad["repo"] is None and bad["seq"] is None
    assert (bad["topic"], bad["part"], bad["offset"]) == ("changes", 5, 43)
