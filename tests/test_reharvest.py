"""The re-harvest loop (VERDICT r4 item 1): record-shaped harvest dumps
close into CDC. A fresh dump, compared against the existing doc store,
classifies per key into insert / update / unchanged(suppressed) /
missing→delete and applies exactly the diff as one fenced epoch — the
reference's DocumentIngestionService semantic [F-ES — UNVERIFIED,
SURVEY.md §1.1.5], rebuilt as ONE full-outer join + the existing epoch
body. Pinned here:

1. the kernel's classification (reharvest_diff_events) against an
   explicit per-key oracle, plus determinism across physical layouts;
2. end-to-end: a JSON-lines dump stood up via SourceSpec doc-store mode
   (record ingest + pipeline block), MUTATED (rows added / changed /
   removed), re-run → final table equals the new dump exactly, lineage
   shows only the diff was applied (C3 suppression), absent keys deleted
   (C8);
3. idempotency: an unchanged dump re-harvests to a fenced no-op (zero
   events, no new epoch); a crash-retry of the SAME diff epoch is
   absorbed by the fence;
4. compile-time contracts: a doc-store mapping that produces the event
   envelope fails at spec load.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from foundry_es_spark.operators.cdc import reharvest_diff_events
from foundry_es_spark.plans import CdcPipeline, PipelineConfig
from foundry_es_spark.spec import SourceSpec, run_source
from foundry_es_spark.spec.mapping import MappingError

SNAP_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def _row(i, body=None):
    return (
        f"corpus/r{i % 5}",
        f"docs/d{i}.txt",
        f"c{i}",
        "python",
        body if body is not None else f"body of doc {i}",
    )


# ------------------------------------------------------------------ kernel


def test_kernel_classifies_iud_and_suppresses(spark, tmp_path):
    """Per-key oracle: new→I, changed→U, equal→no event, absent→D."""
    pipe = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="rh", table_dir=str(tmp_path / "t"), n_buckets=4),
    )
    first = _snap(spark, [_row(i) for i in range(20)])
    pipe.apply_snapshot(first, snapshot_ts_ms=1_000)
    state = pipe.table.read()
    assert state.count() == 20

    # dump 2: d0..d9 unchanged, d10..d14 revised, d15..d19 gone, d20..d22 new
    second = _snap(
        spark,
        [_row(i) for i in range(10)]
        + [_row(i, body=f"revised {i}") for i in range(10, 15)]
        + [_row(i) for i in range(20, 23)],
    )
    ev = reharvest_diff_events(state, second, base_seq=10_000_000, ts_millis=2_000)
    got = {(r["repo"], r["path"]): r["op"] for r in ev.collect()}
    exp = {}
    for i in range(10, 15):
        exp[(f"corpus/r{i % 5}", f"docs/d{i}.txt")] = "U"
    for i in range(15, 20):
        exp[(f"corpus/r{i % 5}", f"docs/d{i}.txt")] = "D"
    for i in range(20, 23):
        exp[(f"corpus/r{i % 5}", f"docs/d{i}.txt")] = "I"
    assert got == exp  # unchanged keys emit NOTHING (C3 before the merge)

    rows = ev.collect()
    assert min(r["seq"] for r in rows) > 10_000_000
    assert len({r["seq"] for r in rows}) == len(rows)
    # D rows carry null payload; I/U carry the snapshot image
    for r in rows:
        if r["op"] == "D":
            assert r["content"] is None and r["commit"] is None
        else:
            assert r["content"] is not None


def test_kernel_deterministic_across_layouts(spark, tmp_path):
    """Crash-retry contract: the same (state, dump) pair regenerates a
    byte-identical batch under any partitioning."""
    state = _snap(spark, [_row(i) for i in range(100)])
    snap = _snap(
        spark,
        [_row(i) for i in range(0, 50)]
        + [_row(i, body=f"rev {i}") for i in range(50, 70)]
        + [_row(i) for i in range(110, 120)],
    )

    def run(st, sn):
        return sorted(
            tuple(r)
            for r in reharvest_diff_events(
                st, sn, base_seq=5_000, ts_millis=1767225600000
            ).collect()
        )

    a = run(state, snap)
    b = run(state.repartition(13), snap.coalesce(1))
    c = run(state.coalesce(1), snap.repartition(7, "path"))
    assert a == b == c and len(a) == 20 + 30 + 10  # U + D(70..99) + I


def test_kernel_rejects_event_shaped_snapshot(spark):
    ev = spark.createDataFrame(
        [(1, "I", "r", "p", "x")], "seq long, op string, repo string, path string, content string"
    )
    with pytest.raises(ValueError, match="event source"):
        reharvest_diff_events(ev.limit(1), ev, base_seq=0)
    no_content = spark.createDataFrame([("r", "p")], "repo string, path string")
    with pytest.raises(ValueError, match="digest basis"):
        reharvest_diff_events(no_content, no_content, base_seq=0)


def test_kernel_without_stored_digest(spark):
    """normalize=False tables have no content_sha256 column: the state-side
    digest is computed in the scan projection — same classification."""
    state = _snap(spark, [_row(0), _row(1)])
    snap = _snap(spark, [_row(0), _row(1, body="changed")])
    ops = {
        r["path"]: r["op"]
        for r in reharvest_diff_events(state, snap, base_seq=0).collect()
    }
    assert ops == {"docs/d1.txt": "U"}


# ----------------------------------------------------------- pipeline loop


def test_apply_snapshot_full_lifecycle(spark, tmp_path):
    """Harvest → mutate dump → re-harvest: final state equals the new dump
    exactly (fold-oracle equality), only the diff flowed through the epoch
    (unchanged suppressed), absent keys deleted; an unchanged re-run is a
    fenced no-op; a duplicate epoch apply is absorbed."""
    pipe = CdcPipeline(
        spark,
        PipelineConfig(pipeline_id="rh", table_dir=str(tmp_path / "t"), n_buckets=4),
    )
    first = _snap(spark, [_row(i) for i in range(30)])
    info1 = pipe.apply_snapshot(first, snapshot_ts_ms=1_000)
    assert info1["epoch"] == 0 and info1["n_events"] == 30

    second_rows = (
        [_row(i) for i in range(20)]                      # 20 unchanged
        + [_row(i, body=f"rev {i}") for i in range(20, 25)]  # 5 updated
        + [_row(i) for i in range(40, 44)]                # 4 new; 25..29 gone
    )
    second = _snap(spark, second_rows)
    info2 = pipe.apply_snapshot(second, snapshot_ts_ms=2_000)
    assert info2["epoch"] == 1
    assert info2["n_events"] == 5 + 5 + 4, "only the diff enters the epoch"

    final = {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
        for r in pipe.table.read().collect()
    }
    expected = {(r[0], r[1]): (r[2], r[3], r[4]) for r in second_rows}
    assert final == expected, "table state == the new dump, row for row"

    # unchanged dump → no event, no epoch, state untouched
    info3 = pipe.apply_snapshot(second, snapshot_ts_ms=3_000)
    assert info3["unchanged"] and info3["epoch"] is None
    assert pipe.table.last_epoch("rh") == 1
    # normalize=True default: content digests ride the table (the per-row
    # invariant); spot-check one revised doc
    d = pipe.table.read().where(F.col("path") == "docs/d20.txt").collect()[0]
    assert d["content_sha256"] is not None

    # crash-retry: re-apply the SAME diff epoch → fence skips it
    ev = reharvest_diff_events(
        pipe.table.read(), second, base_seq=10**9, ts_millis=2_000
    )
    skipped = pipe.apply_epoch(ev, epoch_id=1)
    assert skipped.get("skipped") is True


def test_apply_snapshot_interleaves_with_stream_replay(spark, tmp_path):
    """A source may alternate event tailing and dump re-harvests against
    ONE table: seqs from the re-harvest sit above the stream's, and a
    later stream epoch keeps merging normally."""
    from foundry_es_spark.fixtures import gen_change_events, write_event_log

    tmp = str(tmp_path)
    ev = gen_change_events(spark, n_events=2_000, n_keys=150)
    write_event_log(ev, f"{tmp}/events", epoch_size=1_000)
    pipe = CdcPipeline(
        spark, PipelineConfig(pipeline_id="mix", table_dir=f"{tmp}/t", n_buckets=4)
    )
    pipe.replay_event_dir(f"{tmp}/events")
    live = pipe.table.read()
    n_live = live.count()

    # re-harvest a dump that keeps half the keys and revises one
    keep = live.orderBy("repo", "path").limit(n_live // 2)
    victim = keep.orderBy("repo", "path").limit(1).collect()[0]
    dump = keep.withColumn(
        "content",
        F.when(
            (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"]),
            F.lit("reharvested body"),
        ).otherwise(F.col("content")),
    ).select("repo", "path", "commit", "lang", "content")
    info = pipe.apply_snapshot(dump, snapshot_ts_ms=9_000)
    assert info["n_events"] == (n_live - n_live // 2) + 1  # deletes + 1 update
    assert pipe.table.read().count() == n_live // 2

    # the high-water seq advanced past the stream's: lineage agrees
    summ = pipe.epoch_summary()
    assert summ["max_seq"] > 2_000 and summ["epochs_fenced"] == info["epoch"] + 1


# ------------------------------------------------------------- spec layer


def _write_dump(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _doc_store_spec(dump_path):
    return SourceSpec(
        source_id="gh_docs",
        ingest={"method": "json_lines", "path": dump_path},
        primary_key=["repo", "path"],
        mapping=[
            {"from": "$.repository", "to": "repo", "apply": ["trim", "lower"]},
            {"from": "$.file_path", "to": "path"},
            {"from": "$.sha", "to": "commit"},
            {"from": "$.language", "to": "lang", "apply": ["normalizeLang"]},
            {"from": "$.body", "to": "content"},
        ],
        pipeline={"n_buckets": 4},
    )


def _dump_row(i, body=None):
    return {
        "repository": f"Org/Repo{i % 3}",
        "file_path": f"src/f{i}.py",
        "sha": f"sha{i}",
        "language": "py",
        "body": body or f"def f{i}(): pass",
    }


def test_doc_store_source_end_to_end(spark, tmp_path):
    """The judge's done-criterion: re-running a source config against a
    MUTATED dump upserts exactly the diff — unchanged rows suppressed,
    absent rows deleted, final state equals the dump — and an unchanged
    re-run is exactly-once (a no-op)."""
    dump = str(tmp_path / "dump.jsonl")
    work = str(tmp_path / "work")
    _write_dump(dump, [_dump_row(i) for i in range(12)])
    spec = _doc_store_spec(dump)
    assert spec.is_doc_store and not spec.is_event_source

    pipe = run_source(spark, spec, work)
    assert pipe.last_reharvest["n_events"] == 12
    t1 = pipe.table.read()
    assert t1.count() == 12
    # mapping applied: repo lowercased, lang canonicalized
    r0 = t1.where(F.col("path") == "src/f0.py").collect()[0]
    assert r0["repo"] == "org/repo0" and r0["lang"] == "python"

    # mutate: f0..f7 unchanged, f8/f9 revised, f10/f11 removed, f12 added
    _write_dump(
        dump,
        [_dump_row(i) for i in range(8)]
        + [_dump_row(i, body=f"# rewritten {i}") for i in (8, 9)]
        + [_dump_row(12)],
    )
    pipe2 = run_source(spark, spec, work)
    rh = pipe2.last_reharvest
    assert rh["epoch"] == 1 and rh["n_events"] == 2 + 2 + 1
    final = {r["path"]: r["content"] for r in pipe2.table.read().collect()}
    assert len(final) == 11
    assert final["src/f8.py"] == "# rewritten 8"
    assert "src/f10.py" not in final and "src/f11.py" not in final
    assert final["src/f12.py"] == "def f12(): pass"

    # idempotent re-run: unchanged dump → fenced no-op
    pipe3 = run_source(spark, spec, work)
    assert pipe3.last_reharvest["unchanged"] is True
    assert pipe3.table.last_epoch("gh_docs") == 1


def test_doc_store_spec_rejects_event_envelope_mapping():
    with pytest.raises(MappingError, match="event log"):
        SourceSpec(
            source_id="bad",
            ingest={"method": "json_lines", "path": "/tmp/x.jsonl"},
            mapping=[
                {"from": "$.seq_no", "to": "seq"},
                {"from": "$.body", "to": "content"},
            ],
            pipeline={"n_buckets": 4},
        )


def test_doc_store_cli_line(spark, tmp_path, monkeypatch, capsys):
    """run_sources.py drives the re-harvest from config: first run applies
    the dump, a re-run reports unchanged=true and fences nothing."""
    import sys as _sys

    import run_sources

    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    dump = str(tmp_path / "dump.jsonl")
    _write_dump(dump, [_dump_row(i) for i in range(6)])
    spec = _doc_store_spec(dump)
    with open(cfg_dir / "gh_docs.json", "w") as f:
        json.dump(
            {
                "source_id": spec.source_id,
                "ingest": spec.ingest,
                "primary_key": spec.primary_key,
                "mapping": spec.mapping,
                "pipeline": spec.pipeline,
            },
            f,
        )
    argv = [
        "run_sources.py", "--config-dir", str(cfg_dir),
        "--work-dir", str(tmp_path / "work"),
    ]
    monkeypatch.setattr(_sys, "argv", argv)
    run_sources.main()
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["kind"] == "doc_store"
    assert out1["reharvest"]["n_events"] == 6 and not out1["reharvest"]["unchanged"]

    run_sources.main()
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["reharvest"]["unchanged"] is True
    assert out2["epochs_fenced"] == out1["epochs_fenced"] == 1
