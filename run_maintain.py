#!/usr/bin/env python
"""Table-maintenance entrypoint (the cron/Airflow job a deployment runs
beside the ingest pipeline — the local twin of Iceberg's maintenance
procedures, see lake/iceberg.py expire/vacuum/rewrite golden SQL):

    spark-submit --py-files engine.zip run_maintain.py \
        --table-dir /lake/repos \
        --compact-threshold 4 --files-per-bucket 1 \
        --keep-snapshots 5

Order matters and is fixed: (0) optional tombstone GC at the supplied
low watermark (dead-key storage bound — a full-bucket compaction pass,
so it also resets every delta-generation count), (1) compact buckets
whose delta-generation count crossed the threshold (read-amplification
bound), (2) expire commit records beyond the retention window
(commit-log size bound), (3) vacuum data files no retained snapshot
references (storage bound). Each step is independently idempotent, so a
crashed or retried run just resumes.
Prints one JSON line: the describe() summary before/after plus per-step
actions — consumable by the scheduler's log scraper.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-dir", required=True)
    ap.add_argument("--compact-threshold", type=int, default=4,
                    help="compact buckets with >= this many delta generations (0 = always)")
    ap.add_argument("--files-per-bucket", type=int, default=1)
    ap.add_argument("--keep-snapshots", type=int, default=5,
                    help="retention: snapshots kept time-travelable; also the vacuum floor")
    ap.add_argument("--gc-tombstones-below", type=int, default=None, metavar="SEQ",
                    help="low watermark: additionally purge D rows with _seq <= SEQ "
                    "(caller asserts all events <= SEQ are fully delivered; "
                    "see LakeTable.purge_tombstones). Runs as a full-bucket "
                    "compaction pass before threshold compaction.")
    ap.add_argument("--concurrent", action="store_true",
                    help="multi-writer OCC: safe to run WHILE the ingest "
                    "pipeline is live (maintenance commits rebase past "
                    "concurrent epoch commits; on ConcurrentWriteConflict "
                    "a step is skipped this run and retried next cron "
                    "tick). Without it, schedule maintenance in a write "
                    "pause (the single-writer contract).")
    ap.add_argument("--writer-grace-sec", type=float, default=300.0,
                    help="with --concurrent: age after which an "
                    "uncommitted staging/claimed dir is considered a "
                    "crashed writer's debris")
    ap.add_argument("--skip-compact", action="store_true")
    ap.add_argument("--skip-expire", action="store_true")
    ap.add_argument("--skip-vacuum", action="store_true")
    args = ap.parse_args()

    from foundry_es_spark.lake.table import LakeTable
    from foundry_es_spark.session import get_spark

    spark = get_spark(app_name="cdc-maintain")
    t = LakeTable(
        spark, args.table_dir,
        concurrent_writers=args.concurrent,
        writer_grace_sec=args.writer_grace_sec,
    )
    out: dict = {"table_dir": args.table_dir, "before": t.describe()}

    def _step(fn):
        """With --concurrent a rewrite step whose inputs moved under it is
        skipped (idempotent — next tick redoes it); without, conflicts
        propagate (they indicate a violated single-writer contract)."""
        from foundry_es_spark.lake import log as commitlog

        try:
            return fn()
        except commitlog.ConcurrentWriteConflict:
            if not args.concurrent:
                raise
            return {"skipped": "concurrent write conflict; retry next run"}

    if args.gc_tombstones_below is not None:
        out["tombstone_gc"] = _step(lambda: t.purge_tombstones(
            args.gc_tombstones_below, files_per_bucket=args.files_per_bucket
        ))

    if not args.skip_compact:
        gens = t.bucket_delta_generations()
        if args.compact_threshold <= 0:
            # 0 = always: rewrite every bucket that has ANY file (binpack
            # fragmented bases too, not just delta-bearing buckets)
            due = sorted(t.bucket_file_counts())
        else:
            due = sorted(b for b, g in gens.items() if g >= args.compact_threshold)
        if due:
            stats = _step(lambda: t.compact_buckets(
                due, files_per_bucket=args.files_per_bucket
            ))
            out["compact"] = {"buckets": due, **stats}
        else:
            out["compact"] = {"buckets": []}

    if not args.skip_expire:
        out["expired_snapshots"] = t.expire_snapshots(keep_last=args.keep_snapshots)

    if not args.skip_vacuum:
        out["vacuumed_files"] = t.vacuum(keep_snapshots=args.keep_snapshots)

    out["after"] = t.describe()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
