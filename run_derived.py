#!/usr/bin/env python
"""Derived-table maintenance entrypoint (CDC fan-out):

    spark-submit --py-files engine.zip run_derived.py \
        --source-table-dir /lake/repos --derived-dir /lake/repos_by_repo \
        --name per_repo \
        --aggs "count(*) AS n_paths; sum(length(content)) AS content_bytes"

One-shot by default: folds every source commit past the stored cursor into
the derived rollup and exits (idempotent — safe under cron / Airflow
retries, the cursor commits atomically with the data). `--interval` keeps
polling, the loop shape a downstream-view deployment runs alongside the
ingest pipeline.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-table-dir", required=True)
    ap.add_argument("--derived-dir", required=True)
    ap.add_argument("--name", default="derived")
    ap.add_argument("--group-cols", default="repo",
                    help="comma-separated; first must be repo (lake bucket key)")
    ap.add_argument("--aggs", required=True,
                    help="semicolon-separated SQL aggregate expressions with AS aliases, "
                         "evaluated over the source snapshot grouped by --group-cols")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--max-selective-groups", type=int, default=10_000,
                    help="windows touching more groups than this fall back to one full scan")
    ap.add_argument("--interval", type=float, default=0.0,
                    help="seconds between refresh polls (0 = one-shot)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from foundry_es_spark.lake.table import LakeTable
    from foundry_es_spark.plans import DerivedConfig, DerivedTablePipeline
    from foundry_es_spark.session import get_spark

    spark = get_spark(app_name=f"cdc-derived-{args.name}")
    maintainer = DerivedTablePipeline(
        spark,
        LakeTable(spark, args.source_table_dir),
        DerivedConfig(
            name=args.name,
            derived_dir=args.derived_dir,
            group_cols=[c.strip() for c in args.group_cols.split(",")],
            n_buckets=args.n_buckets,
            max_selective_groups=args.max_selective_groups,
        ),
        [F.expr(e.strip()) for e in args.aggs.split(";") if e.strip()],
    )
    while True:
        print(json.dumps(maintainer.refresh()))
        if args.interval <= 0:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
