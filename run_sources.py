#!/usr/bin/env python
"""Config-driven multi-source entrypoint (SURVEY.md §11 item 1 — the
Foundry-ES harvest-description UX as a CLI):

    spark-submit --py-files engine.zip run_sources.py \
        --config-dir configs/ --work-dir /lake/work \
        [--source <id>] [--records-out /lake/records]

Loads every JSON harvest description in --config-dir (SourceRegistry —
the Mongo `sources` collection analogue) and stands each source up with
zero per-source Python: event-shaped sources replay through the full CDC
pipeline (compaction → mapping/normalization → epoch-fenced merge, their
own table/fences/lineage under <work-dir>/<source_id>); record-shaped
sources WITH a pipeline block (doc-store mode) re-harvest their dump into
the pipeline's table as one snapshot-diff epoch (insert/update/suppress/
delete-by-absence); plain record-shaped sources (CSV / JSON-lines / XML
harvest dumps) produce their mapped record frame, written as parquet
under --records-out when given.

Re-running is exactly-once per source: event replays resume from their
fences (a full re-run is a no-op), re-harvests of an unchanged dump diff
to zero events and fence nothing, record outputs overwrite
deterministically. Prints one JSON line per source for the scheduler's
log scraper — for CDC sources the summary comes entirely from commit
metadata (describe() + the lineage rollup): zero extra Spark jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-dir", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--source", default=None,
                    help="run only this source_id (default: all)")
    ap.add_argument("--records-out", default=None,
                    help="write record-shaped sources' mapped frames as "
                         "parquet under <records-out>/<source_id>")
    args = ap.parse_args()

    from foundry_es_spark.session import get_spark
    from foundry_es_spark.spec import SourceRegistry, run_source

    spark = get_spark(app_name="cdc-sources")
    reg = SourceRegistry.load_dir(args.config_dir)
    if args.source is not None and args.source not in reg.specs:
        sys.exit(
            f"unknown --source {args.source!r}; configured sources: "
            f"{sorted(reg.specs)}"
        )
    specs = (
        {args.source: reg.specs[args.source]} if args.source else dict(reg.specs)
    )
    for sid, spec in specs.items():
        result = run_source(spark, spec, os.path.join(args.work_dir, sid))
        if spec.is_event_source or spec.is_doc_store:
            # summary from commit metadata alone — no count()/agg jobs
            desc = result.table.describe()
            out = {
                "source_id": sid,
                "kind": "doc_store" if spec.is_doc_store else "events",
                "table_dir": result.table.table_dir,
                "table_version": desc["version"],
                "n_files": desc["n_files"],
                "physical_rows": desc["physical_rows"],
                **result.epoch_summary(),
            }
            if spec.is_doc_store:
                rh = result.last_reharvest
                out["reharvest"] = {
                    "epoch": rh.get("epoch"),
                    "n_events": rh.get("n_events", 0),
                    "unchanged": bool(rh.get("unchanged", False)),
                }
        else:
            out = {
                "source_id": sid,
                "kind": "records",
                "rows": result.count(),
                "columns": result.columns,
            }
            if args.records_out:
                dest = os.path.join(args.records_out, sid)
                result.write.mode("overwrite").parquet(dest)
                out["written"] = dest
        print(json.dumps(out))


if __name__ == "__main__":
    main()
