#!/usr/bin/env python
"""C9 partial-update (patch) replay overhead — BENCH evidence.

Replays the standard bench event log twice at identical settings:
(a) as-is (full-image I/U/D stream), (b) with ~1/3 of the U events
deterministically converted to sparse ``op='P'`` patches
(``fixtures.as_patch_events``) and ``patch_ops=True``, which adds the
cross-epoch resolution join against stored state (bucket-pruned selective
read per epoch) to the epoch body. The printed ratio IS the cost of patch
support at this patch rate.

Usage (same env knobs as bench.py; ~2 min at the 1M default):

    python scripts/measure_patch_overhead.py

Prints one JSON line: sustained ev/s for both shapes + the overhead ratio.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from foundry_es_spark.session import get_spark  # noqa: E402


def ensure_patched_log(spark, events_dir: str) -> str:
    """Derive the patch-stream twin of the bench log, preserving the
    epoch=/part= layout (same seq ranges, so offsets_from_footers and the
    epoch chunking behave identically)."""
    from foundry_es_spark.fixtures import as_patch_events

    out = events_dir.rstrip("/") + "_patched"
    marker = os.path.join(out, "_BENCH_READY")
    if os.path.exists(marker):
        return out
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(events_dir) if d.startswith("epoch=")
    )
    for e in epochs:
        df = spark.read.parquet(os.path.join(events_dir, f"epoch={e}"))
        (
            as_patch_events(df)
            .repartition("part")
            .sortWithinPartitions("seq")
            .write.mode("overwrite")
            .partitionBy("part")
            .parquet(os.path.join(out, f"epoch={e}"))
        )
    with open(marker, "w") as f:
        f.write(out)
    return out


def main() -> None:
    spark = get_spark(
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=max(8, 4 * bench.CPUS),
        app_name="bench-patch",
    )
    events_dir = bench.ensure_event_log(spark)
    patched_dir = ensure_patched_log(spark, events_dir)

    import time

    base = bench.run_replay(
        spark, events_dir, os.path.join(bench.BENCH_ROOT, "table_pbase"), warmup=2
    )
    variants = {}
    reads = {}
    for mode in ("write", "merge"):
        tdir = os.path.join(bench.BENCH_ROOT, f"table_ppatch_{mode}")
        variants[mode] = bench.run_replay(
            spark, patched_dir, tdir,
            warmup=2, patch_ops=True, patch_resolve=mode,
        )
        # read-side cost: resolve-at-write stores full rows; resolve-at-
        # merge pays the column fold in every merged read — time it.
        from foundry_es_spark.lake.table import LakeTable

        t = LakeTable(spark, tdir)
        t0 = time.monotonic()
        n_rows = t.read().count()
        reads[mode] = {"rows": n_rows, "read_sec": round(time.monotonic() - t0, 3)}
    # standing correctness check: the two resolution strategies must agree
    from foundry_es_spark.lake.table import LakeTable as _LT

    a = _LT(spark, os.path.join(bench.BENCH_ROOT, "table_ppatch_write")).read()
    b = _LT(spark, os.path.join(bench.BENCH_ROOT, "table_ppatch_merge")).read()
    modes_equal = a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    n_p = spark.read.parquet(patched_dir).where("op = 'P'").count()
    out = {
        "metric": "c9_patch_replay_overhead",
        "events": bench.N_EVENTS,
        "n_patch_events": n_p,
        "full_image_events_per_sec": base["events_per_sec"],
        "patch_write_events_per_sec": variants["write"]["events_per_sec"],
        "patch_merge_events_per_sec": variants["merge"]["events_per_sec"],
        "overhead_ratio_write": round(
            base["events_per_sec"] / max(1.0, variants["write"]["events_per_sec"]), 3
        ),
        "overhead_ratio_merge": round(
            base["events_per_sec"] / max(1.0, variants["merge"]["events_per_sec"]), 3
        ),
        "modes_equal": modes_equal,
        "snapshot_read": reads,
        "full_image": base,
        "patch_write": variants["write"],
        "patch_merge": variants["merge"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
