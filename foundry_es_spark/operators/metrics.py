"""Per-partition task metrics for the compaction kernel (SURVEY.md §5.2).

The skew contract (C4) is not just "final state is correct under a hot
key" — it is "no straggler task": after salting, the slowest compaction
partition must stay within a small factor of the median. That property
can't be asserted from the result DataFrame, so the Arrow kernel reports
per-partition ``(partition_id, rows, seconds)`` through a Spark
accumulator (the Python-worker → driver metrics channel that works with
the UI disabled, unlike the REST task API). The pipeline folds the
summary into the epoch's lineage record, and
``tests/test_evolution.py::test_skew_replay_with_salting`` asserts
``max_sec <= 4 * median_sec`` over loaded partitions.

Task retries/speculation overwrite their partition's entry (dict keyed by
partition id), so a re-run task cannot double-count.
"""

from __future__ import annotations

import statistics

from pyspark.accumulators import AccumulatorParam


class _DictMergeParam(AccumulatorParam):
    """Merge per-partition metric dicts; later updates for the same
    partition id (task retries) replace earlier ones."""

    def zero(self, value):
        return {}

    def addInPlace(self, v1, v2):
        v1.update(v2)
        return v1


def partition_metrics_acc(spark):
    """A fresh accumulator the compaction kernel can report into."""
    return spark.sparkContext.accumulator({}, _DictMergeParam())


def summarize_partitions(acc_value: dict, min_rows: int = 1) -> dict:
    """Straggler summary over partitions that actually carried rows.

    Empty (bkt, salt) partitions exist by construction when the key space
    is smaller than the layout grid; their near-zero task times would make
    any max/median ratio meaningless, so the straggler ratio is defined
    over loaded partitions only.
    """
    loaded = [m for m in acc_value.values() if m.get("rows", 0) >= min_rows]
    if not loaded:
        return {"n_partitions": 0}
    secs = sorted(m["sec"] for m in loaded)
    rows = sorted(m["rows"] for m in loaded)
    med_sec = statistics.median(secs)
    med_rows = statistics.median(rows)
    return {
        "n_partitions": len(loaded),
        "max_sec": round(secs[-1], 4),
        "median_sec": round(med_sec, 4),
        "max_rows": rows[-1],
        "median_rows": med_rows,
        "straggler_ratio": round(secs[-1] / med_sec, 3) if med_sec > 0 else None,
    }
