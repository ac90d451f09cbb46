"""Schemas for the CDC engine.

Base-row shape follows BASELINE.json input_hint: an Iceberg-style table of
source-code repositories ``(repo, path, commit, lang, content)`` with
identifier/merge key ``(repo, path)``. The change stream wraps a base row
in an envelope ``(seq, ts, op)`` — the Spark-native restatement of the
reference's document envelope + Processing.status state machine
(SURVEY.md §1.1–§1.2; FIXTURES.md F2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Merge / identifier key (BASELINE.json north_star: "keyed on (repo, path)").
KEY_COLS = ["repo", "path"]

# Columns of the base table proper (the input_hint shape).
BASE_COLS = ["repo", "path", "commit", "lang", "content"]

BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), False),
    ]
)

# Change-event envelope (FIXTURES.md F2). `op` ∈ {I, U, D}; D rows carry
# null content. `seq` is the global total order; per (repo,path) order is
# preserved within each stream partition.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

EVENT_COLS = [f.name for f in EVENT_SCHEMA.fields]

VALID_OPS = ("I", "U", "D")

# Schema-evolution phases (FIXTURES.md F3): phase B adds meta_license +
# n_stars(int); phase C renames meta_license→license and widens n_stars to
# long. These are the extra *event payload* columns per phase.
PHASE_B_EXTRA = T.StructType(
    [
        T.StructField("meta_license", T.StringType(), True),
        T.StructField("n_stars", T.IntegerType(), True),
    ]
)
PHASE_C_EXTRA = T.StructType(
    [
        T.StructField("license", T.StringType(), True),
        T.StructField("n_stars", T.LongType(), True),
    ]
)


def event_schema_with(extra: T.StructType | None) -> T.StructType:
    if extra is None:
        return EVENT_SCHEMA
    return T.StructType(list(EVENT_SCHEMA.fields) + list(extra.fields))
