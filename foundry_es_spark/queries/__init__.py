"""Layer-B query surface (SURVEY.md §2.4 Q1–Q25) plus the training-data
pipeline operators (dedup / similarity / text analysis / multimodal).

Each query is a callable ``(spark, sf_dir) -> DataFrame`` with, where
ANSI-SQL-expressible, a DuckDB oracle twin keyed by the same name.
Computed columns are aliased identically on both sides (driver contract:
columns are sorted by name before value-hashing).
"""

from __future__ import annotations

from foundry_es_spark.queries import (
    analytics,
    dedup,
    multimodal,
    relational,
    similarity,
    streaming_q,
    textstats,
    udf_q,
)

_MODULES = [relational, analytics, streaming_q, udf_q, dedup, similarity, textstats, multimodal]


def all_queries():
    """Oracle-backed queries FIRST, rows-only (no-oracle) entries LAST.

    The driver walks this dict in insertion order; round 2 showed its
    board can stop short of the full list (50 of 53 entries recorded).
    With this ordering any truncation — entry cap or timeout — can only
    drop entries whose check is rows-only anyway, never an oracle row."""
    qs, oracles = {}, {}
    for m in _MODULES:
        qs.update(m.QUERIES)
        oracles.update(m.ORACLES)
    ordered = {k: v for k, v in qs.items() if k in oracles}
    ordered.update({k: v for k, v in qs.items() if k not in oracles})
    return ordered


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
