"""Board query for the declarative transform-mapping layer (spec/).

Renders `documents` rows as raw JSON harvest records (the Foundry-ES
record envelope shape), then extracts/normalizes them through a mapping
block compiled by spec/mapping.py — JSONPath sources, builtin chains
(toLong / trim+lower / normalizeLang / toDate with a custom format /
sha256 / length) — all of which lands as native expressions in one
whole-stage-codegen projection. The DuckDB oracle recomputes the same
values straight from the columns, so a hash match proves the mapping
compiler end-to-end (JSON round-trip included).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from foundry_es_spark.functions.normalize import LANG_CANON
from foundry_es_spark.queries.common import table
from foundry_es_spark.spec.mapping import apply_mapping

_EXTS = ["py", "md", "c", "yaml"]

MAPPING = [
    {"from": "$.doc_id", "to": "record_id", "apply": ["toLong"]},
    {"from": "$.source", "to": "repo_name", "apply": ["trim", "lower"]},
    {"from": "$.ext", "to": "language", "apply": ["normalizeLang"]},
    # timestamp (not date): pandas canonicalization normalizes
    # datetime64 but not object-dtype datetime.date
    {"from": "$.crawled", "to": "crawl_ts",
     "apply": [{"fn": "toStandardDate", "args": ["MM/dd/yyyy"]}]},
    {"from": "$.text", "to": "content_sha256", "apply": ["sha256"]},
    # length → int; toLong matches the repo-wide bigint oracle convention
    {"from": "$.text", "to": "n_chars", "apply": ["length", "toLong"]},
]


def mapped_source_extract(spark, sf):
    d = table(spark, sf, "documents")
    raw = d.select(
        F.to_json(
            F.struct(
                "doc_id",
                "source",
                F.element_at(
                    F.array(*[F.lit(e) for e in _EXTS]),
                    (F.pmod("doc_id", F.lit(len(_EXTS))) + 1).cast("int"),
                ).alias("ext"),
                F.concat(
                    F.lpad((F.pmod("doc_id", F.lit(12)) + 1).cast("string"), 2, "0"),
                    F.lit("/15/2024"),
                ).alias("crawled"),
                "text",
            )
        ).alias("_raw")
    )
    return apply_mapping(raw, MAPPING, json_col="_raw")


_LANG_CASE = (
    "CASE lower(ext) "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in LANG_CANON.items())
    + " ELSE ext END"
)

MAPPED_SOURCE_SQL = f"""
WITH rec AS (
  SELECT doc_id, source, text,
         ['py','md','c','yaml'][CAST(doc_id % 4 AS INT) + 1] AS ext,
         lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '/15/2024' AS crawled
  FROM documents
)
SELECT doc_id AS record_id,
       lower(trim(source)) AS repo_name,
       {_LANG_CASE} AS language,
       strptime(crawled, '%m/%d/%Y') AS crawl_ts,
       sha256(text) AS content_sha256,
       length(text) AS n_chars
FROM rec
"""

QUERIES = {"mapped_source_extract": mapped_source_extract}
ORACLES = {"mapped_source_extract": MAPPED_SOURCE_SQL}
