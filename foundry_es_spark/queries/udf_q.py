"""Vectorized-UDF query surface Q24–Q25 (SURVEY.md §2.4) — the T7
extension points exercised on driver testdata. All Python is Arrow-batched;
no row-at-a-time UDFs anywhere."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from foundry_es_spark.queries.common import table


@F.pandas_udf(T.StringType())
def _sha256_udf(s: pd.Series) -> pd.Series:
    # hashlib over a whole Arrow batch via map — still no per-row Python
    # *in Spark* (one serde per batch); the digest loop itself is C code.
    return s.map(lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest() if x is not None else None)


@F.pandas_udf(T.DoubleType())
def _scaled_value(v: pd.Series) -> pd.Series:
    # rounding happens OUTSIDE the UDF via F.round (HALF_UP, matching
    # DuckDB); pandas .round is HALF_EVEN and would diverge on ties
    return v * 1.1


def q24_vectorized_udf(spark, sf):
    d = table(spark, sf, "documents")
    return d.select(
        "doc_id",
        _sha256_udf(F.col("text")).alias("text_sha256"),
        F.sha2(F.col("text"), 256).alias("text_sha256_native"),
    )


Q24_SQL = """
SELECT doc_id, sha256(text) AS text_sha256, sha256(text) AS text_sha256_native
FROM documents
"""


def q24b_vectorized_scale(spark, sf):
    e = table(spark, sf, "events")
    return e.select("event_id", F.round(_scaled_value(F.col("value")), 4).alias("value_scaled"))


Q24B_SQL = """
SELECT event_id, round(value * 1.1, 4) AS value_scaled FROM events
"""


def q25_grouped_map(spark, sf):
    """applyInPandas per-lang document stats (UDAF/grouped-map shape).
    SQL-expressible on purpose, so the oracle does a FULL value check."""
    d = table(spark, sf, "documents")

    def per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "avg_chars": [round(float(pdf["n_chars"].mean()), 4)],
                "max_chars": [int(pdf["n_chars"].max())],
                "n_sources": [pdf["source"].nunique()],
            }
        )

    return d.groupBy("lang").applyInPandas(
        per_lang,
        schema="lang string, n_docs long, avg_chars double, max_chars long, n_sources long",
    )


Q25_SQL = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
       max(n_chars) AS max_chars, count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def q25b_map_in_pandas(spark, sf):
    """mapInPandas partition-wise operator: per-batch token counting."""
    d = table(spark, sf, "documents")

    def count_tokens(batches):
        for pdf in batches:
            # nullable Int64: null text stays null (plain int64 raised on
            # NaN); ''.split() == [] so empty/whitespace-only counts 0 —
            # the oracle mirrors both boundaries explicitly
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_ws_tokens": pdf["text"].str.split().str.len().astype("Int64"),
                }
            )

    return d.mapInPandas(count_tokens, schema="doc_id long, n_ws_tokens long")


# Boundary parity with Python str.split(): null -> NULL, empty/whitespace-
# only -> 0 (DuckDB's split of '' yields [''] -> 1, hence the CASE).
Q25B_SQL = """
SELECT doc_id,
       CAST(CASE WHEN text IS NULL THEN NULL
                 WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
         AS n_ws_tokens
FROM documents
"""


QUERIES = {
    "q24_vectorized_udf": q24_vectorized_udf,
    "q24b_vectorized_scale": q24b_vectorized_scale,
    "q25_grouped_map": q25_grouped_map,
    "q25b_map_in_pandas": q25b_map_in_pandas,
}

ORACLES = {
    "q24_vectorized_udf": Q24_SQL,
    "q24b_vectorized_scale": Q24B_SQL,
    "q25_grouped_map": Q25_SQL,
    "q25b_map_in_pandas": Q25B_SQL,
}
