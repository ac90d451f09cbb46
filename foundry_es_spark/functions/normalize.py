"""DATS-style metadata normalization (SURVEY.md §2.3 T1–T6).

The reference runs a per-record transformation-DSL interpreter
[F-ES: common/.../transform/TransformationLanguageInterpreter — UNVERIFIED,
SURVEY.md §0]; here the same enhancement is split by cost:

- anything expressible with built-in ``pyspark.sql.functions`` stays
  JVM-side inside whole-stage codegen (sha256, line/char counts, lang
  canonicalization, date standardization);
- genuine text analysis over ``content`` runs as ONE vectorized
  ``pandas_udf`` returning a struct, so Python is entered once per Arrow
  batch, never per row (BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- T1: digest


def with_content_digest(df: DataFrame, src: str = "content", dest: str = "content_sha256") -> DataFrame:
    """T1: the per-row invariant the whole build is verified on
    (BASELINE.json: "content sha256 equality"). Native — no UDF."""
    return df.withColumn(dest, F.sha2(F.col(src), 256))


# ------------------------------------------------------- T3: lang normalize

# ext/alias → canonical language name; broadcast-joined or inlined as a map
LANG_CANON = {
    "py": "python", "python": "python",
    "scala": "scala",
    "java": "java",
    "sql": "sql",
    "md": "markdown", "markdown": "markdown",
    "json": "json",
    "yaml": "yaml", "yml": "yaml",
    "c": "c", "h": "c",
}


def normalize_lang(col: str | Column = "lang") -> Column:
    """T3: canonicalize `lang` via an inline literal map (tiny vocabulary →
    `element_at(create_map(...))`; a broadcast join would also work but the
    map constant-folds)."""
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in LANG_CANON.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*pairs), F.lower(c)), c)


# ----------------------------------------------------------- T4: date std


def standardize_date(col: str | Column, fmts: list[str] | None = None) -> Column:
    """T4: the reference DSL's `toStandardDate(...)` — try formats in order."""
    c = F.col(col) if isinstance(col, str) else col
    fmts = fmts or ["yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd", "MM/dd/yyyy", "yyyyMMdd"]
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts])


# ---------------------------------------------- T2: vectorized DATS struct

DATS_META_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("n_tokens", T.IntegerType(), True),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("avg_line_len", T.DoubleType(), True),
        T.StructField("has_license_hint", T.BooleanType(), True),
        T.StructField("first_identifier", T.StringType(), True),
    ]
)


@F.pandas_udf(DATS_META_TYPE)
def dats_normalize_meta(content: pd.Series) -> pd.DataFrame:
    """T2: DATS-style metadata struct from `content`, fully vectorized
    (pandas .str ops over the whole Arrow batch; no Python row loop)."""
    s = content.fillna("")
    first_line = s.str.split("\n", n=1).str[0].str.strip()
    title = first_line.str.slice(0, 120).where(first_line.str.len() > 0, None)
    n_tokens = s.str.count(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]").astype("int32")
    n_words = s.str.count(r"\b\w+\b").astype("int32")
    n_lines = s.str.count("\n") + 1
    avg_line_len = (s.str.len() / n_lines).astype("float64")
    has_license = s.str.contains(
        r"license|copyright|apache|gpl|mit\b", case=False, regex=True
    )
    first_id = s.str.extract(r"\b([0-9a-f]{8,40})\b", expand=False)
    out = pd.DataFrame(
        {
            "title": title,
            "n_tokens": n_tokens.astype("Int32"),
            "n_words": n_words.astype("Int32"),
            "avg_line_len": avg_line_len,
            "has_license_hint": has_license.astype("boolean"),
            "first_identifier": first_id,
        }
    )
    # null content (D tombstones) → whole struct null; nullable dtypes above
    # keep this assignment warning-free under pandas 2.x
    out.loc[content.isna(), :] = pd.NA
    return out


def with_normalized_columns(df: DataFrame, content_col: str = "content") -> DataFrame:
    """The full T1+T2+T3 enhancement applied to a change batch.

    Cheap columns native (sha256, n_lines, n_chars, lang); the text-analysis
    struct via ONE Arrow-vectorized UDF call. D tombstones (null content)
    produce null derived columns.
    """
    c = F.col(content_col)
    return (
        df.withColumn("content_sha256", F.sha2(c, 256))
        .withColumn("n_lines", F.when(c.isNotNull(), F.size(F.split(c, "\n"))))
        .withColumn("n_chars", F.when(c.isNotNull(), F.length(c)).cast("long"))
        .withColumn("lang", normalize_lang("lang"))
        .withColumn("meta", F.when(c.isNotNull(), dats_normalize_meta(c)))
    )


# Derived (name, ddl-type) pairs added to the base table schema by the
# normalization stage — the "DATS-normalized columns" that schema evolution
# later mutates (BASELINE.json north_star).
NORMALIZED_FIELDS: list[tuple[str, str]] = [
    ("content_sha256", "string"),
    ("n_lines", "int"),
    ("n_chars", "bigint"),
    ("meta", DATS_META_TYPE.simpleString()),
]
