"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata (SURVEY.md training-data layer).

The decode libraries (PIL/ffmpeg/librosa) are absent in this container, so
the decode step is STUBBED behind `decode_media` — a deterministic fake
that derives "features" from the bytes themselves (documented below, and a
NotImplementedError guard for real codecs). Everything around the stub —
binary schema, Arrow batch shape, mapInPandas signature, partition-size
control for large blobs — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from foundry_es_spark.queries.common import table

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, width int, height int, duration_ms int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, feature array<float>"
)

REAL_CODECS = False  # flipped when decode libs exist on the cluster image


def media_table(spark, sf) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in for
    encoded blobs; metadata is hash-derived. binary column + typed meta —
    the exact shape a real image/audio table has."""
    d = table(spark, sf, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.pmod(F.col("doc_id") * 37, F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.col("doc_id") * 53, F.lit(1080)).cast("int").alias("height"),
        F.pmod(F.col("doc_id") * 977, F.lit(60000)).cast("int").alias("duration_ms"),
    )


def _fake_decode(blob: bytes, kind: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: sha256 of the
    blob expanded to `dim` floats in [0,1). Replace with a real
    decoder+model when codecs exist (REAL_CODECS)."""
    h = hashlib.sha256(kind.encode() + blob).digest()
    return np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32) / 2**32


def decode_media(df: DataFrame, dim: int = 8, batch_rows: int = 256) -> DataFrame:
    """mapInPandas decode/feature-extract over binary media.

    Real Spark plumbing: Arrow-batched iterator, bounded batch size for
    multi-MB blobs (`spark.sql.execution.arrow.maxRecordsPerBatch` should
    be lowered by the caller for real media), schema declared up front.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_CODECS:  # pragma: no cover
            raise NotImplementedError("real codec path not available in this image")
        for pdf in batches:
            feats = [
                _fake_decode(bytes(b), k, dim).tolist()
                for b, k in zip(pdf["media"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "sha256": pdf["media"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark, sf):
    """End-to-end: synthesize media table → decode stub → features.
    The sha256/n_bytes columns are SQL-checkable against documents."""
    return decode_media(media_table(spark, sf)).select(
        "media_id", "kind", "n_bytes", "sha256"
    )


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,  -- UTF-8 BYTES (length() counts chars)
       sha256(text) AS sha256
FROM documents
"""


def multimodal_frame_sample(spark, sf):
    """Frame-sampling shape: explode k hash-derived 'frame offsets' per
    video row — the partition/explode plumbing of real frame extraction.
    Rows-only (offsets are stub-specific)."""
    m = media_table(spark, sf).where(F.col("kind") == "video")
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.pmod(F.xxhash64(F.col("media_id").cast("string"), i.cast("string")),
                         F.greatest(F.col("duration_ms"), F.lit(1))),
    )
    return m.select(
        "media_id",
        F.explode(offsets).alias("frame_offset_ms"),
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_SQL,
}
