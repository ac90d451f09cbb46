"""Transform / enhance functions (SURVEY.md §2.3, T1–T7)."""

from foundry_es_spark.functions.normalize import (
    DATS_META_TYPE,
    dats_normalize_meta,
    normalize_lang,
    standardize_date,
    with_content_digest,
    with_normalized_columns,
)
from foundry_es_spark.functions.registry import UdfRegistry, default_registry

__all__ = [
    "DATS_META_TYPE",
    "dats_normalize_meta",
    "normalize_lang",
    "standardize_date",
    "with_content_digest",
    "with_normalized_columns",
    "UdfRegistry",
    "default_registry",
]
