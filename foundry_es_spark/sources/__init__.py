"""Sources (SURVEY.md §2.1 S1–S4)."""

from foundry_es_spark.sources.events import (
    read_events_batch,
    read_events_seq_range,
    read_events_stream,
)
from foundry_es_spark.sources.records import read_csv_records, read_json_records, read_xml_records

__all__ = [
    "read_events_batch",
    "read_events_seq_range",
    "read_events_stream",
    "read_csv_records",
    "read_json_records",
    "read_xml_records",
]
