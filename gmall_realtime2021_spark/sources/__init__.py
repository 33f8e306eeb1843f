"""Streaming/batch source builders (SURVEY.md §2.1 S1–S4, S7, S10)."""

from gmall_realtime2021_spark.sources.batch import read_table
from gmall_realtime2021_spark.sources.streams import (
    MAXWELL_ENVELOPE,
    file_stream,
    kafka_json_stream,
    kafka_raw_stream,
    maxwell_cdc_parse,
    table_stream,
)

__all__ = [
    "MAXWELL_ENVELOPE",
    "read_table",
    "file_stream",
    "kafka_json_stream",
    "kafka_raw_stream",
    "maxwell_cdc_parse",
    "table_stream",
]
