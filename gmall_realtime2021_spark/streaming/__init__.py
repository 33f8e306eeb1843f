"""Structured-Streaming skin (SURVEY.md §7 M4).

Every job here is the streaming twin of a batch plan in ``plans/`` —
same logical semantics, incremental execution. Jobs take DataFrames
(from ``sources``) and return DataFrames; sinks live in ``sinks.py``.
"""

from gmall_realtime2021_spark.streaming.jobs import (
    asof_attribution_stream,
    cumulate_window_stream,
    event_transitions_stream,
    interaction_pairs_stream,
    incremental_dedup_stream,
    exact_dedup_stream,
    keyword_stats_stream,
    new_visitor_repair_stream,
    order_wide_stream,
    payment_wide_stream,
    product_stats_stream,
    unique_visitors_stream,
    user_jump_stream,
    visitor_stats_stream,
)
from gmall_realtime2021_spark.streaming.sinks import (
    dim_upsert_batch,
    hll_sketch_maintenance_sink,
    dim_upsert_sink,
    dynamic_route_files,
    dynamic_topic_kafka,
    idempotent_jdbc_stats_sink,
    jdbc_stats_sink,
    stats_store_sink,
)

__all__ = [
    "asof_attribution_stream",
    "exact_dedup_stream",
    "keyword_stats_stream",
    "new_visitor_repair_stream",
    "order_wide_stream",
    "payment_wide_stream",
    "product_stats_stream",
    "unique_visitors_stream",
    "user_jump_stream",
    "visitor_stats_stream",
    "dim_upsert_batch",
    "dim_upsert_sink",
    "dynamic_route_files",
    "dynamic_topic_kafka",
    "idempotent_jdbc_stats_sink",
    "jdbc_stats_sink",
    "stats_store_sink",
    "cumulate_window_stream",
    "incremental_dedup_stream",
    "event_transitions_stream",
    "interaction_pairs_stream",
    "hll_sketch_maintenance_sink",
]
