"""Window-operator extensions beyond the reference's tumbling-only
surface (SURVEY.md §2.7 — "no sliding/session windows anywhere").

The engine gets them from Spark for free; registering them here with
oracle twins proves exact semantics:

- ``session_window_stats`` — ``F.session_window`` (30-min gap).
  Oracle: gaps-and-islands (island id = running count of gap-breaks
  per user). Spark closes a session when the next event's ts ≥
  previous ts + gap; window.end = last event + gap — the SQL twin
  reproduces both bounds.
- ``sliding_window_stats`` — hopping ``F.window(1 hour, 30 min)``.
  Oracle: each event expands to exactly size/slide = 2 rows via
  unnest, bucketed with time_bucket.

Both are watermark-compatible streaming aggregations in the skin
(same expressions under ``withWatermark``); batch forms are the
oracle-checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load


@register(
    "session_window_stats",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    isl AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM seq
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS event_ct,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM isl
    GROUP BY user_id, island
    """,
    covers=(),
    doc="session windows (30-min gap) — engine extension over the reference",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Scale: Catalyst plans session_window as a single shuffle on
    (user_id) with in-partition merge of overlapping sessions — the
    same island computation the oracle does with window functions.
    """
    events = load(spark, sf_dir, "events")
    w = F.session_window("ts", "30 minutes")
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(
            F.count("*").alias("event_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "event_ct",
            "value_sum",
        )
    )


@register(
    "sliding_window_stats",
    oracle="""
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(w_start + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
           event_type,
           count(*) AS ev_ct,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM (
        SELECT event_type, value,
               time_bucket(INTERVAL 30 MINUTE, ts) - k * (INTERVAL 30 MINUTE) AS w_start
        FROM events, unnest([0, 1]) AS u(k)
    )
    GROUP BY 1, 2, 3
    """,
    covers=(),
    doc="sliding (hopping) windows 1h/30min — engine extension",
)
def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate: 1-hour windows every 30 minutes —
    each event contributes to exactly two windows (Spark expands via
    its internal window generator; the oracle does the same expansion
    with unnest)."""
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("ev_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_type",
            "ev_ct",
            "value_sum",
        )
    )


@register(
    "cumulate_window_stats",
    oracle="""
    WITH expanded AS (
        SELECT date_trunc('hour', ts) AS ws,
               date_trunc('hour', ts) + INTERVAL (15 * k) MINUTE AS we,
               value
        FROM events
        CROSS JOIN unnest(generate_series(1, 4)) AS u(k)
        WHERE ts < date_trunc('hour', ts) + INTERVAL (15 * k) MINUTE
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(we, '%Y-%m-%d %H:%M:%S') AS window_end,
           count(*) AS event_ct,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM expanded
    GROUP BY ws, we
    """,
    covers=(),
    doc="CUMULATE windows (Flink TVF family): hour-anchored, 15-min steps",
)
def cumulate_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third window TVF of the reference's Flink era
    (TUMBLE = A3/A5, HOP = ``sliding_window_stats``, CUMULATE =
    this): windows share an hour-anchored start and grow by 15-minute
    steps to the full hour — early partial results for the hour
    without waiting for it to close.

    Spark has no native cumulate; the faithful rewrite expands each
    event to the step-end windows that contain it (≤ size/step = 4
    rows, exactly Flink's internal slice replication) and runs one
    hash aggregate on (start, end). Streaming skin: the same
    expressions under a watermark — the expansion is stateless, so
    only the aggregate holds state, like any windowed agg.
    """
    ev = load(spark, sf_dir, "events").select("ts", "value")
    ws = F.date_trunc("hour", F.col("ts"))
    expanded = (
        ev.select("ts", "value", ws.alias("ws"), F.explode(F.sequence(F.lit(1), F.lit(4))).alias("k"))
        .withColumn("we", F.expr("ws + make_interval(0, 0, 0, 0, 0, 15 * k, 0)"))
        .filter(F.col("ts") < F.col("we"))
    )
    return (
        expanded.groupBy("ws", "we")
        .agg(
            F.count("*").alias("event_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("we", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_ct",
            "value_sum",
        )
    )
