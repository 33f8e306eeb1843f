"""DWD layer — parse / filter / split / route (SURVEY.md §2.2-2.3).

Reference apps re-expressed on ``events`` (FIXTURES.md §1 maps the
behavior-log stream onto it):

- ``BaseLogApp`` (P1/P3/R1/R2) → JSON parse + 3-way split
- ``BaseDBApp`` + ``TableProcessFunction`` (R3/P4/S3) → config-driven
  routing
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

#: The routing config table (reference: MySQL ``table_process``,
#: ``bean/TableProcess.java:11-30``): (source, operate) → sink.
#: Inlined fixture — the streaming engine re-reads it per micro-batch
#: (operators/routing.py), mirroring the reference's 5 s Timer poll
#: (``TableProcessFunction.java:54-60``).
TABLE_PROCESS_CONFIG = [
    ("view", "insert", "kafka", "dwd_page_view"),
    ("click", "insert", "kafka", "dwd_page_click"),
    ("error", "insert", "kafka", "dwd_error_log"),
    ("purchase", "insert", "hbase", "dim_purchase"),
    ("signup", "insert", "hbase", "dim_signup"),
]

CONFIG_SCHEMA = ["source_table", "operate_type", "sink_type", "sink_table"]

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


@register(
    "json_parse_project",
    oracle="""
    SELECT event_id,
           user_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
           value
    FROM events
    WHERE props IS NOT NULL AND len(props) > 3 AND event_type <> 'error'
    """,
    covers=("P1", "P2", "P3", "P5", "P8"),
)
def json_parse_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON parse + malformed filter + projection.

    Re-expression of ``BaseLogApp.java:140-148`` (string→JSON map),
    ``BaseDBApp.java:44-48`` (keep only records with a real payload:
    non-null, len > 3) and the per-record field-enrichment maps
    (derived event_time string — P8). ``from_json`` is permissive
    like fastjson: malformed → null column, record passes through.
    Raw ``value`` passes untouched (row-level doubles are exact).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.filter(
            F.col("props").isNotNull() & (F.length("props") > 3) & (F.col("event_type") != "error")
        )
        .withColumn("parsed", F.from_json("props", PROPS_SCHEMA))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("parsed.k").alias("k"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_time"),
            "value",
        )
    )


@register(
    "log_split",
    oracle="""
    SELECT 'start' AS branch, event_id, user_id FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT 'page', event_id, user_id FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    UNION ALL
    SELECT 'error', event_id, user_id FROM events WHERE event_type = 'error'
    """,
    covers=("R1", "P6", "U2", "S11"),
)
def log_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way log split (side outputs → filtered projections).

    Re-expression of ``BaseLogApp.java:213-257``: one ProcessFunction
    with two OutputTags routing start/page/display. In Spark the
    parsed stream is *one* DataFrame and each branch is a filtered
    projection — the scan is shared (or each branch gets its own
    pushed-down scan when written independently); no row-at-a-time
    routing code. Branches re-unioned here so the result is one
    oracle-checkable DataFrame.
    """
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    start = events.filter(F.col("event_type") == "signup").select(
        F.lit("start").alias("branch"), "event_id", "user_id"
    )
    page = events.filter(F.col("event_type").isin("view", "click", "purchase")).select(
        F.lit("page").alias("branch"), "event_id", "user_id"
    )
    err = events.filter(F.col("event_type") == "error").select(
        F.lit("error").alias("branch"), "event_id", "user_id"
    )
    return start.unionByName(page).unionByName(err)


@register(
    "config_routing",
    oracle="""
    WITH config(source_table, operate_type, sink_type, sink_table) AS (
        VALUES ('view', 'insert', 'kafka', 'dwd_page_view'),
               ('click', 'insert', 'kafka', 'dwd_page_click'),
               ('error', 'insert', 'kafka', 'dwd_error_log'),
               ('purchase', 'insert', 'hbase', 'dim_purchase'),
               ('signup', 'insert', 'hbase', 'dim_signup')
    )
    SELECT sink_type, sink_table, count(*) AS routed_ct,
           count(DISTINCT user_id) AS user_ct
    FROM events JOIN config ON event_type = source_table
    GROUP BY 1, 2
    """,
    covers=("R3", "P4", "S3", "S7"),
)
def config_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven dynamic routing (CDC → dim/fact fan-out).

    Re-expression of ``TableProcessFunction.java:159-199`` +
    ``BaseDBApp.java:49-68``: per record, look up (table, type) in
    the config table, attach ``sink_table``, route hbase→dim upsert /
    kafka→dynamic-topic producer. Spark: broadcast-join the stream
    with the config DataFrame — the lookup map, 5 s refresh Timer and
    side outputs all collapse into one join whose ``sink_table``
    column the Kafka sink natively honors as the per-record topic
    (S3). The full dynamic version (real projection by sink_columns,
    per-sink writers) lives in ``operators/routing.py``.
    """
    events = load(spark, sf_dir, "events")
    config = spark.createDataFrame(
        [(s, o, st, t) for (s, o, st, t) in TABLE_PROCESS_CONFIG], CONFIG_SCHEMA
    )
    return (
        events.join(F.broadcast(config), events.event_type == config.source_table)
        .groupBy("sink_type", "sink_table")
        .agg(F.count("*").alias("routed_ct"), F.countDistinct("user_id").alias("user_ct"))
    )
