"""Source builders — the engine's ingest layer.

The reference ingests everything from Kafka (`MyKafkaUtil.java:23-29`
string consumer, `:45-53` SQL DDL source; Maxwell CDC JSON on
``ods_base_db_m`` — SURVEY.md §2.1 S1/S4/S10). This engine exposes the
same two shapes:

- :func:`kafka_raw_stream` / :func:`kafka_json_stream` — the
  production path (S1/S4). Requires the spark-sql-kafka package on the
  cluster; the local test container has no broker, so tests exercise
  the identical downstream plans through :func:`file_stream` /
  :func:`table_stream` instead (sources are interchangeable: every
  job in ``streaming/jobs.py`` takes a DataFrame, never a topic name).
- :func:`file_stream` / :func:`table_stream` — file-based streaming
  source over the same parquet fixtures the batch plans read; used by
  the batch≡streaming equivalence tests (SURVEY.md §5).

Scale note: the Kafka source's parallelism is one partition per topic
partition; the file source splits by file. Both hand Catalyst an
ordinary streaming DataFrame, so the downstream plan (and its
incremental execution) is identical whichever source feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_raw_stream(
    spark: SparkSession,
    topic: str,
    brokers: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 — Kafka topic as a stream of (key, value) strings.

    Twin of ``MyKafkaUtil.getKafkaSource`` (`MyKafkaUtil.java:23-29`);
    ``latest`` matches the reference's `latest-offset`
    (`MyKafkaUtil.java:51`).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "timestamp",
        )
    )


def kafka_json_stream(
    spark: SparkSession,
    topic: str,
    brokers: str,
    schema: T.StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S4 — Kafka JSON topic as a typed streaming table.

    Twin of the SQL DDL source (`MyKafkaUtil.java:45-53`,
    `KeywordStatsApp.java:42-48`): JSON value parsed against an
    explicit schema, permissive like the reference's fastjson
    (malformed → null columns, record passes through).
    """
    raw = kafka_raw_stream(spark, topic, brokers, starting_offsets)
    return raw.select(F.from_json("value", schema).alias("r"), "timestamp").select("r.*", "timestamp")


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (test/replay ingest).

    ``max_files_per_trigger`` throttles to one-or-few files per
    micro-batch — the test harness uses it to force multi-batch runs
    so watermark advancement and state-timeout paths really execute.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


#: Maxwell/Debezium-style CDC envelope (S10): the reference ingests
#: ``ods_base_db_m`` as Maxwell JSON ``{database, table, type, ts,
#: data}`` (`TableProcessFunction.java:166-170`, SURVEY.md §2.1 S10).
#: ``data`` is schema-on-read: a string→string map, like the
#: reference's fastjson JSONObject.
MAXWELL_ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
)


def maxwell_cdc_parse(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S10 + P3 — parse a Maxwell CDC JSON stream and drop malformed
    records.

    Twin of ``BaseDBApp.java:43-48``: permissive JSON parse, then
    keep only records with a real table and payload (non-null,
    len(data-json) > 3). Composes with
    ``operators.routing.route_by_config`` for the dim/fact fan-out.
    """
    parsed = raw.select(F.from_json(F.col(value_col), MAXWELL_ENVELOPE).alias("r")).select("r.*")
    return parsed.filter(
        F.col("table").isNotNull()
        & F.col("data").isNotNull()
        & (F.length(F.to_json("data")) > 3)
    )


def table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A fixture table (TESTDATA.md) as a streaming DataFrame with the
    same column types :func:`tables.load` yields for batch — so a plan
    built against one is valid against the other.
    """
    import os

    from gmall_realtime2021_spark.tables import TABLES, load

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Schema from the batch reader — including the nanos→long shape of
    # events.ts under spark.sql.legacy.parquet.nanosAsLong (older
    # fixture generations only; current fixtures are TIMESTAMP(MICROS)).
    raw_schema = spark.read.parquet(path).schema
    df = file_stream(spark, path, raw_schema)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df
