"""Env-gated Kafka integration smoke (S1-S4).

The sandbox has no broker, so every CI run exercises the Kafka
surfaces through file-source twins (see ``sources/streams.py`` module
docstring). This test is the real-broker counterpart: set
``KAFKA_BROKERS=host:9092`` (and have ``spark-sql-kafka`` on the
classpath) and it drives one topic end-to-end through the exact
production builders — ``dynamic_topic_kafka`` shaping on the way in
(`MyKafkaUtil.java:36-42`), ``kafka_raw_stream`` + an availableNow
streaming read on the way out (`MyKafkaUtil.java:23-29`).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("KAFKA_BROKERS")

pytestmark = pytest.mark.skipif(
    not BROKERS, reason="set KAFKA_BROKERS=host:9092 to run the broker round-trip"
)


def test_kafka_round_trip_dynamic_topic(spark, tmp_path):
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.sources.streams import kafka_raw_stream
    from gmall_realtime2021_spark.streaming.sinks import dynamic_topic_kafka

    topic = f"graft_smoke_{uuid.uuid4().hex[:8]}"
    rows = [(topic, i, f"payload-{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "sink_table string, k long, v string")

    # in: the S3 per-record-topic shaping, batch-written to the broker
    shaped = dynamic_topic_kafka(df, BROKERS)
    assert shaped.columns == ["topic", "value"]
    (
        shaped.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .save()
    )

    # out: the S1 streaming consumer, drained with availableNow
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = kafka_raw_stream(spark, topic, BROKERS, starting_offsets="earliest")
    q = (
        stream.select("value")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["k"], r["v"])
        for r in (json.loads(row.value) for row in spark.read.parquet(out_dir).collect())
    }
    assert got == {(i, f"payload-{i}") for i in range(10)}
