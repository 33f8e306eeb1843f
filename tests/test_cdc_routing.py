"""CDC ingest path (SURVEY.md §3.3): Maxwell envelope parse (S10/P3)
→ config-driven routing (R3/P4) → dim/fact split, to_json fact
payloads (P10/S3 shape). End-to-end twin of
BaseDBApp + TableProcessFunction + DimSink.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_realtime2021_spark.operators.routing import route_by_config
from gmall_realtime2021_spark.sources import maxwell_cdc_parse
from gmall_realtime2021_spark.streaming import dynamic_topic_kafka

RAW = [
    '{"database":"gmall","table":"order_info","type":"insert","ts":1700000000,'
    '"data":{"id":"1","user_id":"7","total_amount":"99.5","secret":"x"}}',
    '{"database":"gmall","table":"user_info","type":"bootstrap-insert","ts":1700000001,'
    '"data":{"id":"7","name":"u7","birthday":"2000-01-01"}}',
    '{"database":"gmall","table":"order_info","type":"update","ts":1700000002,'
    '"data":{"id":"1","user_id":"7","total_amount":"100.0"}}',
    '{"database":"gmall","table":"ignored_tbl","type":"insert","ts":1700000003,'
    '"data":{"id":"9"}}',
    '{"database":"gmall","table":"order_info","type":"insert","ts":1700000004,"data":{}}',
    "not json at all",
]

CONFIG = [
    ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount"),
    ("user_info", "insert", "hbase", "dim_user_info", "id,name"),
]
CONFIG_COLS = ["source_table", "operate_type", "sink_type", "sink_table", "sink_columns"]


def test_cdc_parse_route_split(spark):
    raw = spark.createDataFrame([(s,) for s in RAW], "value string")
    parsed = maxwell_cdc_parse(raw)
    # malformed filter: empty-data and non-JSON records dropped
    assert parsed.count() == 4

    config = spark.createDataFrame(CONFIG, CONFIG_COLS)
    routed = route_by_config(parsed, config)
    rows = {(r.source_table, r.operate_type, r.sink_type, r.sink_table): r.data for r in routed.collect()}
    # update has no config entry -> dropped; bootstrap-insert normalized
    assert set(rows) == {
        ("order_info", "insert", "kafka", "dwd_order_info"),
        ("user_info", "insert", "hbase", "dim_user_info"),
    }
    # P4: column projection by sink_columns CSV (secret/birthday dropped)
    assert rows[("order_info", "insert", "kafka", "dwd_order_info")] == {
        "id": "1",
        "user_id": "7",
        "total_amount": "99.5",
    }
    assert rows[("user_info", "insert", "hbase", "dim_user_info")] == {"id": "7", "name": "u7"}


def test_fact_branch_kafka_shape(spark):
    raw = spark.createDataFrame([(s,) for s in RAW], "value string")
    config = spark.createDataFrame(CONFIG, CONFIG_COLS)
    routed = route_by_config(maxwell_cdc_parse(raw), config)
    facts = routed.filter(F.col("sink_type") == "kafka").drop("sink_type")
    shaped = dynamic_topic_kafka(facts, brokers="unused:9092")
    row = shaped.collect()[0]
    assert row.topic == "dwd_order_info"
    assert '"user_id":"7"' in row.value  # P10: to_json payload
