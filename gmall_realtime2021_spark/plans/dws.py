"""DWS layer — windowed multi-metric aggregates (SURVEY.md §2.5, §2.7).

Reference apps re-expressed on the test star schema:

- ``VisitorStatsApp`` (A2/W1/U2)  → visitor_stats over ``events``
- ``ProductStatsApp`` (A1/T4/J3/U1) → product_stats over ``lineitem ⋈ part``
- ``ProvinceStatsApp`` (A5)       → province_stats over ``orders ⋈ dims``
- ``sum_demo`` (A4/W5)            → tumble count-distinct
- ``KeywordStats4ProductApp`` (R5/F2) → metric unpivot
- ``FlinkDemo3`` (A7)             → sum-of-cast from JSON props
- ``Demo1`` (A8)                  → plain grouped count (retract analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import fan_out, load


@register(
    "visitor_stats",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
           event_type,
           count(*) AS pv_ct,
           count(DISTINCT user_id) AS uv_ct,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS dur_sum
    FROM events
    GROUP BY 1, 2, 3
    """,
    covers=("A2", "W1", "W6", "J6"),
)
def visitor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window multi-metric visitor aggregate.

    Re-expression of ``VisitorStatsApp.java:163-201``: keyBy(dims) →
    10 s tumbling event-time window → incremental sums, with window
    bounds re-serialized as strings (``stt``/``edt``). Here the window
    is 1 h over ``events.ts`` and the dims are ``event_type``;
    ``value`` plays ``dur_sum``. The reference's `uj_ct ← uv+uv` bug
    (``VisitorStatsApp.java:179``) is *not* reproduced — intended
    per-metric sums only (documented deviation, SURVEY.md §7).

    Scale: a single hash-aggregate after a scan; Catalyst plans
    partial (map-side) aggregation, so the shuffle carries one row
    per (hour, event_type) per task — the same incremental-combine
    the reference hand-writes with a ReduceFunction.
    """
    events = load(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("dur_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_type",
            "pv_ct",
            "uv_ct",
            "dur_sum",
        )
    )


@register(
    "product_stats",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS stt,
           p_brand,
           count(*) AS item_ct,
           count(DISTINCT l_orderkey) AS order_ct,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS order_sku_num,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS refund_ct,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS refund_amount,
           count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS refund_order_ct,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS comment_ct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
    """,
    covers=("A1", "T4", "J3", "U1", "W1"),
)
def product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed multi-metric product aggregate with distinct counts.

    Re-expression of ``ProductStatsApp.java:224-265``: per sku,
    tumbling window, 13 incrementally-summed metrics plus
    order-id-set sizes (``ProductStats.java:77-86`` accumulates
    HashSets). Conditional metrics mirror the refund/comment branches
    fed by the reference's 7-way union (``ProductStatsApp.java:127-200``).

    Scale: part is dim-sized → broadcast hash join (J3: the
    reference's async Phoenix lookup + Redis cache collapse into
    this). The two exact distinct counts are written as a **manual
    two-phase aggregate** — pre-aggregate on (window, brand,
    orderkey), then finalize on (window, brand) — instead of
    ``countDistinct``: Catalyst plans multi-distinct via Expand,
    which triples the map output before the shuffle, while the
    two-phase form ships one partially-aggregated row per
    (group, orderkey). Also the only shuffle the plan needs — the
    first groupBy's exchange supplies the parallelism fan_out would
    otherwise add (values proven equal to the Expand form).

    The month key stays a TIMESTAMP through both aggregates and is
    formatted to string only on the final (few-hundred-row) output:
    an 8-byte key hashes/compares/ships cheaper than a formatted
    10-char string on every one of the shuffle's rows.

    ``fan_out`` on the orderkey (fires only when the scan is
    under-partitioned, i.e. the single-row-group fixture): the hash
    exchange it adds IS the exchange the first groupBy needs
    (l_orderkey ⊆ its keys, so Catalyst reuses the partitioning and
    plans no second shuffle) — the join + 7-metric partial aggregate
    move off the single scan core at zero extra exchange cost.
    """
    li = fan_out(load(spark, sf_dir, "lineitem"), "l_orderkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    zero = F.lit(0).cast("decimal(18,2)")
    per_order = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("stt_ts"),
            F.col("p_brand"),
            F.col("l_orderkey"),
        )
        .agg(
            F.count("*").alias("_ct"),
            F.sum(dec("l_quantity")).alias("_qty"),
            F.sum(dec("l_extendedprice")).alias("_amt"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_ref_ct"),
            F.sum(F.when(F.col("l_returnflag") == "R", dec("l_extendedprice")).otherwise(zero)).alias("_ref_amt"),
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_has_ref"),
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("_cmt"),
        )
    )
    return (
        per_order.groupBy("stt_ts", "p_brand")
        .agg(
            F.sum("_ct").alias("item_ct"),
            F.count("*").alias("order_ct"),
            F.sum("_qty").cast("double").alias("order_sku_num"),
            F.sum("_amt").cast("double").alias("order_amount"),
            F.sum("_ref_ct").alias("refund_ct"),
            F.sum("_ref_amt").cast("double").alias("refund_amount"),
            F.sum("_has_ref").cast("long").alias("refund_order_ct"),
            F.sum("_cmt").alias("comment_ct"),
        )
        .withColumn("stt", F.date_format("stt_ts", "yyyy-MM-dd"))
        .drop("stt_ts")
        .select(
            "stt", "p_brand", "item_ct", "order_ct", "order_sku_num",
            "order_amount", "refund_ct", "refund_amount", "refund_order_ct", "comment_ct",
        )
    )


@register(
    "province_stats",
    oracle="""
    SELECT r_name AS region_name,
           n_name AS province_name,
           count(DISTINCT o_orderkey) AS order_count,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
    covers=("A5", "J3"),
)
def province_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-province order count-distinct + amount sum.

    Re-expression of ``ProvinceStatsApp.java:39-55`` (with the
    reference's missing-FROM / ``provinnce_name`` typos fixed to the
    intended query — documented deviation, SURVEY.md §2.5 A5). The
    province dim hierarchy maps to customer→nation→region.

    Scale: both dims broadcast; the only shuffle is the final agg on
    (region, province) — low cardinality, partial agg collapses it.
    """
    orders = fan_out(load(spark, sf_dir, "orders"), "o_orderkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("province_name"))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("order_amount"),
        )
    )


@register(
    "tumble_count_distinct",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS dt,
           event_type,
           count(DISTINCT user_id) AS uid_ct
    FROM events
    GROUP BY 1, 2
    """,
    covers=("A4", "W2", "W5"),
)
def tumble_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TUMBLE count(distinct) — ``sum_demo.java:52-59``:
    ``count(distinct common['uid'])`` per (window, os); here daily
    windows × event_type over ``events``. Batch uses exact
    countDistinct; the streaming skin's two-phase dedup-then-count
    variant lives in ``streaming/jobs.py`` (SURVEY.md §4.2).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("dt"), "event_type")
        .agg(F.countDistinct("user_id").alias("uid_ct"))
    )


@register(
    "keyword_metric_unpivot",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_ct,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_ct
        FROM events GROUP BY user_id
    )
    SELECT user_id, source, ct FROM (
        SELECT user_id, 'CLICK' AS source, click_ct AS ct FROM per_user
        UNION ALL SELECT user_id, 'VIEW', view_ct FROM per_user
        UNION ALL SELECT user_id, 'ORDER', order_ct FROM per_user
    ) WHERE ct > 0
    """,
    covers=("R5", "F2", "A6"),
)
def keyword_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-columns → rows unpivot, zero rows suppressed.

    Re-expression of the ``keywordProductC2R`` UDTF
    (``KeywordProductC2RUDTF.java:14-38``): (click_ct, cart_ct,
    order_ct) exploded to (ct, source) rows, skipping zeros. Spark
    expresses the UDTF as a ``stack`` projection — no UDF, no
    shuffle beyond the feeding aggregate.
    """
    events = load(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("click_ct"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("view_ct"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("order_ct"),
    )
    return per_user.select(
        "user_id",
        F.expr("stack(3, 'CLICK', click_ct, 'VIEW', view_ct, 'ORDER', order_ct) AS (source, ct)"),
    ).filter(F.col("ct") > 0)


@register(
    "sum_of_cast",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY event_type
    """,
    covers=("A7", "P7"),
)
def sum_of_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sum(cast(map['field'] as int))`` — ``FlinkDemo3.java:75`` /
    ``FlinkDemo1.scala:77``: aggregate a casted field pulled out of a
    semi-structured payload (``events.props`` JSON plays the
    ``start`` map). Integer sum is order-exact, no decimal detour.
    """
    events = load(spark, sf_dir, "events")
    return (
        events.select("event_type", F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"))
    )


@register(
    "grouped_count",
    oracle="SELECT user_id, count(*) AS ct FROM events GROUP BY user_id",
    covers=("A8",),
)
def grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-windowed grouped count — ``Demo1.java:54-58``'s retract-
    stream aggregate; batch form is a plain groupBy, the streaming
    skin runs the same plan in update mode (SURVEY.md §3.2).
    """
    return load(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("ct"))


@register(
    "product_stats_approx",
    oracle=None,  # HLL sketch values are engine-specific by design
    covers=(),
    doc="approx_count_distinct variant of product_stats (scale/streaming path)",
)
def product_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-distinct variant of ``product_stats``.

    Exact per-window distincts force an Expand (×3 input rows) and a
    wide shuffle; at 100 TB — or under streaming where exact distinct
    aggregates are disallowed — the HLL++ sketch
    (``approx_count_distinct``, rsd 2%) keeps the aggregate a single
    partial/final hash-agg with O(groups × sketch) state. Sketch
    values are engine-specific, so this plan is rows-only checked by
    the driver; tests/test_approx.py bounds its error against the
    exact plan instead.
    """
    li = fan_out(load(spark, sf_dir, "lineitem"))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            # timestamp key through the shuffle, string only on output
            # rows — same rationale as product_stats
            F.date_trunc("month", "l_shipdate").alias("stt_ts"),
            F.col("p_brand"),
        )
        .agg(
            F.count("*").alias("item_ct"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("order_ct_approx"),
        )
        .select(
            F.date_format("stt_ts", "yyyy-MM-dd").alias("stt"),
            "p_brand",
            "item_ct",
            "order_ct_approx",
        )
    )
