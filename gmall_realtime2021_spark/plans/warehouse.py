"""Plans over the MATERIALIZED physical layouts
(``sources/warehouse.py``): the bucketed fact-fact join and the
date-partition-pruned event scan.

Layout is value-invisible — each oracle twin reads the same rows from
the raw parquet views — so the driver's hash compare pins that the
re-layout is lossless while the physical-plan tests
(``tests/test_physical_plans.py``) pin what the layout buys: a
``lineitem ⋈ orders`` sort-merge join with ZERO exchanges and zero
per-query sorts, and an events scan whose date predicate prunes
partitions at planning time (``PartitionFilters``).

Reference analog: the reference's layer-to-layer Kafka topics and
ClickHouse MergeTree sinks ARE its materialized layout
(``ClickHouseUtil.java:31-76``); at 100 TB the equivalent Spark move
is bucketing the hot join key and partitioning the hot range key,
which until this module the engine only narrated in docstrings
(``operators/retrieval.py``, ``streaming/sinks.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.plans.oracle_fragments import sql_poly_hash
from gmall_realtime2021_spark.sources.warehouse import (
    ensure_bucketed_events,
    ensure_bucketed_facts,
    ensure_day_bucketed_events,
    layout_health_stats,
    read_ivf_embeddings,
    read_partitioned_events,
    read_split_documents,
)

#: Date range for the partition-pruning demonstration (inclusive /
#: exclusive) — interior days present at every fixture scale.
EVENTS_FROM, EVENTS_TO = "2024-01-10", "2024-01-20"

#: Lookback margin for the date-bounded enrich plan: the 30-minute
#: window frame can reach at most one day before the serving range,
#: so the scan includes exactly one margin day before EVENTS_FROM.
EVENTS_MARGIN_FROM = "2024-01-09"


@register(
    "bucketed_order_totals",
    oracle="""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority,
           count(*) AS line_ct,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    covers=(),
    doc="bucketed-layout fact-fact join: per-order line rollup with zero exchanges",
)
def bucketed_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line rollup computed on the BUCKETED layout: both
    fact tables read from ``bucketBy(N, orderkey).sortBy`` storage,
    joined with a merge hint (at 100 TB both sides are fact-sized —
    broadcast is never on the table), grouped on the bucket key.

    The whole plan runs exchange-free: the scan's bucket partitioning
    satisfies the join's distribution on both sides AND the final
    aggregate's clustering (o_orderkey ⊆ group keys), and the
    per-bucket sort order satisfies the merge join's ordering, so
    neither a shuffle nor a sort appears anywhere
    (``tests/test_physical_plans.py::test_bucketed_join_no_exchange``).
    Money follows the registry cents discipline.
    """
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    li = spark.table(lineitem_t)
    o = spark.table(orders_t)
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.count("*").alias("line_ct"),
            F.sum(rev_cents).alias("revenue_cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "line_ct",
            "revenue_cents",
            "total_qty",
        )
    )


@register(
    "bucketed_order_wide",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_custkey AS user_id,
           o_orderstatus AS order_status,
           o_totalprice AS total_amount,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS create_time,
           CAST(epoch(o_orderdate) AS BIGINT) * 1000 AS create_ts,
           l_linenumber AS detail_id,
           l_partkey AS sku_id,
           l_quantity AS sku_num,
           l_extendedprice AS split_total_amount,
           strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_time
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
    """,
    covers=("J1", "J6", "P9"),
    doc="the flagship interval join (order_wide) on the bucketed layout: zero exchanges, zero sorts",
)
def bucketed_order_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``order_wide`` — the reference's flagship stream-stream shape
    (``OrderWideApp.java:101-112``) — switched onto the bucketed
    layout (VERDICT r10 item #3). The unbucketed twin shuffles BOTH
    fact sides on every run (x8 scale-probe α 0.75, row-dominated
    linear); here the orderkey equi-join rides the co-located,
    co-sorted buckets and the 30-day interval predicate evaluates as
    the merge join's residual condition — the whole plan has ZERO
    exchanges and ZERO sorts
    (``tests/test_physical_plans.py::test_bucketed_order_wide_no_exchange``).
    Same oracle as ``order_wide``: the layout is value-invisible.
    """
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    o = spark.table(orders_t)
    li = spark.table(lineitem_t)
    joined = o.hint("merge").join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & li.l_shipdate.between(o.o_orderdate, o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    )
    return joined.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("total_amount"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
        (F.unix_timestamp("o_orderdate") * 1000).alias("create_ts"),
        F.col("l_linenumber").alias("detail_id"),
        F.col("l_partkey").alias("sku_id"),
        F.col("l_quantity").alias("sku_num"),
        F.col("l_extendedprice").alias("split_total_amount"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_time"),
    )


@register(
    "bucketed_payment_wide",
    oracle="""
    SELECT p.user_id AS user_id,
           count(*) AS matched_ct,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS matched_value
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
     AND e.event_id <> p.event_id
    GROUP BY 1
    """,
    covers=("J2", "J6", "P9"),
    doc="the asymmetric interval self-join (payment_wide) on the user-bucketed layout: zero exchanges, zero sorts",
)
def bucketed_payment_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``payment_wide`` — the reference's payment⋈order flagship
    (``PaymentWideApp.java:65-75``) — switched onto the USER-bucketed
    events layout: both sides of the self-join read the same
    ``bucketBy(N, user_id).sortBy`` storage, so the user_id equi-join
    rides co-located, co-sorted buckets with the backward-looking
    30-minute window and the event-id inequality as merge-join
    residuals, and the per-user rollup rides the same partitioning —
    ZERO exchanges and ZERO sorts in the whole plan (pinned). The
    unbucketed twin shuffles the event stream twice every run. Same
    oracle as ``payment_wide`` — the layout is value-invisible.

    Role since r12: the labeled PAIR-AUDIT twin. The merge join still
    materializes every qualifying (payment, prior-event) pair before
    the rollup, so its cost grows quadratically in per-user event
    density (x16 isolated α 1.58, SCALEPROBE16_r11 — output-bound,
    the plan stays shuffle-free and sublinear in its own output);
    ``bucketed_payment_enrich`` is the bounded serving form (range
    window, no pair step) and the default recommendation for
    downstream aggregation.
    """
    events_t = ensure_bucketed_events(spark, sf_dir)
    pay = (
        spark.table(events_t)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pay_ts"),
            F.col("event_id").alias("pay_id"),
        )
    )
    prior = spark.table(events_t).select("user_id", "ts", "event_id", "value")
    return (
        pay.hint("merge")
        .join(
            prior,
            (prior.user_id == pay.p_user)
            & prior.ts.between(pay.pay_ts - F.expr("INTERVAL 30 MINUTES"), pay.pay_ts)
            & (prior.event_id != pay.pay_id),
        )
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("*").alias("matched_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("matched_value"),
        )
    )


@register(
    "bucketed_payment_enrich",
    oracle="""
    SELECT user_id, event_id AS pay_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS pay_time,
           prior_ct,
           CAST(prior_value AS DOUBLE) AS prior_value
    FROM (
        SELECT user_id, event_id, ts, event_type,
               count(*) OVER w - 1 AS prior_ct,
               sum(CAST(value AS DECIMAL(18,2))) OVER w
                   - CAST(value AS DECIMAL(18,2)) AS prior_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
    )
    WHERE event_type = 'purchase'
    """,
    covers=("J2", "J6", "P9"),
    doc="the bounded-output serving form of payment_wide: per-payment 30-min enrichment via a range window, no pair join",
)
def bucketed_payment_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-OUTPUT serving form of the payment⋈order flagship
    (VERDICT r11 item #1): one row per payment, carrying the
    30-minute-lookback aggregate (count and value of the user's prior
    events) instead of one row per qualifying (payment, prior-event)
    PAIR. The reference's consumer only ever aggregates the wide rows
    (``PaymentWideApp.java:65-75`` feeding ``ProductStatsApp``), so
    this is semantics-preserving for every downstream use while
    replacing the join twin's quadratic-in-density intermediate with
    a sliding range frame: output and work are O(events), not
    O(qualifying pairs) — the x16 density probe rides α ≈ 1, where
    ``bucketed_payment_wide`` (kept as the labeled pair-audit twin)
    measured α 1.58.

    Physical shape: the window's required distribution
    (hash(user_id)) and ordering ((user_id, ts)) are both satisfied
    by the user-bucketed, ``(user_id, ts)``-sorted events layout, so
    the whole plan — scan → window → purchase filter — runs with ZERO
    exchanges and ZERO sorts (pinned in
    ``tests/test_physical_plans.py``). The frame arithmetic follows
    the registry decimal discipline; ties in ``ts`` are RANGE-frame
    peers in both engines, matching the join twin's inclusive-bound
    semantics. ``prior_ct`` subtracts the frame's self row, so a
    payment with no prior events is SERVED (with zeros) rather than
    dropped — the inner-join twin omits it; downstream aggregation is
    unaffected and the serving contract is strictly more complete.
    """
    events_t = ensure_bucketed_events(spark, sf_dir)
    w = (
        "(PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)"
    )
    return (
        spark.table(events_t)
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.expr(f"count(*) OVER {w} - 1").alias("prior_ct"),
            (
                F.expr(f"sum(CAST(value AS DECIMAL(18,2))) OVER {w}")
                - F.col("value").cast("decimal(18,2)")
            ).alias("prior_value"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("pay_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("pay_time"),
            "prior_ct",
            F.col("prior_value").cast("double").alias("prior_value"),
        )
    )


@register(
    "bucketed_payment_enrich_day",
    oracle=f"""
    SELECT user_id, event_id AS pay_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS pay_time,
           prior_ct,
           CAST(prior_value AS DOUBLE) AS prior_value
    FROM (
        SELECT user_id, event_id, ts, event_type,
               count(*) OVER w - 1 AS prior_ct,
               sum(CAST(value AS DECIMAL(18,2))) OVER w
                   - CAST(value AS DECIMAL(18,2)) AS prior_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
    )
    WHERE event_type = 'purchase'
      AND CAST(ts AS DATE) >= DATE '{EVENTS_FROM}'
      AND CAST(ts AS DATE) < DATE '{EVENTS_TO}'
    """,
    covers=("J2", "J6", "P9"),
    doc="date-bounded payment enrichment: partition-pruned scan + exchange-free range window on the day+user layout",
)
def bucketed_payment_enrich_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATE-BOUNDED serving form of the payment enrichment
    (VERDICT r12 item #4): "payments in [day range]" with the same
    30-minute-lookback aggregate as ``bucketed_payment_enrich``,
    served from the day-partitioned + user-bucketed layout
    (``sources/warehouse.ensure_day_bucketed_events``). The unbounded
    form scans the full event history per query — fine while history
    is small, a scan-dominated plan at years-of-events scale; here
    the ``event_date`` predicate prunes the scan to the serving
    window PLUS ONE MARGIN DAY (the window frame reaches back 30
    minutes, so only the immediately preceding day can contribute to
    an in-window payment's frame) at PLANNING time, and the bucket
    metadata still satisfies the window's hash(user_id) distribution.

    Physical shape (pinned in ``tests/test_physical_plans.py``):
    ``PartitionFilters`` on the scan, ZERO exchanges, ONE bucket-local
    sort (in-bucket order is per (day, bucket) file, so the multi-day
    scan re-sorts within buckets — no shuffle). Frame semantics,
    money discipline, and the serve-zero-prior contract are identical
    to the unbounded form; margin-day rows enter the frame arithmetic
    but are filtered from the OUTPUT by the day bound, so values
    match a full-history computation exactly (the oracle computes
    over all events then applies the same day bound). The
    history-growth probe (``tools/scale_probe.py --history``) pins
    the scale claim: serving time stays flat as history grows with
    the query window fixed, while the unbounded form grows linearly.
    """
    events_t = ensure_day_bucketed_events(spark, sf_dir)
    w = (
        "(PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)"
    )
    return (
        spark.table(events_t)
        # margin-inclusive PLANNING-time prune: window + 1 lookback day
        .filter(
            (F.col("event_date") >= F.lit(EVENTS_MARGIN_FROM))
            & (F.col("event_date") < F.lit(EVENTS_TO))
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "event_date",
            F.expr(f"count(*) OVER {w} - 1").alias("prior_ct"),
            (
                F.expr(f"sum(CAST(value AS DECIMAL(18,2))) OVER {w}")
                - F.col("value").cast("decimal(18,2)")
            ).alias("prior_value"),
        )
        # OUTPUT bound: in-window purchases only (margin day rows
        # served the frame arithmetic, never the result)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("event_date") >= F.lit(EVENTS_FROM))
        )
        .select(
            "user_id",
            F.col("event_id").alias("pay_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("pay_time"),
            "prior_ct",
            F.col("prior_value").cast("double").alias("prior_value"),
        )
    )


@register(
    "events_daily_partitioned",
    oracle=f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS event_ct,
           count(DISTINCT user_id) AS user_ct,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '{EVENTS_FROM}'
      AND CAST(ts AS DATE) < DATE '{EVENTS_TO}'
    GROUP BY 1
    """,
    covers=(),
    doc="date-partitioned layout: range query served by partition pruning",
)
def events_daily_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event rollup over a ten-day range, served from the
    DATE-PARTITIONED event log: the ``event_date`` predicate is a
    partition filter, so planning selects ~10 of the day directories
    and the scan never opens an off-range file — at 100 TB (years of
    events) this is the difference between reading 10 days and
    reading the table
    (``tests/test_physical_plans.py::test_partitioned_events_pruning``
    pins ``PartitionFilters``). The oracle reads the same rows from
    the raw events view, proving the re-layout lossless.
    """
    ev = read_partitioned_events(spark, sf_dir).filter(
        (F.col("event_date") >= F.lit(EVENTS_FROM)) & (F.col("event_date") < F.lit(EVENTS_TO))
    )
    return (
        ev.groupBy(F.date_format("event_date", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("event_ct"),
            F.countDistinct("user_id").alias("user_ct"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("value_cents"),
        )
    )


@register(
    "layout_health",
    # Filesystem-metadata plan: the numbers come from the layout
    # directories themselves (file counts/bytes per bucket/partition/
    # cell), which no lake-table SQL can derive — rows-only driver
    # check; the value behavior is pinned by
    # tests/test_layout.py::test_layout_health_flags_fragmentation.
    oracle=None,
    covers=(),
    doc="at-rest layout observability: per-family occupancy, fragmentation, and compaction-due flags",
)
def layout_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable health for ALL at-rest layout families
    (``sources/warehouse.layout_health_stats``): one row per family
    with unit occupancy (buckets / day partitions / IVF cells /
    splits), file and byte totals, worst per-unit file count, how
    many units exceed their auto-compaction threshold, whether
    compaction is due, and — for the bucketed families — whether the
    single-file-per-bucket SORT-serving property currently holds,
    plus (r13) the snapshot-isolation picture: generation-directory
    count and how many retired generations await GC (the disk cost of
    serving readers across maintenance flips). This turns "when is
    compaction due" from maintenance-code internals into a catalog
    query, the operational complement of ``ivf_cell_stats`` (which
    reports index GEOMETRY, not file state)."""
    schema = (
        "family string, kind string, units long, data_files long, total_bytes long, "
        "max_files_per_unit long, fragmented_units long, compact_due boolean, "
        "sorted_serving boolean, generations long, gc_pending long"
    )
    return spark.createDataFrame(
        sorted(layout_health_stats(spark, sf_dir), key=lambda r: r["family"]), schema
    )


@register(
    "train_split_stats",
    oracle=f"""
    WITH assigned AS (
        SELECT source, text,
               {sql_poly_hash('lower(text)')} % 100 AS bucket
        FROM documents
    )
    SELECT source,
           count(*) AS doc_ct,
           CAST(sum(length(text)) AS BIGINT) AS char_ct
    FROM assigned WHERE bucket < 80
    GROUP BY source
    """,
    covers=(),
    doc="training-split stats served from the split-partitioned corpus (metadata-level leakage guarantee)",
)
def train_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source statistics of the TRAINING slice, served from the
    SPLIT-PARTITIONED corpus (``sources/warehouse.
    ensure_split_documents``): the ``split='train'`` predicate is a
    partition filter, so the val/test directories are never listed —
    the train/eval isolation that ``leakage_free_split`` proves
    logically becomes a PHYSICAL property of the layout (a training
    job cannot read bytes it never opens). Pinned in
    ``tests/test_physical_plans.py``; the oracle derives the same
    80/10/10 content-hash split on the raw table, proving the
    re-layout lossless.
    """
    docs = read_split_documents(spark, sf_dir).filter(F.col("split") == "train")
    return docs.groupBy("source").agg(
        F.count("*").alias("doc_ct"),
        F.sum(F.length("text")).cast("long").alias("char_ct"),
    )


@register(
    "bucketed_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate + INTERVAL 10 DAY
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
    covers=(),
    doc="TPC-H Q3 shape re-run on the bucketed layout: one broadcast, zero shuffle exchanges",
)
def bucketed_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``shipping_priority`` (the TPC-H Q3 shape) re-expressed on the
    bucketed layout — the "switch your existing query onto the
    warehouse" demonstration. The segment-filtered customer dim
    broadcasts into ``orders`` (a broadcast join PRESERVES the
    streamed side's bucket partitioning and ordering), then the
    lineitem⋈orders merge join and the per-order aggregate both ride
    the bucket partitioning: the whole Q3 pipeline plans with exactly
    ONE broadcast exchange and ZERO shuffle exchanges, where the
    unbucketed twin shuffles both fact sides every run. Same oracle
    as ``shipping_priority`` — the layout is value-invisible.
    """
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    from gmall_realtime2021_spark.tables import load

    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.table(orders_t)
    li = spark.table(lineitem_t)
    enriched = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.hint("merge")
        .join(
            enriched,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 10 DAYS")),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / 100.0
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


def _layout_contract_oracle() -> str:
    from gmall_realtime2021_spark.plans.similarity import _sql_cell_scores

    split_expr = (
        f"CASE WHEN {sql_poly_hash('lower(text)')} % 100 < 80 THEN 'train' "
        f"WHEN {sql_poly_hash('lower(text)')} % 100 < 90 THEN 'val' ELSE 'test' END"
    )
    return f"""
    SELECT 'facts_orders' AS family, count(*) AS row_ct,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum, CAST(-1 AS BIGINT) AS units
    FROM orders
    UNION ALL
    SELECT 'facts_lineitem', count(*), CAST(sum(l_orderkey) AS BIGINT), CAST(-1 AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_by_user', count(*), CAST(sum(event_id) AS BIGINT), CAST(-1 AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_by_day', count(*), CAST(sum(event_id) AS BIGINT),
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_day_user', count(*), CAST(sum(event_id) AS BIGINT),
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_split', count(*), CAST(sum(doc_id) AS BIGINT),
           CAST(count(DISTINCT {split_expr}) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'embeddings_ivf', count(*), CAST(sum(vec_id) AS BIGINT),
           CAST(count(DISTINCT cell) AS BIGINT)
    FROM (
        SELECT vec_id,
               CAST(list_position(scores, list_min(scores)) AS BIGINT) AS cell
        FROM (SELECT vec_id, {_sql_cell_scores('embedding')} AS scores FROM embeddings)
    )
    """


@register(
    "layout_contract",
    oracle=_layout_contract_oracle(),
    covers=(),
    doc="at-rest layout row/key/geometry contract vs the raw tables (driver-verifiable twin of layout_health)",
)
def layout_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRIVER-VERIFIABLE contract behind ``layout_health`` (r14,
    VERDICT r13 item #6): ``layout_health`` itself reports filesystem
    facts (file counts, bytes, generation dirs) that no base-table
    SQL can derive, so it is structurally ``no_oracle``. This twin
    pins everything about the layouts that IS derivable: per family,
    the exact ROW COUNT, a key CHECKSUM (sum of the family's id
    column), and — for the value-partitioned families — the distinct
    partition-unit count (days / splits / IVF cells), all read
    through each family's SERVING path (manifest resolution,
    generation flip, bucket metadata included). The DuckDB twin
    recomputes all three from the raw parquet, so a layout that ever
    loses, duplicates, or mis-assigns a row under
    ensure/append/compact/GC fails the driver's hash compare.

    ``units`` is −1 for the hash-bucketed families: Spark's bucket
    hash is engine-internal, so bucket geometry has no portable SQL
    twin (the physical-plan tests pin it instead).
    """
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    events_t = ensure_bucketed_events(spark, sf_dir)
    day_events_t = ensure_day_bucketed_events(spark, sf_dir)

    def row(family: str, df: DataFrame, key: str, unit_col: str | None) -> DataFrame:
        units = (
            F.count_distinct(F.col(unit_col)).cast("long")
            if unit_col
            else F.lit(-1).cast("long")
        )
        return df.agg(
            F.count("*").alias("row_ct"),
            F.sum(F.col(key)).cast("long").alias("key_sum"),
            units.alias("units"),
        ).select(F.lit(family).alias("family"), "row_ct", "key_sum", "units")

    parts = [
        row("facts_orders", spark.table(orders_t), "o_orderkey", None),
        row("facts_lineitem", spark.table(lineitem_t), "l_orderkey", None),
        row("events_by_user", spark.table(events_t), "event_id", None),
        row("events_by_day", read_partitioned_events(spark, sf_dir), "event_id", "event_date"),
        row("events_day_user", spark.table(day_events_t), "event_id", "event_date"),
        row("documents_split", read_split_documents(spark, sf_dir), "doc_id", "split"),
        row("embeddings_ivf", read_ivf_embeddings(spark, sf_dir), "vec_id", "cell"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
