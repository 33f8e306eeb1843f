"""User-behavior analytics over the event stream: cohort retention
and ordered-funnel conversion.

The reference's DWS layer stops at per-window visitor/product/keyword
counts; a real e-commerce warehouse serves retention and funnel
dashboards from the same cleaned event stream (the reference's
``dwd_page_log`` consumers are exactly this input shape). Both plans
are pure conditional-aggregate pipelines — no self-joins over raw
events, no UDFs — so they scale as a handful of user-keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.sources.warehouse import read_partitioned_events
from gmall_realtime2021_spark.tables import load


@register(
    "cohort_retention",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (
        SELECT user_id, min(d) AS first_d FROM daily GROUP BY user_id
    ),
    offsets AS (
        SELECT DISTINCT daily.user_id,
               strftime(first_d, '%Y-%m-%d') AS cohort_date,
               date_diff('day', first_d, d) // 7 AS week_offset
        FROM daily JOIN firsts ON daily.user_id = firsts.user_id
    )
    SELECT cohort_date, week_offset, count(*) AS active_users
    FROM offsets
    GROUP BY cohort_date, week_offset
    """,
    covers=("A4", "T2"),
    doc="cohort retention: first-activity date × week offset × distinct users",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity
    date, counted in each subsequent week they return.

    Shape: one explicit hash repartition on user_id up front, then
    every user-keyed step — the (user, day) dedup, the first-activity
    min (a window, not a groupBy+join: the join form scanned and
    deduped ``daily`` once per side), and the (user, cohort, offset)
    dedup — reuses that single exchange, because HashPartitioning on
    a SUBSET of an aggregate's grouping keys satisfies its clustering
    requirement. Only the final low-cardinality (cohort, offset)
    count pays a second (tiny) shuffle: 2 exchanges and 1 scan where
    the join form paid 4 and 2. The final count is a plain count(*)
    over the deduped frame, not a countDistinct — dedup happened
    upstream where the key was narrower.

    r11: reads the DATE-PARTITIONED event log (the reference's
    dashboards scan partitioned MergeTree tables,
    ``ClickHouseUtil.java:31-76``): the day grain IS the partition
    column, so the scan reads only ``user_id`` bytes — ``ts`` is
    never parsed — and the layout is lossless, so the oracle over raw
    events is unchanged.
    """
    daily = (
        read_partitioned_events(spark, sf_dir)
        .select("user_id", F.col("event_date").alias("d"))
        .repartition(F.col("user_id"))
        .distinct()
    )
    offsets = (
        daily.withColumn("first_d", F.min("d").over(Window.partitionBy("user_id")))
        .select(
            "user_id",
            F.date_format("first_d", "yyyy-MM-dd").alias("cohort_date"),
            F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7).alias("week_offset"),
        )
        .distinct()
    )
    return offsets.groupBy("cohort_date", "week_offset").agg(F.count("*").alias("active_users"))


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE event_type = 'click' AND ts > v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE event_type = 'purchase' AND ts > c_ts
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT (SELECT count(*) FROM v) AS viewed,
               (SELECT count(*) FROM c) AS clicked,
               (SELECT count(*) FROM p) AS purchased
    )
    SELECT stage, users,
           round(CAST(users AS DOUBLE) / CAST(prev AS DOUBLE), 6) AS conversion
    FROM (
        SELECT 1 AS ord, 'view' AS stage, viewed AS users, viewed AS prev FROM counts
        UNION ALL
        SELECT 2, 'click', clicked, viewed FROM counts
        UNION ALL
        SELECT 3, 'purchase', purchased, clicked FROM counts
    )
    WHERE prev > 0
    """,
    covers=("A6", "R5"),
    doc="strict-order funnel view→click→purchase with per-stage conversion",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: a user converts a stage only with an
    event *after* their previous stage's first event (the batch analog
    of the reference's CEP pattern matching, ``UserJumpDetailApp`` —
    there the pattern is entry-then-timeout, here entry-then-next).

    Three user-keyed aggregates chained by joins on user_id: each
    stage's frame is one row per qualifying user, so the joins after
    stage one are aggregate-sized, not event-sized. The final unpivot
    reuses the stack shape (R5) to emit one row per stage with its
    conversion from the previous stage. Same-timestamp stage events
    don't count (strict '>'), matching the oracle exactly.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        v.agg(F.count("*").alias("viewed"))
        .crossJoin(c.agg(F.count("*").alias("clicked")))
        .crossJoin(p.agg(F.count("*").alias("purchased")))
    )
    staged = counts.selectExpr(
        "stack(3, 'view', viewed, viewed, 'click', clicked, viewed, 'purchase', purchased, clicked) "
        "as (stage, users, prev)"
    )
    return staged.filter(F.col("prev") > 0).select(
        "stage",
        "users",
        F.round(F.col("users").cast("double") / F.col("prev").cast("double"), 6).alias("conversion"),
    )


@register(
    "props_key_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS distinct_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
    covers=("P1", "P7"),
    doc="semi-structured props: JSON key extraction + per-type stats",
)
def props_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column path: extract ``$.k`` from the JSON
    ``props`` string (the map-key access + IS NOT NULL shape, P7,
    over a JSON payload, P1) and aggregate per event type.

    ``get_json_object`` evaluates JVM-side; at scale this is a pure
    map expression feeding one small hash agg — the pattern for any
    schemaless side-channel column. A production pipeline with a
    FIXED props schema should prefer ``from_json`` with an explicit
    schema so Catalyst can prune/push; ``get_json_object`` is the
    schema-on-read escape hatch.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


@register(
    "basket_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    covers=("A6", "J6"),
    doc="market-basket pair mining: co-purchased part pairs with support >= 2",
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule input: co-occurrence counts of part pairs
    within an order (the apriori support table). Collect each order's
    DISTINCT parts into a sorted array (one orderkey shuffle), then
    emit all C(n,2) pairs with a higher-order-function expression —
    map-side, NO self-join at all. Fan-out per order is C(n,2) with
    n ≤ the lineitem-per-order cap (7 here), never corpus-quadratic;
    the same per-key-bounded discipline as ``token_cooccurrence_topk``.
    The oracle states the same semantics as the relational self-join —
    values are identical, the physical strategies differ on purpose.

    Scale: TWO shuffles total (basket build on orderkey, pair count on
    the pair key) versus four for the distinct + self-join form; the
    HAVING prunes the singleton long tail before output.
    """
    baskets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    # all C(n,2) ordered pairs from the sorted per-order array — a
    # higher-order-function expression, no self-join: slice(i+2..)
    # pairs each part with its strict successors only (a < b holds by
    # the sort), so the pair stream is emitted map-side
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda x, i: F.transform(
                        F.slice("parts", i + 2, F.size("parts")),
                        lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
                    ),
                )
            )
        ).alias("pr")
    )
    return (
        pairs.select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no
        FROM events
    ),
    bounds AS (SELECT max(day_no) AS max_day FROM ud),
    cover AS (
        SELECT DISTINCT user_id, day_no + off AS as_of
        FROM ud CROSS JOIN unnest(generate_series(0, 6)) AS t(off), bounds
        WHERE day_no + off <= max_day
    ),
    wau AS (SELECT as_of, count(*) AS wau FROM cover GROUP BY as_of),
    dau AS (SELECT day_no AS as_of, count(*) AS dau FROM ud GROUP BY day_no)
    SELECT CAST(d.as_of AS BIGINT) AS day_no, dau, wau,
           round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
    FROM dau d JOIN wau w ON d.as_of = w.as_of
    """,
    covers=("A4", "W1"),
    doc="DAU/WAU engagement: sliding 7-day distinct users via coverage expansion",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness (DAU over trailing-7-day WAU): the
    sliding COUNT DISTINCT that a naive plan computes with 7 passes
    (or an unbounded self-join) becomes ONE pass via coverage
    expansion: each (user, active day) emits the ≤7 as-of days it
    covers, a distinct collapses multi-active users per window, and a
    plain count per as-of day is the WAU. Emission is capped at the
    corpus max day so both engines report the same day range.

    Scale: expansion is a constant ×7 on the (user, day) DEDUPED
    grain (already ≪ raw events), all three aggregates key on
    user/day hashes — no window-sort over users, no 7-way self-join.
    The same trick extends to 28-day MAU with ×28 on the same grain.

    r11: reads the DATE-PARTITIONED event log — the day number
    derives from the partition column (directory metadata), so the
    scan materializes only ``user_id``; same oracle over raw events
    (the layout is lossless).
    """
    ud = (
        read_partitioned_events(spark, sf_dir)
        .select(
            "user_id",
            F.datediff(F.col("event_date"), F.lit("1970-01-01").cast("date")).alias("day_no"),
        )
        .distinct()
    )
    max_day = ud.agg(F.max("day_no").alias("max_day"))
    cover = (
        ud.crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("day_no"), F.least(F.col("day_no") + 6, F.col("max_day")))).alias(
                "as_of"
            ),
        )
        .distinct()
    )
    wau = cover.groupBy("as_of").agg(F.count("*").alias("wau"))
    dau = ud.groupBy(F.col("day_no").alias("as_of")).agg(F.count("*").alias("dau"))
    return dau.join(wau, "as_of").select(
        F.col("as_of").cast("long").alias("day_no"),
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )
