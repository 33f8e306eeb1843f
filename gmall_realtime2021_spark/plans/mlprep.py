"""ML feature-engineering plans: the user feature matrix, gap-based
session funnels, and point-in-time-correct training examples.

The step between the warehouse layers (dwd/dws) and a model: turn the
event stream into per-entity feature rows WITHOUT future leakage.
``next_purchase_examples`` is the load-bearing one — its feature
frame ends strictly BEFORE the label window begins (the feature-store
"point-in-time join" discipline); building it wrong (features peeking
into the label window) is the classic silent training bug, and the
oracle twin pins the exact cutoff arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

#: event-type domain (FIXTURES.md): pivot columns are explicit so the
#: output schema is stable even if a type is absent at small SF.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "user_feature_matrix",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click_ct,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error_ct,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_ct,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_ct,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view_ct,
           count(DISTINCT CAST(ts AS DATE)) AS active_days,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS DOUBLE) / 100.0 AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    covers=("A6", "R4"),
    doc="per-user feature matrix: typed event counts, active days, purchase value",
)
def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-input feature frame: one row per user, event counts
    pivoted to EXPLICIT typed columns (stable schema — a data-driven
    ``pivot()`` would change shape with the data), distinct active
    days, and integer-cents purchase value.

    Scale: ONE pass, one user-keyed shuffle; the conditional counts
    are the same fused CASE pattern as ``product_stats`` (R4) — never
    one job per feature. The distinct-day count is the only Expand;
    at extreme cardinality swap in approx_count_distinct with an
    identical plan shape (documented trade, cf. table_profile).
    """
    ev = load(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"{t}_ct") for t in EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(
        *aggs,
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).cast("double")
            / 100.0
        ).alias("purchase_value"),
    )


@register(
    "session_funnel",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM seq
    ),
    per_sess AS (
        SELECT user_id, session_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM sess GROUP BY user_id, session_id
    )
    SELECT count(*) AS sessions,
           count(first_view) AS with_view,
           count(CASE WHEN first_click >= first_view THEN 1 END) AS view_then_click,
           count(CASE WHEN first_click >= first_view AND first_purchase >= first_click
                 THEN 1 END) AS full_funnel
    FROM per_sess
    """,
    covers=("A6", "W1"),
    doc="gap-sessionized ordered funnel: view -> click -> purchase within 30-min sessions",
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's funnel (``funnel_conversion``) re-scoped from
    user-lifetime to SESSION grain: 30-min-gap sessionization (the
    explicit cumulative-flag form — the same semantics
    ``session_window_stats`` gets from ``F.session_window``, but
    producing a session ID usable as a grouping key), then the
    ordered min-timestamp containment chain per session.

    Scale: both windows and the session aggregate share ONE user_id
    partitioning (Catalyst reuses the exchange); the final funnel
    count is a 1-row aggregate. The cumulative-sum session labeling
    is per-user-frame linear — the standard scalable sessionizer.

    NULL semantics lean on both engines agreeing that comparisons
    with NULL are not TRUE: a session with no view never counts in
    ``view_then_click`` because ``first_click >= NULL`` fails.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    seq = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.withColumn("session_id", F.sum("new_session").over(wcum))
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return per_sess.agg(
        F.count("*").alias("sessions"),
        F.count("first_view").alias("with_view"),
        F.count(F.when(F.col("first_click") >= F.col("first_view"), 1)).alias(
            "view_then_click"
        ),
        F.count(
            F.when(
                (F.col("first_click") >= F.col("first_view"))
                & (F.col("first_purchase") >= F.col("first_click")),
                1,
            )
        ).alias("full_funnel"),
    )


@register(
    "next_purchase_examples",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no,
               count(*) AS ev_ct,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS buy_ct,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END) AS buy_cents
        FROM events
        GROUP BY 1, 2
    ),
    framed AS (
        SELECT user_id, day_no,
               sum(ev_ct)    OVER past AS past_events,
               sum(buy_ct)   OVER past AS past_purchases,
               sum(buy_cents) OVER past AS past_cents,
               sum(buy_ct)   OVER future AS future_purchases
        FROM daily
        WINDOW past   AS (PARTITION BY user_id ORDER BY day_no
                          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               future AS (PARTITION BY user_id ORDER BY day_no
                          RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
    )
    SELECT user_id,
           CAST(day_no AS BIGINT) AS day_no,
           CAST(coalesce(past_events, 0) AS BIGINT) AS past_events,
           CAST(coalesce(past_purchases, 0) AS BIGINT) AS past_purchases,
           CAST(coalesce(past_cents, 0) AS DOUBLE) / 100.0 AS past_value,
           CASE WHEN coalesce(future_purchases, 0) > 0 THEN 1 ELSE 0 END AS label_next7
    FROM framed
    """,
    covers=("A6", "W1"),
    doc="point-in-time training examples: strictly-past features, next-7-day purchase label",
)
def next_purchase_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised training-set generation with the feature-store
    point-in-time guarantee: one example per (user, active day);
    features aggregate STRICTLY BEFORE the day (RANGE … 1 PRECEDING),
    the label looks only at (day, day+7] (RANGE 1 FOLLOWING TO
    7 FOLLOWING) — the two frames cannot overlap, so no leakage by
    construction. The classic bug (features including the label day)
    would shift both hash totals; the oracle twin pins the cutoffs.

    Scale: raw events collapse to (user, day) grain FIRST (one
    shuffle, map-side combined); both RANGE frames then run on that
    per-user daily series — bounded by active days, not events — and
    share the day-ordered sort. Integer day numbers make the RANGE
    arithmetic exact in both engines.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day_no"),
    ).agg(
        F.count("*").alias("ev_ct"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("buy_ct"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("buy_cents"),
    )
    past = (
        Window.partitionBy("user_id").orderBy("day_no").rangeBetween(Window.unboundedPreceding, -1)
    )
    future = Window.partitionBy("user_id").orderBy("day_no").rangeBetween(1, 7)
    framed = daily.select(
        "user_id",
        "day_no",
        F.sum("ev_ct").over(past).alias("past_events"),
        F.sum("buy_ct").over(past).alias("past_purchases"),
        F.sum("buy_cents").over(past).alias("past_cents"),
        F.sum("buy_ct").over(future).alias("future_purchases"),
    )
    return framed.select(
        "user_id",
        F.col("day_no").cast("long").alias("day_no"),
        F.coalesce(F.col("past_events"), F.lit(0)).cast("long").alias("past_events"),
        F.coalesce(F.col("past_purchases"), F.lit(0)).cast("long").alias("past_purchases"),
        (F.coalesce(F.col("past_cents"), F.lit(0)).cast("double") / 100.0).alias("past_value"),
        F.when(F.coalesce(F.col("future_purchases"), F.lit(0)) > 0, 1).otherwise(0).alias(
            "label_next7"
        ),
    )
