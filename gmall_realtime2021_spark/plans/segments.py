"""Customer-segmentation and journey analytics: RFM scoring, Pareto
(ABC) classification, event-transition mining, and first-touch
attribution.

These extend the reference's DWS aggregates (``ProvinceStatsSqlApp``,
``VisitorStatsApp`` shapes) into the segmentation/attribution queries
a marketing warehouse serves from the same inputs. All four are pure
DataFrame pipelines — conditional aggregates, user-keyed windows, and
broadcast-scalar thresholds — with exact-parity conventions: money as
integer cents, thresholds derived from bigint sums (one IEEE division,
identical in both engines), deterministic tie-breaks on every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), (SELECT max(o_orderdate) FROM orders)) AS r_days,
               count(*) AS freq,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m_cents
        FROM orders GROUP BY o_custkey
    ),
    means AS (
        SELECT CAST(sum(r_days) AS DOUBLE) / count(*) AS r_mean,
               CAST(sum(freq) AS DOUBLE) / count(*) AS f_mean,
               CAST(sum(m_cents) AS DOUBLE) / count(*) AS m_mean
        FROM base
    )
    SELECT o_custkey AS custkey,
           CAST(r_days AS BIGINT) AS r_days,
           CAST(freq AS BIGINT) AS freq,
           CAST(m_cents AS DOUBLE) / 100.0 AS monetary,
           concat(CASE WHEN r_days <= r_mean THEN 'R+' ELSE 'R-' END,
                  CASE WHEN freq >= f_mean THEN 'F+' ELSE 'F-' END,
                  CASE WHEN m_cents >= m_mean THEN 'M+' ELSE 'M-' END) AS segment
    FROM base, means
    """,
    covers=("A1", "A6"),
    doc="RFM segmentation: recency/frequency/monetary vs corpus means, 8 segments",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scoring against corpus means: each customer is above/below
    average on recency (days since last order, anchored to the data's
    max date), frequency (order count), and monetary (integer-cents
    spend), giving the classic 8-cell segment grid.

    Means — not medians — are the thresholds on purpose: a mean is
    sum(bigint)/count, one IEEE division that both engines compute
    bit-identically, while interpolated medians can differ in the
    last ulp and flip boundary customers. Scale: one shuffle for the
    per-customer aggregate; the anchor date and the three means are
    single-row aggregates broadcast back via crossJoin — no global
    sort, no single-partition window (contrast ``customer_quartiles``,
    which documents the positional-ntile trade-off).
    """
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    anchor = orders.agg(F.max("o_orderdate").alias("_anchor"))
    # recency = days from the customer's LAST order to the anchor =
    # min over per-order gaps; folded into the one aggregate pass
    base = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("_anchor"), F.col("o_orderdate"))).alias("r_days"),
            F.count("*").alias("freq"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("m_cents"),
        )
    )
    means = base.agg(
        (F.sum("r_days").cast("double") / F.count("*")).alias("r_mean"),
        (F.sum("freq").cast("double") / F.count("*")).alias("f_mean"),
        (F.sum("m_cents").cast("double") / F.count("*")).alias("m_mean"),
    )
    return base.crossJoin(F.broadcast(means)).select(
        F.col("o_custkey").alias("custkey"),
        F.col("r_days").cast("long").alias("r_days"),
        F.col("freq").cast("long").alias("freq"),
        (F.col("m_cents").cast("double") / 100.0).alias("monetary"),
        F.concat(
            F.when(F.col("r_days") <= F.col("r_mean"), F.lit("R+")).otherwise(F.lit("R-")),
            F.when(F.col("freq") >= F.col("f_mean"), F.lit("F+")).otherwise(F.lit("F-")),
            F.when(F.col("m_cents") >= F.col("m_mean"), F.lit("M+")).otherwise(F.lit("M-")),
        ).alias("segment"),
    )


@register(
    "abc_classification",
    oracle="""
    WITH rev AS (
        SELECT p_brand,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    ),
    cum AS (
        SELECT p_brand, cents,
               sum(cents) OVER (ORDER BY cents DESC, p_brand
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
               sum(cents) OVER () AS total_cents
        FROM rev
    )
    SELECT p_brand,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cum_cents AS DOUBLE) / total_cents, 6) AS cum_share,
           CASE WHEN CAST(cum_cents AS DOUBLE) / total_cents <= 0.7 THEN 'A'
                WHEN CAST(cum_cents AS DOUBLE) / total_cents <= 0.9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
    covers=("A1",),
    doc="Pareto/ABC analysis: cumulative revenue share classes over brands",
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: brands ranked by revenue, classified A/B/C at
    70%/90% cumulative share. The running sum accumulates integer
    cents on a (cents DESC, brand) total order — identical tie-breaks,
    identical cumsums — and the share is one bigint→double division
    per row, so the class boundaries compare identically in both
    engines (the round(…,6) is display-only; classification uses the
    raw ratio).

    Scale (r05 reshape): the running sum is the range-partitioned
    two-phase prefix sum (``operators/prefix.range_prefix_sums``), not
    a ``sum OVER (ORDER BY)`` global window — the plan has NO
    single-partition exchange, so the same code holds when the grain
    is a million SKUs instead of 25 brands. Integer-cents accumulation
    keeps the re-associated sum bit-exact vs the oracle's sequential
    one.
    """
    from gmall_realtime2021_spark.operators.prefix import range_prefix_sums

    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    cum = range_prefix_sums(
        rev, [F.desc("cents"), F.asc("p_brand")], {"cents": F.col("cents")}
    )
    share = F.col("cum_cents").cast("double") / F.col("total_cents")
    return cum.select(
        "p_brand",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").alias("abc_class"),
    )


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS transition_ct
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    covers=("A6", "T3"),
    doc="behavior-path mining: adjacent event-type transition counts (Markov matrix input)",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-event transition counts per user journey — the input
    matrix for Markov path models and the batch twin of the
    reference's CEP jump detection (``UserJumpDetailApp``: a 'jump'
    is exactly a transition whose prev is an entry page). Lag over a
    (ts, event_id)-ordered user window, then one grouped count over
    the tiny type×type domain.

    Scale: one shuffle on user_id for the window; frames are
    per-user-session sized; the final aggregate's key space is
    |event_type|² — map-side partial combine collapses it before the
    (trivial) second exchange.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("transition_ct")
    )


@register(
    "first_touch_attribution",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'view'
    ),
    fv AS (SELECT user_id, ts, event_id FROM v WHERE rn = 1)
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS purchase_cents,
           CASE WHEN fv.ts <= p.ts THEN fv.event_id ELSE CAST(-1 AS BIGINT) END AS first_view_id,
           CASE WHEN fv.ts <= p.ts THEN strftime(fv.ts, '{TS_FMT_DUCK}') ELSE '' END AS first_view_ts,
           CASE WHEN fv.ts <= p.ts THEN epoch_us(p.ts) - epoch_us(fv.ts)
                ELSE CAST(-1 AS BIGINT) END AS gap_us
    FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
    LEFT JOIN fv ON p.user_id = fv.user_id
    """,
    covers=("J1", "J6"),
    doc="first-touch attribution: each purchase credited to the user's earliest prior view",
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of ``asof_attribution`` (last-touch): credit
    every purchase to the user's EARLIEST view at-or-before it. The
    earliest view overall either precedes the purchase (then it is
    the answer) or doesn't (then no view does), so no as-of machinery
    is needed — a per-user min and one equi-join replace the merge
    window.

    Scale: the first-view table is one row per viewing user (min over
    a (ts, event_id) struct — deterministic tie-break, no sort
    window); both the aggregate and the join shuffle on user_id, so
    the exchange is reused. Sentinels (-1/'') for view-less
    purchases keep the output NULL-free per the asof_attribution
    convention (engines disagree on NULL canonicalization; values
    never).
    """
    ev = load(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fv"))
        .select("user_id", F.col("fv.ts").alias("fv_ts"), F.col("fv.event_id").alias("fv_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    matched = F.col("fv_ts") <= F.col("ts")
    return purch.join(fv, "user_id", "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("purchase_cents"),
        F.when(matched, F.col("fv_id")).otherwise(F.lit(-1)).cast("long").alias("first_view_id"),
        F.when(matched, F.date_format("fv_ts", TS_FMT_SPARK)).otherwise(F.lit("")).alias(
            "first_view_ts"
        ),
        F.when(matched, F.unix_micros(F.col("ts")) - F.unix_micros(F.col("fv_ts")))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("gap_us"),
    )


@register(
    "transition_probs",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    ct AS (
        SELECT prev_type, event_type AS next_type, count(*) AS transition_ct
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, transition_ct,
           round(CAST(transition_ct AS DOUBLE)
                 / sum(transition_ct) OVER (PARTITION BY prev_type), 6) AS prob
    FROM ct
    """,
    covers=("A6",),
    doc="row-normalized Markov transition matrix over event-type pairs",
)
def transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``event_transitions`` normalized into the Markov transition
    matrix: P(next | prev) per row. The normalizing window partitions
    by prev_type over the |types|²-row AGGREGATE (bounded, post
    partial/final count) — one bigint→double division per cell,
    exact in both engines; round(…,6) is display-only.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    ct = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("transition_ct")
    )
    norm = Window.partitionBy("prev_type")
    return ct.select(
        "prev_type",
        "next_type",
        "transition_ct",
        F.round(
            F.col("transition_ct").cast("double") / F.sum("transition_ct").over(norm), 6
        ).alias("prob"),
    )
