"""Third TPC-H-shaped batch: the join/predicate shapes the catalog
still lacked — disjunctive pushdown (Q19), the exists/not-exists
chain rewritten as aggregation (Q21), the bilateral multi-join
(Q7), plus the last three query shapes of the 22 (Q9 profit
decomposition, Q12 conditional priority counts, Q13 outer-join
distribution). Money follows the registry cents discipline
(``plans/tpch.py:49-54``); no partsupp table exists in the fixture
schema, so Q9's supply cost is proxied by a fixed retail-price
margin; Q2/Q11/Q16/Q20 live in ``plans/tpch4.py`` with lineitem as
the part-supplier relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

#: Q19-style predicate bundles: (brand, max size, qty range).
_BUNDLES = (
    ("Brand#12", 15, 1, 11),
    ("Brand#23", 25, 10, 20),
    ("Brand#34", 35, 20, 30),
)


def _cents(c: F.Column) -> F.Column:
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


@register(
    "disjunctive_revenue",
    oracle="""
    SELECT p_brand,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           count(*) AS line_ct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand
    """,
    covers=("P5", "J3"),
    doc="TPC-H Q19 shape: OR-of-AND predicate bundles across the join",
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19's signature is the DISJUNCTION spanning both join sides:
    Catalyst can only push the per-side residuals (brand list on
    part, quantity hull on lineitem) and must keep the cross-side
    OR above the join — writing it as one boolean expression (not a
    3-way union of filtered joins) lets the optimizer extract those
    residuals itself and scan each table once. The part side stays
    broadcast (it is a dim)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    cond = None
    for brand, max_size, qlo, qhi in _BUNDLES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )
        cond = c if cond is None else (cond | c)
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.filter(cond)
        .groupBy("p_brand")
        .agg(
            (F.sum(revenue).cast("double") / 100.0).alias("revenue"),
            F.count("*").alias("line_ct"),
        )
    )


@register(
    "waiting_orders",
    oracle="""
    WITH lo AS (
        SELECT l_orderkey AS okey, l_suppkey AS skey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    per_order AS (
        SELECT okey, count(*) AS n_supps, sum(late) AS n_late FROM lo GROUP BY okey
    ),
    blamed AS (
        SELECT lo.skey
        FROM lo JOIN per_order USING (okey)
        WHERE lo.late = 1 AND per_order.n_supps >= 2 AND per_order.n_late = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM blamed JOIN supplier ON skey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    covers=("A6",),
    doc="TPC-H Q21 shape: sole-late-supplier blame via the aggregation rewrite of EXISTS/NOT EXISTS",
)
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's correlated ``EXISTS (another supplier) AND NOT EXISTS
    (another late supplier)`` is rewritten as ONE aggregation over
    (order, supplier) — n_supps ≥ 2 encodes the EXISTS, n_late = 1
    plus the candidate's own late flag encodes the NOT EXISTS. The
    rewrite is the scale-correct form: two correlated subqueries
    would be two more shuffles over lineitem; this is a single
    grouped pass plus an order-grain (tiny) join. Late proxy:
    shipped > 60 days after order date (the fixture has no
    commit/receipt dates)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.max(
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
        ).otherwise(0)
    ).alias("late")
    lo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey"))
        .agg(late)
    )
    per_order = lo.groupBy("okey").agg(
        F.count("*").alias("n_supps"), F.sum("late").alias("n_late")
    )
    blamed = (
        lo.join(per_order, "okey")
        .filter((F.col("late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1))
        .select("skey")
    )
    return (
        blamed.join(F.broadcast(sup), blamed.skey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "bilateral_trade",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
       OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    covers=("J3", "A5"),
    doc="TPC-H Q7 shape: bilateral nation-pair revenue by year (5-way join)",
)
def bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7's 5-way join: the two big tables (lineitem, orders) meet on
    the order key; every other side — customer, supplier, both
    nation aliases — is a broadcast dim. The nation-pair filter is
    applied to the two broadcast sides FIRST (2-row dims), which
    turns the customer/supplier joins into semi-filters before the
    fact shuffle. Year comes off the ship date map-side."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nat.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    ns = pair.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = pair.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    revenue = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(revenue).cast("double") / 100.0).alias("revenue"))
    )


@register(
    "median_order_gap",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           count(*) AS n_gaps,
           round(quantile_cont(CAST(gap_days AS DOUBLE), 0.5), 6) AS median_gap_days,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    covers=("A6",),
    doc="per-customer inter-order gap stats: lag window + exact median",
)
def median_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile: consecutive-order day gaps per
    customer (lag over a deterministic (date, orderkey) order — equal
    dates give a 0 gap on a stable tie-break), then exact median /
    min / max per customer. Both engines interpolate the median at
    (n−1)·q over the sorted integer gaps, so values match exactly.

    Scale: ONE shuffle on custkey serves both the window and the
    aggregate (same partitioning — Catalyst reuses the exchange);
    per-customer frames are order-count sized, never corpus sized.
    """
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_gaps"),
        F.round(F.percentile(F.col("gap_days").cast("double"), F.lit(0.5)), 6).alias("median_gap_days"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


@register(
    "top_parts_per_brand",
    oracle="""
    WITH rev AS (
        SELECT p_brand, p_partkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    ),
    ranked AS (
        SELECT p_brand, p_partkey, cents,
               row_number() OVER (PARTITION BY p_brand ORDER BY cents DESC, p_partkey) AS rk
        FROM rev
    )
    SELECT p_brand, CAST(rk AS BIGINT) AS rank, p_partkey,
           CAST(cents AS DOUBLE) / 100.0 AS revenue
    FROM ranked WHERE rk <= 3
    """,
    covers=("A6",),
    doc="top-N per group: top-3 parts by revenue within each brand (rank window over the aggregate)",
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-N-per-group shape the catalog's global top-ks
    (``top_customers``, ``shipping_priority``) don't cover: rank a
    window PARTITIONED by the group over the pre-aggregated grain.

    Scale: the window runs on the (brand, part) AGGREGATE — one row
    per part, partitioned by brand — never on raw lineitem; the
    rank's sort is per-brand-sized. Ties break on partkey so both
    engines rank identically. Revenue accumulates as integer cents
    through both the aggregate and the window (one final cast)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from pyspark.sql import Window

    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("cents"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("cents"), F.asc("p_partkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "rank", "p_partkey", (F.col("cents").cast("double") / 100.0).alias("revenue"))
    )


@register(
    "product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                    - CAST(floor(p_retailprice * 0.6 * 100 + 0.5) AS BIGINT) * CAST(l_quantity AS BIGINT)
               ) AS DOUBLE) / 100.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    covers=("J3", "A5", "P5"),
    doc="TPC-H Q9 shape: product-type profit by supplier nation and order year",
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9's signature: a substring filter on the part DIM prunes the
    fact before the 5-way join, and profit decomposes into revenue
    minus cost at line grain. The fixture has no partsupp, so supply
    cost is proxied as 60% of ``p_retailprice`` — deterministic and
    join-shape-identical to ``ps_supplycost`` (it rides the same
    broadcast part dim). Cents discipline: both terms floor to
    integer cents BEFORE the sum so Spark and DuckDB accumulate the
    same integers (``plans/tpch.py:49-54``).

    Scale: part/supplier/nation broadcast; the only shuffles are the
    lineitem–orders key join and the final (nation, year) agg — the
    part LIKE filter cuts the fact map-side via the broadcast hash
    semi-lookup. Reference parity: the join family mirrors
    ``OrderWideApp.java`` dim enrichment at fact grain."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _cents(
        F.col("p_retailprice") * 0.6
    ) * F.col("l_quantity").cast("long")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_cents).cast("double") / 100.0).alias("profit"))
    )


@register(
    "priority_line_counts",
    oracle="""
    SELECT l_returnflag,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
    covers=("A6", "P5"),
    doc="TPC-H Q12 shape: high/low-priority order counts per line category",
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape: fact–fact key join, a date-range filter pushed to
    the lineitem scan, then CONDITIONAL counts splitting one pass by
    the joined-in priority (the fixture has no l_shipmode; the
    return flag is the line-side category). One CASE-sum pass — not
    two filtered aggregations — so the fact is read once.

    Scale: the shipdate range prunes at the parquet scan
    (PushedFilters); the join shuffles both sides on orderkey once;
    the 3-key final agg is map-side partial. Mirrors the reference's
    conditional metric fan-in (``ProductStatsApp`` CASE pattern)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    covers=("A6", "J5"),
    doc="TPC-H Q13 shape: distribution of customers by order count (outer join with ON-clause predicate)",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13's two signatures, both preserved: (a) the extra predicate
    lives in the OUTER JOIN's ON clause — filtering orders before
    the join, NOT dropping unmatched customers (a WHERE would) —
    and (b) ``count(o_orderkey)`` counts matches only, so
    order-less customers land in the c_count=0 bucket. Double
    aggregation: per-customer count, then the histogram over it.

    Scale: the priority filter prunes the orders scan; the outer
    join shuffles on custkey; the per-customer agg reuses that same
    partitioning (no second exchange); the histogram agg is over a
    tiny distinct-count domain."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
