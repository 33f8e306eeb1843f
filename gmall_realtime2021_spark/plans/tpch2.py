"""Second batch of headline analytical shapes over the star schema.

Fills the classic decision-support shapes the first batch (tpch.py)
left out: conditional-share aggregates (Q8/Q14), group-by-HAVING
semi-join (Q18), EXISTS by-priority counts (Q4), returned-items
top-k (Q10), scalar-subquery + anti-join (Q22), CUBE grouping sets,
percent-of-total windows, and ntile quartiles. The reference itself
has no sort/limit/OLAP surface (SURVEY.md §2.9) — these extend the
engine the same way region_rollup/asof do, under the registry's
exact-value conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import fan_out, load

#: Exact integer cents of a per-row money product: floor(x*100 + 0.5)
#: is pure IEEE double math, bit-identical in Spark and DuckDB, and the
#: resulting BIGINT sum is associative — immune to fold-order drift.
_CENTS_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _cents() -> F.Column:
    return F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)).cast("long")


@register(
    "market_share",
    oracle=f"""
    SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
           round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_CENTS_SQL} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_CENTS_SQL}) AS DOUBLE), 6) AS mkt_share,
           CAST(sum({_CENTS_SQL}) AS DOUBLE) / 100.0 AS total_revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
    """,
    covers=("J3", "A6"),
    doc="TPC-H Q8 shape: supplier-nation market share per year in one region",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of supplier revenue to ASIA customers per year.

    Spark-first plan: the only big-big join is lineitem⋈orders (one
    shuffle on the order key); customer/supplier/nation/region all
    broadcast, and the ASIA filter prunes the customer side before
    the probe. The share is a conditional aggregate (A6 shape) over
    exact integer cents, so the double division at the end is
    deterministic.
    """
    li = fan_out(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
        "l_orderkey",
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    cents = _cents()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("sn.n_name") == "NATION_3", cents).otherwise(F.lit(0))).alias("_nat"),
            F.sum(cents).alias("_tot"),
        )
        .select(
            "order_year",
            F.round(F.col("_nat").cast("double") / F.col("_tot").cast("double"), 6).alias("mkt_share"),
            (F.col("_tot").cast("double") / 100.0).alias("total_revenue"),
        )
    )


@register(
    "promo_revenue",
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_CENTS_SQL} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_CENTS_SQL}) AS DOUBLE), 6) AS promo_pct,
           CAST(sum({_CENTS_SQL}) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    covers=("J3", "A6"),
    doc="TPC-H Q14 shape: promotion revenue percentage per ship month",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO-type parts, by ship month.

    One broadcast join (part is a dim) and one hash aggregate on a
    ~80-row key space — the shuffle after partial aggregation moves a
    few rows per task at any scale. Conditional cents sums keep the
    percentage bit-stable.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _cents()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))).alias("_promo"),
            F.sum(cents).alias("_tot"),
        )
        .select(
            "ship_month",
            F.round(F.lit(100.0) * F.col("_promo").cast("double") / F.col("_tot").cast("double"), 6).alias("promo_pct"),
            (F.col("_tot").cast("double") / 100.0).alias("revenue"),
        )
    )


@register(
    "large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    covers=("A1", "J3"),
    doc="TPC-H Q18 shape: large-quantity orders via group-by-HAVING semi join",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds 250, with their customer.

    The HAVING subquery is expressed as an aggregate → filter →
    **left-semi join** back onto lineitem: the qualifying-key set is
    tiny (99th-percentile threshold), so AQE converts the semi join
    to a broadcast probe and the second big scan never shuffles.
    Decimal quantity sums keep HAVING's boundary exact — a double sum
    could flip a row at the 250.00 edge.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .filter(F.col("_qty") > 250)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qualified = li.join(big.withColumnRenamed("l_orderkey", "_ok"), F.col("l_orderkey") == F.col("_ok"), "leftsemi")
    return (
        qualified.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "late_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_ct
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority
    """,
    covers=("A6", "J1"),
    doc="TPC-H Q4 shape: per-priority count of orders with a late line item",
)
def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one line shipped >30 days after order
    date, counted by priority.

    The EXISTS becomes a **left-semi join with a non-equi conjunct**:
    Spark evaluates the equi part (order key) as the join key and the
    date comparison as a residual, so it stays a hash semi join — one
    shuffle — not a nested loop. Semi-join semantics also dedup
    multiple late lines per order for free (no distinct needed).
    """
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_ct"))


@register(
    "returned_items",
    oracle=f"""
    WITH ranked AS (
        SELECT c_custkey, c_name, n_name,
               CAST(sum({_CENTS_SQL}) AS DOUBLE) / 100.0 AS returned_revenue,
               count(*) AS item_ct,
               row_number() OVER (ORDER BY sum({_CENTS_SQL}) DESC, c_custkey) AS rn
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
    )
    SELECT CAST(rn AS BIGINT) AS rank, c_custkey, c_name, n_name, returned_revenue, item_ct
    FROM ranked WHERE rn <= 20
    """,
    covers=("J3", "P5"),
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue",
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue on returned ('R') line items.

    The returnflag filter pushes into the lineitem scan (cuts ~2/3 of
    rows before any join); rank runs over the per-customer aggregate
    (≤ one row per customer), never the raw fact rows. Tie-break on
    the key keeps top-k deterministic.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cents()).alias("_cents"), F.count("*").alias("item_ct"))
    )
    w = Window.orderBy(F.col("_cents").desc(), F.col("c_custkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select(
            "rank",
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("_cents").cast("double") / 100.0).alias("returned_revenue"),
            "item_ct",
        )
    )


@register(
    "sales_opportunity",
    oracle="""
    SELECT n_name,
           count(*) AS cust_ct,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        FROM customer WHERE c_acctbal > 0
    )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY n_name
    """,
    covers=("A6", "J3"),
    doc="TPC-H Q22 shape: scalar-subquery threshold + anti join, per nation",
)
def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy customers (balance above the positive-balance average)
    with no order since 2000, grouped by nation.

    The scalar subquery is one tiny aggregate broadcast as a cross
    join (one row); the NOT EXISTS is a **left-anti join** whose probe
    side is pre-filtered to recent orders only — at 100 TB the anti
    join's build input is the recent slice, not all of history. The
    average is rounded to 6 dp in both engines so the threshold
    comparison can't straddle a ULP.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count("*"), 6).alias("_avg"))
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cust_ct"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "sales_cube",
    oracle="""
    SELECT coalesce(CAST(extract(year FROM o_orderdate) AS VARCHAR), 'ALL') AS order_year,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(extract(year FROM o_orderdate)) * 2 + GROUPING(o_orderpriority) AS BIGINT)
               AS grouping_lvl,
           count(*) AS order_ct,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (extract(year FROM o_orderdate), o_orderpriority)
    """,
    covers=("A5",),
    doc="CUBE grouping sets over (year, priority) with grouping_id",
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping sets of (order year, priority) in one pass.

    Spark compiles ``cube`` into a single Expand node feeding one
    hash aggregate — the fact table is scanned once, not once per
    grouping set (same engine mechanics region_rollup leans on, here
    with the full 2^k lattice and an explicit ``grouping_id`` so
    downstream consumers can tell subtotal rows apart).
    """
    orders = load(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    return (
        orders.cube(year.alias("_year"), F.col("o_orderpriority"))
        .agg(
            F.grouping_id().cast("long").alias("grouping_lvl"),
            F.count("*").alias("order_ct"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("_year").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "grouping_lvl",
            "order_ct",
            "total_price",
        )
    )


@register(
    "nation_revenue_share",
    oracle=f"""
    WITH nat AS (
        SELECT r_name, n_name, sum({_CENTS_SQL}) AS cents
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cents AS DOUBLE) / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE), 6)
               AS region_share
    FROM nat
    """,
    covers=("A5", "J3"),
    doc="percent-of-total window: nation revenue share within its region",
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's customer revenue.

    Two-level pattern: heavy aggregate first (facts → 25 rows), then
    the percent-of-total window runs on the aggregate — the window
    shuffle moves 25 rows, never facts. Integer-cents sums make the
    share division exact-input-deterministic.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    nat = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(_cents()).alias("_cents"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        (F.col("_cents").cast("double") / 100.0).alias("revenue"),
        F.round(F.col("_cents").cast("double") / F.sum("_cents").over(w).cast("double"), 6).alias("region_share"),
    )


@register(
    "customer_quartiles",
    oracle="""
    WITH spend AS (
        SELECT c_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey
    ),
    tiled AS (
        SELECT *, CAST(ntile(4) OVER (ORDER BY total_spend DESC, c_custkey) AS BIGINT) AS quartile
        FROM spend
    )
    SELECT quartile,
           count(*) AS cust_ct,
           CAST(min(total_spend) AS DOUBLE) AS min_spend,
           CAST(max(total_spend) AS DOUBLE) AS max_spend,
           CAST(sum(total_spend) AS DOUBLE) AS total_spend
    FROM tiled
    GROUP BY quartile
    """,
    covers=("A1",),
    doc="ntile(4) spend quartiles over the per-customer aggregate",
)
def customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles: ntile over the aggregate, then a
    4-row summary.

    Scale (r05 reshape): no ``ntile OVER (ORDER BY)`` global window —
    the global 1-based rank comes from the range-partitioned prefix
    sum of ones (``operators/prefix.range_prefix_sums``; the grand
    total doubles as n), and the tile is then SQL ntile's exact
    arithmetic on (rank, n): the first ``n mod k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k``. Zero single-partition
    exchanges, identical tile assignment (unique-key tie-break on
    c_custkey), so the plan survives a customer table that doesn't
    fit one task.
    """
    from gmall_realtime2021_spark.operators.prefix import (
        ntile_from_rank,
        range_prefix_sums,
    )

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    spend = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spend"))
    )
    ranked = range_prefix_sums(
        spend, [F.desc("total_spend"), F.asc("c_custkey")], {"one": F.lit(1)}
    )
    tile = ntile_from_rank(F.col("cum_one"), F.col("total_one"), F.lit(4))
    return (
        ranked.withColumn("quartile", tile.cast("long"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("cust_ct"),
            F.min("total_spend").cast("double").alias("min_spend"),
            F.max("total_spend").cast("double").alias("max_spend"),
            F.sum("total_spend").cast("double").alias("total_spend"),
        )
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           count(*) AS item_ct,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN pa   ON lineitem.l_partkey = pa.l_partkey
    JOIN part ON lineitem.l_partkey = p_partkey
    WHERE l_quantity < 0.5 * avg_qty
    GROUP BY p_brand
    """,
    covers=("A1", "J3"),
    doc="TPC-H Q17 shape: rows below half their part's average quantity",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from line items ordering less than half their part's
    average quantity, per brand.

    The correlated scalar subquery becomes a **self-aggregate join**:
    one pass computes per-part averages (shuffle on partkey), then the
    fact table probes it on the same key — Spark reuses the hash
    partitioning, and at scale the per-part aggregate is orders of
    magnitude smaller than the facts, so AQE turns the probe into a
    broadcast. The average is sum(decimal)/count (exact numerator) so
    the 0.5× threshold compares identically in both engines.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    pa = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty")
        )
        .withColumnRenamed("l_partkey", "_pk")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(pa, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("item_ct"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


@register(
    "top_supplier",
    oracle=f"""
    WITH sr AS (
        SELECT l_suppkey, sum({_CENTS_SQL}) AS cents
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(cents AS DOUBLE) / 100.0 AS total_revenue
    FROM sr JOIN supplier ON l_suppkey = s_suppkey
    WHERE cents = (SELECT max(cents) FROM sr)
    """,
    covers=("A1", "J3"),
    doc="TPC-H Q15 shape: supplier(s) achieving the maximum revenue",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum line-item revenue — the argmax
    shape (Q15's revenue view + MAX subquery).

    One aggregate on suppkey, then a window max over the *aggregate*
    (supplier-count rows) instead of a second scan-and-join against a
    scalar subquery — the plan reads lineitem once. Ties all surface
    (`=` on exact integer cents), matching the SQL's equality
    semantics without a deterministic-tiebreak limit.
    """
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sr = li.groupBy("l_suppkey").agg(F.sum(_cents()).alias("_cents"))
    w = Window.partitionBy()
    return (
        sr.withColumn("_max", F.max("_cents").over(w))
        .filter(F.col("_cents") == F.col("_max"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("_cents").cast("double") / 100.0).alias("total_revenue"))
    )
