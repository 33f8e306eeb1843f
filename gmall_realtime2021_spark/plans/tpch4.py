"""Fourth TPC-H-shaped batch — the last four query shapes of the 22
(Q2 correlated-min supplier selection, Q11 important-stock HAVING
over a global scalar, Q16 excluded-supplier variety count, Q20
nested-semi-join promotion candidates). The fixture has no partsupp
table, so ``lineitem(l_partkey, l_suppkey)`` plays the part-supplier
relation throughout: supply cost = observed unit price, availability
= shipped quantity. Money follows the registry cents discipline
(``plans/tpch.py:49-54``); thresholds are integer-exact
(cents-longs compared via cross-multiplication) so the DuckDB twins
hash-match bit for bit.

Reference analog: the same multi-dim enrichment + conditional-agg
shapes as the DWS product/province stats apps
(``ProductStatsApp.java``, ``ProvinceStatsSqlApp.java``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load


def _cents(c: F.Column) -> F.Column:
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


@register(
    "min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS unit_cents
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_cents,
               row_number() OVER (PARTITION BY l_partkey ORDER BY unit_cents, l_suppkey) AS rn
        FROM cost
    )
    SELECT p.p_partkey, p.p_brand, p.p_type, s.s_name, n.n_name AS nation,
           CAST(r.unit_cents AS DOUBLE) / 100.0 AS min_unit_cost
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE r.rn = 1 AND p.p_size <= 10
    """,
    covers=("J3", "A6"),
    doc="TPC-H Q2 shape: per part, the supplier offering the minimum observed unit cost (correlated-min as window argmin)",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's shape with lineitem as the part-supplier relation: per
    small part (p_size <= 10), the supplier whose best observed unit
    price (extendedprice/quantity, cents-floored) is the global
    minimum for that part — the classic correlated-min subquery
    rewritten as a window argmin (ties to the smallest supplier key,
    so exactly one row per part). Supplier and nation details joined
    after the argmin, never before.

    Scale: the unit-cost agg shuffles once on (part, supplier); the
    argmin window reuses the part-keyed partitioning; part/supplier/
    nation enrichment is broadcast. The expensive relation is read
    once and reduced before any window.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cents(F.col("l_extendedprice") / F.col("l_quantity"))).alias("unit_cents")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cents", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_brand", "p_type")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(pt), best.l_partkey == pt.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "s_name",
            F.col("n_name").alias("nation"),
            (F.col("unit_cents").cast("double") / 100.0).alias("min_unit_cost"),
        )
    )


@register(
    "important_part_values",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    ),
    tot AS (SELECT sum(value_cents) AS total_cents, count(*) AS part_ct FROM pv)
    SELECT l_partkey AS p_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS part_value
    FROM pv, tot
    WHERE value_cents * part_ct > 2 * total_cents
    """,
    covers=("A6", "J3"),
    doc="TPC-H Q11 shape: parts whose shipped value from one region's suppliers exceeds twice the average share (HAVING over a global scalar)",
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's shape with shipped value as the stock proxy: per-part
    revenue from ASIA-region suppliers, keeping parts whose value
    exceeds TWICE the average part's — the HAVING-over-a-global-
    scalar-subquery shape. The threshold is cross-multiplied
    (``value*count > 2*total``) so the comparison is integer-exact
    and scale-free: no floating fraction constant to re-tune per SF.

    Scale: the supplier→nation→region chain broadcasts into the fact
    scan; one part-keyed agg; the global scalar is a one-row frame
    broadcast back — no second pass over the fact, no window over
    the whole table.
    """
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    pv = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("value_cents"))
    )
    tot = pv.agg(
        F.sum("value_cents").alias("total_cents"), F.count("*").alias("part_ct")
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("part_ct") > 2 * F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


@register(
    "supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 = 0)
    GROUP BY p_brand, p_type, p_size
    """,
    covers=("A4", "P5"),
    doc="TPC-H Q16 shape: distinct-supplier variety per (brand, type, size), excluding a supplier denylist (NOT IN as anti-join)",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's shape: how many distinct suppliers ship each (brand,
    type, size) combination, excluding a supplier denylist (Q16's
    '%Customer%Complaints%' comment scan — the fixture schema has no
    s_comment, so ``s_suppkey % 3 = 0`` is the deterministic
    stand-in, clearly an arbitrary denylist either way). NOT IN on a
    non-nullable key compiles to an anti-join.

    Scale: the denylist broadcasts as a left-anti join before the
    shuffle; part predicates prune the broadcast dim; the
    count(distinct) agg shuffles once on the 3-part group key.
    """
    deny = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 3 == 0)
        .select("s_suppkey")
    )
    pt = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(deny), li.l_suppkey == deny.s_suppkey, "left_anti")
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "promotion_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                              AND l_shipdate < TIMESTAMP '1998-01-01'
                             THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_1997,
               CAST(sum(l_quantity) AS BIGINT) AS qty_total
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget'
        GROUP BY l_suppkey
    )
    SELECT s.s_name, n.n_name AS nation, sh.qty_1997, sh.qty_total
    FROM shipped sh
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE 7 * sh.qty_1997 > sh.qty_total
    """,
    covers=("A6", "P5"),
    doc="TPC-H Q20 shape: suppliers shipping widgets above their own multi-year average rate in 1997 (nested-IN chain as conditional agg + HAVING)",
)
def promotion_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's shape with shipped quantity as the availability proxy:
    suppliers whose 1997 shipments of '%widget' parts run above
    their own 7-year average rate (the fixture spans 1995-2001) —
    the nested IN(IN(...)) chain collapsed into one conditional
    aggregate with an integer HAVING (``7*qty_1997 > qty_total``;
    quantities are integral, so the comparison is exact). Supplier and nation names join after the
    reduction.

    Scale: the part name filter broadcasts into the fact scan; ONE
    supplier-keyed agg computes both windows of the comparison in
    the same pass (no self-join of lineitem against itself, which is
    the naive Q20 plan); the enrichment joins are broadcast.
    """
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    shipped = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(F.lit(0.0))).cast("long").alias("qty_1997"),
            F.sum("l_quantity").cast("long").alias("qty_total"),
        )
        .filter(7 * F.col("qty_1997") > F.col("qty_total"))
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        shipped.join(F.broadcast(sup), shipped.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), "qty_1997", "qty_total")
    )
