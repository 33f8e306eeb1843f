"""Graph analytics over derived relationship tables: a PageRank power
iteration on the co-purchase graph.

The house already runs two iterative distributed algorithms
(``operators/dedup.duplicate_clusters`` label propagation;
``operators/similarity.train_ivf_centroids`` Lloyd's) — this adds the
third classic, expressed as the registry's single-iteration pattern
(cf. ``kmeans_iteration``): one exactly-checkable power step, with
the loop shape documented rather than unrolled.

Determinism discipline: PageRank is fractional, and float SUMS are
fold-order-dependent — so ranks live in FIXED-POINT integers
(SCALE = 10^12): every contribution is floor-divided to a bigint
before any aggregation, making both engines' sums exact and the
driver hash stable. The float form appears only as a rounded display
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.operators.graph import SCALE
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

_EDGES_SQL = """
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    edges AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL
        SELECT pb AS src, pa AS dst FROM pairs
    )
"""


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """support>=2 co-purchase part pairs (pa < pb), built with the
    map-side array-combinations form — the same 2-shuffle shape
    ``basket_pairs`` documents as strictly cheaper than the
    distinct+self-join (4 shuffles); both graph plans share it so the
    edge derivation lives in exactly one place. The SQL oracles keep
    the relational self-join form — identical values, different
    physical strategy, which is the point of the oracle."""
    baskets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda x, i: F.transform(
                        F.slice("parts", i + 2, F.size("parts")),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                )
            )
        ).alias("pr")
    )
    return (
        pairs.select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
    )

@register(
    "pagerank_iteration",
    oracle=f"""
    WITH {_EDGES_SQL},
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT count(*) AS n_nodes FROM nodes),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    r0 AS (
        SELECT node, CAST({SCALE} AS BIGINT) // n_nodes AS r FROM nodes, n
    ),
    contrib AS (
        SELECT e.dst AS node, CAST(85 * r0.r AS BIGINT) // (100 * deg.out_deg) AS c
        FROM edges e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
    )
    SELECT nodes.node AS part,
           CAST((CAST(15 * {SCALE} AS BIGINT) // (100 * n.n_nodes))
                + coalesce(s.c_sum, 0) AS BIGINT) AS rank_fp,
           round(CAST((CAST(15 * {SCALE} AS BIGINT) // (100 * n.n_nodes))
                      + coalesce(s.c_sum, 0) AS DOUBLE) / {SCALE}, 9) AS rank
    FROM nodes CROSS JOIN n
    LEFT JOIN (SELECT node, sum(c) AS c_sum FROM contrib GROUP BY node) s
      ON s.node = nodes.node
    """,
    covers=(),
    doc="one PageRank power iteration over the co-purchase graph (fixed-point exact)",
)
def pagerank_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank step (d = 0.85) on the support>=2 co-purchase
    graph: r1(v) = (1-d)/N + d * Σ_{{u→v}} r0(u)/deg(u), from uniform
    r0. Single-iteration pattern like ``kmeans_iteration``: the full
    loop repeats this step to convergence with per-round
    ``localCheckpoint`` lineage truncation, exactly the
    ``duplicate_clusters`` loop shape.

    Scale: degrees and contributions are edge-grain joins keyed on
    src (rank table joins in at node grain — at 100 TB the rank/deg
    tables are node-sized, orders below the edge table; the join is
    the standard vertex-cut shape); one aggregate on dst collects
    contributions. Fixed-point floor division keeps every
    intermediate a bigint — fold-order-proof sums, hash-stable
    output in both engines.
    """
    pairs = _copurchase_pairs(spark, sf_dir)
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Spark's `/` on longs is FLOAT division; `div` is the exact
    # integer form matching DuckDB's `//` — mandatory for the
    # fixed-point discipline (a float quotient near an integer can
    # floor differently)
    r0 = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"CAST({SCALE} AS BIGINT) div n_nodes").alias("r")
    )
    contrib = (
        edges.join(r0, edges.src == r0.node)
        .join(deg, "src")
        .select(
            F.col("dst").alias("node"),
            F.expr("(85 * r) div (100 * out_deg)").cast("long").alias("c"),
        )
    )
    sums = contrib.groupBy("node").agg(F.sum("c").alias("c_sum"))
    teleport = F.expr(f"CAST(15 * {SCALE} AS BIGINT) div (100 * n_nodes)").cast("long")
    return (
        nodes.crossJoin(F.broadcast(n_nodes))
        .join(sums, "node", "left")
        .select(
            F.col("node").alias("part"),
            (teleport + F.coalesce(F.col("c_sum"), F.lit(0))).cast("long").alias("rank_fp"),
            F.round(
                (teleport + F.coalesce(F.col("c_sum"), F.lit(0))).cast("double") / SCALE, 9
            ).alias("rank"),
        )
    )


@register(
    "triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
        ) GROUP BY node
    ),
    oriented AS (
        -- orient each undirected edge from the lower-(degree, id)
        -- endpoint to the higher: every triangle then has exactly
        -- one wedge at its minimum vertex
        SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS lo,
               CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS hi
        FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
    ),
    wedges AS (
        SELECT e1.lo AS apex, e1.hi AS x, e2.hi AS y
        FROM oriented e1 JOIN oriented e2
          ON e1.lo = e2.lo AND e1.hi < e2.hi
    )
    SELECT count(*) AS triangles
    FROM wedges w
    JOIN und t ON t.a = least(w.x, w.y) AND t.b = greatest(w.x, w.y)
    """,
    covers=(),
    doc="triangle count on the co-purchase graph (degree-ordered wedge join)",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering structure: triangles in the support>=2
    co-purchase graph, by the degree-ordered node-iterator — the
    algorithm whose wedge fan-out is bounded by the ORIENTED
    out-degree (≤ √(2m) after low→high orientation), not the raw
    degree; the naive wedge join explodes quadratically on hub nodes,
    this one provably cannot. Each triangle is counted exactly once:
    at its minimum-(degree, id) vertex.

    Scale: two self-joins keyed on node ids (wedge build on the apex,
    closure probe on the (x, y) pair), both over the ORIENTED edge
    table; the (degree, id) total order is the standard tie-broken
    orientation, identical in both engines, so wedge sets match
    exactly — the count is an integer either way.
    """
    und = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("a"), F.col("pb").alias("b")
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    e1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedges = e1.join(e2, "apex").filter(F.col("x") < F.col("y"))
    closure = und.select(
        F.col("a").alias("cx"), F.col("b").alias("cy")
    )
    return (
        wedges.join(
            closure,
            (F.least("x", "y") == F.col("cx")) & (F.greatest("x", "y") == F.col("cy")),
        )
        .agg(F.count("*").alias("triangles"))
    )
