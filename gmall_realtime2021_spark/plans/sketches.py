"""Deterministic probabilistic-structure plans: a Count-Min sketch and
a Bloom filter, both built on the catalog's portable polynomial hash
so the sketch CONTENTS (not just the error guarantees) are
bit-identical in Spark and DuckDB — the estimates themselves are
oracle-checkable, unlike library sketches with engine-private hashing.

- countmin_heavyhitters — d×w Count-Min over corpus token counts;
  per-candidate exact count vs sketch estimate (est >= exact always)
- bloom_membership      — k-hash/m-bit Bloom built over the orders
  custkey set, probed by every customer; per-nation
  true/bloom-member/false-positive census (no false negatives by
  construction)

Why these matter at 100 TB: both structures compress an unbounded key
set into a FIXED-size summary (d·w counters / m bit positions) that
merges map-side and broadcasts whole — the standard way to pre-filter
a huge probe side before any shuffle (Bloom semijoin) or to
approximate frequencies in one pass (CMS). The reference keeps
per-key state in HBase/Redis (``DimUtil.java:21-58``,
``RedisUtil.java:12-26``); these plans are the bounded-memory batch
counterpart, and ``streaming/sinks.py`` maintains the same shapes
incrementally (HLL today, CMS via ``cms_sketch_maintenance_sink``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.functions.text import poly_hash, tokenize
from gmall_realtime2021_spark.plans.oracle_fragments import sql_poly_hash, sql_tokens
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import fan_out, load

from gmall_realtime2021_spark.operators.sketches import BF_K, BF_M, bloom_positions

CM_DEPTH = 4  # hash rows
CM_WIDTH = 256  # counters per row
CM_TOPK = 20  # candidates to estimate (the exact top-k terms)


@register(
    "countmin_heavyhitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({sql_tokens("coalesce(text, '')")}) AS term FROM documents
    ),
    counts AS (
        SELECT term, count(*) AS ct FROM tok GROUP BY term
    ),
    hashes AS (
        SELECT term, ct, i,
               {sql_poly_hash("'cm' || CAST(i AS VARCHAR) || ':' || term")} % {CM_WIDTH} AS bucket
        FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    ),
    sketch AS (
        SELECT i, bucket, sum(ct) AS bsum FROM hashes GROUP BY i, bucket
    ),
    cand AS (
        SELECT term, ct FROM counts ORDER BY ct DESC, term LIMIT {CM_TOPK}
    )
    SELECT c.term,
           CAST(c.ct AS BIGINT) AS exact_ct,
           CAST(min(s.bsum) AS BIGINT) AS cm_est,
           CAST(min(s.bsum) - c.ct AS BIGINT) AS overestimate
    FROM cand c
    JOIN hashes h ON h.term = c.term
    JOIN sketch s ON s.i = h.i AND s.bucket = h.bucket
    GROUP BY c.term, c.ct
    """,
    covers=("A6", "J6"),
    doc="Count-Min sketch (4×256) over token counts; estimate vs exact for top-20 terms",
)
def countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4×256 Count-Min sketch over the corpus token-frequency
    table, then read back estimates for the exact top-20 terms. The
    sketch rows use salted copies of the portable polynomial hash, so
    both engines place every term in the same counters, and the
    estimate — min over the 4 counters a term maps to — is exactly
    reproducible (and provably >= the true count;
    ``tests/test_sketch_plans.py`` pins both properties).

    Scale: one term-grain hash aggregate over the tokens; the sketch
    build then collapses 4 rows per term into <= d·w = 1024 counters —
    a bounded structure regardless of corpus size (Spark's partial
    aggregation on (i, bucket) IS the map-side sketch merge) — and the
    candidate lookup is a broadcast join against those 1024 rows. The
    top-20 pick is TakeOrderedAndProject, never a global sort.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    txt = F.coalesce(F.col("text"), F.lit(""))
    counts = (
        docs.select(F.explode(tokenize(txt)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("ct"))
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (poly_hash(F.concat(F.lit(f"cm{i}:"), F.col("term"))) % CM_WIDTH).alias(
                    "bucket"
                ),
            )
            for i in range(CM_DEPTH)
        ]
    )

    def fan(df: DataFrame) -> DataFrame:
        return df.select("term", "ct", F.explode(buckets).alias("h")).select(
            "term", "ct", F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket")
        )

    sketch = fan(counts).groupBy("i", "bucket").agg(F.sum("ct").alias("bsum"))
    cand = counts.orderBy(F.desc("ct"), F.asc("term")).limit(CM_TOPK)
    return (
        fan(cand)
        .join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("term", "ct")
        .agg(F.min("bsum").alias("_est"))
        .select(
            "term",
            F.col("ct").cast("long").alias("exact_ct"),
            F.col("_est").cast("long").alias("cm_est"),
            (F.col("_est") - F.col("ct")).cast("long").alias("overestimate"),
        )
    )


@register(
    "bloom_membership",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
    ),
    filt AS (
        SELECT DISTINCT {sql_poly_hash("'bf' || CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % {BF_M} AS pos
        FROM keys CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
    ),
    probe AS (
        SELECT c_custkey, c_nationkey,
               {sql_poly_hash("'bf' || CAST(j AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} % {BF_M} AS pos
        FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
    ),
    verdict AS (
        SELECT p.c_custkey, p.c_nationkey,
               CASE WHEN count(f.pos) = {BF_K} THEN 1 ELSE 0 END AS bloom_member
        FROM probe p LEFT JOIN filt f ON p.pos = f.pos
        GROUP BY p.c_custkey, p.c_nationkey
    ),
    truth AS (
        SELECT v.c_nationkey, v.bloom_member,
               CASE WHEN k.k IS NULL THEN 0 ELSE 1 END AS actual
        FROM verdict v LEFT JOIN keys k ON v.c_custkey = k.k
    )
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS customer_ct,
           CAST(sum(actual) AS BIGINT) AS true_members,
           CAST(sum(bloom_member) AS BIGINT) AS bloom_members,
           CAST(sum(CASE WHEN bloom_member = 1 AND actual = 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_positives
    FROM truth GROUP BY c_nationkey
    """,
    covers=("J3", "J6"),
    doc="Bloom-semijoin census: orders custkeys probed by every customer, per-nation FP counts",
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom filter (k=3 salted polynomial hashes into m=4096
    positions) over the set of customers that placed orders, probe it
    with EVERY customer, and reconcile against true membership: per
    nation, how many customers the filter admits and how many of those
    are false positives. False negatives are impossible by
    construction, which the oracle proves on every run
    (``true_members <= bloom_members`` row by row).

    This is the Bloom-semijoin pre-filter shape: the filter side
    compresses an arbitrarily large key set into <= m distinct
    positions (4096 rows here) that broadcast to every executor, so a
    100 TB probe side is filtered map-side BEFORE any shuffle join —
    the same trick Spark's runtime row-level Bloom join applies, made
    explicit and oracle-checkable. The membership count-join stays at
    probe grain (k rows per probe key), never key×key.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    keys = orders.select(F.col("o_custkey").alias("k")).distinct()
    filt = keys.select(F.explode(bloom_positions(F.col("k"))).alias("pos")).distinct()
    probe = customer.select(
        "c_custkey",
        "c_nationkey",
        F.explode(bloom_positions(F.col("c_custkey"))).alias("pos"),
    )
    verdict = (
        probe.join(F.broadcast(filt.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.when(F.col("hits") == BF_K, 1).otherwise(0).alias("bloom_member"),
        )
    )
    truth = verdict.join(
        keys.withColumn("present", F.lit(1)), verdict.c_custkey == keys.k, "left"
    ).select(
        "c_nationkey",
        "bloom_member",
        F.coalesce(F.col("present"), F.lit(0)).alias("actual"),
    )
    return truth.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").cast("long").alias("customer_ct"),
        F.sum("actual").cast("long").alias("true_members"),
        F.sum("bloom_member").cast("long").alias("bloom_members"),
        F.sum(F.when((F.col("bloom_member") == 1) & (F.col("actual") == 0), 1).otherwise(0))
        .cast("long")
        .alias("false_positives"),
    )
