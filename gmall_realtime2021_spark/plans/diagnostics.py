"""Pipeline-diagnostic queries: index-quality audits and skew
profiling, expressed as plans (measurement-as-a-query).

A 100 TB curation run needs its own observability: is the LSH index
still catching the near-dups the exact metric defines? Which join
keys are skewed enough to need salting? Both answers are themselves
one-pass aggregate queries over the same engine — so they live in the
catalog with oracle twins like everything else, and the driver's hash
gate guards them against drift the same way (complementing the
pytest-side recall floors in ``tests/test_algo_quality.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from gmall_realtime2021_spark.plans.registry import PLANS, register
from gmall_realtime2021_spark.tables import load


@register(
    "lsh_quality_audit",
    # composes the two pair oracles verbatim: ground truth = the exact
    # inverted-index Jaccard pairs, prediction = the banded-LSH pairs
    oracle="""
    WITH truth AS (SELECT a, b FROM ({exact})),
         pred  AS (SELECT a, b FROM ({lsh})),
         joined AS (
             SELECT (t.a IS NOT NULL) AS in_truth,
                    (p.a IS NOT NULL) AS in_pred
             FROM truth t FULL OUTER JOIN pred p ON t.a = p.a AND t.b = p.b
         )
    SELECT count(CASE WHEN in_truth AND in_pred THEN 1 END) AS tp,
           count(CASE WHEN NOT in_truth AND in_pred THEN 1 END) AS fp,
           count(CASE WHEN in_truth AND NOT in_pred THEN 1 END) AS fn,
           CAST(count(CASE WHEN in_truth AND in_pred THEN 1 END) AS DOUBLE)
               / count(CASE WHEN in_pred THEN 1 END) AS precision,
           CAST(count(CASE WHEN in_truth AND in_pred THEN 1 END) AS DOUBLE)
               / count(CASE WHEN in_truth THEN 1 END) AS recall
    FROM joined
    """.format(
        exact=PLANS["dedup_ngram_jaccard"].oracle, lsh=PLANS["dedup_minhash_lsh"].oracle
    ),
    covers=(),
    doc="LSH index-quality audit: precision/recall of banded MinHash vs exact Jaccard pairs",
)
def lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the MinHash-LSH index against the exact
    inverted-index Jaccard ground truth, as one full-outer join +
    conditional-count pass over the two (tiny) pair sets. Precision
    is 1.0 by construction (the LSH path exact-verifies candidates at
    the same threshold); the number that can silently drift with k,
    band count, or shingle changes is RECALL — banding can miss a
    true pair entirely. Counts are bigint; precision/recall are one
    bigint→double division each, bit-identical across engines.

    Scale: both pair sets are outputs of already-bucketed pipelines
    (never all-pairs); the audit join is pair-count sized — epsilon
    next to the pipelines it measures.
    """
    docs = load(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs).select("a", "b", F.lit(True).alias("in_truth"))
    pred = minhash_lsh_pairs(docs).select(
        F.col("a").alias("pa"), F.col("b").alias("pb"), F.lit(True).alias("in_pred")
    )
    joined = truth.join(
        pred, (truth.a == pred.pa) & (truth.b == pred.pb), "full_outer"
    ).select(
        F.coalesce(F.col("in_truth"), F.lit(False)).alias("in_truth"),
        F.coalesce(F.col("in_pred"), F.lit(False)).alias("in_pred"),
    )
    tp = F.count(F.when(F.col("in_truth") & F.col("in_pred"), 1))
    return joined.agg(
        tp.alias("tp"),
        F.count(F.when(~F.col("in_truth") & F.col("in_pred"), 1)).alias("fp"),
        F.count(F.when(F.col("in_truth") & ~F.col("in_pred"), 1)).alias("fn"),
        (tp.cast("double") / F.count(F.when(F.col("in_pred"), 1))).alias("precision"),
        (tp.cast("double") / F.count(F.when(F.col("in_truth"), 1))).alias("recall"),
    )


_SKEW_KEYS = (
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
    ("events", "user_id"),
)


def _skew_sql(table: str, key: str) -> str:
    return f"""
    SELECT '{table}.{key}' AS join_key,
           count(*) AS n_keys,
           CAST(sum(ct) AS BIGINT) AS n_rows,
           CAST(max(ct) AS BIGINT) AS max_ct,
           CAST(sum(ct) AS DOUBLE) / count(*) AS mean_ct,
           round(quantile_cont(CAST(ct AS DOUBLE), 0.5), 6) AS p50_ct,
           round(quantile_cont(CAST(ct AS DOUBLE), 0.99), 6) AS p99_ct,
           CAST(max(ct) AS DOUBLE) / (CAST(sum(ct) AS DOUBLE) / count(*)) AS skew_factor
    FROM (SELECT {key}, count(*) AS ct FROM {table} GROUP BY {key})
    """


@register(
    "key_skew_profile",
    oracle=" UNION ALL ".join(_skew_sql(t, k) for t, k in _SKEW_KEYS),
    covers=("J6",),
    doc="join-key skew profile: per-key count distribution + hot-key factor for the shuffle keys",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight check for every shuffle key this engine joins or
    aggregates on: per-key row counts summarized as exact p50/p99/max
    and a hot-key factor (max/mean). skew_factor >> p99/mean is the
    signal to salt that join or lean on AQE skew splitting
    (``operators/skew.salted_join`` — exercised by
    ``skewed_user_enrich``).

    Scale: one count-aggregate per table (map-side combined) plus a
    per-table summary whose input is one row per KEY; the exact
    percentiles run over the key-grain counts, never raw rows. The
    three summaries union to a 3-row frame. Means/factors are
    bigint→double divisions, exact in both engines; percentiles
    follow the proven interpolated-median parity of
    ``median_order_gap``.
    """
    parts = []
    for table, key in _SKEW_KEYS:
        ct = load(spark, sf_dir, table).groupBy(key).agg(F.count("*").alias("ct"))
        parts.append(
            ct.agg(
                F.lit(f"{table}.{key}").alias("join_key"),
                F.count("*").alias("n_keys"),
                F.sum("ct").cast("long").alias("n_rows"),
                F.max("ct").cast("long").alias("max_ct"),
                (F.sum("ct").cast("double") / F.count("*")).alias("mean_ct"),
                F.round(F.percentile(F.col("ct").cast("double"), F.lit(0.5)), 6).alias("p50_ct"),
                F.round(F.percentile(F.col("ct").cast("double"), F.lit(0.99)), 6).alias("p99_ct"),
                (F.max("ct").cast("double") / (F.sum("ct").cast("double") / F.count("*"))).alias(
                    "skew_factor"
                ),
            )
        )
    out = parts[0]
    for nxt in parts[1:]:
        out = out.unionByName(nxt)
    return out
