"""Similarity-search plans over ``embeddings`` with oracle twins.

Query set = vec_id < 8, corpus = the rest. Oracle SQL is generated
from the same hyperplane constants as the Spark operator, and every
float expression follows the fixed-fold-order discipline
(functions/vectors.py) so cosines are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.operators.similarity import LSH_PLANES, cosine_topk, lsh_bucket_topk
from gmall_realtime2021_spark.plans.oracle_fragments import sql_dot
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import load

N_QUERIES = 8


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_QUERIES), emb.filter(F.col("vec_id") >= N_QUERIES)


def _plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]"


def _sql_bucket(vec: str) -> str:
    bits = [
        f"(CASE WHEN {sql_dot(vec, _plane_lit(p))} > 0 THEN '1' ELSE '0' END)" for p in LSH_PLANES
    ]
    return " || ".join(bits)


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_vec,
               sqrt({sql_dot('embedding', 'embedding')}) AS q_norm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
        SELECT vec_id AS c_id, embedding AS c_vec,
               sqrt({sql_dot('embedding', 'embedding')}) AS c_norm
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ),
    scored AS (
        SELECT q_id AS query_id, c_id AS neighbor_id,
               {sql_dot('q_vec', 'c_vec')} / (q_norm * c_norm) AS raw_cos
        FROM q CROSS JOIN c
    ),
    ranked AS (
        SELECT query_id, neighbor_id, raw_cos,
               row_number() OVER (PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, round(raw_cos, 6) AS cos
    FROM ranked WHERE rk <= 5
    """,
    covers=(),
    doc="brute-force cosine top-k (broadcast queries × corpus scan)",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _split(spark, sf_dir)
    out = cosine_topk(q, c, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_vec,
               sqrt({sql_dot('embedding', 'embedding')}) AS q_norm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
        SELECT vec_id AS c_id, embedding AS c_vec,
               sqrt({sql_dot('embedding', 'embedding')}) AS c_norm,
               {_sql_bucket('embedding')} AS bucket
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ),
    scored AS (
        SELECT q_id AS query_id, c_id AS neighbor_id,
               {sql_dot('q_vec', 'c_vec')} / (q_norm * c_norm) AS raw_cos
        FROM q JOIN c USING (bucket)
    ),
    ranked AS (
        SELECT query_id, neighbor_id, raw_cos,
               row_number() OVER (PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rank, round(raw_cos, 6) AS cos
    FROM ranked WHERE rk <= 3
    """,
    covers=(),
    doc="hyperplane-LSH bucketed ANN top-k (scale path)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _split(spark, sf_dir)
    out = lsh_bucket_topk(q, c, k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))
