"""Similarity search over embedding columns (SURVEY.md §7 M5).

Embeddings are ``array<float>`` columns; all arithmetic is JVM-side
double folds (functions/vectors.py) so results stay oracle-exact.

Scale shapes:

- brute-force top-k: broadcast the (small) query set, scan the
  corpus once, per-partition partial top-k via the rank window —
  the honest baseline every ANN variant is judged against.
- LSH (random hyperplane): deterministic hyperplanes → sign-bit
  bucket key → equi-join queries↔corpus per bucket. The bucket key
  is the shuffle key; each query only scores its bucket. Recall is
  tunable with more tables/probes; this is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.functions.vectors import dot, norm

__all__ = ["LSH_PLANES", "hyperplanes", "cosine_topk", "lsh_bucket_topk"]


def hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from an LCG over
    rationals — exact literals both engines parse to identical
    doubles (no libm, no RNG)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            v = (1103515245 * (j * 131 + i * 17 + 7) + 12345) % (1 << 31)
            row.append(v / float(1 << 31) - 0.5)
        planes.append(row)
    return planes


LSH_PLANES = hyperplanes()


def _with_norm(df: DataFrame, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_vec"),
        norm(F.col(vec_col)).alias(f"{prefix}_norm"),
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5, vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast queries × corpus scan.

    Norms are precomputed per row (not per pair); cosine =
    dot/(qn·cn) in a fixed fold order so DuckDB reproduces the bits.
    Ties broken on neighbor id.
    """
    q = F.broadcast(_with_norm(queries, vec_col, "q"))
    c = _with_norm(corpus, vec_col, "c")
    scored = q.join(c).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _bucket(vec_col: str) -> F.Column:
    """Sign-bit bucket key over the fixed hyperplanes."""
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane])) > 0, "1").otherwise("0")
        for plane in LSH_PLANES
    ]
    return F.concat(*bits)


def lsh_bucket_topk(queries: DataFrame, corpus: DataFrame, k: int = 3, vec_col: str = "embedding") -> DataFrame:
    """Hyperplane-LSH ANN: queries meet corpus only inside their
    sign-bucket, then exact cosine top-k within the bucket. Output is
    the algorithm's answer (not exact top-k) — the oracle runs the
    same algorithm, so the check is strict.
    """
    q = F.broadcast(_with_norm(queries, vec_col, "q").withColumn("bucket", _bucket("q_vec")))
    c = _with_norm(corpus, vec_col, "c").withColumn("bucket", _bucket("c_vec"))
    scored = q.join(c, "bucket").select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
