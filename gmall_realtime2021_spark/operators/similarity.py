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
from gmall_realtime2021_spark.functions.vectors_arrow import matrix_dots_arrow, pair_dot_arrow
from gmall_realtime2021_spark.tables import fan_out

__all__ = [
    "LSH_PLANES",
    "IVF_CENTROIDS",
    "NEARDUP_PLANES",
    "hyperplanes",
    "cosine_topk",
    "lsh_bucket_topk",
    "ivf_topk",
    "embedding_near_dup_pairs",
]


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


def centroids(n_cells: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic IVF coarse-quantizer centroids (same LCG-rational
    discipline as :func:`hyperplanes` — exact literals in both
    engines). A production deployment would train these with k-means
    and broadcast them; the index structure is identical."""
    cells = []
    for j in range(n_cells):
        row = []
        for i in range(dim):
            v = (1103515245 * (j * 419 + i * 23 + 29) + 12345) % (1 << 31)
            row.append(v / float(1 << 31) - 0.5)
        cells.append(row)
    return cells


IVF_CENTROIDS = centroids()
#: ‖c‖² per centroid, as exact Python doubles (inlined as literals).
IVF_C2 = [sum(x * x for x in c) for c in IVF_CENTROIDS]


def _cell_scores(vec_col: str) -> F.Column:
    """array of (−2·v·cⱼ + ‖cⱼ‖²) — rank-equivalent to squared
    distance to centroid j (‖v‖² is constant per row). Centroid dots
    come from the Arrow matrix-dot pass (functions/vectors_arrow.py);
    the affine map stays JVM-side."""
    dots = matrix_dots_arrow(F.col(vec_col), IVF_CENTROIDS)
    return F.transform(
        dots,
        lambda d, j: d * F.lit(-2.0)
        + F.element_at(F.array(*[F.lit(c2) for c2 in IVF_C2]), j + 1),
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 3, n_probe: int = 2, vec_col: str = "embedding"
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest-centroid cell;
    queries probe the ``n_probe`` nearest cells and score exact
    cosine only there.

    Scale path: the cell id is the shuffle/join key (like a
    bucketed-table layout at rest); a 100 TB corpus partitioned by
    cell serves each query from n_probe partitions. Probing is
    expressed as an explode of the probe-cell array → plain
    equi-join; Catalyst broadcasts the (small) query side.

    Probing is a portable argsort: (score, index) structs sorted
    lexicographically — Spark ``array_sort`` and DuckDB ``list_sort``
    order structs identically, so any ``n_probe`` stays
    oracle-exact (ties broken by cell index in both engines).
    """
    n_cells = len(IVF_CENTROIDS)
    if not 1 <= n_probe <= n_cells:
        raise ValueError(f"n_probe must be in [1, {n_cells}]")
    # Corpus: assign to nearest cell (first index on exact ties).
    # fan_out: 16 centroid dots per row, rebalanced across cores.
    c = _with_norm(fan_out(corpus.select("vec_id", vec_col)), vec_col, "c").withColumn(
        "scores", _cell_scores("c_vec")
    )
    c = c.withColumn("cell", F.array_position("scores", F.array_min("scores"))).drop("scores")
    # Queries: the n_probe nearest cells by score-argsort.
    q = _with_norm(queries, vec_col, "q").withColumn("scores", _cell_scores("q_vec"))
    idx = F.sequence(F.lit(1), F.lit(n_cells))
    ranked = F.array_sort(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("scores"), i).alias("s"), i.alias("i")
            ),
        )
    )
    probes = F.transform(F.slice(ranked, 1, n_probe), lambda x: x.getField("i").cast("long"))
    q = q.select("q_id", "q_vec", "q_norm", F.explode(probes).alias("cell"))
    scored = F.broadcast(q).join(c, "cell").select(
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


#: Multi-table LSH for near-dup: 4 tables × 4 planes. One 8-plane
#: table (as in :func:`lsh_bucket_topk`) has ~0 recall at cosine 0.5
#: (P = (1−θ/π)^8); banding trades precision for recall exactly like
#: MinHash bands (operators/dedup.py).
NEARDUP_PLANES = hyperplanes(16)
NEARDUP_TABLES = 4
NEARDUP_PLANES_PER = 4


def _neardup_band_keys(vec_col: str) -> F.Column:
    """4 band keys from one Arrow pass over all 16 planes; only the
    sign-bit formatting stays in the JVM."""
    dots = matrix_dots_arrow(F.col(vec_col), NEARDUP_PLANES).alias("_nd_dots")

    def key(t: int, d: F.Column) -> F.Column:
        bits = [
            F.when(F.element_at(d, t * NEARDUP_PLANES_PER + i + 1) > 0, "1").otherwise("0")
            for i in range(NEARDUP_PLANES_PER)
        ]
        return F.concat(F.lit(f"{t}:"), *bits)

    # Route through a single transform over a 1-elem wrapper so the
    # UDF column is referenced once per row, not 16 times.
    return F.transform(
        F.array(dots), lambda d: F.array(*[key(t, d) for t in range(NEARDUP_TABLES)])
    ).getItem(0)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    min_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup
    primitive): candidates = pairs colliding in >= ``min_tables`` of
    the 4 LSH band tables, then exact cosine >= threshold verifies --
    the candidates-then-verify shape of MinHash-LSH dedup.

    Scale design: the bucket join carries *ids only* (the band key is
    the sole shuffle key; rows are two ints and a short string), the
    >=min_tables vote is a cheap count aggregate that cuts random
    collisions ~10x before any vector math, and only the surviving
    candidate ids re-join the (norm-annotated) vectors for exact
    verification. Vector arrays never travel through the candidate
    shuffle -- the difference between this and a naive bucket join is
    the difference between shuffling ids and shuffling the corpus.
    """
    # fan_out: the 16 plane-dots per row are the map-side hot path —
    # rebalance the (single-row-group) scan before computing them.
    base = fan_out(emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), norm(F.col(vec_col)).alias("nm")
    )
    buckets = base.select("id", F.explode(_neardup_band_keys("vec")).alias("bucket"))
    cand = (
        buckets.select(F.col("id").alias("a"), "bucket")
        .join(buckets.select(F.col("id").alias("b"), "bucket"), "bucket")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("tables_hit"))
        .filter(F.col("tables_hit") >= min_tables)
        .select("a", "b")
    )
    va = base.select(F.col("id").alias("a"), F.col("vec").alias("va"), F.col("nm").alias("na"))
    vb = base.select(F.col("id").alias("b"), F.col("vec").alias("vb"), F.col("nm").alias("nb"))
    # Arrow pair-dot: the candidate set is orders of magnitude larger
    # than the survivor set, so bulk verification is the hot path.
    cos = pair_dot_arrow(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _bucket(vec_col: str) -> F.Column:
    """Sign-bit bucket key over the fixed hyperplanes."""
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane])) > 0, "1").otherwise("0")
        for plane in LSH_PLANES
    ]
    return F.concat(*bits)


def _bit_cols(vec_col: str) -> list[F.Column]:
    """The 8 sign bits as individual '0'/'1' columns — computed once
    (one Arrow matrix-dot pass), composed into bucket keys after."""
    dots = matrix_dots_arrow(F.col(vec_col), LSH_PLANES)
    return [
        F.when(F.element_at(dots, i + 1) > 0, "1").otherwise("0").alias(f"_bit{i}")
        for i in range(len(LSH_PLANES))
    ]


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Hyperplane-LSH ANN: queries meet corpus only inside their
    sign-bucket, then exact cosine top-k within the bucket. Output is
    the algorithm's answer (not exact top-k) — the oracle runs the
    same algorithm, so the check is strict.

    ``multiprobe`` probes the 8 one-bit-flip neighbor buckets as well
    (the standard multi-probe LSH recall lever): a query whose true
    neighbor sits just across one hyperplane still finds it, at 9×
    candidate cost — still a tiny fraction of the corpus. Corpus rows
    stay single-bucket; only the (broadcast) query side fans out.
    """
    n = len(LSH_PLANES)
    qb = _with_norm(queries, vec_col, "q").select("*", *_bit_cols("q_vec"))
    bits = [F.col(f"_bit{i}") for i in range(n)]

    def key_with_flip(flip: int | None) -> F.Column:
        parts = [
            F.when(bits[i] == "1", "0").otherwise("1") if i == flip else bits[i]
            for i in range(n)
        ]
        return F.concat(*parts)

    probe_keys = [key_with_flip(None)] + ([key_with_flip(i) for i in range(n)] if multiprobe else [])
    q = F.broadcast(
        qb.select("q_id", "q_vec", "q_norm", F.explode(F.array(*probe_keys)).alias("bucket"))
    )
    cb = _with_norm(corpus, vec_col, "c").select("*", *_bit_cols("c_vec"))
    c = cb.select("c_id", "c_vec", "c_norm", F.concat(*bits).alias("bucket"))
    scored = (
        q.join(c, "bucket")
        .dropDuplicates(["q_id", "c_id"])
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
