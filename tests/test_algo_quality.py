"""Algorithm-quality checks for the approximate operators.

Oracle parity proves the *implementation* is deterministic and
cross-engine exact; these tests bound the *algorithms*: an ANN or
LSH variant that hash-matches its oracle but finds nothing useful
would still pass parity. Ground truths are the exhaustive
counterparts on the same fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_realtime2021_spark.plans import get_plans

SF = "/root/testdata/sf0.01"


def _pairs(df, a="a", b="b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_recall_and_precision(spark):
    """ngram_jaccard is exhaustive (inverted index over ALL shared
    shingles); minhash-LSH samples the same space through 4 bands.
    Both verify exact Jaccard >= 0.5, so LSH output must be a subset
    (precision 1.0) with high recall at this threshold."""
    exact = _pairs(get_plans()["dedup_ngram_jaccard"].build(spark, SF))
    lsh = _pairs(get_plans()["dedup_minhash_lsh"].build(spark, SF))
    assert lsh <= exact  # precision 1.0 by construction
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(exact)} true pairs"


def test_ann_variants_recall_vs_brute_force(spark):
    """LSH/IVF top-k against the exact top-k.

    The fixture embeddings are near-uniform random (max pairwise
    cosine ≈ 0.51) — the worst case for any ANN index, where "true
    neighbors" are barely closer than random points. The honest bound
    is therefore chance-normalized: recall must beat a same-size
    random answer set by a wide factor (≥ 10×), plus a small absolute
    floor. On clustered real-world embeddings the same indexes have
    conventional recall; this pins that they're far better than
    chance even with no structure to exploit.
    """
    brute = get_plans()["ann_cosine_topk"].build(spark, SF)
    truth = {
        (r.query_id, r.neighbor_id) for r in brute.filter(F.col("rank") <= 3).collect()
    }
    corpus_n = 500 - 8  # sf0.01 embeddings minus the query set
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        got = {
            (r.query_id, r.neighbor_id)
            for r in get_plans()[name].build(spark, SF).collect()
        }
        recall = len(got & truth) / len(truth)
        # chance: each returned neighbor is a uniform draw from the corpus
        chance = (len(got) / len(truth)) * (3 / corpus_n)
        assert recall >= max(0.05, 10 * chance), (
            f"{name} recall {recall:.3f} vs chance {chance:.4f}"
        )


def test_pq_training_improves_reconstruction(spark):
    """Per-subspace Lloyd's training must strictly reduce mean PQ
    reconstruction error vs the untrained deterministic codebooks
    (measured ~25% drop on the fixture corpus), and the trained ADC
    search must stay chance-normalized-useful like the other ANN
    variants. Pins train_pq_codebooks end-to-end."""
    from gmall_realtime2021_spark.operators.similarity import (
        cosine_topk,
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from gmall_realtime2021_spark.tables import load

    emb = load(spark, SF, "embeddings")
    err0 = pq_encode(emb).agg(F.avg("recon_err")).collect()[0][0]
    books = train_pq_codebooks(emb, iters=3)
    err1 = pq_encode(emb, books=books).agg(F.avg("recon_err")).collect()[0][0]
    assert err1 < err0 * 0.9, (err0, err1)

    q = emb.filter(F.col("vec_id") < 8)
    c = emb.filter(F.col("vec_id") >= 8)
    truth = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, c, k=3).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(q, c, k=10, books=books).collect()
    }
    recall = len(got & truth) / len(truth)
    chance = (len(got) / len(truth)) * (3 / (500 - 8))
    assert recall >= max(0.05, 5 * chance), f"PQ recall {recall:.3f} vs chance {chance:.4f}"


def test_ivfpq_rerank_never_worse_than_adc(spark):
    """Stage-2 exact re-rank picks the true-cosine-best 3 of the same
    10 ADC candidates, so its recall against the exact top-3 is
    mathematically >= the ADC-only top-3's recall. Pin it (and that
    the composed plans run end to end)."""
    brute = get_plans()["ann_cosine_topk"].build(spark, SF)
    truth = {(r.query_id, r.neighbor_id) for r in brute.filter(F.col("rank") <= 3).collect()}
    adc = {
        (r.query_id, r.neighbor_id)
        for r in get_plans()["ann_ivfpq_topk"].build(spark, SF).collect()
    }
    rerank = {
        (r.query_id, r.neighbor_id)
        for r in get_plans()["ann_ivfpq_rerank"].build(spark, SF).collect()
    }
    assert len(rerank & truth) >= len(adc & truth), (
        len(rerank & truth), len(adc & truth))


def test_ivf_training_improves_quantization(spark):
    """Lloyd's training of the coarse quantizer must strictly reduce
    the mean squared distance to the assigned centroid vs the
    untrained LCG centroids — pins train_ivf_centroids end-to-end
    (same criterion as the PQ trainer)."""
    from gmall_realtime2021_spark.operators.similarity import (
        _cell_scores,
        train_ivf_centroids,
    )
    from gmall_realtime2021_spark.functions.vectors import dot
    from gmall_realtime2021_spark.tables import load

    emb = load(spark, SF, "embeddings")

    def msd(cents):
        # actual squared distance = ||v||^2 + min_score (scores are
        # -2 v.c + ||c||^2)
        scored = emb.select(
            (dot(F.col("embedding"), F.col("embedding"))
             + F.array_min(_cell_scores("embedding", cents))).alias("d2")
        )
        return scored.agg(F.avg("d2")).collect()[0][0]

    from gmall_realtime2021_spark.operators.similarity import centroids

    before = msd(centroids())
    trained = train_ivf_centroids(emb, iters=3)
    after = msd(trained)
    assert after < before * 0.9, (before, after)


def test_leakage_free_split_has_zero_leakage(spark):
    """The remedy must actually remedy: re-splitting by near-dup
    cluster leaves ZERO Jaccard pairs straddling splits (while the
    plain content-hash split provably leaks on this fixture — the
    cross_split_leakage plan returns rows)."""
    from gmall_realtime2021_spark.operators.dedup import ngram_jaccard_pairs
    from gmall_realtime2021_spark.tables import load

    docs = load(spark, SF, "documents")
    labels = get_plans()["leakage_free_split"].build(spark, SF)
    pairs = ngram_jaccard_pairs(docs)
    la = labels.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    lb = labels.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    crossing = pairs.join(la, "a").join(lb, "b").filter("sa <> sb")
    assert crossing.count() == 0
    # the audit is non-vacuous: the naive split DOES leak here
    assert get_plans()["cross_split_leakage"].build(spark, SF).count() > 0
