"""Mergeable-sketch operators: incremental distinct maintenance with
Apache DataSketches HLL (Spark ≥3.5 built-ins).

The 100 TB pattern this encodes: persist one HLL sketch per
(partition-key, day) — a few KB each — and answer ANY date-range
distinct-count query by merging sketches, never rescanning the fact
data. ``approx_count_distinct`` (HLL++) gives a one-shot estimate but
its aggregate state is not a storable column; ``hll_sketch_agg``
emits the sketch AS a binary column, which is what makes nightly
incremental maintenance possible (union yesterday's sketch with
today's partial — associative, commutative, lossless w.r.t. the
sketch's own guarantees).

All JVM-side expressions (DataSketches via Catalyst); no Python in
the loop. Tests pin the algebraic property that makes the pattern
sound (merge-of-parts ≡ sketch-of-whole) and the accuracy envelope
vs the exact count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_positions_int",
    "daily_user_sketches",
    "range_distinct_estimate",
    "cms_buckets",
    "daily_type_cms",
    "cms_range_estimate",
]


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """One HLL sketch of the distinct user_ids per day: (day, sketch).

    This is the stored layer — at scale, the nightly job computes one
    such row per (day, dimension cell) from that day's partition only
    and appends it; historical fact partitions are never re-read.
    """
    return events.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch")
    )


def range_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Merge a set of per-day sketches into one distinct-user estimate
    (1 row: est bigint). Filter the input to any date range first —
    the merge cost is rows × sketch-size, independent of fact volume.
    """
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_buckets(col: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> Column:
    """The (i, bucket) pairs a value maps to — salted copies of the
    portable polynomial hash, the SAME family ``plans/sketches.py``
    uses batch-side (salt ``cm{i}:``), so batch-built and
    stream-maintained counter tables are interchangeable."""
    from gmall_realtime2021_spark.functions.text import poly_hash

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (poly_hash(F.concat(F.lit(f"cm{i}:"), col)) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def daily_type_cms(events: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min counter rows of per-day event_type multiplicity:
    ``(d, i, bucket, ct)``. Like :func:`daily_user_sketches` this is
    the STORED layer: one bounded block of ≤ depth·width rows per day,
    mergeable by counter-wise SUM — associative and commutative, so
    any micro-batch split yields bit-identical counters to a single
    pass (a stronger property than HLL, whose guarantee is
    register-state equality; pinned in test_sinks.py).
    """
    hashed = events.select(
        F.to_date("ts").alias("d"), F.explode(cms_buckets(F.col("event_type"), depth, width)).alias("h")
    )
    return hashed.groupBy(
        "d", F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket")
    ).agg(F.count("*").alias("ct"))


def cms_range_estimate(counters: DataFrame, terms: Sequence[str], depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Estimate each term's total occurrences over the stored range:
    SUM the per-day counters first (CMS merge), then take the min over
    the term's depth buckets. Filter ``counters`` by day to scope the
    range — cost is rows × depth·width, independent of fact volume.
    Terms absent from every batch estimate 0 (their buckets may hold
    other terms' mass, so the one-sided >= guarantee still holds).
    """
    spark = counters.sparkSession
    summed = counters.groupBy("i", "bucket").agg(F.sum("ct").alias("ct"))
    probe = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", F.explode(cms_buckets(F.col("term"), depth, width)).alias("h")
    )
    return (
        probe.select("term", F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket"))
        .join(summed, ["i", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("ct"), F.lit(0))).cast("long").alias("est"))
    )


BF_K = 3  # Bloom hash functions
BF_M = 4096  # Bloom bit positions


def bloom_positions(col: Column, k: int = BF_K, m: int = BF_M) -> Column:
    """The k bit positions a key sets/probes — salted copies of the
    portable polynomial hash (salt ``bf{j}:``), the SAME family
    ``plans/sketches.bloom_membership`` uses batch-side, so a
    batch-built filter and a stream-maintained one are
    interchangeable (pinned in test_sinks.py)."""
    from gmall_realtime2021_spark.functions.text import poly_hash

    return F.array(
        *[
            poly_hash(F.concat(F.lit(f"bf{j}:"), col.cast("string"))) % m
            for j in range(k)
        ]
    )


#: Salted affine coefficients for :func:`bloom_positions_int` —
#: classic LCG multipliers/increments, all < 2^31 so ``h * a + b``
#: stays under 2^62 for h in [0, POLY_MOD).
BF_INT_COEFFS = ((1103515245, 12345), (69069, 362437), (1664525, 1013904223))


def bloom_positions_int(col: Column, m: int = BF_M) -> Column:
    """k bit positions for an ALREADY-HASHED int64 key in
    [0, POLY_MOD): salted affine maps modulo the Mersenne prime —
    ``((h*a_j + b_j) mod P) mod m`` — pure integer arithmetic that
    stays inside whole-stage codegen. The string-salted
    :func:`bloom_positions` pays an interpreted O(chars) fold per
    probe (it must: its keys are arbitrary strings); when the key is
    already a poly hash, re-stringifying it costs more than the whole
    rest of the plan (measured: decontamination_bloom 3.0 → sub-second
    at sf0.01). NOT interchangeable with filters built by the string
    family — a store is one family or the other.
    """
    from gmall_realtime2021_spark.functions.text import POLY_MOD

    return F.array(
        *[
            ((col * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD)) % F.lit(m)
            for a, b in BF_INT_COEFFS
        ]
    )
