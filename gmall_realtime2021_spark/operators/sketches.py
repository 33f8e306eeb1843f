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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["daily_user_sketches", "range_distinct_estimate"]


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
