"""Approx-distinct plan: HLL order counts within rsd bounds of the
exact plan (the scale/streaming path for A1's distinct metrics)."""

from __future__ import annotations

from gmall_realtime2021_spark.plans import get_plans

SF = "/root/testdata/sf0.01"


def test_approx_order_ct_within_bounds(spark):
    exact = {
        (r.stt, r.p_brand): r.order_ct
        for r in get_plans()["product_stats"].build(spark, SF).collect()
    }
    approx = {
        (r.stt, r.p_brand): r.order_ct_approx
        for r in get_plans()["product_stats_approx"].build(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        ap = approx[k]
        # rsd=2% asymptotically; small-cardinality HLL++ bins carry a
        # few-count bias, so allow max(5, 15%) absolute slack
        assert abs(ap - ex) <= max(5, 0.15 * ex), (k, ex, ap)


def test_approx_percentiles_within_bounds(spark):
    """percentile_approx rank error: with accuracy=10000 and ~20k
    events the sketch is near-exact; allow a loose 5% relative value
    slack to stay robust to sketch-impl changes."""
    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in get_plans()["event_value_percentiles"].build(spark, SF).collect()
    }
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in get_plans()["event_value_percentiles_approx"].build(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        for e, a in zip(ex, approx[k]):
            assert abs(a - e) <= max(0.05 * abs(e), 1.0), (k, ex, approx[k])


def test_hll_sketch_merge_equals_whole(spark, sf_dir):
    """The algebraic property that makes incremental distinct
    maintenance sound: merging per-day HLL sketches estimates the
    SAME value as sketching the whole range at once (identical
    register state — HLL is order- and partition-insensitive), and
    both land within the sketch's error envelope of the exact count."""
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.operators.sketches import (
        daily_user_sketches,
        range_distinct_estimate,
    )
    from gmall_realtime2021_spark.tables import load

    ev = load(spark, sf_dir, "events")
    merged = range_distinct_estimate(daily_user_sketches(ev)).collect()[0].est
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est")
    ).collect()[0].est
    exact = ev.select("user_id").distinct().count()
    assert merged == whole  # merge-of-parts ≡ sketch-of-whole
    assert abs(merged - exact) <= max(2, 0.05 * exact)  # lg_k=12 ⇒ ~1.6% rse


def test_hll_range_query_uses_only_range_sketches(spark, sf_dir):
    """Range queries merge only the sketches inside the range: the
    estimate over a half-open date range matches the exact distinct
    over the same range within the envelope — without touching any
    event row (only the sketch table)."""
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.operators.sketches import (
        daily_user_sketches,
        range_distinct_estimate,
    )
    from gmall_realtime2021_spark.tables import load

    ev = load(spark, sf_dir, "events")
    sketches = daily_user_sketches(ev)
    mid = sketches.agg(F.min("d").alias("m")).collect()[0].m
    est = range_distinct_estimate(sketches.filter(F.col("d") <= F.lit(mid))).collect()[0].est
    exact = (
        ev.filter(F.to_date("ts") <= F.lit(mid)).select("user_id").distinct().count()
    )
    assert abs(est - exact) <= max(2, 0.05 * exact)
