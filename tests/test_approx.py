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
