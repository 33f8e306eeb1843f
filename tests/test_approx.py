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
