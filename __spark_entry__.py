"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented plan from SURVEY.md §2 (plus
the M5 training-data operators); ``oracle_sql()`` exposes each plan's
DuckDB twin. Plans live in ``gmall_realtime2021_spark/plans/`` —
this module is a thin adapter over the plan registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.session import apply_engine_config

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "pricing_summary"

#: Catalog priority for a driver that samples a prefix of ``queries()``.
#: r09 ordering rule (VERDICT r08 items 1/2/6): plans whose code
#: changed THIS round first (the simhash default rebase + the
#: partsupp-rebased TPC-H shapes), then the 38 plans whose latest
#: driver row is still r3/r4/r5 — the r08 rotation spent all 50
#: sample slots on tiers 0-2 and never reached them. The changed-plan
#: tier is 10 rows, so the 50-row sample covers all 48 priority
#: entries with room to spare. Everything else follows in registry
#: order; every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # tier 0 — new or changed in r09: the simhash default family moved
    # to 62 bits (and the narrow 32-bit config got explicit names),
    # edit-distance now verifies wide candidates, and the four TPC-H
    # shapes were rebased from the lineitem stand-in onto the derived
    # partsupp relation
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_simhash_narrow",
    "dedup_simhash_narrow_pairs",
    "dedup_edit_distance",
    "partsupp_profile",
    "min_cost_supplier",
    "important_part_values",
    "supplier_part_variety",
    "promotion_part_suppliers",
    "image_phash",  # real-PNG decode path gained the wavefront unfilter
    # tier 1 — latest driver evidence is r3 (1 plan) / r4 (33) / r5 (4)
    "unique_visitors",
    "bilateral_trade",
    "cumulate_window_stats",
    "customer_order_distribution",
    "dedup_incremental",
    "discount_elasticity",
    "disjunctive_revenue",
    "duplicate_span_topk",
    "dynamic_gap_sessions",
    "event_transitions",
    "first_touch_attribution",
    "grouping_sets_stats",
    "hard_negatives",
    "ivf_cell_stats",
    "key_skew_profile",
    "lsh_quality_audit",
    "median_order_gap",
    "next_purchase_examples",
    "open_order_backlog",
    "pagerank_iteration",
    "pii_scan",
    "priority_line_counts",
    "product_type_profit",
    "rag_retrieval",
    "rfm_segments",
    "session_funnel",
    "span_scrub",
    "token_cooccurrence_topk",
    "top_parts_per_brand",
    "transition_probs",
    "triangle_count",
    "user_feature_matrix",
    "waiting_orders",
    "yoy_revenue_growth",
    "config_routing",
    "dedup_exact",
    "session_window_stats",
    "sliding_window_stats",
)


def _catalog_order() -> list[str]:
    names = list(get_plans())
    prio = [n for n in _PRIORITY if n in names]
    return prio + [n for n in names if n not in set(prio)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_config(spark)
    return get_plans()[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(plan) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_config(spark)
            return plan.build(spark, sf_dir)

        run.__name__ = plan.name
        return run

    plans = get_plans()
    return {name: wrap(plans[name]) for name in _catalog_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each oracle-expressible plan."""
    plans = get_plans()
    return {
        name: plans[name].oracle for name in _catalog_order() if plans[name].oracle is not None
    }
