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
#: r12 ordering rule (VERDICT r11 item #2 — continue the staleness
#: rotation): plans new or behavior-changed THIS round first, then the
#: 40 plans whose latest driver row is still r8 (the oldest remaining
#: tier after r11's rotation refreshed the r7 set). The driver's
#: 50-row sample covers tier 0 + tier 1, leaving nothing older than r9
#: in the merged evidence. Everything else follows in registry order;
#: every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # tier 0 — new/changed in r14: layout_contract is the
    # driver-verifiable twin of layout_health (VERDICT r13 item #6 —
    # row counts, key checksums, and partition-unit geometry of every
    # at-rest layout family, read through the serving paths, vs the
    # raw tables in DuckDB), plus the plans whose shapes changed in
    # the r14 optimization pass; then the r13 tier-0 set.
    "layout_contract",
    "duplicate_spans",
    "unique_visitors",
    "rrf_fusion",
    "bm25_topk",
    "bucketed_payment_enrich_day",
    "simhash_cluster_summary",
    "layout_health",
    "bucketed_payment_enrich",
    # tier 1 — latest driver evidence is r9 (46 plans; the r12
    # rotation left these as the oldest live tier — after this round
    # the cross-round merge has nothing older than r10).
    "bilateral_trade",
    "config_routing",
    "cumulate_window_stats",
    "customer_order_distribution",
    "dedup_edit_distance",
    "dedup_exact",
    "dedup_incremental",
    "dedup_simhash_narrow",
    "dedup_simhash_narrow_pairs",
    "discount_elasticity",
    "disjunctive_revenue",
    "duplicate_span_topk",
    "dynamic_gap_sessions",
    "event_transitions",
    "first_touch_attribution",
    "grouping_sets_stats",
    "hard_negatives",
    "important_part_values",
    "ivf_cell_stats",
    "key_skew_profile",
    "lsh_quality_audit",
    "median_order_gap",
    "min_cost_supplier",
    "next_purchase_examples",
    "open_order_backlog",
    "pagerank_iteration",
    "partsupp_profile",
    "pii_scan",
    "priority_line_counts",
    "product_type_profit",
    "promotion_part_suppliers",
    "rag_retrieval",
    "rfm_segments",
    "session_funnel",
    "session_window_stats",
    "sliding_window_stats",
    "span_scrub",
    "supplier_part_variety",
    "token_cooccurrence_topk",
    "top_parts_per_brand",
    "transition_probs",
    "triangle_count",
    "user_feature_matrix",
    "waiting_orders",
    "yoy_revenue_growth",
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
