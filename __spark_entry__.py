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
#: Tier 0: plans whose LATEST driver row (CORRECTNESS_r01 ∪ r02 ∪ r03,
#: latest wins) was non-green — these carry fresh fixes that need a
#: driver re-check. Tier 1: brand-new plans with no driver row. Tier 2:
#: plans whose implementation changed this round after their last green
#: row (re-verify the change). Everything else follows in registry
#: order; every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # latest row non-green, fixed this round: asof_attribution (r03
    # hash-red: raw DECIMAL output → now integer cents) and pq_codes
    # (r03 error: array<long> output → now c1..c8 scalars).
    "asof_attribution",
    "pq_codes",
    # new this round — no driver row yet.
    "pii_scan",
    "props_key_stats",
    "duplicate_spans",
    "duplicate_span_topk",
    "semantic_dedup",
    "dedup_survivor_by_quality",
    "dedup_incremental",
    "curation_decisions",
    "span_scrub",
    "disjunctive_revenue",
    "waiting_orders",
    "bilateral_trade",
    "token_cooccurrence_topk",
    "median_order_gap",
    "cumulate_window_stats",
    "grouping_sets_stats",
    "rag_retrieval",
    "ivf_cell_stats",
    "top_parts_per_brand",
    "product_type_profit",
    "priority_line_counts",
    "customer_order_distribution",
    "rfm_segments",
    "abc_classification",
    "event_transitions",
    "first_touch_attribution",
    "dedup_edit_distance",
    "hard_negatives",
    "lsh_quality_audit",
    "key_skew_profile",
    "transition_probs",
    "user_feature_matrix",
    "session_funnel",
    "next_purchase_examples",
    "basket_pairs",
    "dau_wau_stickiness",
    "open_order_backlog",
    "yoy_revenue_growth",
    "pagerank_iteration",
    "discount_elasticity",
    "triangle_count",
    "dynamic_gap_sessions",
    # changed-since-last-green this round (plan or shared-fragment
    # edits — oracle rounding fix, tokenizer swap).
    "cross_split_leakage",
    "keyword_stats",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_canonical",
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
