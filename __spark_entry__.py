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
#: r08 ordering rule (per the r07 verdict's item 5): plans whose code
#: changed THIS round first, then OLDEST-driver-evidence-first — 64
#: plans' latest driver row dated to r2/r3/r4 while the kernels under
#: them kept moving; this prefix rotates them back through the
#: driver's 50-row sample. Everything else follows in registry order;
#: every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # tier 0 — new or changed in r08: the video near-dup family (new),
    # the BPE plans (batched training + config-driven vocab cap), the
    # simhash/minhash band plans (arg validation moved before persist,
    # stage probes extracted), and the image/audio fingerprint plans
    # (numpy-vectorized decode/hash kernels, pinned bit-identical)
    "video_fingerprint",
    "video_fingerprint_pairs",
    "video_dedup_clusters",
    "video_dedup_incremental",
    "audio_dedup_clusters",
    "audio_dedup_incremental",
    "dedup_simhash_wide",
    "dedup_simhash_wide_pairs",
    "min_cost_supplier",
    "important_part_values",
    "supplier_part_variety",
    "promotion_part_suppliers",
    "bpe_encode_topk",
    "bpe_merge_step",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "image_phash",
    "image_phash_pairs",
    "audio_fingerprint",
    "audio_fingerprint_pairs",
    # tier 1 — latest driver evidence is r2
    "shipping_priority",
    "skewed_user_enrich",
    "small_quantity_revenue",
    "table_profile",
    "top_customers",
    "top_supplier",
    "trailing_revenue",
    "user_correlation",
    # tier 2 — latest driver evidence is r3
    "ann_ivfpq_rerank",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "chunk_packing",
    "daily_revenue_anomaly",
    "data_mix_weights",
    "decontamination",
    "dim_enrich_left",
    "gap_fill_daily",
    "interval_left_join_agg",
    "json_parse_project",
    "keyword_stats_sql",
    "length_histogram",
    "log_split",
    "order_event_reconciliation",
    "order_wide",
    "payment_wide",
    "product_stats",
    "product_stats_approx",
    "temporal_dim_join",
    "training_shuffle",
    "unique_visitors",
    # tier 3 — latest driver evidence is r4
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
