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
#: r11 ordering rule (VERDICT r10 item #2 — continue the staleness
#: rotation): plans new or behavior-changed THIS round first, then the
#: 41 plans whose latest driver row is still r7 (the oldest remaining
#: tier after r10's rotation refreshed the r6 set). The driver's
#: 50-row sample covers tier 0 + tier 1, leaving nothing older than r8
#: in the merged evidence. Everything else follows in registry order;
#: every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # tier 0 — new or behavior-changed in r11: the bucketed
    # order_wide/payment_wide twins (zero-shuffle flagship joins), the
    # at-rest IVF index plan (dynamic partition pruning), and the
    # partitioned-events rewires of the date-range consumers.
    "bucketed_order_wide",
    "ann_ivf_partitioned",
    "bucketed_payment_wide",
    "train_split_stats",
    "gap_fill_daily",
    "dau_wau_stickiness",
    "cohort_retention",
    "daily_revenue_anomaly",
    # tier 1 — latest driver evidence is r7 (41 plans)
    "active_customers",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "asof_bounded",
    "churned_customers",
    "curation_decisions",
    "daily_event_pivot",
    "dedup_canonical",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_survivor_by_quality",
    "event_value_percentiles",
    "event_value_percentiles_approx",
    "forecast_revenue",
    "grouped_count",
    "keyword_metric_unpivot",
    "kmeans_iteration",
    "large_orders",
    "late_order_priority",
    "leakage_free_split",
    "lm_bigram_score",
    "local_supplier_volume",
    "market_share",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_meta",
    "nation_revenue_share",
    "new_visitor_repair",
    "pricing_summary",
    "promo_revenue",
    "province_stats",
    "region_rollup",
    "returned_items",
    "running_total",
    "sales_cube",
    "sales_opportunity",
    "sum_of_cast",
    "tumble_count_distinct",
    "user_jump_detail",
    "visitor_stats",
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
