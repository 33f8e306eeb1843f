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
    # tier 0 — new in r12: the bounded-output serving forms for the
    # two emit-all-pairs contracts (VERDICT items #1/#7) and the
    # layout-health observability plan (item #4).
    "bucketed_payment_enrich",
    "dedup_cluster_summary",
    "layout_health",
    # tier 1 — latest driver evidence is r8 (40 plans)
    "ann_ivfpq_rerank",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "audio_dedup_clusters",
    "audio_dedup_incremental",
    "audio_fingerprint",
    "audio_fingerprint_pairs",
    "bpe_encode_topk",
    "bpe_merge_step",
    "chunk_packing",
    "data_mix_weights",
    "decontamination",
    "dedup_minhash_lsh",
    # the r8 driver rows were recorded under the pre-r9 names
    # dedup_simhash_wide(_pairs); the plans live on as the defaults:
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dim_enrich_left",
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
    "shipping_priority",
    "skewed_user_enrich",
    "small_quantity_revenue",
    "table_profile",
    "temporal_dim_join",
    "top_customers",
    "top_supplier",
    "trailing_revenue",
    "training_shuffle",
    "user_correlation",
    "video_dedup_clusters",
    "video_dedup_incremental",
    "video_fingerprint",
    "video_fingerprint_pairs",
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
