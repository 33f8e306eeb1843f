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
#: r07 ordering rule (per the r06 verdict's item 4): plans whose code
#: changed THIS round first, then OLDEST-driver-evidence-first — 43
#: plans' latest driver row dated to r1/r2 while the kernels under
#: them kept moving; this prefix rotates them back through the
#: driver's 50-row sample. Everything else follows in registry order;
#: every plan passes the identical local harness in
#: ``tests/test_oracle_parity.py`` and ``tools/driver_sweep.py``
#: regardless of order.
_PRIORITY = (
    # tier 0 — new or changed in r07: the image dHash family (new),
    # bpe_encode_topk (gained a full DuckDB oracle), lm_bigram_score
    # (refactored onto operators/lm.py for the incremental twin),
    # the dedup_clusters consumers (star-contraction rewrite), and
    # the simhash-band consumers (hamming_band_pairs extraction)
    "image_phash",
    "image_phash_pairs",
    "audio_fingerprint",
    "audio_fingerprint_pairs",
    "image_dedup_clusters",
    "image_dedup_incremental",
    "bpe_encode_topk",
    "lm_bigram_score",
    "dedup_clusters",
    "dedup_canonical",
    "dedup_survivor_by_quality",
    "curation_decisions",
    "leakage_free_split",
    "dedup_simhash_pairs",
    "dedup_edit_distance",
    # tier 1 — latest driver evidence is r1
    "grouped_count",
    "keyword_metric_unpivot",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_meta",
    "new_visitor_repair",
    "province_stats",
    "region_rollup",
    "running_total",
    "sum_of_cast",
    "tumble_count_distinct",
    "user_jump_detail",
    "visitor_stats",
    # tier 2 — latest driver evidence is r2
    "active_customers",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "asof_bounded",
    "churned_customers",
    "daily_event_pivot",
    "dedup_embedding_cosine",
    "event_value_percentiles",
    "event_value_percentiles_approx",
    "forecast_revenue",
    "kmeans_iteration",
    "large_orders",
    "late_order_priority",
    "local_supplier_volume",
    "market_share",
    "nation_revenue_share",
    "pricing_summary",
    "promo_revenue",
    "returned_items",
    "sales_cube",
    "sales_opportunity",
    "shipping_priority",
    "skewed_user_enrich",
    "small_quantity_revenue",
    "table_profile",
    "top_customers",
    "top_supplier",
    "trailing_revenue",
    "user_correlation",
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
