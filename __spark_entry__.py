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
#: Tier 0: plans whose LATEST driver row (CORRECTNESS_r01 ∪ r02, latest
#: wins) was non-green — these carry fresh fixes that need a driver
#: re-check. Tier 1: plans whose implementation changed this round
#: after their last green row (re-verify the change). Everything else
#: follows in registry order; every plan passes the identical local
#: harness in ``tests/test_oracle_parity.py`` regardless of order.
_PRIORITY = (
    # latest row non-green: asof_attribution hash-failed r1 (sentinel
    # fix landed post-sample, never re-checked); keyword_stats_sql
    # errored r2 (ImportError, fixed this round).
    "asof_attribution",
    "keyword_stats_sql",
    # changed-since-last-green this round (plan or shared-fragment edits).
    "corpus_quality_gate",
    "dedup_clusters",
    "keyword_stats",
    "product_stats",
    "product_stats_approx",
    "repetition_stats",
    # new this round — no driver row yet.
    "pq_codes",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank",
    "data_mix_weights",
    "length_histogram",
    "bpe_merge_step",
    "gap_fill_daily",
    "daily_revenue_anomaly",
    "order_event_reconciliation",
    "dedup_containment",
    "cross_split_leakage",
    "leakage_free_split",
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
