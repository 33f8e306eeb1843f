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
#: r10 ordering rule (VERDICT r09 item #4 — finish the staleness
#: rotation): plans new or behavior-changed THIS round first, then the
#: 43 plans whose latest driver row is still r6 (the last stale tier;
#: r9's rotation refreshed everything older). 3 + 43 = 46 priority
#: entries, so the driver's 50-row sample covers them all with room to
#: spare, leaving nothing older than r7 in the merged evidence.
#: Everything else follows in registry order; every plan passes the
#: identical local harness in ``tests/test_oracle_parity.py`` and
#: ``tools/driver_sweep.py`` regardless of order.
_PRIORITY = (
    # tier 0 — new or changed in r10: semantic_dedup's quantizer now
    # scales k with the corpus (data-adaptive oracle CTE), and the two
    # materialized-layout plans are new (bucketed fact join,
    # date-partition-pruned events)
    "semantic_dedup",
    "bucketed_order_totals",
    "bucketed_shipping_priority",
    "events_daily_partitioned",
    # tier 1 — latest driver evidence is r6 (43 plans)
    "abc_classification",
    "ann_clustered_recall",
    "asof_attribution",
    "basket_pairs",
    "bloom_membership",
    "bm25_topk",
    "c4_line_filter",
    "cohort_retention",
    "corpus_quality_gate",
    "corpus_split",
    "countmin_heavyhitters",
    "cross_split_leakage",
    "customer_quartiles",
    "data_mix_temperature",
    "dau_wau_stickiness",
    "decontamination_bloom",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "doc_chunks",
    "doc_fingerprint",
    "duplicate_spans",
    "funnel_conversion",
    "gopher_quality",
    "hybrid_retrieval",
    "keyword_stats",
    "language_id",
    "mmr_rerank",
    "ngram_topk",
    "pii_redact",
    "pq_codes",
    "props_key_stats",
    "quality_deciles",
    "repetition_stats",
    "rrf_fusion",
    "scd2_dim_build",
    "semantic_decontamination",
    "stratified_sample",
    "text_quality",
    "tfidf_topterms",
    "token_count",
    "vocab_coverage",
    "weighted_sample",
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
