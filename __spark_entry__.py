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

    return {name: wrap(plan) for name, plan in get_plans().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each oracle-expressible plan."""
    return {name: plan.oracle for name, plan in get_plans().items() if plan.oracle is not None}
