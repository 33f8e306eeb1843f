"""The local correctness gate: every registered plan must match its
DuckDB oracle twin exactly at sf0.001 (the driver does the same at
sf0.01)."""

from __future__ import annotations

import pytest

from gmall_realtime2021_spark.plans import get_plans
from tests.oracle_compare import compare

PLANS = get_plans()


@pytest.mark.parametrize("name", sorted(PLANS))
def test_plan_matches_oracle(spark, sf_dir, name):
    plan = PLANS[name]
    df = plan.build(spark, sf_dir)
    if plan.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        compare(df, plan.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
