"""Plan-output contract: the driver canonicalizes every ``queries()``
result through pandas (``toPandas`` → ``sort_values`` → stringify →
hash), and two dtype families have each burned a round by breaking
that path even when values matched:

- DecimalType outputs → Spark yields ``object(Decimal("3.10"))``,
  DuckDB ``.df()`` yields ``float64 → "3.1"`` — hash mismatch
  (``asof_attribution``, red r01 and r03).
- ArrayType/MapType/StructType outputs → pandas ``sort_values``
  raises ``unhashable type: 'numpy.ndarray'`` (``pq_codes``, red r03).

So: no registered plan may emit a top-level column of any of those
types. Complex types live INSIDE plans and operators (arrays cross
exchanges all over the dedup/ANN code); they just never leave a plan.
Money leaves as DOUBLE, VARCHAR, or integer cents (plans/tpch.py).

Schema-only check — ``build`` declares the plan, nothing executes.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from gmall_realtime2021_spark.plans import get_plans

SF = "/root/testdata/sf0.001"
BANNED = (ArrayType, MapType, StructType, DecimalType)


@pytest.mark.parametrize("name", sorted(get_plans()))
def test_plan_schema_is_driver_canonicalizable(spark, name):
    schema = get_plans()[name].build(spark, SF).schema
    offenders = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, BANNED)
    ]
    assert not offenders, (
        f"{name} emits driver-unhashable top-level column(s) {offenders}; "
        "project to scalars (cents for money, c1..cN or concat_ws for arrays)"
    )
