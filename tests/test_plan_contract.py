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


def test_bpe_vocab_cap_is_config_driven(spark):
    """r08 (carried r06 note): the BPE training-vocabulary cap is
    sourced from ONE place — session config with BPE_VOCAB_CAP as the
    default — and the plan's single driver-side collect honors it.
    The cap is the plan's driver-memory bound (cap × ~50 B)."""
    from gmall_realtime2021_spark.plans.textops import (
        BPE_VOCAB_CAP,
        BPE_VOCAB_CAP_KEY,
        bpe_vocab_cap,
    )

    assert bpe_vocab_cap(spark) == BPE_VOCAB_CAP  # default = the constant
    try:
        spark.conf.set(BPE_VOCAB_CAP_KEY, "7")
        assert bpe_vocab_cap(spark) == 7
        # the capped collect in the plan body is limit(bpe_vocab_cap):
        # with a 7-word cap the trained merge table can only draw on
        # the 7 most frequent words
        plan = get_plans()["bpe_encode_topk"].build(spark, SF)
        assert plan.columns == ["token", "token_ct"] or "token" in plan.columns
        spark.conf.set(BPE_VOCAB_CAP_KEY, "0")
        with pytest.raises(ValueError):
            bpe_vocab_cap(spark)
    finally:
        spark.conf.unset(BPE_VOCAB_CAP_KEY)
    assert bpe_vocab_cap(spark) == BPE_VOCAB_CAP
