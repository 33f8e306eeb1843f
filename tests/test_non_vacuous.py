"""Every registered plan must produce rows on the smoke fixture —
an oracle hash-match on an empty result proves nothing (this guard
exists because payment_wide once joined disjoint date ranges and
passed its checks vacuously for a whole round).
"""

from __future__ import annotations

import pytest

from gmall_realtime2021_spark.plans import get_plans

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(get_plans()))
def test_plan_not_vacuous(spark, name):
    assert get_plans()[name].build(spark, SF).count() > 0, f"{name} returns 0 rows at sf0.001"
