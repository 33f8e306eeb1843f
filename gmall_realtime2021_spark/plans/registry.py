"""Plan registry: name → (Spark builder, DuckDB oracle twin).

Conventions every plan follows (these ARE the correctness contract —
the driver sorts result columns by name and value-hashes rows, so
both sides must agree on names, types and exact values):

- **Money/doubles under aggregation** are cast to ``DECIMAL(18,2)``
  *before* ``sum`` in both engines: decimal addition is exact and
  associative, so Spark's partial-aggregation order can't drift from
  DuckDB's sequential sum (a raw ``sum(double)`` would).
- **Averages** are written as ``round(sum(decimal)/count, N)`` —
  never ``avg`` (Spark's avg(decimal) and DuckDB's avg(anything →
  double) disagree on types).
- **Timestamps in outputs** become formatted strings
  (``date_format`` / ``strftime``), like the reference's ``stt/edt``
  window-bound strings (``ProductStatsApp.java:256-259``).
- **Every computed column is aliased identically** in the Spark plan
  and the oracle SQL.
- **Deterministic output**: any top-k/limit breaks ties on a unique
  key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Plan", "PLANS", "register", "get_plans"]

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Plan:
    name: str
    build: Builder
    #: ANSI SQL DuckDB runs over the same parquet tables; None for
    #: non-SQL-expressible ops (driver then does a rows-only check).
    oracle: str | None
    #: SURVEY.md §2 operator ids this plan covers (e.g. "J1", "A2").
    covers: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


PLANS: dict[str, Plan] = {}


def register(
    name: str,
    oracle: str | None,
    covers: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in PLANS:
            raise ValueError(f"duplicate plan {name!r}")
        PLANS[name] = Plan(name=name, build=fn, oracle=oracle, covers=covers, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def get_plans() -> dict[str, Plan]:
    # Import side effect populates PLANS.
    import gmall_realtime2021_spark.plans  # noqa: F401

    return PLANS
