"""The query catalog: every SURVEY.md §2 operator re-expressed on the
test star schema, each with a DuckDB oracle twin where SQL can express
the semantics.

Importing this package populates :data:`registry.PLANS`; the modules
are organized by warehouse layer like the reference
(``app/dwd|dwm|dws`` in the reference tree), plus the training-data
extension operators (SURVEY.md §7 M5).
"""

from gmall_realtime2021_spark.plans import (  # noqa: F401
    audio,
    behavior,
    corpus,
    dedup,
    diagnostics,
    dwd,
    graph,
    dwm,
    dws,
    filtering,
    images,
    mlprep,
    multimodal,
    olap,
    segments,
    similarity,
    sketches,
    textops,
    tpch,
    tpch2,
    tpch3,
    tpch4,
    video,
    warehouse,
    windows,
)
from gmall_realtime2021_spark.plans.registry import PLANS, Plan, get_plans

__all__ = ["PLANS", "Plan", "get_plans"]
