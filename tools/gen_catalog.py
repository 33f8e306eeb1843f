"""Generate CATALOG.md: the machine-built index of every registered
plan — name, defining module, SURVEY §2 ids covered, oracle status,
and one-line description. Run after adding plans::

    python tools/gen_catalog.py > CATALOG.md

The table is generated from the live registry, so it cannot drift
from the code the way a hand-maintained list can; COVERAGE.md stays
the narrative mapping, this is the exhaustive inventory.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime2021_spark.plans import get_plans


def main() -> None:
    plans = get_plans()
    by_module: dict[str, list[str]] = defaultdict(list)
    for name, plan in plans.items():
        by_module[plan.build.__module__.rsplit(".", 1)[-1]].append(name)
    n_oracle = sum(1 for p in plans.values() if p.oracle is not None)
    print("# CATALOG — generated plan inventory (do not edit; `python tools/gen_catalog.py`)")
    print()
    print(
        f"{len(plans)} plans; {n_oracle} with DuckDB oracle twins "
        f"(hash-compared by the driver at sf0.01 and by "
        f"tests/test_oracle_parity.py at sf0.001), "
        f"{len(plans) - n_oracle} rows-only by design (approx sketches, "
        f"recall telemetry, filesystem-metadata observability)."
    )
    print()
    print("| plan | module | covers | oracle | description |")
    print("|---|---|---|---|---|")
    for module in sorted(by_module):
        for name in sorted(by_module[module]):
            p = plans[name]
            covers = " ".join(p.covers) if p.covers else "—"
            oracle = "yes" if p.oracle is not None else "rows-only"
            print(f"| `{name}` | {module} | {covers} | {oracle} | {p.doc} |")


if __name__ == "__main__":
    main()
