"""Time EVERY registered plan (noop sink, warm session) — the
per-plan latency complement to bench.py's fixed 19-query headline.

Usage::

    python tools/bench_all.py [sf_dir] [n]    # default sf0.01, n=2

Prints one line per plan (best of n executions) and a total, then a
JSON summary line. The headline bench stays fixed for floor
comparability (BASELINE.md); this sweep exists so a regression in any
NON-headline plan is visible per-round rather than only when it
graduates into the headline. Artifact convention: commit the output
as ``BENCHALL_r{N}.txt``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("bench-all")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(batches):
        yield from batches

    spark.range(10_000).repartition(64).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from gmall_realtime2021_spark.operators.dedup import release_caches

    # Telemetry plans run five whole index pipelines over a FIXED
    # in-plan fixture — their latency measures per-stage scheduling
    # overhead on 480 rows, is invariant to sf_dir, and distorts the
    # data-plan total (r05 verdict #3). Timed and printed, but
    # reported under "telemetry" instead of the comparable total.
    TELEMETRY = {"ann_clustered_recall"}

    plans = get_plans()
    timings: dict[str, float] = {}
    for name in sorted(plans):
        best = float("inf")
        for _ in range(n):
            df = plans[name].build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_caches()
        timings[name] = round(best, 3)
        tag = "  [telemetry, not in total]" if name in TELEMETRY else ""
        print(f"{name:40s} {timings[name]:8.3f}s{tag}")
    data = {k: v for k, v in timings.items() if k not in TELEMETRY}
    tele = {k: v for k, v in timings.items() if k in TELEMETRY}
    total = round(sum(data.values()), 3)
    print(
        f"{'TOTAL':40s} {total:8.3f}s  ({len(data)} data plans, best of {n}; "
        f"+{round(sum(tele.values()), 3)}s telemetry)"
    )
    print(json.dumps({"metric": "bench_all", "value": total, "unit": "sec", "sf_dir": sf_dir, "n": n, "plans": data, "telemetry": tele}))


if __name__ == "__main__":
    main()
