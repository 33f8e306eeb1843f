"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the noop sink — full plan,
every output column materialized, no disk/collect overhead — after a
small JVM warm-up so the first measurement isn't paying class-loading.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.session import get_spark

#: The bench set: scan-heavy agg, big joins, window functions, text
#: explode, near-dup LSH, ANN — one per workload family.
HEADLINE = [
    "pricing_summary",
    "order_wide",
    "shipping_priority",
    "product_stats",
    "province_stats",
    "top_customers",
    "visitor_stats",
    "unique_visitors",
    "keyword_stats",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "asof_attribution",
    "corpus_quality_gate",
    "market_share",
    "cohort_retention",
    # added r04 — two new workload families (BASELINE.md notes the
    # set change; totals before/after are not comparable):
    "duplicate_spans",   # substring-level dedup (linear span counting)
    "semantic_dedup",    # cluster-then-dedup (applyInPandas per cell)
    # added r05 — the retrieval family (inverted index + rank fusion):
    "rrf_fusion",        # BM25 postings build + dense top-20 + fusion
    # added r10 — the materialized-layout family (BASELINE.md notes
    # the set change; the warm-up pays the one-time materialization,
    # timed runs measure the query against the laid-out storage):
    "bucketed_order_totals",    # bucketed fact⋈fact join, zero exchanges
    "events_daily_partitioned", # date-partition-pruned range scan
    # added r11 — the flagship interval join on the bucketed layout
    # (contrast with order_wide above, which shuffles both fact sides)
    # and the at-rest IVF index (contrast with ann_ivf_topk, which
    # re-assigns the corpus every query):
    "bucketed_order_wide",
    "ann_ivf_partitioned",
    "bucketed_payment_wide",
    # added r12 — the bounded-output serving form of the payment
    # flagship (contrast with bucketed_payment_wide above, whose
    # emit-every-pair contract grows quadratically in per-user event
    # density; this one is a range window over the same layout —
    # zero exchanges, zero sorts, no pair join):
    "bucketed_payment_enrich",
    # added r13 — the DATE-BOUNDED enrich serving form on the composed
    # day-partitioned + user-bucketed layout (contrast with
    # bucketed_payment_enrich above, which scans full history per
    # query: this one partition-prunes to the serving window + one
    # margin day and stays flat as history grows):
    "bucketed_payment_enrich_day",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("gmall-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    # Python-worker warm-up: the Arrow-UDF operators (dedup/ANN)
    # otherwise pay ~2-4 s of executor→Python worker spinup in
    # whichever query happens to run first.
    def _warm(batches):
        yield from batches

    spark.range(10_000).repartition(64).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from gmall_realtime2021_spark.operators.dedup import release_caches

    plans = get_plans()
    timings: dict[str, float] = {}
    build_timings: dict[str, float] = {}
    # Per-query timing protocol (r05, VERDICT r04 item #6): untimed
    # warm-up execution(s) — absorbing first-touch codegen/JIT and
    # Python worker spinup so they can never masquerade as a plan
    # regression — then n timed runs (min reported; min is the least
    # noisy estimator of the plan's cost under a warm JVM).
    #
    # r09 (VERDICT r08 item #5): plans with a Python/Arrow stage
    # (applyInPandas / mapInPandas / ArrowEvalPython) get EXTRA
    # warm-ups — semantic_dedup measured a 6.58 → 1.49 s decay over
    # five back-to-back runs (Python-worker + numpy warm decay), and
    # one warm-up + min-of-2 left ~1.5-2x of that in the committed
    # r08 number, which then read as a +121% regression under host
    # contention. Detected from the executed plan string, not a
    # hand-list, so new Pandas-UDF plans inherit the protocol.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "2")))
    flagship_probe = []  # [first_sec, final_sec] contention stamp
    for name in HEADLINE:
        df = plans[name].build(spark, sf_dir)
        plan_str = df._jdf.queryExecution().executedPlan().toString()
        pythonic = any(
            marker in plan_str
            for marker in ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython", "BatchEvalPython")
        )
        warmups = 3 if pythonic else 1
        for _ in range(warmups):
            plans[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up, untimed
            release_caches()
        best = float("inf")
        best_build = float("inf")
        for _ in range(n_runs):
            tb = time.perf_counter()
            df = plans[name].build(spark, sf_dir)
            best_build = min(best_build, time.perf_counter() - tb)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # free operator-owned caches (LSH signature tables) so later
            # queries aren't benched against a shrunken storage pool
            release_caches()
        timings[name] = round(best, 3)
        # r14 (VERDICT r13 "what's wrong" #3): plan-BUILD time is real
        # driver work a user pays per query (manifest resolution, the
        # semantic_dedup k-sizing count) but sits outside the timed
        # write. Record it alongside so it can never silently absorb
        # cost; the stdout contract line is unchanged — the detail
        # lands in BENCH_GATE.json / stderr.
        build_timings[name] = round(best_build, 3)
        print(f"# {name}: {timings[name]}s{' (pandas-udf, 3 warmups)' if pythonic else ''}", file=sys.stderr)
        if name == HEADLINE[0]:
            flagship_probe.append(timings[name])

    # Host-contention stamp: re-time the flagship query at the END of
    # the run. On an idle host the two readings agree within noise; a
    # large delta means the machine was contended mid-run and the
    # totals should be read accordingly (the r08 artifact regressed
    # +31% with all 20 queries uniformly slower — exactly this
    # signature, invisible without an in-artifact control). The probe
    # uses the SAME min-of-n protocol as the first reading (ADVICE
    # r09: a single final run vs a min-of-n first run biases the
    # ratio above 1.0 even on an idle host).
    best = float("inf")
    for _ in range(n_runs):
        df = plans[HEADLINE[0]].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_caches()
    flagship_probe.append(round(best, 3))
    drift = round(flagship_probe[1] / flagship_probe[0], 3) if flagship_probe[0] else 1.0

    # Floor gate (VERDICT r09 item #5): per-plan regression floors
    # live in tools/bench_floors.json (the r05+ protocol table from
    # BASELINE.md, machine-readable); emit pass/warn per query against
    # 2x floor so a regression is a diff in the artifact, not an
    # essay. Queries without a floor are tagged "new" — their first
    # idle-host reading becomes the floor next round.
    gate: dict[str, object] = {}
    floors_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_floors.json")
    try:
        with open(floors_path) as fh:
            floors = json.load(fh)["floors_sec"]
        results = {}
        for name, sec in timings.items():
            f = floors.get(name)
            if f is None:
                results[name] = {"floor": None, "ratio": None, "status": "new"}
            else:
                ratio = round(sec / f, 2)
                # Two-part threshold (r12): 2x floor AND an absolute
                # +0.15 s guard. For sub-100 ms layout queries the
                # multi-session-min floor sits at the JIT/filesystem
                # noise grain, so a pure ratio gate cries wolf on
                # deltas BASELINE.md itself classifies as noise
                # (<~0.3 s); the absolute guard keeps those quiet
                # while 2x stays the binding constraint for every
                # query slower than 150 ms.
                warn = sec > max(2.0 * f, f + 0.15)
                results[name] = {"floor": f, "ratio": ratio, "status": "warn" if warn else "ok"}
        warns = sorted(n for n, r in results.items() if r["status"] == "warn")
        gate = {"rule": "warn if sec > max(2x floor, floor + 0.15s)", "warn": warns, "results": results}
        for n in warns:
            print(
                f"# FLOOR WARN {n}: {timings[n]}s > max(2x, +0.15s) of {results[n]['floor']}s floor",
                file=sys.stderr,
            )
    except (OSError, KeyError, ValueError) as exc:
        gate = {"error": f"floors unavailable: {exc}"}

    total = round(sum(timings.values()), 3)
    # VERDICT r10 item #1: the r10 artifact broke because the per-plan
    # gate object pushed the single stdout line past the driver's ~2 KB
    # tail buffer ("parsed": null). The full gate detail now goes to
    # stderr AND to BENCH_GATE.json next to this script; the final
    # stdout line carries only the compact headline contract
    # (metric/value/unit/queries/sf/protocol) so the driver can parse it.
    gate_detail = {
        "gate": gate,
        # min build() seconds per query (driver-side plan construction,
        # incl. any layout/manifest ensure work) — reported so costs
        # outside the timed write stay visible (r14)
        "build_sec": build_timings,
        "build_total_sec": round(sum(build_timings.values()), 3),
        "contention_stamp": {
            "query": HEADLINE[0],
            "first_sec": flagship_probe[0],
            "final_sec": flagship_probe[1],
            "final_over_first": drift,
        },
    }
    print("# BENCH_GATE " + json.dumps(gate_detail), file=sys.stderr)
    try:
        gate_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_GATE.json")
        with open(gate_path, "w") as fh:
            json.dump(gate_detail, fh, indent=1)
    except OSError as exc:  # artifact write is best-effort
        print(f"# BENCH_GATE write failed: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "protocol": {
                    "warmup_runs": 1,
                    "pandas_udf_warmup_runs": 3,
                    "timed_runs": n_runs,
                    "stat": "min",
                    "gate_warns": sorted(gate.get("warn", [])) if isinstance(gate.get("warn"), list) else [],
                    "contention_drift": drift,
                },
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
