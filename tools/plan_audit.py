"""Full-catalog physical-plan audit: one line per plan with the
scale-relevant plan-shape counters, plus a red-flag summary.

Usage::

    python tools/plan_audit.py [sf_dir]      # default /root/testdata/sf0.001

For every registered plan, builds the DataFrame (no execution) and
counts the physical operators that matter at 100 TB:

- ``exch``   hash-partition exchanges (shuffles)
- ``single`` SinglePartition exchanges (global sorts/windows — only
             acceptable over pre-aggregated, broadcast-sized frames)
- ``bhj``/``smj``/``bnlj``/``cart``  join strategies chosen
- ``scans``  parquet FileScans (re-scan multiplicity)
- ``python`` Python-eval nodes (ArrowEvalPython / BatchEvalPython /
             FlatMapGroupsInPandas / MapInPandas) — the slow path,
             each one deliberate
- ``codegen`` WholeStageCodegen spans (JVM fast path)

Red flags printed at the end: any CartesianProduct outside the
labeled exact-ANN baselines, any BatchEvalPython (row-at-a-time UDF)
outside the SQL-fidelity twin. Duplicate scans show in the ``scans``
column for eyeballing — they are NOT auto-flagged because AQE
exchange reuse (runtime-only) legitimately collapses most of them.

The committed artifact (``PLANAUDIT_r{N}.txt``) is the per-round
evidence that every plan's shape was reviewed, complementing the
targeted pins in ``tests/test_physical_plans.py``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.session import get_spark

#: plans whose cartesian/BNLJ is the documented broadcast-scalar or
#: labeled-baseline shape (see their docstrings).
CARTESIAN_OK = {
    "ann_cosine_topk",
    "hard_negatives",
    "rag_retrieval",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank",
}
#: the one row-at-a-time Python UDF, mandated by the reference's SQL
#: `LATERAL TABLE(udtf)` invocation shape (KeywordUDTF.java).
ROW_UDF_OK = {"keyword_stats_sql", "ik_analyze"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # static audit: AQE off so the pre-execution plan is the full
    # picture (with AQE on, codegen spans and final join choices
    # only exist per-stage at runtime)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    plans = get_plans()
    flags: list[str] = []
    print(f"# plan audit at {sf_dir}: {len(plans)} plans")
    print(
        f"{'plan':36s} {'exch':>4s} {'single':>6s} {'bhj':>3s} {'smj':>3s} "
        f"{'bnlj':>4s} {'cart':>4s} {'scans':>5s} {'python':>6s} {'codegen':>7s}"
    )
    for name in sorted(plans):
        try:
            df = plans[name].build(spark, sf_dir)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            p = qe.explainString(mode)
        except Exception as exc:  # audit must cover every plan or say why
            print(f"{name:36s} BUILD-ERROR {type(exc).__name__}: {exc}")
            flags.append(f"{name}: build error")
            continue
        exch = len(re.findall(r"\bExchange hashpartitioning", p))
        single = len(re.findall(r"Exchange SinglePartition", p))
        bhj = p.count("BroadcastHashJoin")
        smj = p.count("SortMergeJoin")
        bnlj = p.count("BroadcastNestedLoopJoin")
        cart = p.count("CartesianProduct")
        scans = p.count("FileScan parquet")
        py = sum(
            p.count(k)
            for k in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
                "AggregateInPandas",
            )
        )
        codegen = len(set(re.findall(r"\*\((\d+)\)", p)))
        print(
            f"{name:36s} {exch:4d} {single:6d} {bhj:3d} {smj:3d} "
            f"{bnlj:4d} {cart:4d} {scans:5d} {py:6d} {codegen:7d}"
        )
        if cart and name not in CARTESIAN_OK:
            flags.append(f"{name}: CartesianProduct outside the labeled baselines")
        if "BatchEvalPython" in p and name not in ROW_UDF_OK:
            flags.append(f"{name}: row-at-a-time Python UDF in the plan")
        # duplicated-kernel detector (the r06 find): the SAME UDF call
        # (child signature incl. input attr ids) materialized as TWO
        # ArrowEvalPython nodes with distinct output ids means Catalyst
        # cloned the kernel (e.g. a filter pushed below an exchange
        # with its own copy) — every affected doc pays the Python pass
        # twice. Cache-printed duplicates share output ids and don't
        # flag.
        dup: dict[str, set[str]] = {}
        for child, out in re.findall(
            r"ArrowEvalPython \[([^\]]+)\], \[([^\]]+)\]", p
        ):
            dup.setdefault(child, set()).add(out)
        for child, outs in dup.items():
            if len(outs) > 1:
                flags.append(
                    f"{name}: Arrow kernel evaluated {len(outs)}x ({child[:60]})"
                )
    print("=== RED FLAGS:", len(flags))
    for f in flags:
        print("  !", f)


if __name__ == "__main__":
    main()
