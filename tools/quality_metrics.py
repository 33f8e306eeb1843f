"""Tracked algorithm-quality metrics (recall@k, reconstruction error)
for the approximate operators whose regressions neither the driver's
hash gate nor the latency bench can see.

The pytest pins in tests/test_algo_quality.py assert THRESHOLDS
(recall >= floor); this tool records the NUMBERS per round so drift
inside the passing band is visible, the way BASELINE.md's frozen
floor makes latency drift visible. Run at round end, record in
BASELINE.md §"Quality floor":

    python tools/quality_metrics.py          # one JSON line, sf0.01

Metrics (all sf0.01, deterministic — fixed data, fixed seeds/codebooks):
- lsh_pair_recall      — minhash-LSH near-dup pairs found / exhaustive
                         inverted-index pairs (precision is 1.0 by
                         construction; recall is the banding loss).
- ann_*_recall_at_3    — approximate top-3 overlap with the exact
                         cosine top-3, per ANN variant.
- pq_recon_err_mean    — mean PQ reconstruction error over the corpus
                         with the deterministic codebooks (pure
                         function of codebook geometry; any change
                         means the PQ kernel or codebooks moved).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_QUALITY_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.operators.dedup import release_caches
    from gmall_realtime2021_spark.plans import get_plans
    from gmall_realtime2021_spark.session import get_spark

    spark = get_spark("gmall-quality")
    spark.sparkContext.setLogLevel("ERROR")
    plans = get_plans()
    out: dict[str, float] = {}

    pairs = lambda df: {(r.a, r.b) for r in df.select("a", "b").collect()}  # noqa: E731
    exact = pairs(plans["dedup_ngram_jaccard"].build(spark, SF_DIR))
    lsh = pairs(plans["dedup_minhash_lsh"].build(spark, SF_DIR))
    release_caches()
    out["lsh_pair_recall"] = round(len(lsh & exact) / len(exact), 4) if exact else 1.0

    # r08 addition — SimHash near-dup recall against the same exact
    # jaccard ground truth: hamming<=3 over the 62-bit default vs the
    # narrow 32-bit fixture-compat variant (narrow fingerprints
    # collapse more unrelated docs together — higher recall, far worse
    # precision/candidate cost; the wide row is the production floor).
    # r09 renaming: the default names moved to the wide family, so
    # "simhash_wide" now reads the default plan and "simhash" reads
    # the explicit narrow one — same configs as the r08 table rows.
    for key, plan in (("simhash", "dedup_simhash_narrow_pairs"), ("simhash_wide", "dedup_simhash_pairs")):
        sh = pairs(plans[plan].build(spark, SF_DIR))
        release_caches()
        out[f"{key}_pair_recall"] = round(len(sh & exact) / len(exact), 4) if exact else 1.0
        out[f"{key}_pair_ct"] = float(len(sh))

    brute = plans["ann_cosine_topk"].build(spark, SF_DIR)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute.filter(F.col("rank") <= 3).collect()
    }
    for name in ("ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk", "ann_ivfpq_topk", "ann_ivfpq_rerank"):
        got = {
            (r.query_id, r.neighbor_id)
            for r in plans[name].build(spark, SF_DIR).collect()
        }
        out[f"{name}_recall_at_3"] = round(len(got & truth) / len(truth), 4)

    (err,) = (
        plans["pq_codes"]
        .build(spark, SF_DIR)
        .agg(F.round(F.avg("recon_err"), 6).alias("e"))
        .collect()
    )
    out["pq_recon_err_mean"] = err.e

    # r04 additions — curation-suite selectivity (a silent change in
    # tokenizer/hash/threshold kernels moves these even while every
    # hash gate stays green, because oracle twins move in lockstep):
    sem = plans["semantic_dedup"].build(spark, SF_DIR).collect()
    out["semantic_dedup_drop_ct"] = float(sum(1 for r in sem if r.keep == 0))
    spans = plans["duplicate_spans"].build(spark, SF_DIR).collect()
    release_caches()
    out["span_dup_doc_frac"] = round(
        sum(1 for r in spans if r.dup_spans > 0) / len(spans), 4
    )
    incr = plans["dedup_incremental"].build(spark, SF_DIR).collect()
    release_caches()
    out["incremental_dup_ct"] = float(sum(r.is_dup for r in incr))
    # probe recall vs the corpus-wide LSH pairs that straddle the split
    straddle = {
        (min(a, b), max(a, b))
        for (a, b) in lsh
        if (a % 10 < 8) != (b % 10 < 8)
    }
    flagged = {r.doc_id for r in incr if r.is_dup}
    hit = sum(1 for (a, b) in straddle if (b if b % 10 >= 8 else a) in flagged)
    out["incremental_probe_recall"] = round(hit / len(straddle), 4) if straddle else 1.0

    # r05 addition — conventional-recall telemetry on the CLUSTERED
    # fixture (the near-uniform parquet fixture keeps absolute recalls
    # at 0.08-0.29 where kernel regressions hide inside noise-sized
    # deltas; here lsh/ivf/rerank sit at ~1.0 so any drop is real):
    for r in plans["ann_clustered_recall"].build(spark, SF_DIR).collect():
        out[f"clustered_{r.variant}_recall_at_3"] = r.recall_at_3
        out[f"clustered_{r.variant}_cluster_recall_at_3"] = r.cluster_recall_at_3

    # r07 addition — the RECALL-LATENCY OPERATING CURVE of the
    # two-stage IVF-PQ deployment on the clustered fixture: the
    # (n_probe, candidates) sweep every deployment tunes. Static
    # point-recalls say nothing about tunability; the curve pins that
    # spending more probes/candidates monotonically buys recall (and
    # shows what each point costs in wall time on this fixture).
    curve = ann_operating_curve(spark)
    out["ann_ivfpq_rerank_curve"] = curve  # list of operating points

    print(json.dumps({"metric": "quality", "sf_dir": SF_DIR, "values": out}))


def ann_operating_curve(spark) -> list[dict]:
    """Sweep (n_probe, candidates) for ``ivf_pq_rerank_topk`` on the
    clustered fixture against its exact top-3 baseline; returns one
    dict per operating point: recall@3 and best-of-2 wall seconds.
    Deterministic data/codebooks — only the timing column is
    machine-dependent."""
    import time

    from gmall_realtime2021_spark.operators.similarity import ivf_pq_rerank_topk
    from gmall_realtime2021_spark.plans.similarity import (
        CLUSTER_PER,
        _clustered_artifacts,
    )

    q, c, exact, n_truth, books = _clustered_artifacts(spark)
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    points = [
        (1, max(3, CLUSTER_PER // 4)),
        (2, CLUSTER_PER // 2),
        (2, CLUSTER_PER),
        (4, CLUSTER_PER),
        (4, 2 * CLUSTER_PER),
    ]
    curve = []
    for n_probe, candidates in points:
        df = ivf_pq_rerank_topk(q, c, k=3, candidates=candidates, n_probe=n_probe, books=books)
        rows = df.collect()  # warm-up, untimed
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rows = ivf_pq_rerank_topk(
                q, c, k=3, candidates=candidates, n_probe=n_probe, books=books
            ).collect()
            best = min(best, time.perf_counter() - t0)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        curve.append(
            {
                "n_probe": n_probe,
                "candidates": candidates,
                "recall_at_3": round(len(got & truth) / n_truth, 4),
                "sec": round(best, 3),
            }
        )
    return curve


if __name__ == "__main__":
    main()
