"""Empirical scale-up probe: do the plan shapes actually hold as the
data grows?

SCALE.md argues each operator family's 100 TB behavior from its plan
shape; this tool adds the measurement. It materializes scaled copies
of the sf0.1 fixture — FACT tables (orders, lineitem, events,
documents, embeddings) replicated K× with shifted primary keys, DIM
tables (region, nation, customer, supplier, part) kept as-is, which is
how real warehouses grow — then times a representative plan subset at
each multiplier and reports the per-plan growth exponent
alpha = log(t_k / t_1) / log(k). A shuffle-clean scan/agg/broadcast
plan should sit near alpha ≈ 1 (linear) once per-job overhead is
amortized; alpha >> 1 is the scale-killer signal the plan audit can't
see statically.

Replication details (all deterministic):
- orders.o_orderkey / lineitem.l_orderkey shift by k·(max_orderkey+1)
  per replica, so the order⋈lineitem join key stays unique and every
  fact join remains valid against the unscaled dims.
- events.event_id shifts; user_id is kept, so per-user event density
  grows with K (more history per key — the realistic direction for
  keyed windows/state).
- documents.doc_id shifts and each replica's text gets three
  replica-specific salt tokens appended, so intra-replica dedup
  structure is preserved while cross-replica rows stop being exact
  duplicates. Near-dup pair plans may still find cross-replica pairs
  on heavily templated docs — pair OUTPUT is allowed to grow
  superlinearly there; the probe reports it rather than hiding it.
- embeddings.vec_id shifts; vectors are left identical (throughput
  probe, not a quality probe — ANN quality has its own telemetry).

CONTENT-GROWTH mode (``--dedup``, r07): the copy-replication fixture
above is the wrong instrument for the inverted-index dedup pair
plans — replicating documents K× replicates their DUPLICATE
STRUCTURE, so the qualifying-pair OUTPUT contract grows ~K² and the
measured alpha conflates candidate-generation cost (the thing that
must stay linear at 100 TB) with output size (which real corpora
don't inflate: they add content, not copies). ``--dedup`` builds a
fixture that grows by NEW content instead: replica j > 0 remaps every
latin/digit token by a fixed per-replica suffix (a bijection on the
token universe), so each replica keeps the base corpus's
intra-replica near-dup structure EXACTLY while sharing no latin
shingles across replicas — held dup-rate, fresh shingle universes.
It then times the pair pipeline in stages (hash / candidate-pairs /
full plan) and reports pair counts, separating candidate-stage
growth from output growth on BOTH fixtures. (CJK tokens, if any,
are not remapped — any cross-replica CJK shingles just ride the
ordinary stop-shingle DF cap.)

Usage:
    python tools/scale_probe.py                # multipliers 1 2 4, default plans
    python tools/scale_probe.py 1 2 4 8        # custom multipliers
    python tools/scale_probe.py 1 4 -- q1 q2   # custom plan list after --
    python tools/scale_probe.py --dedup 1 2 4 8  # content-growth dedup stage probe
    python tools/scale_probe.py --isolated 1 16 -- q1 q2  # fresh JVM per (plan, mult)
    python tools/scale_probe.py --history 1 2 4 8  # history-growth serving probe

Env: SPARK_GRAFT_SCALE_DIR (scratch root, default /tmp/spark_graft_scale),
     SPARK_GRAFT_SF_DIR (base fixture, default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT_KEYS = {
    # table -> columns that must stay unique across replicas (shifted
    # by replica * (max+1)); every other column is copied verbatim
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("region", "nation", "customer", "supplier", "part")

DEFAULT_PLANS = (
    "pricing_summary",      # scan + 6-group hash agg
    "shipping_priority",    # fact⋈fact⋈dim, top-N
    "product_stats",        # multi-distinct windowed agg, broadcast dims
    "order_wide",           # interval join
    "top_customers",        # join + agg + rank
    "keyword_stats",        # Arrow tokenizer + explode + agg
    "corpus_quality_gate",  # one-pass Arrow gate
    "token_count",          # pure map
    "dedup_exact",          # fingerprint hash-agg
    "dedup_minhash_lsh",    # banded LSH group stats
    "semantic_dedup",       # IVF-cell cosine
    "unique_visitors",      # dedup + windowed count
    # r07 multimodal fingerprint families (Arrow hash + fp-grain band join)
    "image_phash_pairs",
    "audio_fingerprint_pairs",
    "image_dedup_incremental",
    # r08 video family (frame-envelope hashes + majority fold + band join)
    "video_fingerprint_pairs",
    # r11 materialized-layout twins: the layout cost is paid in the
    # warm-up (ensure_* materialization of the scaled fixture); the
    # timed runs measure the query against the laid-out storage, so
    # their alpha is the SERVING growth — compare with order_wide
    # (shuffling twin) above
    "bucketed_order_wide",
    "bucketed_payment_wide",
    "ann_ivf_partitioned",
    # r12 bounded-output serving forms: the payment flagship as a
    # range window on the same layout (compare bucketed_payment_wide
    # above — identical storage, pair-free plan) and the star-edge
    # dedup summary (compare dedup_minhash_lsh — same buckets, K−1
    # edges per bucket instead of K² pairs)
    "bucketed_payment_enrich",
    "dedup_cluster_summary",
)


def _complete(dst: str) -> bool:
    """A prior write counts only if Spark committed it (_SUCCESS) —
    a partial fixture from an interrupted run must be rebuilt, never
    silently timed against."""
    return os.path.exists(os.path.join(dst, "_SUCCESS"))


def build_scaled(spark, base: str, out: str, mult: int) -> None:
    """Write the K×-scaled fixture (facts replicated, dims copied)."""
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        src, dst = f"{base}/{t}.parquet", f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst + ".tmp")
            else:
                shutil.copy(src, dst + ".tmp")
            os.replace(dst + ".tmp", dst)  # never leave a half-copied dim
    # ONE shared shift base for the order⋈lineitem key: independent
    # per-table maxima would desynchronize cross-replica join keys on
    # any fixture where the max-key order has no lineitems
    ok_base = (
        max(
            spark.read.parquet(f"{base}/orders.parquet").agg(F.max("o_orderkey")).collect()[0][0],
            spark.read.parquet(f"{base}/lineitem.parquet").agg(F.max("l_orderkey")).collect()[0][0],
        )
        + 1
    )
    shared_base = {"o_orderkey": ok_base, "l_orderkey": ok_base}
    for t, keys in FACT_KEYS.items():
        dst = f"{out}/{t}.parquet"
        if _complete(dst):
            continue
        df = spark.read.parquet(f"{base}/{t}.parquet")
        if mult == 1:
            # same layout policy as the scaled copies (constant rows
            # per file), else x1 keeps the fixture's single row-group
            # and its scan-parallelism handicap poisons the alphas
            df.repartition(8).write.mode("overwrite").parquet(dst)
            continue
        bases = {
            k: shared_base.get(k) or df.agg(F.max(k)).collect()[0][0] + 1 for k in keys
        }
        rep = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep")
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__rep") * F.lit(bases[k]))
        if t == "documents":
            # salt each replica's text so cross-replica rows aren't
            # byte-identical (keeps exact-dedup counts K×, not K²-ish)
            salt = F.concat_ws(
                " ",
                F.col("text"),
                *[F.concat(F.lit(f"zqsalt{j}x"), F.col("__rep")) for j in range(3)],
            )
            rep = rep.withColumn(
                "text", F.when(F.col("__rep") > 0, salt).otherwise(F.col("text"))
            )
        rep.drop("__rep").repartition(max(8, 4 * mult)).write.mode(
            "overwrite"
        ).parquet(dst)


def build_content_grown(spark, base: str, out: str, mult: int) -> None:
    """Write a documents-only fixture that grows by NEW content:
    replica j > 0 suffixes every latin/digit token with a fixed
    per-replica tag (``<tok>q{j:03d}z``) — a bijection on the token
    universe, so every replica reproduces the base corpus's internal
    near-dup structure exactly (held dup-rate) while replicas share
    no latin shingles (fresh universes). Replica 0 is the base text
    verbatim. doc_id shifts like the copy fixture; n_chars is
    recomputed from the new text."""
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    dst = f"{out}/documents.parquet"
    if _complete(dst):
        return
    df = spark.read.parquet(f"{base}/documents.parquet")
    if mult == 1:
        df.repartition(8).write.mode("overwrite").parquet(dst)
        return
    id_base = df.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep")
    ).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(id_base))
    tag = F.concat(F.lit("$1q"), F.lpad(F.col("__rep").cast("string"), 3, "0"), F.lit("z"))
    remapped = F.regexp_replace(F.col("text"), F.lit("([a-zA-Z0-9]+)"), tag)
    rep = rep.withColumn(
        "text", F.when(F.col("__rep") > 0, remapped).otherwise(F.col("text"))
    )
    if "n_chars" in df.columns:
        rep = rep.withColumn("n_chars", F.coalesce(F.length("text"), F.lit(0)).cast("long"))
    rep.drop("__rep").repartition(max(8, 4 * mult)).write.mode("overwrite").parquet(dst)


def dedup_stage_probe(spark, base: str, root: str, mults: list[int]) -> None:
    """Content-growth vs copy-replication stage decomposition for the
    inverted-index dedup pair plans (the r06 verdict's top item).

    Per fixture kind and multiplier, times three nested stages:
    - ``hash``  — the Arrow shingle-hashing pass alone
      (:func:`operators.dedup._shingle_hash_sets`): the linear floor.
    - ``pairs`` — the full candidate pipeline
      (:func:`operators.dedup._shingle_pair_counts`): stop-shingle
      census + inverted-index self-join + pair-grain aggregate. Its
      ROW COUNT is the candidate-pair population; its time minus the
      hash stage is the candidate-generation cost the 100 TB claim
      rests on.
    - ``jaccard`` / ``containment`` — the registered plans (adds only
      the metric projection + threshold filter on top of ``pairs``).

    On the copy fixture the qualifying-pair OUTPUT grows ~K² by
    construction; on the content fixture it grows ~K. A
    candidate-stage alpha near 1 on CONTENT growth with the same
    plan that shows a superlinear tail on COPY growth localizes the
    tail to the output contract, not the index join."""
    import pyspark.sql.functions as F

    from gmall_realtime2021_spark.operators.dedup import (
        _shingle_hash_sets,
        _shingle_pair_counts,
        _signature_table,
        hamming_band_candidates,
        minhash_band_candidates,
        minhash_star_edges,
        release_caches,
        simhash_fingerprints,
    )
    from gmall_realtime2021_spark.plans import get_plans

    plans = get_plans()
    stages: dict[str, object] = {
        # shingle inverted-index family (r06/r07 coverage)
        "hash": lambda docs, sf: _shingle_hash_sets(docs, "doc_id", "text", 3),
        "pairs": lambda docs, sf: _shingle_pair_counts(docs, "doc_id", "text", 3),
        "jaccard": lambda docs, sf: plans["dedup_ngram_jaccard"].build(spark, sf),
        "containment": lambda docs, sf: plans["dedup_containment"].build(spark, sf),
        # minhash-LSH family (r08): signature floor → band-bucket
        # candidates → verified pairs plan
        "mh_sig": lambda docs, sf: _signature_table(docs, "doc_id", "text", 3),
        "mh_cand": lambda docs, sf: minhash_band_candidates(
            _signature_table(docs, "doc_id", "text", 3)
        ),
        "mh_lsh": lambda docs, sf: plans["dedup_minhash_lsh"].build(spark, sf),
        # star-edge family (r12, VERDICT r11 item #7): the
        # bounded-output audit form for copy-heavy corpora — each LSH
        # bucket emits (min-id rep → member) edges, K−1 per K-doc
        # bucket, so neither the edge set nor the final per-cluster
        # summary inherits the pair plans' K² copy-growth contract
        "star_edges": lambda docs, sf: minhash_star_edges(docs),
        "star_summary": lambda docs, sf: plans["dedup_cluster_summary"].build(spark, sf),
        # NARROW (32-bit) simhash band-join family (r08; r09: the
        # default plan names moved to 62 bits, this probe keeps
        # measuring the saturating narrow config under its new
        # explicit name): fingerprint floor → distinct-fp band
        # candidates → verified pairs plan
        "sh_fp": lambda docs, sf: simhash_fingerprints(docs, bits=32),
        "sh_cand": lambda docs, sf: hamming_band_candidates(
            simhash_fingerprints(docs, bits=32), bits=32, max_hamming=3
        ),
        "sh_pairs": lambda docs, sf: plans["dedup_simhash_narrow_pairs"].build(spark, sf),
        # wide (62-bit) simhash family (r08; DEFAULT since r09): the
        # content-scale configuration — candidate stage must stay
        # output-sized where the 31-bit family's ~13-bit composite
        # keys go quadratic
        "sh62_cand": lambda docs, sf: hamming_band_candidates(
            simhash_fingerprints(docs, bits=62), fp_col="simhash", bits=62, max_hamming=3
        ),
        "sh62_pairs": lambda docs, sf: plans["dedup_simhash_pairs"].build(spark, sf),
        # fp-grain bounded accounting (r13, VERDICT r12 item #5): the
        # simhash analog of star_summary — components over DISTINCT
        # fingerprints, one linear doc-grain rollup. On the copy
        # fixture K replicas share one fingerprint, so this stage must
        # stay FLAT while sh62_pairs' output rides its K² contract.
        "sh62_summary": lambda docs, sf: plans["simhash_cluster_summary"].build(spark, sf),
    }
    COUNTED = (
        "pairs", "jaccard", "containment", "mh_cand", "mh_lsh",
        "star_edges", "star_summary",
        "sh_cand", "sh_pairs", "sh62_cand", "sh62_pairs", "sh62_summary",
    )
    results: dict[str, dict[str, dict[int, float]]] = {}
    counts: dict[str, dict[str, dict[int, int]]] = {}
    for kind in ("copy", "content"):
        results[kind] = {s: {} for s in stages}
        counts[kind] = {s: {} for s in COUNTED}
        for mult in sorted(mults):
            out = f"{root}/{kind}_x{mult}"
            t0 = time.perf_counter()
            if kind == "copy":
                os.makedirs(out, exist_ok=True)
                dst = f"{out}/documents.parquet"
                if not _complete(dst):
                    df = spark.read.parquet(f"{base}/documents.parquet")
                    if mult == 1:
                        df.repartition(8).write.mode("overwrite").parquet(dst)
                    else:
                        id_base = df.agg(F.max("doc_id")).collect()[0][0] + 1
                        rep = df.select(
                            "*",
                            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep"),
                        ).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(id_base))
                        salt = F.concat_ws(
                            " ",
                            F.col("text"),
                            *[F.concat(F.lit(f"zqsalt{j}x"), F.col("__rep")) for j in range(3)],
                        )
                        rep = rep.withColumn(
                            "text", F.when(F.col("__rep") > 0, salt).otherwise(F.col("text"))
                        )
                        rep.drop("__rep").repartition(max(8, 4 * mult)).write.mode(
                            "overwrite"
                        ).parquet(dst)
            else:
                build_content_grown(spark, base, out, mult)
            print(f"== {kind} x{mult} fixture ready ({time.perf_counter() - t0:.1f}s)", flush=True)
            for sname, builder in stages.items():
                docs = spark.read.parquet(f"{out}/documents.parquet")
                builder(docs, out).write.format("noop").mode("overwrite").save()  # warm-up
                release_caches()
                best = float("inf")
                for _ in range(2):
                    docs = spark.read.parquet(f"{out}/documents.parquet")
                    df = builder(docs, out)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                    release_caches()
                results[kind][sname][mult] = best
                if sname in counts[kind]:
                    docs = spark.read.parquet(f"{out}/documents.parquet")
                    counts[kind][sname][mult] = builder(docs, out).count()
                    release_caches()
                print(
                    f"  {kind}/{sname:<14}{best:>8.3f}s"
                    + (
                        f"  rows={counts[kind][sname][mult]}"
                        if sname in counts[kind]
                        else ""
                    ),
                    flush=True,
                )
    lo, hi = min(mults), max(mults)

    def alpha(ts: dict[int, float]):
        if hi > lo and ts.get(lo, 0) > 0:
            return round(math.log(ts[hi] / ts[lo]) / math.log(hi / lo), 2)
        return None

    print(f"\n{'fixture/stage':<22}" + "".join(f"{f'x{m}':>9}" for m in sorted(mults)) + f"{'alpha':>8}")
    alphas: dict[str, dict[str, float | None]] = {}
    count_alphas: dict[str, dict[str, float | None]] = {}
    for kind in results:
        alphas[kind] = {}
        count_alphas[kind] = {}
        for sname in stages:
            ts = results[kind][sname]
            a = alpha(ts)
            alphas[kind][sname] = a
            print(
                f"{kind}/{sname:<16}"
                + "".join(f"{ts[m]:>9.3f}" for m in sorted(mults))
                + (f"{a:>8.2f}" if a is not None else f"{'-':>8}")
            )
        for sname, cs in counts[kind].items():
            ca = (
                round(math.log(cs[hi] / cs[lo]) / math.log(hi / lo), 2)
                if hi > lo and cs.get(lo, 0) > 0 and cs.get(hi, 0) > 0
                else None
            )
            count_alphas[kind][sname] = ca
    print(
        json.dumps(
            {
                "metric": "scale_probe_dedup",
                "base": base,
                "mults": sorted(mults),
                "sec": {
                    k: {s: {str(m): round(t, 3) for m, t in ts.items()} for s, ts in sv.items()}
                    for k, sv in results.items()
                },
                "rows": {
                    k: {s: {str(m): c for m, c in cs.items()} for s, cs in cv.items()}
                    for k, cv in counts.items()
                },
                "alpha": alphas,
                "rows_alpha": count_alphas,
            }
        )
    )


def build_history_grown(spark, base: str, out: str, mult: int) -> None:
    """Write an events fixture that grows along the HISTORY axis:
    replica j > 0 shifts every timestamp by j*366 days (and event_id
    by j*(max+1)), so the day count grows ~K x while per-day,
    per-user density stays EXACTLY the base corpus's. This is the
    axis the copy fixture (build_scaled) cannot probe: it replicates
    rows at the same timestamps, growing density inside a fixed day
    span. A date-bounded serving plan should be FLAT here (the
    partition prune reads the same window regardless of history),
    while its unbounded twin scans everything — the contract VERDICT
    r12 item #4 asks to measure. Non-event tables ride along
    unscaled so the registry plans stay buildable."""
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in list(DIMS) + [k for k in FACT_KEYS if k != "events"]:
        src, dst = f"{base}/{t}.parquet", f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst + ".tmp")
            else:
                shutil.copy(src, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
    dst = f"{out}/events.parquet"
    if _complete(dst):
        return
    ev = spark.read.parquet(f"{base}/events.parquet")
    if mult == 1:
        ev.repartition(8).write.mode("overwrite").parquet(dst)
        return
    id_base = ev.agg(F.max("event_id")).collect()[0][0] + 1
    rep = ev.select("*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep"))
    rep = (
        rep.withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(id_base))
        .withColumn("ts", F.expr("ts + make_interval(0, 0, 0, __rep * 366, 0, 0, 0)"))
        .drop("__rep")
    )
    rep.repartition(max(8, 4 * mult)).write.mode("overwrite").parquet(dst)


#: The history-growth probe's plan pair: the date-bounded serving form
#: vs its unbounded twin (same window arithmetic, no day prune).
HISTORY_PLANS = ["bucketed_payment_enrich_day", "bucketed_payment_enrich"]


def history_probe(mults: list[int], base: str, root: str) -> None:
    """``--history``: time the date-bounded enrich form against its
    unbounded twin as EVENT HISTORY grows with the query window
    fixed. Layout materialization (the ensure pass) happens in the
    warmup build — ingest cost is paid once at write time on a real
    deployment and is not the serving claim under test."""
    spark = _probe_session("scale_probe_history")
    from gmall_realtime2021_spark.plans import get_plans

    plans = get_plans()
    results: dict[str, dict[int, float]] = {n: {} for n in HISTORY_PLANS}
    rows: dict[str, dict[int, int]] = {n: {} for n in HISTORY_PLANS}
    for mult in sorted(mults):
        out = f"{root}/hist_x{mult}"
        t0 = time.perf_counter()
        build_history_grown(spark, base, out, mult)
        print(f"== hist_x{mult} fixture ready ({time.perf_counter() - t0:.1f}s)", flush=True)
        for name in HISTORY_PLANS:
            plan = plans[name]
            plan.build(spark, out).write.format("noop").mode("overwrite").save()  # warm + ensure
            best = float("inf")
            for _ in range(2):
                df = plan.build(spark, out)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][mult] = best
            rows[name][mult] = plan.build(spark, out).count()
            print(f"  {name:<30}x{mult:<4}{best:>8.3f}s  rows={rows[name][mult]}", flush=True)
    lo, hi = min(mults), max(mults)
    alphas = {}
    print(f"\n{'plan':<30}" + "".join(f"{f'x{m}':>9}" for m in sorted(mults)) + f"{'alpha':>8}")
    for name in HISTORY_PLANS:
        ts = results[name]
        alpha = math.log(ts[hi] / ts[lo]) / math.log(hi / lo) if hi > lo and ts[lo] > 0 else None
        alphas[name] = round(alpha, 2) if alpha is not None else None
        print(
            f"{name:<30}"
            + "".join(f"{ts[m]:>9.3f}" for m in sorted(mults))
            + (f"{alpha:>8.2f}" if alpha is not None else f"{'-':>8}")
        )
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "mode": "history",
                "base": base,
                "mults": sorted(mults),
                "sec": {n: {str(m): round(t, 3) for m, t in ts.items()} for n, ts in results.items()},
                "rows": {n: {str(m): c for m, c in cs.items()} for n, cs in rows.items()},
                "alpha": alphas,
            }
        )
    )
    spark.stop()


def _probe_session(app: str):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .appName(app)
        .getOrCreate()
    )
    from gmall_realtime2021_spark.session import apply_engine_config

    apply_engine_config(spark)
    return spark


def run_one(plan_name: str, mult: int) -> None:
    """Internal single-measurement mode (``--one plan mult``): a FRESH
    JVM + Python-worker pool times one plan at one multiplier against
    a pre-built fixture. This is the isolated twin of the grouped loop
    — VERDICT r09 item #6: grouped ×16 readings inherit worker-pool
    churn from heavy predecessor plans (order_wide read α 1.04 grouped
    vs 0.55 isolated), so flagged plans need a per-plan process to
    attribute grouped-run noise vs real growth."""
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
    out = f"{root}/x{mult}"
    for t in FACT_KEYS:
        if not _complete(f"{out}/{t}.parquet"):
            raise SystemExit(f"fixture {out}/{t}.parquet not built; run the grouped probe first")
    spark = _probe_session(f"scale_probe_one_{plan_name}_x{mult}")
    from gmall_realtime2021_spark.operators.dedup import release_caches
    from gmall_realtime2021_spark.plans import get_plans

    plan = get_plans()[plan_name]
    plan.build(spark, out).write.format("noop").mode("overwrite").save()  # warm-up
    release_caches()
    best = float("inf")
    for _ in range(2):
        df = plan.build(spark, out)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_caches()
    print(json.dumps({"plan": plan_name, "mult": mult, "sec": round(best, 3)}))
    spark.stop()


def isolated_probe(mults: list[int], plan_names: list[str], base: str, root: str) -> None:
    """``--isolated``: every (plan, mult) measurement runs in its own
    subprocess (fresh JVM, fresh Python workers) after the fixtures
    are built once. Eliminates cross-plan session state (worker-pool
    churn, JIT residue, storage-pool pressure) from the readings."""
    import subprocess

    spark = _probe_session("scale_probe_fixture_builder")
    for mult in sorted(mults):
        t0 = time.perf_counter()
        build_scaled(spark, base, f"{root}/x{mult}", mult)
        print(f"== x{mult} fixture ready ({time.perf_counter() - t0:.1f}s)", flush=True)
    spark.stop()

    results: dict[str, dict[int, float]] = {n: {} for n in plan_names}
    for mult in sorted(mults):
        for name in plan_names:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name, str(mult)],
                capture_output=True,
                text=True,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not line:
                raise SystemExit(f"--one {name} x{mult} failed:\n{proc.stderr[-2000:]}")
            results[name][mult] = json.loads(line[-1])["sec"]
            print(f"  {name:<28}x{mult:<4}{results[name][mult]:>8.3f}s  (isolated)", flush=True)

    lo, hi = min(mults), max(mults)
    alphas = {}
    print(f"\n{'plan':<28}" + "".join(f"{f'x{m}':>9}" for m in sorted(mults)) + f"{'alpha':>8}")
    for name in plan_names:
        ts = results[name]
        alpha = math.log(ts[hi] / ts[lo]) / math.log(hi / lo) if hi > lo and ts[lo] > 0 else None
        alphas[name] = round(alpha, 2) if alpha is not None else None
        print(
            f"{name:<28}"
            + "".join(f"{ts[m]:>9.3f}" for m in sorted(mults))
            + (f"{alpha:>8.2f}" if alpha is not None else f"{'-':>8}")
        )
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "mode": "isolated",
                "base": base,
                "mults": sorted(mults),
                "sec": {n: {str(m): round(t, 3) for m, t in ts.items()} for n, ts in results.items()},
                "alpha": alphas,
            }
        )
    )


def main() -> None:
    argv = sys.argv[1:]
    if argv[:1] == ["--one"]:
        run_one(argv[1], int(argv[2]))
        return
    isolated = "--isolated" in argv
    if isolated:
        argv = [a for a in argv if a != "--isolated"]
    dedup_mode = "--dedup" in argv
    if dedup_mode:
        argv = [a for a in argv if a != "--dedup"]
    history_mode = "--history" in argv
    if history_mode:
        argv = [a for a in argv if a != "--history"]
    if "--" in argv:
        cut = argv.index("--")
        mults = [int(a) for a in argv[:cut]] or [1, 2, 4]
        plan_names = argv[cut + 1 :]
    else:
        mults = [int(a) for a in argv] or [1, 2, 4]
        plan_names = list(DEFAULT_PLANS)
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if history_mode:
        history_probe(mults, base, root)
        return
    if isolated:
        isolated_probe(mults, plan_names, base, root)
        return

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .appName("scale_probe")
        .getOrCreate()
    )
    from gmall_realtime2021_spark.operators.dedup import release_caches
    from gmall_realtime2021_spark.plans import get_plans
    from gmall_realtime2021_spark.session import apply_engine_config

    apply_engine_config(spark)
    if dedup_mode:
        dedup_stage_probe(spark, base, root, mults)
        spark.stop()
        return
    plans = get_plans()
    missing = [n for n in plan_names if n not in plans]
    if missing:
        raise SystemExit(f"unknown plans: {missing}")

    results: dict[str, dict[int, float]] = {n: {} for n in plan_names}
    # The DEFAULT semantic_dedup plan sizes its quantizer k ∝ N from
    # the corpus count (r10; untrained closed-form centroids, oracle
    # derives the same k from count(*)). This probe variant measures
    # the TRAINED-quantizer path a deployment runs instead
    # (train_ivf_centroids Lloyd iterations; training untimed — a
    # deployment trains once per corpus build and broadcasts).
    retrain = "semantic_dedup" in plan_names
    if retrain:
        results["semantic_dedup_ktrained"] = {}
    for mult in sorted(mults):
        out = f"{root}/x{mult}"
        t0 = time.perf_counter()
        build_scaled(spark, base, out, mult)
        print(f"== x{mult} fixture ready ({time.perf_counter() - t0:.1f}s)", flush=True)
        for name in plan_names:
            plans[name].build(spark, out).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up, untimed
            release_caches()
            best = float("inf")
            for _ in range(2):
                df = plans[name].build(spark, out)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                release_caches()
            results[name][mult] = best
            print(f"  {name:<28}{best:>8.3f}s", flush=True)
        if retrain:
            from gmall_realtime2021_spark.operators.similarity import (
                centroids,
                semantic_dedup_flags,
                train_ivf_centroids,
            )
            from gmall_realtime2021_spark.plans.similarity import SEMDEDUP_TAU

            k = 16 * mult  # k ∝ N: held target cell size as data grows
            emb = spark.read.parquet(f"{out}/embeddings.parquet")
            cents = train_ivf_centroids(emb, iters=3, init=centroids(n_cells=k))

            def build_sd():
                return semantic_dedup_flags(
                    spark.read.parquet(f"{out}/embeddings.parquet"),
                    tau=SEMDEDUP_TAU,
                    centroids_override=cents,
                )

            build_sd().write.format("noop").mode("overwrite").save()  # warm-up
            best = float("inf")
            for _ in range(2):
                df = build_sd()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results["semantic_dedup_ktrained"][mult] = best
            print(f"  {'semantic_dedup_ktrained':<28}{best:>8.3f}s  (k={k})", flush=True)
    if retrain:
        plan_names = plan_names + ["semantic_dedup_ktrained"]

    lo = min(mults)
    print(f"\n{'plan':<28}" + "".join(f"{f'x{m}':>9}" for m in sorted(mults)) + f"{'alpha':>8}")
    alphas = {}
    for name in plan_names:
        ts = results[name]
        hi = max(mults)
        alpha = (
            math.log(ts[hi] / ts[lo]) / math.log(hi / lo) if hi > lo and ts[lo] > 0 else None
        )
        alphas[name] = round(alpha, 2) if alpha is not None else None  # None, not NaN: keeps the JSON line RFC-valid
        print(
            f"{name:<28}"
            + "".join(f"{ts[m]:>9.3f}" for m in sorted(mults))
            + (f"{alpha:>8.2f}" if alpha is not None else f"{'-':>8}")
        )
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "base": base,
                "mults": sorted(mults),
                "sec": {n: {str(m): round(t, 3) for m, t in ts.items()} for n, ts in results.items()},
                "alpha": alphas,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
