"""Skewed-corpus probe for the inverted-index build (r14, VERDICT r13
item #4 / ADVICE medium #2).

The r13 rewrite counts document frequency with ``count(*) over
(partition by tok)`` on the tok-clustered postings. Token frequencies
are Zipf-distributed, so the concern is a hot-token straggler: a
window cannot partial-aggregate map-side and AQE cannot split a
window partition (skew handling applies to joins only).

What bounds the exposure — and what this probe measures: postings are
(doc, DISTINCT token) grain (tf is pre-counted inside the tokenize
kernel), so a token's window partition holds at most N rows (its
document frequency), NOT its occurrence count. A stopword carrying
10% of corpus OCCURRENCES still contributes <= one row per document.
This probe constructs the worst case — a synthetic stopword present
in EVERY document (df = N, the maximum any token can reach) on a K×
content-grown corpus — and times the BM25 pair stage:

  window  — the shipped form (df via window over the tok exchange)
  atrest  — the production escape hatch: postings persisted (the
            at-rest index the module docstring describes), df via
            groupBy (map-side partials, skew-immune) joined back
            (AQE-splittable join)

Writes one line per (corpus, K, form) with wall seconds; ratios near
1.0 between base and skewed corpora mean the window form holds.

Usage: python tools/skew_probe_retrieval.py [K ...]   (default 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_micro,
    doc_dl_expr,
    doc_postings,
    query_terms,
)
from gmall_realtime2021_spark.session import get_spark
from gmall_realtime2021_spark.tables import load

N_QUERIES = 8
#: lowercase-alnum token absent from the fixture corpus; injected into
#: every document so its df equals N — the worst window partition any
#: real token could produce.
STOPTOK = "zzzstopword7"


def grown_docs(spark, sf_dir: str, k: int, skew: bool) -> DataFrame:
    """K× content growth (token-suffix remap per replica, the --dedup
    probe recipe) with an optional stopword injected into every doc.
    The remap keeps each replica's token universe disjoint, so distinct
    token counts grow ~K× while the injected stopword's df grows to
    the FULL grown corpus size."""
    docs = load(spark, sf_dir, "documents")
    n0 = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for j in range(k):
        d = docs.select(
            (F.col("doc_id") + F.lit(j * n0)).alias("doc_id"),
            # suffix every latin/digit run so replicas share no tokens
            (
                F.regexp_replace("text", r"([a-z0-9]+)", rf"$1x{j}q")
                if j
                else F.col("text")
            ).alias("text"),
        )
        parts.append(d)
    grown = parts[0]
    for p in parts[1:]:
        grown = grown.unionAll(p)
    if skew:
        grown = grown.select(
            "doc_id", F.concat_ws(" ", F.col("text"), F.lit(STOPTOK)).alias("text")
        )
    return grown


def pair_stage(docs: DataFrame, form: str) -> DataFrame:
    corpus = docs.filter(F.col("doc_id") >= N_QUERIES)
    qdocs = docs.filter(F.col("doc_id") < N_QUERIES)
    postings = doc_postings(corpus)
    qterms = query_terms(qdocs)
    if form == "window":
        return bm25_micro(postings, qterms, per_doc_dl=doc_dl_expr(corpus))
    # at-rest form: postings persisted once (the production index-at-
    # rest analog), df via skew-immune groupBy partials + join-back
    from pyspark import StorageLevel

    stored = postings.persist(StorageLevel.MEMORY_AND_DISK)
    per_doc_dl = doc_dl_expr(corpus)
    stats = per_doc_dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    df_tbl = stored.groupBy("tok").agg(F.count("*").alias("df_ct"))
    contrib = F.sqrt(
        (F.col("n_docs") - F.col("df_ct") + F.lit(0.5)) / (F.col("df_ct") + F.lit(0.5))
    ) * (
        (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1) - F.lit(BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl")))
        )
    )
    micro = F.floor(contrib * F.lit(1000000000) + F.lit(0.5)).cast("long")
    out = (
        stored.join(df_tbl, "tok")
        .join(F.broadcast(qterms), "tok")
        .crossJoin(F.broadcast(stats))
        .select("q_id", "c_id", micro.alias("cmicro"))
        .groupBy("q_id", "c_id")
        .agg(F.sum("cmicro").alias("micro"))
    )
    return out, stored


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-probe-retrieval")
    spark.sparkContext.setLogLevel("ERROR")

    def _w(b):
        yield from b

    spark.range(10_000).repartition(64).mapInPandas(_w, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for k in ks:
        for skew in (False, True):
            docs = grown_docs(spark, sf_dir, k, skew)
            docs = docs.persist()  # isolate the probe from growth-gen cost
            docs.count()
            for form in ("window", "atrest"):
                # build fresh per run so the at-rest persist is paid
                # inside every timed run (one warmup + min of 2)
                runs = []
                for _ in range(3):
                    built = pair_stage(docs, form)
                    stored = None
                    if isinstance(built, tuple):
                        built, stored = built
                    t0 = time.perf_counter()
                    built.write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                    if stored is not None:
                        stored.unpersist(blocking=True)
                best = min(runs[1:])
                label = "skewed" if skew else "base  "
                print(
                    f"k={k} corpus={label} form={form:7s} best={best:7.3f}s runs={[round(r,3) for r in runs]}",
                    flush=True,
                )
            docs.unpersist(blocking=True)


if __name__ == "__main__":
    main()
