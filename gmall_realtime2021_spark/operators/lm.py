"""Bigram-LM fluency model — the shared pieces of the batch plan
(``plans/filtering.lm_bigram_score``) and its incremental maintenance
twin (``streaming/sinks.lm_counts_sink``).

The model is two count tables and a scalar: ``c1`` (token-hash
context counts), ``c2`` (bigram-hash counts), ``vsz`` (vocabulary
size = distinct token hashes). All three are ADDITIVE aggregates of
per-document contributions, so incremental maintenance is exact by
algebra: per-delivery count rows summed into an at-rest store equal
the batch aggregate integer-for-integer, and the score — IEEE
division of identical integers plus the position-pinned fold — is
bit-identical whichever way the counts were accumulated (pinned in
tests/test_sinks.py, replay included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_realtime2021_spark.functions.text_arrow import bigram_pair_rows_arrow

__all__ = [
    "lm_posrows",
    "lm_batch_counts",
    "lm_model_counts",
    "lm_score_docs",
]


def lm_posrows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, w, b) positional rows: the i-th token's hash and the
    (i, i+1) bigram hash, ONE combined Arrow kernel feeding ONE
    posexplode — composing token_hashes + shingle_hashes instead puts
    the UDF on both sides of the Generate and Catalyst extracts two
    ArrowEvalPython nodes (every doc tokenized twice). No size filter
    needed: sub-2-token and NULL docs emit an empty/NULL pair array
    and posexplode drops them."""
    pr = docs.select(
        id_col, F.posexplode(bigram_pair_rows_arrow(F.col(text_col))).alias("pos", "e")
    )
    return pr.select(id_col, "pos", F.col("e.w").alias("w"), F.col("e.b").alias("b"))


def lm_batch_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Delivery-grain model-count rows ``(kind, k, ct)``: kind ``'w'``
    = context (token-hash) counts, kind ``'b'`` = bigram-hash counts.
    This is what the incremental sink writes per micro-batch; summing
    rows across deliveries reproduces the batch model exactly because
    counts are additive. Per-batch cost is delivery-sized: one Arrow
    pass + two map-side-combined aggregates."""
    pos = lm_posrows(docs, id_col=id_col, text_col=text_col)
    c1 = pos.groupBy("w").agg(F.count("*").alias("ct")).select(
        F.lit("w").alias("kind"), F.col("w").alias("k"), F.col("ct")
    )
    c2 = pos.groupBy("b").agg(F.count("*").alias("ct")).select(
        F.lit("b").alias("kind"), F.col("b").alias("k"), F.col("ct")
    )
    return c1.unionByName(c2)


def lm_model_counts(store: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold an at-rest (possibly epoch-partitioned) count-row store
    back into the three model tables ``(c1, c2, vrow)`` the scorer
    consumes: totals per key, and vocabulary size = the number of
    distinct context keys (each 'w' key appears once after the
    merge)."""
    merged = store.groupBy("kind", "k").agg(F.sum("ct").alias("ct"))
    c1 = merged.filter(F.col("kind") == "w").select(
        F.col("k").alias("w"), F.col("ct").alias("c1")
    )
    c2 = merged.filter(F.col("kind") == "b").select(
        F.col("k").alias("b"), F.col("ct").alias("c2")
    )
    vrow = c1.agg(F.count("*").alias("vsz"))
    return c1, c2, vrow


def lm_score_docs(
    posrows: DataFrame, c1: DataFrame, c2: DataFrame, vrow: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score positional rows against a bigram model: per doc, the
    mean add-one-smoothed INVERSE bigram probability
    ``mean_i (c1(w_i) + V) / (c2(w_i, w_{i+1}) + 1)`` — see the plan
    docstring for why inverse-probability means replace perplexity
    here (integer-ratio math, no libm). Fold order is PINNED
    (position-sorted array fold, not SUM) so the mean is bit-identical
    across engines, partitionings, and batch-vs-incremental count
    accumulation. Scoring docs containing bigrams absent from the
    model tables (scoring a NEW delivery against a stale model) drop
    those positions via the inner joins — maintain the model first,
    as the sink does."""
    inv = (
        posrows.join(c2, "b")
        .join(c1, "w")
        .crossJoin(F.broadcast(vrow))
        .select(
            id_col,
            "pos",
            ((F.col("c1") + F.col("vsz")).cast("double") / (F.col("c2") + 1)).alias(
                "inv_p"
            ),
        )
    )
    folded = inv.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "inv_p"))).alias("xs")
    )
    return folded.select(
        id_col,
        F.size("xs").cast("long").alias("n_bigrams"),
        F.round(
            F.aggregate(
                F.transform("xs", lambda x: x["inv_p"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size("xs"),
            6,
        ).alias("lm_score"),
    )
