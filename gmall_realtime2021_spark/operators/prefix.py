"""Distributed (range-partitioned) prefix sums.

The classic scale problem with ``sum(x) OVER (ORDER BY ...)``: Spark
plans a global ordered window as ONE SinglePartition exchange — every
row through one task. Bounded inputs tolerate it; anything
corpus-sized doesn't. This operator is the standard two-phase
replacement:

1. ``repartitionByRange`` on the order key (parallel range exchange —
   partition *i* holds keys strictly before partition *i+1*'s);
2. per-partition running sums (a window PARTITIONED by the range
   partition id — parallel, each task sorts only its slice);
3. per-partition totals → cumulative offsets via a broadcast
   triangular join over the tiny (one row per partition) totals
   frame — NOT a window, so no SinglePartition exchange anywhere;
4. global cumsum = partition offset + local running sum.

The ranged frame is persisted (via the catalog cache registry)
before fan-out: the running-sum branch and the totals branch both
read ``__pid``, and range boundaries come from seeded *sampling*
whose seed includes the RDD id — two independent instantiations of
the exchange could draw different boundaries, silently misaligning
the offset join if Catalyst's exchange-reuse ever failed to
deduplicate them. One ``InMemoryRelation`` means one exchange
instance by construction; even a cache-evicted partition recomputes
through the SAME shuffle dependency (its ``rangeBounds`` are frozen
in the partitioner object), so ``__pid`` cannot drift. Persist
(not ``localCheckpoint``) keeps the sub-plan visible to the
physical-plan pins and costs one linear executor-local write —
cheap next to the shuffle it follows.

Exactness: callers follow the registry's integer-cents discipline
(sum longs, not doubles), so re-associating the sum across partitions
cannot drift a bit. The order key must be a TOTAL order (include a
unique tie-break column) — range boundaries then can't split equal
keys across partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ntile_from_rank", "range_prefix_sums"]


def ntile_from_rank(rn: Column, n: Column, k: Column) -> Column:
    """SQL ``ntile(k)`` recomputed from a global rank: given a 1-based
    total-order rank ``rn`` out of ``n`` rows, return the 1-based tile
    in 1..k — bit-identical to the window function's assignment (the
    first ``n % k`` tiles get ``floor(n/k)+1`` rows, the rest
    ``floor(n/k)``). Pairs with :func:`range_prefix_sums`
    (``rn = cum_one``, ``n = total_one``) so quantile plans need no
    single-partition window. Integer-exact; cast the result yourself.
    """
    q, m = F.floor(n / k), n % k  # small-tile size, count of big tiles
    boundary = m * (q + 1)  # rows covered by the (q+1)-sized tiles
    return F.when(rn <= boundary, F.ceil(rn / (q + 1))).otherwise(
        m + F.ceil((rn - boundary) / q)
    )


def range_prefix_sums(
    df: DataFrame,
    order_cols: list[Column],
    sums: dict[str, Column],
    n_partitions: int = 32,
) -> DataFrame:
    """For each ``name: expr`` in ``sums``, add ``cum_{name}`` (the
    running sum of ``expr`` over the global ``order_cols`` order,
    inclusive of the current row) and ``total_{name}`` (the grand
    total) to ``df`` — with no single-partition exchange in the plan.

    ``row_number``-style ranks come free: pass ``F.lit(1)`` and read
    ``cum_{name}`` as the global 1-based rank (requires the total
    order). Output row set and values are identical to the global
    window form; only the physical plan differs.
    """
    from gmall_realtime2021_spark.operators.dedup import register_cache

    ranked = register_cache(
        df.repartitionByRange(n_partitions, *order_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranked.select(
        "*", *[F.sum(expr).over(w).alias(f"__cum_{n}") for n, expr in sums.items()]
    )
    ptot = ranked.groupBy("__pid").agg(
        *[F.sum(expr).alias(f"__pt_{n}") for n, expr in sums.items()]
    )
    # offsets: for partition p, Σ totals of partitions before p, plus
    # the grand total — one broadcast pass over the per-partition
    # totals (rows == n_partitions, driver-trivial at any data scale)
    b = F.broadcast(
        ptot.select(
            F.col("__pid").alias("__bpid"),
            *[F.col(f"__pt_{n}").alias(f"__bpt_{n}") for n in sums],
        )
    )
    offsets = (
        ptot.crossJoin(b)
        .groupBy("__pid")
        .agg(
            *[
                F.sum(
                    F.when(F.col("__bpid") < F.col("__pid"), F.col(f"__bpt_{n}")).otherwise(
                        F.lit(0)
                    )
                ).alias(f"__off_{n}")
                for n in sums
            ],
            *[F.sum(f"__bpt_{n}").alias(f"__tot_{n}") for n in sums],
        )
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for n in sums:
        out = out.withColumn(
            f"cum_{n}", F.coalesce(F.col(f"__off_{n}"), F.lit(0)) + F.col(f"__cum_{n}")
        ).withColumn(f"total_{n}", F.col(f"__tot_{n}"))
    drop = ["__pid"] + [c for n in sums for c in (f"__cum_{n}", f"__off_{n}", f"__tot_{n}")]
    return out.drop(*drop)
