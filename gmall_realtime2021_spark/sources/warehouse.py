"""Materialized physical layouts: bucketed fact tables and a
date-partitioned event log.

These are the two levers a 100 TB deployment reaches for first, paid
once at ingest instead of per query:

- ``orders``/``lineitem`` written ``bucketBy(N, orderkey).sortBy``
  into catalog tables → every orderkey equi-join between them runs
  with ZERO exchanges (co-located buckets) and no per-query sort
  (each bucket is one pre-sorted file). Today's ``order_wide``-style
  plans re-shuffle both fact sides on every query; the bucketed twin
  is the layout that amortizes that shuffle across the whole query
  mix.
- ``events`` written ``partitionBy(event_date)`` → date-range
  queries prune whole directories at planning time
  (``PartitionFilters`` in the scan), never opening off-range files.

Reference analog: the ClickHouse sink tables are the reference's
materialized layout (``ClickHouseUtil.java:31-76`` — partitioned
MergeTree tables the dashboards range-scan); this module is that
storage layer re-expressed as Spark-managed parquet, with the layout
choices (bucket key = the hot join key, partition key = the hot
range predicate) made explicit and pinned by physical-plan tests
(``tests/test_physical_plans.py``).

Idempotence: per sf_dir, the bucketed tables are registered once per
session (catalog check) and the partitioned event log is written once
per scratch dir (``_SUCCESS`` marker — Spark writes it last). The
scratch root follows the scale-probe convention
(``SPARK_GRAFT_WAREHOUSE_DIR``, default ``/tmp/spark_graft_warehouse``).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.tables import load

__all__ = [
    "N_BUCKETS",
    "ensure_bucketed_facts",
    "ensure_partitioned_events",
    "read_partitioned_events",
    "append_bucketed_batch",
    "upsert_event_days",
    "rebuild_bucketed_facts",
]

#: Bucket count for the fact-fact join layout. On a real cluster this
#: is sized to target bucket-file sizes of 128 MB–1 GB at the ingest
#: volume (e.g. 4096 buckets at 100 TB); the join-elision property is
#: bucket-count-invariant as long as both sides agree.
N_BUCKETS = 16


def _root() -> str:
    return os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/spark_graft_warehouse")


def _tag(sf_dir: str) -> str:
    return re.sub(r"\W+", "_", sf_dir).strip("_")


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize ``orders`` and ``lineitem`` as bucketed, sorted
    catalog tables (bucket key = orderkey on both sides) and return
    their table names ``(orders_table, lineitem_table)``.

    The write repartitions by the bucket column first so each bucket
    is exactly ONE file per table — that single-file-per-bucket shape
    is what lets the scan expose a per-bucket sort order and the
    sort-merge join skip both the exchange AND the sort.
    """
    tag = _tag(sf_dir)
    names = {}
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"wh_{table}_{tag}"
        expected = os.path.join(_root(), tag, table)
        if spark.catalog.tableExists(name):
            loc = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
                .filter("col_name = 'Location'")
                .collect()[0]["data_type"]
                .removeprefix("file:")
            )
            if loc != expected or not os.path.exists(os.path.join(expected, "_SUCCESS")):
                # catalog entry outlived its files (scratch cleanup) or
                # the warehouse root changed since registration: drop
                # and re-materialize under the CURRENT root instead of
                # failing at scan time / silently reading stale state
                spark.sql(f"DROP TABLE {name}")
        if not spark.catalog.tableExists(name):
            (
                load(spark, sf_dir, table)
                .repartition(N_BUCKETS, F.col(key))
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(_root(), tag, table))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        names[table] = name
    return names["orders"], names["lineitem"]


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``events`` date-partitioned (hive-style
    ``event_date=YYYY-MM-DD`` directories, one file per day via a
    pre-write repartition on the partition column) and return the
    layout path. Lossless: every source column is preserved;
    ``event_date`` is derived as ``to_date(ts)`` in the session zone.
    """
    dst = os.path.join(_root(), _tag(sf_dir), "events")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        (
            ev.repartition(F.col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(dst)
        )
    return dst


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioned event log as a DataFrame (materializing it on
    first use)."""
    return spark.read.parquet(ensure_partitioned_events(spark, sf_dir))


def append_bucketed_batch(
    spark: SparkSession,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    key: str,
    sink_name: str = "bucketed_ingest",
) -> bool:
    """Incremental ingest into a bucketed fact table from
    ``foreachBatch``: append the micro-batch with the SAME bucket
    spec (repartitioned to one file per bucket per batch), guarded by
    the engine's replay marker (``streaming/sinks._replay_guard_skip``
    — batch id + query lineage in a sidecar ``_ingest`` dir next to
    the table path). Returns True if the batch was applied, False if
    skipped as a replay.

    Scale contract: the join-elision property survives appends — the
    bucket partitioning is table-level metadata, so ``lineitem ⋈
    orders`` stays shuffle-free no matter how many batches land. The
    per-bucket SORT guarantee does NOT survive: each batch adds one
    file per bucket, and the scan only exposes an ordering when a
    bucket is a single file, so the merge join re-sorts (bucket-local,
    no exchange) until compaction. Compaction = re-materialize from
    the upstream lake, the source of truth
    (:func:`rebuild_bucketed_facts`) — the derived-state rebuild
    discipline every maintenance sink in this engine follows.

    At-least-once caveat (documented, same class as the SCD2/CMS
    sinks): the marker is written AFTER the append commits, so a
    crash in between replays one batch as duplicate rows; the rebuild
    path is the remedy, and the guard makes steady-state replays
    (Spark's normal restart behavior) exact skips.
    """
    from gmall_realtime2021_spark.streaming.sinks import (
        _replay_guard_skip,
        _write_batch_marker,
    )

    location = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").filter(
        "col_name = 'Location'"
    ).collect()[0]["data_type"]
    guard_dir = os.path.join(location.removeprefix("file:"), "_ingest")
    os.makedirs(guard_dir, exist_ok=True)
    skip, lineage = _replay_guard_skip(guard_dir, batch_id, spark, sink_name)
    if skip:
        return False
    (
        batch_df.repartition(N_BUCKETS, F.col(key))
        .write.bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .mode("append")
        .format("parquet")
        .saveAsTable(table)
    )
    # foreachBatch hands us a CLONED session: its write invalidates its
    # own relation cache but not the parent session's cached file
    # listing — a reader that counted the table before the stream
    # would silently keep seeing the old files. Refresh through the
    # shared catalog so every session sees the appended batch.
    spark.catalog.refreshTable(table)
    _write_batch_marker(guard_dir, batch_id, lineage)
    return True


def upsert_event_days(spark: SparkSession, sf_dir: str, batch_df: DataFrame, batch_id: int = -1) -> str:
    """Incremental ingest into the date-partitioned event log:
    DYNAMIC partition overwrite — only the ``event_date`` partitions
    present in the batch are rewritten, every other day directory is
    untouched. This is the events-side twin of
    :func:`append_bucketed_batch` with a STRONGER delivery contract:
    a replayed batch rewrites the same day partitions with the same
    rows, so the operation is naturally idempotent — exactly-once
    per partition without any replay marker (the reference's
    "idempotent write" claim for its ClickHouse sink,
    ``ClickHouseUtil.java:20-21``, realized properly).

    The trade (why both ingest paths exist): per-day overwrite
    requires each batch to carry COMPLETE days (a late-data trickle
    would erase the day's earlier rows), which fits
    backfill/compaction and day-grain micro-batches; the bucketed
    append fits row-grain trickle ingest and pays for it with the
    marker guard. ``batch_id`` is accepted for foreachBatch wiring
    symmetry; idempotence comes from the write mode, not the id.
    """
    dst = ensure_partitioned_events(spark, sf_dir)
    if "event_date" not in batch_df.columns:
        batch_df = batch_df.withColumn("event_date", F.to_date("ts"))
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch_df.repartition(F.col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(dst)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    return dst


def rebuild_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Compaction/repair: drop the bucketed tables and re-materialize
    them from the upstream parquet lake (the source of truth). Restores
    the one-file-per-bucket shape — and with it the zero-sort merge
    join — after incremental appends have fragmented the buckets."""
    tag = _tag(sf_dir)
    for table in ("orders", "lineitem"):
        name = f"wh_{table}_{tag}"
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
    return ensure_bucketed_facts(spark, sf_dir)
