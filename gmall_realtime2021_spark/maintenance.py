"""Table maintenance: small-file compaction for streaming sink dirs.

Every micro-batch append (stats_store_sink, dim_upsert_batch,
dynamic_route_files) adds files; after days of 10-second batches a
table is millions of KB-sized files and the scan is metadata-bound.
The fix is the standard compact-and-swap: rewrite the directory into
size-targeted files, then atomically replace. (The reference never
solves this — ClickHouse merges parts server-side; parquet-on-object-
store engines must do it themselves.)
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

__all__ = ["compact_parquet_dir"]


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(rows / target_rows_per_file)`` files; returns
    (files_before, files_after).

    Strategy: read → coalesce (narrow — no shuffle; file merge only
    reduces parallelism of the one rewrite job) → write to a sibling
    temp dir → swap via two renames. The swap window is not
    transactional (plain parquet has no commit protocol — a real
    lakehouse table format does this with a metadata commit); callers
    pause readers or accept a brief listing race, which is the
    standard operating procedure for raw-parquet maintenance.
    """

    def _n_files(p: str) -> int:
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

    before = _n_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    n_out = max(1, math.ceil(rows / target_rows_per_file))
    tmp = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return before, _n_files(path)
