"""Format-agnostic batch ingestion (external deliveries).

The engine's plans read the curated parquet layout through
``tables.load``; real pipelines also ingest third-party deliveries —
JSON-lines dumps, CSV exports, ORC from other warehouses. This module
gives those one entry point returning the same DataFrame surface, so
every downstream operator works unchanged.

Scale rules encoded here:

- **Schema is mandatory for text formats.** Inference is a whole
  extra pass over the data at 100 TB, and it type-drifts (ints widen
  to doubles, timestamps stay strings) — a delivery contract is a
  schema, so the caller supplies it.
- **Pushdown reality:** parquet/orc scans get predicate + column
  pushdown; json/csv are row-parse formats — Spark still prunes
  referenced columns at parse time, but filters run post-parse. The
  first job against a recurring text delivery should therefore be a
  parquet-ification pass, not analytics.
- ``mode="FAILFAST"`` by default: a malformed delivery should fail
  loudly at ingest, not silently null-fill analytics downstream
  (PERMISSIVE with a corrupt-record column is the opt-in for
  quarantine flows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_table", "read_with_quarantine"]

_TEXT_FORMATS = {"json", "csv"}
_FORMATS = {"parquet", "orc", "json", "csv"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an explicit ``schema``.

    ``schema`` may be a StructType or a DDL string; required for
    json/csv (raises otherwise). ``options`` pass through to the
    reader (e.g. ``header="true"`` for csv with a header row).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(_FORMATS)}")
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} ingestion requires an explicit schema — inference is an "
            "extra full pass and type-drifts; deliveries have contracts"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in _TEXT_FORMATS:
        reader = reader.option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    quarantine_dir: str | None = None,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """The PERMISSIVE opt-in the module docstring promises: read a
    text delivery (json/csv) splitting rows into (good, bad) instead
    of failing the job — the quarantine flow for deliveries where a
    fractional malformed tail is expected and the clean majority must
    land on schedule.

    Returns ``(good, bad)``: good rows with the contract schema, bad
    rows as ``(_corrupt_record string)`` preserving the raw line for
    replay after the upstream fix. If ``quarantine_dir`` is given the
    bad rows are also written there (append, JSON-lines) so the
    quarantine survives the job.

    Scale: one parse pass — the split is two filters over the same
    scan (Spark caches the parsed batch per-task, no re-read);
    PERMISSIVE nulls + the corrupt column cost nothing on clean rows.
    Spark requires the corrupt column to be referenced through a
    cache boundary rather than a pure projection, hence the
    ``cache()`` on the raw parse. Cache lifetime: bounded by one
    delivery and released by the ContextCleaner when the returned
    frames go out of scope; a long-lived session looping over many
    deliveries should ``good.sparkSession.catalog.clearCache()``
    between rounds (or hold and unpersist ``good``'s lineage root).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    if fmt not in _TEXT_FORMATS:
        raise ValueError(f"quarantine reads are for text formats, not {fmt!r}")
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    full = StructType(list(schema.fields)).add("_corrupt_record", StringType())
    raw = (
        spark.read.format(fmt)
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .options(**options)
        .load(path)
        .cache()
    )
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    if quarantine_dir is not None:
        bad.write.mode("append").json(quarantine_dir)
    return good, bad
