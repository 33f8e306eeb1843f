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

__all__ = ["read_table"]

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
