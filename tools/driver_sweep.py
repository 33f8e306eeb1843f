"""Driver-style correctness sweep: run EVERY oracle-checkable plan at
sf0.01 (the driver's CORRECTNESS scale) with a vanilla SparkSession
and the driver's own compare semantics (columns sorted by name,
values stringified), against DuckDB.

The sf0.001 pytest gate (tests/test_oracle_parity.py) is faster but
has missed sf-dependent mismatches before (round 1: a DuckDB
integer-sum type widening at sf0.01, an as-of NULL-sentinel
normalization). Run this before every round ends:

    python tools/driver_sweep.py            # all plans
    python tools/driver_sweep.py name1 ...  # just the named plans
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _canon(pdf):
    """The driver's compare path, replicated: PANDAS frames (Spark
    ``toPandas`` vs DuckDB ``.df()``), columns sorted by name, rows
    sorted via ``sort_values`` (this is where array cells die with
    'unhashable type' — exactly the r03 ``pq_codes`` red), then every
    cell stringified through its pandas dtype. Row-object ``str()``
    compare (the old form of this tool) masked both r03 reds: Spark
    Decimal('3.10') and DuckDB Decimal('3.10') stringify alike, but
    through pandas one side is object(Decimal) and the other float64
    → '3.1'. Sweep with the same lens the driver grades with."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    return [tuple(str(v) for v in row) for row in pdf.itertuples(index=False)]


SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        # hostile preset probe: plans must not depend on session TZ
        .config("spark.sql.session.timeZone", "Asia/Shanghai")
        # instrument sizing, not engine tuning: one session runs the
        # whole 180-plan catalog back-to-back (plus, since r11, the
        # warehouse-layout materializations), and the 1 GiB default
        # driver heap died of GCLocker starvation ~104 plans into the
        # sf0.1 pass. The conf stays vanilla otherwise.
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "6g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name in qs:
        if name not in osql or (only and name not in only):
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = _canon(sdf.toPandas())
            oraw = con.execute(osql[name]).df()
            ocols = sorted(oraw.columns)
            orows = _canon(oraw)
            if scols != ocols:
                bad.append((name, "schema", scols, ocols))
                print("SCHEMA-FAIL", name, flush=True)
            elif srows != orows:
                bad.append((name, "values", srows[:1], orows[:1]))
                print("VALUE-FAIL", name, flush=True)
            else:
                print("ok", name, len(srows), flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, "error", str(ex)[:200]))
            print("ERROR", name, str(ex)[:120], flush=True)
        finally:
            from gmall_realtime2021_spark.operators.dedup import release_caches

            release_caches()  # LSH signature tables, per-plan lifetime here
    print(f"=== SUMMARY: {len(bad)} failures")
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
