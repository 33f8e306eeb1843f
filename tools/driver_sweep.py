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

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        # hostile preset probe: plans must not depend on session TZ
        .config("spark.sql.session.timeZone", "Asia/Shanghai")
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
            srows = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
            cur = con.execute(osql[name])
            names = [d[0] for d in cur.description]
            ocols = sorted(names)
            orows = sorted(
                tuple(str(r[names.index(c)]) for c in ocols) for r in cur.fetchall()
            )
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
    print(f"=== SUMMARY: {len(bad)} failures")
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
