"""Local replica of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, sorts rows, compares exact values — stricter
than tolerant float comparison on purpose: the plans are engineered
for bit-identical results (decimal sums, fixed fold order), and this
harness proves it before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb

from gmall_realtime2021_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            elif hasattr(v, "timestamp") or hasattr(v, "isoformat"):
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def spark_result(df):
    cols = df.columns
    rows = [tuple(row) for row in df.collect()]
    return cols, rows


def compare(df, sql: str, sf_dir: str) -> None:
    """Raise AssertionError with a helpful diff when mismatched."""
    s_cols, s_rows = normalize(*spark_result(df))
    o_cols, o_rows = normalize(*run_oracle(sql, sf_dir))
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, (
            f"row {i} differs:\n  spark : {a}\n  oracle: {b}\n"
            f"(first differing col: "
            f"{next((c for c, x, y in zip(s_cols, a, b) if x != y), '?')})"
        )
