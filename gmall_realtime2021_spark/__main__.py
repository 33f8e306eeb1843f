"""CLI: run any registered plan by name.

    python -m gmall_realtime2021_spark list
    python -m gmall_realtime2021_spark run pricing_summary
    python -m gmall_realtime2021_spark run ngram_topk --sf-dir /root/testdata/sf0.01 --show 20
    python -m gmall_realtime2021_spark run order_wide --out /tmp/ow --explain
    python -m gmall_realtime2021_spark sql "SELECT count(*) FROM orders"

`run` executes the plan against `--sf-dir` (default
$SPARK_GRAFT_SF_DIR) and either shows the first rows, writes parquet
to `--out`, or both; `--explain` prints the formatted physical plan
first — the same audit loop the repo's plan-shape tests use.

`sql` registers every fixture table as a temp view and runs an
arbitrary Spark SQL statement against them — the ad-hoc surface for
users migrating their own queries off the reference.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.tables import default_sf_dir


def run_plan(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    out: str | None = None,
    explain: bool = False,
    show: int = 10,
) -> int:
    """Build and execute one plan; returns the row count."""
    plans = get_plans()
    if name not in plans:
        raise KeyError(f"unknown plan {name!r}; `list` shows the {len(plans)} available")
    df = plans[name].build(spark, sf_dir)
    if explain:
        df.explain("formatted")
    if out:
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
    else:
        n = df.count()
    if show:
        df.show(show, truncate=False)
    return n


def run_sql(
    spark: SparkSession,
    query: str,
    sf_dir: str,
    out: str | None = None,
    explain: bool = False,
    show: int = 20,
) -> int:
    """Register every fixture table as a temp view, run ``query``."""
    from gmall_realtime2021_spark.tables import TABLES, load

    for table in TABLES:
        load(spark, sf_dir, table).createOrReplaceTempView(table)
    df = spark.sql(query)
    if explain:
        df.explain("formatted")
    if out:
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
    else:
        n = df.count()
    if show:
        df.show(show, truncate=False)
    return n


def run_maintain(spark: SparkSession, sf_dir: str, compact: bool = False, gc: bool = False) -> int:
    """Operational surface over the at-rest layouts: print the
    ``layout_health`` report and, with ``--compact``, run the matching
    row-preserving compaction for every family whose flag says it is
    due (facts/events buckets → :func:`compact_bucketed_table`; IVF
    cells → :func:`compact_ivf_cells`; the hive-partitioned families
    never fragment — whole-partition rewrites). Exit code 0 when no
    family needs maintenance (after compaction, if requested), 1 when
    one does — scriptable as a cron health check. "Needs maintenance"
    is the SAME predicate compaction acts on: compact_due OR a
    bucketed family whose single-file-per-bucket sort-serving
    property is lost (a report that exits 0 for exactly the state
    --compact would repair could never drive the cron pattern
    ``maintain || maintain --compact``).

    ``--gc`` additionally sweeps retired layout GENERATIONS past the
    grace window (``gc_layout_generations`` — the explicit form of
    the sweep every maintenance writer runs at commit time) and
    reclaims the pre-r12 hash-less tag directory for this sf_dir
    (``sweep_legacy_tag_dir``, ADVICE r12)."""
    from gmall_realtime2021_spark.sources import warehouse as W

    if gc:
        swept = W.gc_layout_generations(spark, sf_dir)
        for fam, names in sorted(swept.items()):
            print(f"# gc {fam}: removed {', '.join(names)}")
        legacy = W.sweep_legacy_tag_dir(sf_dir)
        if legacy:
            print(f"# gc: reclaimed pre-r12 tag dir {legacy}")

    def _due(row: dict) -> bool:
        return bool(row["compact_due"]) or row.get("sorted_serving") is False

    rows = sorted(W.layout_health_stats(spark, sf_dir), key=lambda r: r["family"])
    if compact:
        due = {r["family"] for r in rows if _due(r)}
        if due & {"facts_orders", "facts_lineitem"}:
            orders_t, lineitem_t = W.ensure_bucketed_facts(spark, sf_dir)
            if "facts_orders" in due:
                W.compact_bucketed_table(spark, orders_t, "o_orderkey")
            if "facts_lineitem" in due:
                W.compact_bucketed_table(spark, lineitem_t, "l_orderkey")
        if "events_by_user" in due:
            W.compact_bucketed_table(
                spark,
                W.ensure_bucketed_events(spark, sf_dir),
                W.EVENTS_BUCKET_KEY,
                sort_cols=W.EVENTS_SORT_COLS,
            )
        if "embeddings_ivf" in due:
            W.compact_ivf_cells(spark, sf_dir)
        rows = sorted(W.layout_health_stats(spark, sf_dir), key=lambda r: r["family"])
    hdr = ("family", "kind", "units", "data_files", "total_bytes", "max_files_per_unit",
           "fragmented_units", "compact_due", "sorted_serving", "generations", "gc_pending")
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r[c]) for c in hdr))
    return 1 if any(_due(r) for r in rows) else 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gmall_realtime2021_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered plans")
    runp = sub.add_parser("run", help="execute one plan")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default=default_sf_dir())
    runp.add_argument("--out", default=None, help="write result parquet here")
    runp.add_argument("--explain", action="store_true")
    runp.add_argument("--show", type=int, default=10, help="rows to print (0 = none)")
    sqlp = sub.add_parser("sql", help="run ad-hoc Spark SQL over the fixture tables")
    sqlp.add_argument("query")
    sqlp.add_argument("--sf-dir", default=default_sf_dir())
    sqlp.add_argument("--out", default=None, help="write result parquet here")
    sqlp.add_argument("--explain", action="store_true")
    sqlp.add_argument("--show", type=int, default=20, help="rows to print (0 = none)")
    mnt = sub.add_parser(
        "maintain",
        help="at-rest layout maintenance: report health; --compact acts on compact-due families",
    )
    mnt.add_argument("--sf-dir", default=default_sf_dir())
    mnt.add_argument(
        "--compact",
        action="store_true",
        help="run the matching compaction for every family flagged compact_due "
        "(reader-safe: maintenance lands in a new generation and flips the manifest; "
        "overlapping scans keep the old snapshot until the GC grace expires)",
    )
    mnt.add_argument(
        "--gc",
        action="store_true",
        help="sweep retired layout generations past the grace window and reclaim "
        "the pre-r12 legacy tag dir for this --sf-dir",
    )
    args = ap.parse_args(argv)

    if args.cmd == "list":
        for name, plan in sorted(get_plans().items()):
            kind = "oracle" if plan.oracle else "rows-only"
            doc = (plan.doc or "").strip().splitlines()[0] if plan.doc else ""
            print(f"{name:32s} [{kind}] {doc}")
        return 0

    from gmall_realtime2021_spark.session import get_spark

    spark = get_spark("gmall-cli")
    if args.cmd == "maintain":
        return run_maintain(spark, args.sf_dir, compact=args.compact, gc=args.gc)
    if args.cmd == "sql":
        n = run_sql(spark, args.query, args.sf_dir, out=args.out, explain=args.explain, show=args.show)
        print(f"# sql: {n} rows", file=sys.stderr)
        return 0
    n = run_plan(spark, args.name, args.sf_dir, out=args.out, explain=args.explain, show=args.show)
    print(f"# {args.name}: {n} rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
