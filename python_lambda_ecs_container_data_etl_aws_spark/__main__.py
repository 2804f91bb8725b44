"""CLI entry point: run any catalog query against a table directory.

    python -m python_lambda_ecs_container_data_etl_aws_spark list
    python -m python_lambda_ecs_container_data_etl_aws_spark run q05_report_aggregate \
        --sf-dir /root/testdata/sf0.01 [--limit 20] [--out /path/parquet|csv] [--explain]
    python -m python_lambda_ecs_container_data_etl_aws_spark verify q05_report_aggregate \
        [--sf-dir /root/testdata/sf0.01]

`run` prints the result as a table (or writes it with --out: .csv →
one-file CSV via the export module, anything else → parquet), `list`
enumerates the catalog, `verify` runs a query on BOTH engines (Spark
and its DuckDB oracle twin) and reports the driver-style row/schema/
value-hash match — the self-service audit of the correctness
contract. Sessions come from the package factory (AQE, UTC, nanos
conf) on local[*] unless SPARK_GRAFT_CPUS is set.
"""

from __future__ import annotations

import argparse
import os
import sys


def _session():
    from pyspark.sql import SparkSession

    from .session import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pyspark-etl-analytics-engine")
        .getOrCreate()
    )
    configure(spark)
    return spark


def main(argv: list[str] | None = None) -> int:
    from .catalog import DEFAULT_SF_DIR
    from .plans import QUERIES

    ap = argparse.ArgumentParser(prog="python_lambda_ecs_container_data_etl_aws_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list catalog query names")
    runp = sub.add_parser("run", help="run one catalog query")
    runp.add_argument("query", help="catalog name, e.g. q05_report_aggregate")
    runp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    runp.add_argument("--limit", type=int, default=20, help="rows to print")
    runp.add_argument("--out", help="write result here instead of printing "
                                    "(.csv → one-file CSV, else parquet)")
    runp.add_argument("--explain", action="store_true",
                      help="print the formatted physical plan instead of rows")
    verp = sub.add_parser("verify", help="run one query on Spark AND its "
                                         "DuckDB oracle, compare results")
    verp.add_argument("query")
    verp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args(argv)

    if args.cmd == "list":
        for name in sorted(QUERIES):
            print(name)
        return 0

    if args.cmd == "verify":
        from .plans import ORACLE
        from .verify import compare_frames, duck_connect

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}", file=sys.stderr)
            return 2
        spark = _session()
        df = QUERIES[args.query](spark, args.sf_dir)
        con = duck_connect(args.sf_dir)
        r = compare_frames(df, con, ORACLE.get(args.query), args.query)
        spark.catalog.clearCache()
        if r.oracle_rows is None:
            print(f"{args.query}: rows-only (no oracle), spark_rows={r.spark_rows}")
            return 0
        status = "MATCH" if r.ok else "MISMATCH"
        print(f"{args.query}: {status} rows={r.spark_rows}/{r.oracle_rows} "
              f"schema={r.schema_match} hash={r.hash_match}")
        for a, b in r.diffs:
            print(f"  spark={a} oracle={b}")
        return 0 if r.ok else 1

    if args.query not in QUERIES:
        import difflib

        close = difflib.get_close_matches(args.query, QUERIES, n=3)
        print(f"unknown query {args.query!r}" +
              (f"; did you mean: {', '.join(close)}?" if close else ""),
              file=sys.stderr)
        return 2

    spark = _session()
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        if args.out.endswith(".csv"):
            from .export import export_report_csv

            # print the actual part-file path: the out argument names
            # a DIRECTORY Spark writes into, and downstream tools
            # pointed at the printed path expect a readable file
            print(f"wrote {export_report_csv(df, args.out)}")
        else:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        spark.catalog.clearCache()
        return 0
    df.show(args.limit, truncate=False)
    # getOrCreate() shares one session across repeated in-process
    # main() calls (tests, embedding callers): release this query's
    # operator-owned caches so runs don't accumulate cached blocks
    spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
