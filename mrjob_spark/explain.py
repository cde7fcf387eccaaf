"""Plan inspection CLI: ``python -m mrjob_spark.explain <query> [...]``.

Prints the FORMATTED physical plan of any registry query (or, with
``--all-scans``, just the scan lines of every query — a quick pushdown
audit). The plan properties that matter at scale (PushedFilters,
ReadSchema, broadcast vs sort-merge joins, exchange count, codegen spans)
are exactly what tests/test_plans.py pins; this tool is the interactive
view of the same thing.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m mrjob_spark.explain",
        description="Print the formatted physical plan of registry queries.",
    )
    parser.add_argument("queries", nargs="*", help="registry query names")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    parser.add_argument(
        "--list", action="store_true", help="list registry query names"
    )
    parser.add_argument(
        "--all-scans",
        action="store_true",
        help="print only each query's scan lines (pushdown audit)",
    )
    args = parser.parse_args(argv)

    from mrjob_spark import queries as q

    if args.list:
        for name in q.REGISTRY:
            print(name)
        return 0

    from mrjob_spark.session import get_spark

    spark = get_spark(app_name="mrjob_spark_explain", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or (list(q.REGISTRY) if args.all_scans else [])
    if not names:
        parser.error("give query names, --list, or --all-scans")
    for name in names:
        if name not in q.REGISTRY:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        df = q.REGISTRY[name].fn(spark, args.sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"=== {name}")
        if args.all_scans:
            for line in plan.splitlines():
                if "Scan parquet" in line or "PushedFilters" in line or "ReadSchema" in line:
                    print("  " + line.strip())
        else:
            print(plan)
    return 0


if __name__ == "__main__":
    sys.exit(main())
