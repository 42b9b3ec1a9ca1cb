#!/usr/bin/env python3
"""Dump .explain("formatted") for headline queries to plans/r12/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [query ...]
Plans are captured with the same session config as bench.py.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feldera_spark.queries import all_queries
    from feldera_spark.session import get_spark

    import bench

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    if not names:
        names = bench.HEADLINE
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # multi-step IVM queries may run jobs to build
            plan = f"<error capturing plan: {e}>"
        out = f"plans/r12/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
