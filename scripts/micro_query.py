#!/usr/bin/env python3
"""Time individual headline queries in isolation (guide §1.4).

Usage: python scripts/micro_query.py <query> [query ...] [--n N] [--noop]

Times the bench's action (df.count(), best-of-N) per query with a
setJobDescription label; --noop times a noop-sink write instead (full
column materialization). Prints one line per query.
"""
from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
        args = [a for a in args if a != str(n)]
    use_noop = "--noop" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from feldera_spark.queries import all_queries
    from feldera_spark.session import get_spark

    spark = get_spark(app_name="micro_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in args:
        fn = qs[name]
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: best={min(times):.3f}s all={' '.join(f'{t:.3f}' for t in times)}"
        )


if __name__ == "__main__":
    main()
