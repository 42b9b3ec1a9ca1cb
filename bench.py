#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    "q01_pricing_summary",   # linear agg scan
    "q03_join_topk",         # join + agg + topK
    "q08_star_join",         # 5-way broadcast star join
    "q16_window_rank",       # window functions
    "q21_topk_per_group",    # indexed topK
    "q41_tumble",            # time windows
    "q43_session",           # session windows
    "q44_asof_join",         # as-of join
    "q45_range_join",        # banded range join
    "nx04_avg_closing_price",   # Nexmark q4: temporal join + 2-level agg
    "nx05_hot_items",        # Nexmark q5: HOP windows + per-window max
    "nx09_winning_bids",     # Nexmark q9: arg-max per auction
    "d03_lsh_candidate_pairs",  # minhash LSH dedup
    "d06_cosine_topk",       # similarity search
    "d11_fingerprint",       # text fingerprinting
    "d14_ivf_topk",          # IVF ANN (coarse cells + probes)
    "i01_ivm_agg",           # incremental aggregate (4 deltas)
    "i05_ivm_rolling",       # incremental rolling OVER-RANGE aggregate
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from feldera_spark.queries import all_queries
    from feldera_spark.session import get_spark

    spark = get_spark(app_name="feldera_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best, n = None, 0
        for _ in range(2):  # best-of-2: shields the metric from host noise
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # force full execution
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
