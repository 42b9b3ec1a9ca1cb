#!/usr/bin/env python3
"""Driver-contract oracle sweep, shardable: run every registered query
against its DuckDB oracle at a small SF under a hostile (non-UTC)
session timezone, printing one flushed PASS/FAIL line per query.

Usage: python3 scripts/oracle_sweep_shard.py SHARD NSHARDS [SF_DIR]
"""
import sys

shard, nshards = int(sys.argv[1]), int(sys.argv[2])
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m

qs, os_ = m.queries(), m.oracle_sql()
from feldera_spark.testing.oracle import compare_to_oracle

names = [n for i, n in enumerate(sorted(os_)) if i % nshards == shard]
bad = []
for name in names:
    try:
        compare_to_oracle(qs[name](spark, sf_dir), os_[name], sf_dir)
        print(f"PASS {name}", flush=True)
    except Exception as ex:
        bad.append(name)
        print(f"FAIL {name} {type(ex).__name__} {str(ex)[:200]!r}", flush=True)
print(f"shard {shard}/{nshards}: {len(names) - len(bad)}/{len(names)} pass",
      flush=True)
