#!/usr/bin/env python3
"""Driver-contract check: plain SparkSession (hostile non-UTC tz),
entry() smoke, then the full oracle sweep at sf0.001 (arg 1 overrides).
Exit 0 only when every oracle matches."""
import sys

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m

rows = m.entry(spark).collect()
print("entry rows:", len(rows), flush=True)
qs, os_ = m.queries(), m.oracle_sql()
from feldera_spark.testing.oracle import compare_to_oracle

bad = 0
for name in sorted(os_):
    try:
        compare_to_oracle(qs[name](spark, sf_dir), os_[name], sf_dir)
    except Exception as e:  # noqa: BLE001
        bad += 1
        print("FAIL", name, str(e)[:200], flush=True)
print(f"oracle sweep done, failures={bad}, total={len(os_)}", flush=True)
sys.exit(1 if bad else 0)
