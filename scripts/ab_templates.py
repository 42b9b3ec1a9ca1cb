#!/usr/bin/env python3
"""A/B the plan-template path: run selected streaming bench shapes with
spark.feldera.planTemplates on or off (arg 1), shapes as arg 2 (comma
list, default chain_stream). Separate processes per mode keep the JVM
helper cache honest."""
import json
import os
import sys

mode = sys.argv[1] if len(sys.argv) > 1 else "on"
shapes = (sys.argv[2] if len(sys.argv) > 2 else "chain_stream").split(",")

from feldera_spark.session import get_spark

spark = get_spark(app_name=f"ab_templates_{mode}")
spark.conf.set("spark.feldera.planTemplates", mode)
spark.sparkContext.setLogLevel("ERROR")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.read.parquet(f"{sf_dir}/region.parquet").count()

import bench

full = bench.run_streaming_bench(spark, sf_dir)
print(json.dumps({k: v for k, v in full.items() if k in shapes or not shapes}))
