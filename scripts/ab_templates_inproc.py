#!/usr/bin/env python3
"""Within-process interleaved A/B of plan templates: alternate
spark.feldera.planTemplates on/off across repeated runs of one
streaming-bench shape, in ONE JVM, so host noise hits both arms."""
import json
import os
import sys

shape = sys.argv[1] if len(sys.argv) > 1 else "nx04_stream"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from feldera_spark.session import get_spark

spark = get_spark(app_name="ab_tpl_inproc")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_STREAM_SHAPES"] = shape

import bench

results = {"on": [], "off": []}
order = []
for i in range(reps):
    for mode in ("on", "off") if i % 2 == 0 else ("off", "on"):
        spark.conf.set("spark.feldera.planTemplates", mode)
        spark._fs_plan_helper = None  # re-check conf
        r = bench.run_streaming_bench(spark, sf_dir)[shape]
        results[mode].append(
            (r["events_per_sec"], r["phase_ms"]["step"], r["phase_ms"]["commit"])
        )
        order.append((mode, r["events_per_sec"]))

print(json.dumps({"shape": shape, "order": order, "results": results}))
for mode in ("on", "off"):
    evs = [x[0] for x in results[mode]]
    steps = [x[1] for x in results[mode]]
    commits = [x[2] for x in results[mode]]
    print(
        f"{mode}: ev/s median {sorted(evs)[len(evs)//2]:,} "
        f"(all {evs}) step {steps} commit {commits}",
        file=sys.stderr,
    )
