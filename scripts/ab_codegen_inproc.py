#!/usr/bin/env python3
"""Within-process interleaved A/B of whole-stage codegen inside step
scopes + streamed batches: alternate spark.feldera.step.codegen /
spark.feldera.stream.codegen on/off across repeated runs of streaming
bench shapes in ONE JVM (host noise hits both arms; order alternates
per rep to cancel first-position bias). VERDICT r11 next-round #3."""
import json
import os
import sys
sys.path.insert(0, "/root/repo")

shapes = (sys.argv[1] if len(sys.argv) > 1 else "nx04_stream,nx05_stream").split(",")
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from feldera_spark.session import get_spark

spark = get_spark(app_name="ab_codegen_inproc")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench

for shape in shapes:
    os.environ["SPARK_GRAFT_STREAM_SHAPES"] = shape
    results = {"on": [], "off": []}
    order = []
    for i in range(reps):
        for mode in ("on", "off") if i % 2 == 0 else ("off", "on"):
            spark.conf.set("spark.feldera.step.codegen", mode == "on" and "true" or "false")
            spark.conf.set("spark.feldera.stream.codegen", mode == "on" and "true" or "false")
            r = bench.run_streaming_bench(spark, sf_dir)[shape]
            results[mode].append(
                (r["events_per_sec"], r["phase_ms"]["step"], r["phase_ms"]["commit"])
            )
            order.append((mode, r["events_per_sec"]))
    print(json.dumps({"shape": shape, "order": order}))
    for mode in ("on", "off"):
        evs = sorted(x[0] for x in results[mode])
        print(f"{shape} codegen={mode}: median {evs[len(evs)//2]:,} all {evs}")
