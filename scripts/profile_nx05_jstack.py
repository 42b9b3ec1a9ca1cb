#!/usr/bin/env python3
"""Sample JVM executor-thread stacks with jstack while the nx05 shape
streams, and histogram the topmost interesting frames. Names whatever
burns the ~1-2s CPU per task on <100-row commit stages."""
import collections
import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from feldera_spark.session import get_spark

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid

bid = _bid(spark, sf_dir).select(
    "event_id", "bidder", "auction", "price", "date_time"
)
base_n = bid.count()
reps = max(1, 2000000 // max(base_n, 1))
shift = spark.range(reps).select(F.col("id").alias("__rep"))
bid = (
    bid.crossJoin(F.broadcast(shift))
    .withColumn("event_id", F.col("event_id") + F.col("__rep") * base_n * 2)
    .drop("__rep")
)
work = tempfile.mkdtemp(prefix="profjs_")
src = f"{work}/bid"
bid.repartition(8).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

prog = (
    "CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT,"
    " price DOUBLE, date_time TIMESTAMP) WITH ('append_only'='true');"
    "CREATE LOCAL VIEW counts AS SELECT window_start, auction, COUNT(*)"
    " AS num FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time),"
    " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    " GROUP BY window_start, auction;"
    "CREATE LOCAL VIEW maxes AS SELECT window_start, MAX(num) AS maxn"
    " FROM counts GROUP BY window_start;"
    "CREATE MATERIALIZED VIEW hot AS SELECT c.window_start, c.auction,"
    " c.num FROM counts c JOIN maxes m ON c.window_start = m.window_start"
    " WHERE c.num >= m.maxn"
)
b = PipelineBuilder(spark).sql(prog)
b.connect_table("bid", bid.limit(0))
p = b.create()

pid = os.getpid()  # local mode: driver JVM is a child; find java child
java_pid = None
out = subprocess.run(
    ["ps", "--ppid", str(pid), "-o", "pid,comm"], capture_output=True, text=True
).stdout
for line in out.splitlines()[1:]:
    parts = line.split()
    if len(parts) == 2 and "java" in parts[1]:
        java_pid = parts[0]
if java_pid is None:
    java_pid = str(pid)
print(f"jstack target pid={java_pid}")

hist = collections.Counter()
stop = threading.Event()


def sampler():
    while not stop.is_set():
        try:
            dump = subprocess.run(
                ["jstack", java_pid], capture_output=True, text=True, timeout=10
            ).stdout
        except Exception:
            time.sleep(0.2)
            continue
        for block in dump.split("\n\n"):
            if "Executor task launch" not in block:
                continue
            lines = [
                l.strip() for l in block.splitlines() if l.strip().startswith("at ")
            ]
            if not lines:
                continue
            # topmost 1 frame + first non-jdk frame
            top = lines[0][3:]
            interesting = next(
                (
                    l[3:]
                    for l in lines
                    if "org.apache.spark" in l or "feldera" in l
                ),
                top,
            )
            hist[(top.split("(")[0], interesting.split("(")[0])] += 1
        time.sleep(0.15)


t = threading.Thread(target=sampler, daemon=True)
t.start()

stream = (
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
)
t0 = time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
p.barrier()
el = time.perf_counter() - t0
stop.set()
t.join(timeout=5)
print(f"== total {el:.2f}s")
print("top sampled (top_frame | first_spark_frame) counts:")
for (topf, sparkf), n in hist.most_common(30):
    print(f"  {n:5d}  {topf}  ||  {sparkf}")
