#!/usr/bin/env python3
"""Decompose the nx05 commit job: record each flush's wall window, then
attribute completed Spark stages (name, tasks, executorRunTime, input/
shuffle volumes) to the window. Answers: is the >1s commit real executor
work, stage-serialization latency, or state-sized rematerialization?"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from feldera_spark.session import get_spark

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid
from feldera_spark.streaming import stepper

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
work = tempfile.mkdtemp(prefix="profcommit_")
src = f"{work}/bid"
with_us = bid.withColumn("__us", F.unix_micros(F.col("date_time").cast("timestamp")))
bounds = with_us.approxQuantile("__us", [i / 4 for i in range(1, 4)], 0.001)
lo = None
for i in range(4):
    hi = bounds[i] if i < 3 else None
    part = with_us
    if lo is not None:
        part = part.filter(F.col("__us") > lo)
    if hi is not None:
        part = part.filter(F.col("__us") <= hi)
    part.drop("__us").repartition(8).write.mode("append").parquet(src)
    lo = hi
    time.sleep(1.1)
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

flush_windows = []
orig_flush = stepper._StepBatch.flush


def traced_flush(self):
    t0 = time.time()
    orig_flush(self)
    flush_windows.append((t0, time.time()))


stepper._StepBatch.flush = traced_flush

step_windows = []
orig_ss = p._stream_step


def traced(decl, spine, df):
    t0 = time.time()
    orig_ss(decl, spine, df)
    step_windows.append((t0, time.time()))


p._stream_step = traced

stream = (
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(src)
)
t0 = time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
p.barrier()
el = time.perf_counter() - t0
print(f"== total {el:.2f}s = {int(2000000 / el):,} ev/s")

print(f"flush_windows={len(flush_windows)} step_windows={len(step_windows)}")
store = spark._jsc.sc().statusStore()
jvm = spark._jvm
stages = store.stageList(
    jvm.java.util.ArrayList(),
    False,
    False,
    spark.sparkContext._gateway.new_array(jvm.double, 0),
    jvm.java.util.ArrayList(),
)
rows = []
for i in range(stages.size()):
    s = stages.apply(i)
    try:
        sub = s.submissionTime().get().getTime() / 1000.0
        comp = s.completionTime().get().getTime() / 1000.0
    except Exception:
        continue
    rows.append(
        {
            "id": s.stageId(),
            "name": s.name().split("\n")[0][:70],
            "sub": sub,
            "comp": comp,
            "tasks": s.numCompleteTasks(),
            "runtime_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "deser_ms": s.executorDeserializeTime(),
            "gc_ms": s.jvmGcTime(),
            "input_mb": round(s.inputBytes() / 1e6, 1),
            "sh_read_mb": round(s.shuffleReadBytes() / 1e6, 1),
            "sh_write_mb": round(s.shuffleWriteBytes() / 1e6, 1),
            "out_rows": s.outputRecords(),
            "in_rows": s.inputRecords(),
        }
    )

for wi, (ws, we) in enumerate(flush_windows):
    print(f"\n--- flush {wi}: wall {we - ws:.3f}s ---")
    tot = 0
    for r in sorted(rows, key=lambda r: r["sub"]):
        if r["comp"] >= ws - 0.01 and r["sub"] <= we + 0.01:
            overlap = min(r["comp"], we) - max(r["sub"], ws)
            if overlap <= 0:
                continue
            tot += r["runtime_ms"]
            print(
                f"  st{r['id']:4d} wall[{r['sub']-ws:6.2f},{r['comp']-ws:6.2f}]"
                f" tasks {r['tasks']:3d} exec {r['runtime_ms']:6d}ms"
                f" cpu {r['cpu_ms']:6d} deser {r['deser_ms']:5d}"
                f" gc {r['gc_ms']:4d}"
                f" in {r['input_mb']:6.1f}MB shr {r['sh_read_mb']:5.1f}"
                f" inrows {r['in_rows']:7d}  {r['name'][:40]}"
            )
    print(f"  total executor runtime in window: {tot}ms")
