import os, sys, tempfile, time, threading
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from feldera_spark.session import get_spark
spark = get_spark(cpus=32)
sc = spark.sparkContext
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid
from feldera_spark.streaming import stepper, incremental as inc
import feldera_spark.zset as zset
from feldera_spark.streaming.incremental import prepared_keys
from feldera_spark.streaming.stepper import step_scope

bid = _bid(spark, "/root/testdata/sf0.1").select("event_id","bidder","auction","price","date_time")
base_n = bid.count()
reps = max(1, 2000000 // max(base_n,1))
shift = spark.range(reps).select(F.col("id").alias("__rep"))
bid = (bid.crossJoin(F.broadcast(shift))
       .withColumn("event_id", F.col("event_id")+F.col("__rep")*base_n*2).drop("__rep"))
work = tempfile.mkdtemp(prefix="prof_")
src = f"{work}/bid"
bid.repartition(32).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

prog = ("CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT, price DOUBLE, date_time TIMESTAMP);"
 "CREATE LOCAL VIEW counts AS SELECT window_start, auction, COUNT(*) AS num FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time), INTERVAL '15' MINUTE, INTERVAL '1' HOUR)) GROUP BY window_start, auction;"
 "CREATE LOCAL VIEW maxes AS SELECT window_start, MAX(num) AS maxn FROM counts GROUP BY window_start;"
 "CREATE MATERIALIZED VIEW hot AS SELECT c.window_start, c.auction, c.num FROM counts c JOIN maxes m ON c.window_start = m.window_start WHERE c.num >= m.maxn")
b = PipelineBuilder(spark).sql(prog)
b.connect_table("bid", bid.limit(0))
p = b.create()

phase = {"cur": "init"}
events = []  # (phase, sub, dt)

def fine_step(self, delta):
    delta = zset.lift(delta)
    self.integral.append(delta)
    touched = delta.select(*self.keys)
    kd = prepared_keys(touched, self.keys)
    affected = self.integral.read_for_keys(touched, self.keys, prepared=kd)
    new_groups = zset.lift(self.agg_fn(affected))
    if self.output.empty:
        out_delta = zset.consolidate(new_groups)
    else:
        old_groups = self.output.read_for_keys(touched, self.keys, prepared=kd)
        out_delta = zset.consolidate(zset.minus(new_groups, old_groups))
    # decompose out.append: physical planning vs RDD construction
    t0=time.perf_counter()
    qe = out_delta._jdf.queryExecution()
    qe.executedPlan()
    t1=time.perf_counter()
    r = self.output.append(out_delta)
    t2=time.perf_counter()
    events.append(("maxes.planning", t1-t0))
    events.append(("maxes.append_after_plan", t2-t1))
    return r
def wrapped(self, delta):
    with step_scope():
        return fine_step(self, delta)
inc.IncrementalAggregateView.step = wrapped

orig_ss = p._stream_step
def traced(decl, spine, df):
    t0=time.perf_counter(); orig_ss(decl, spine, df)
    events.append(("STEP_TOTAL", time.perf_counter()-t0)); events.append(("---",0))
p._stream_step = traced

stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(src))
t0=time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
el = time.perf_counter()-t0
print(f"\n== total {el:.2f}s")
for k,v in events:
    print(f"  {k:26s} {v*1000:8.1f}" if k!='---' else "  ---")
