import os, sys, tempfile, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from feldera_spark.session import get_spark
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid
from feldera_spark.streaming import stepper

bid = _bid(spark, sf_dir).select("event_id","bidder","auction","price","date_time")
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

log = []
# time flush
orig_flush = stepper._StepBatch.flush
def timed_flush(self):
    t0 = time.perf_counter(); orig_flush(self); log.append(("flush", time.perf_counter()-t0))
stepper._StepBatch.flush = timed_flush

# time IncrementalAggregateView phases
from feldera_spark.streaming import incremental as inc
orig_step = inc.IncrementalAggregateView.step
import feldera_spark.zset as zset
from feldera_spark.streaming.incremental import prepared_keys
def fine_step(self, delta):
    t0=time.perf_counter()
    delta = zset.lift(delta)
    self.integral.append(delta); t1=time.perf_counter()
    touched = delta.select(*self.keys)
    kd = prepared_keys(touched, self.keys); t2=time.perf_counter()
    affected = self.integral.read_for_keys(touched, self.keys, prepared=kd); t3=time.perf_counter()
    new_groups = zset.lift(self.agg_fn(affected)); t4=time.perf_counter()
    if self.output.empty:
        out_delta = zset.consolidate(new_groups)
    else:
        old_groups = self.output.read_for_keys(touched, self.keys, prepared=kd)
        out_delta = zset.consolidate(zset.minus(new_groups, old_groups))
    t5=time.perf_counter()
    r = self.output.append(out_delta); t6=time.perf_counter()
    log.append(("agg: int.append",t1-t0)); log.append(("agg: prep_keys",t2-t1))
    log.append(("agg: read_keys",t3-t2)); log.append(("agg: aggfn",t4-t3))
    log.append(("agg: old/minus",t5-t4)); log.append(("agg: out.append",t6-t5))
    return r
import functools
# keep step_scoped wrapper behavior: original step is decorated; call fine under a scope
from feldera_spark.streaming.stepper import step_scope
def wrapped(self, delta):
    with step_scope():
        return fine_step(self, delta)
inc.IncrementalAggregateView.step = wrapped

# time join step
orig_jstep = inc.IncrementalJoinView.step
def timed_jstep(self, a, b_):
    t0=time.perf_counter(); r = orig_jstep(self, a, b_); log.append(("join.step", time.perf_counter()-t0)); return r
inc.IncrementalJoinView.step = timed_jstep

orig_ss = p._stream_step
def traced(decl, spine, df):
    t0=time.perf_counter(); orig_ss(decl, spine, df); log.append(("STEP_TOTAL", time.perf_counter()-t0)); log.append(("---",0))
p._stream_step = traced

stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(src))
t0=time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
el = time.perf_counter()-t0
print(f"\n== total {el:.2f}s = {int(2000000/el):,} ev/s")
for k,v in log:
    print(f"  {k:18s} {v*1000:8.1f}" if k!='---' else "  ---")
