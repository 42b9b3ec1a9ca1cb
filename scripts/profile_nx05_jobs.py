import os, sys, tempfile, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from feldera_spark.session import get_spark
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sc = spark.sparkContext
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

# log every job via SparkListener-ish polling: wrap runJob? easier: JobProgressListener via statusTracker after the fact
phase = {"cur": "init"}
import threading
jobs_log = []
class Poller(threading.Thread):
    daemon = True
    def run(self):
        st = sc.statusTracker()
        seen = set()
        while True:
            for jid in st.getActiveJobsIds():
                if jid not in seen:
                    seen.add(jid)
                    jobs_log.append((jid, phase["cur"]))
            time.sleep(0.002)
Poller().start()

from feldera_spark.streaming import incremental as inc
import feldera_spark.zset as zset
from feldera_spark.streaming.incremental import prepared_keys
from feldera_spark.streaming.stepper import step_scope
def fine_step(self, delta):
    delta = zset.lift(delta)
    phase["cur"]="agg:int.append"; self.integral.append(delta)
    phase["cur"]="agg:prep"; touched = delta.select(*self.keys); kd = prepared_keys(touched, self.keys)
    phase["cur"]="agg:read"; affected = self.integral.read_for_keys(touched, self.keys, prepared=kd)
    phase["cur"]="agg:aggfn"; new_groups = zset.lift(self.agg_fn(affected))
    phase["cur"]="agg:minus"
    if self.output.empty:
        out_delta = zset.consolidate(new_groups)
    else:
        old_groups = self.output.read_for_keys(touched, self.keys, prepared=kd)
        out_delta = zset.consolidate(zset.minus(new_groups, old_groups))
    phase["cur"]="agg:out.append"; r = self.output.append(out_delta)
    phase["cur"]="agg:done"
    return r
def wrapped(self, delta):
    with step_scope():
        return fine_step(self, delta)
inc.IncrementalAggregateView.step = wrapped
orig_jstep = inc.IncrementalJoinView.step
def timed_jstep(self, a, b_):
    phase["cur"]="join.step"; r = orig_jstep(self, a, b_); phase["cur"]="join.done"; return r
inc.IncrementalJoinView.step = timed_jstep
orig_flush = stepper._StepBatch.flush
def timed_flush(self):
    old=phase["cur"]; phase["cur"]="flush"; orig_flush(self); phase["cur"]=old
stepper._StepBatch.flush = timed_flush
orig_lin = inc.IncrementalLinearAggregateView.step
def timed_lin(self, delta):
    phase["cur"]="linear.step"; r = orig_lin(self, delta); phase["cur"]="linear.done"; return r
inc.IncrementalLinearAggregateView.step = timed_lin

stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(src))
t0=time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
el = time.perf_counter()-t0
time.sleep(0.3)
print(f"\n== total {el:.2f}s = {int(2000000/el):,} ev/s")
from collections import Counter
c = Counter(ph for _, ph in jobs_log)
for ph, n in c.most_common():
    print(f"  {ph:16s} jobs={n}  (~{n//4}/step)")
print("total jobs:", len(jobs_log))
