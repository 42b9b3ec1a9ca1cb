"""Phase-level profile of the scale-probe chain shape: where does
per-step time go as state deepens over 16 micro-batches? Wraps the
table-spine append, each view's step, and the step-scope flush with
wall timers; prints a per-step phase table."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from feldera_spark.session import get_spark

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid
from feldera_spark.streaming import incremental as inc
from feldera_spark.streaming import stepper

n_batches = 16
target = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "8000000"))
bid = _bid(spark, sf_dir).select(
    "event_id", "bidder", "auction", "price", "date_time"
)
base_n = bid.count()
reps = max(1, target // max(base_n, 1))
if reps > 1:
    shift = spark.range(reps).select(F.col("id").alias("__rep"))
    bid = (
        bid.crossJoin(F.broadcast(shift))
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * base_n * 2)
        .drop("__rep")
    )
work = tempfile.mkdtemp(prefix="scaleprof_")
src = f"{work}/bid"
bid.repartition(n_batches * 4).write.mode("overwrite").parquet(src)
n_events = spark.read.parquet(src).count()
schema = spark.read.parquet(src).schema

b = PipelineBuilder(spark).sql(
    "CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT,"
    " price DOUBLE, date_time TIMESTAMP) WITH ('append_only'='true');"
    "CREATE LOCAL VIEW v1 AS SELECT auction, bidder, price * 0.908 AS"
    "  price_eur FROM bid WHERE price > 1;"
    "CREATE LOCAL VIEW v2 AS SELECT auction, price_eur FROM v1"
    "  WHERE price_eur > 2;"
    "CREATE LOCAL VIEW v3 AS SELECT auction, COUNT(*) AS n,"
    "  SUM(price_eur) AS total FROM v2 GROUP BY auction;"
    "CREATE MATERIALIZED VIEW v4 AS SELECT auction, total / n AS avg_eur"
    "  FROM v3"
)
b.connect_table("bid", bid.limit(0))
p = b.create()

# --- instrumentation ---------------------------------------------------
phases: list[dict] = []
cur: dict = {}

orig_append = inc.Spine.append


def timed_append(self, delta, **kw):
    t0 = time.perf_counter()
    r = orig_append(self, delta, **kw)
    cur["append"] = cur.get("append", 0.0) + time.perf_counter() - t0
    cur["append_n"] = cur.get("append_n", 0) + 1
    return r


inc.Spine.append = timed_append

orig_flush = stepper._StepBatch.flush


def timed_flush(self):
    t0 = time.perf_counter()
    orig_flush(self)
    cur["flush"] = cur.get("flush", 0.0) + time.perf_counter() - t0


stepper._StepBatch.flush = timed_flush

for vname, plan in p._ivm.items():
    orig_step = plan.step

    def mk(vn, os_):
        def timed(deltas):
            t0 = time.perf_counter()
            r = os_(deltas)
            cur[f"view:{vn}"] = time.perf_counter() - t0
            return r

        return timed

    plan.step = mk(vname, orig_step)

orig_stream = p._stream_step


def timed_step(decl, spine, df):
    global cur
    cur = {}
    jobs0 = sc._jsc.sc().statusStore().jobsList(None).size()
    t0 = time.perf_counter()
    orig_stream(decl, spine, df)
    cur["total"] = time.perf_counter() - t0
    cur["jobs"] = sc._jsc.sc().statusStore().jobsList(None).size() - jobs0
    phases.append(cur)


p._stream_step = timed_step

stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 4)
    .parquet(src)
)
t0 = time.perf_counter()
p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
for q in spark.streams.active:
    q.awaitTermination()
el = time.perf_counter() - t0
print(f"\n== total {el:.2f}s = {int(n_events / el):,} ev/s over {len(phases)} steps")
keys = sorted({k for ph in phases for k in ph if k not in ("append_n",)})
hdr = "step " + " ".join(f"{k:>10s}" for k in keys)
print(hdr)
for i, ph in enumerate(phases):
    print(
        f"{i:4d} "
        + " ".join(
            f"{ph.get(k, 0):10.3f}" if k != "jobs" else f"{ph.get(k, 0):10d}"
            for k in keys
        )
    )
q1 = phases[: len(phases) // 4]
q4 = phases[-len(phases) // 4 :]
for k in keys:
    if k == "jobs":
        continue
    a = sum(ph.get(k, 0) for ph in q1) / len(q1)
    b_ = sum(ph.get(k, 0) for ph in q4) / len(q4)
    print(f"{k:>14s}: firstQ {a:.3f}s lastQ {b_:.3f}s ratio {b_ / max(a, 1e-9):.2f}")
