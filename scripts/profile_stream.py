"""Profile a streaming bench shape: jobs per micro-batch step + per-view
step wall time. Usage: python scripts/profile_stream.py [nx05|nx04|nx01|chain]"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feldera_spark.session import get_spark  # noqa: E402

shape = sys.argv[1] if len(sys.argv) > 1 else "nx05"
n_batches = 4
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from feldera_spark.pipeline import PipelineBuilder  # noqa: E402
from feldera_spark.queries.nexmark import _bid  # noqa: E402

bid = _bid(spark, sf_dir).select(
    "event_id", "bidder", "auction", "price", "date_time"
)
target = int(os.environ.get("SPARK_GRAFT_STREAM_EVENTS", "2000000"))
base_n = bid.count()
reps = max(1, target // max(base_n, 1))
if reps > 1:
    shift = spark.range(reps).select(F.col("id").alias("__rep"))
    bid = (
        bid.crossJoin(F.broadcast(shift))
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * base_n * 2)
        .drop("__rep")
    )
work = tempfile.mkdtemp(prefix="prof_stream_")
src = f"{work}/bid"
files_per_batch = 8
import time as _time
with_us = bid.withColumn("__us", F.unix_micros(F.col("date_time").cast("timestamp")))
bounds = with_us.approxQuantile("__us", [i / n_batches for i in range(1, n_batches)], 0.001)
lo = None
for i in range(n_batches):
    hi = bounds[i] if i < n_batches - 1 else None
    part = with_us
    if lo is not None:
        part = part.filter(F.col("__us") > lo)
    if hi is not None:
        part = part.filter(F.col("__us") <= hi)
    part.drop("__us").repartition(files_per_batch).write.mode("append").parquet(src)
    lo = hi
    _time.sleep(1.1)
schema = spark.read.parquet(src).schema

bid_ddl = (
    "CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT,"
    " price DOUBLE, date_time TIMESTAMP) WITH ('append_only'='true');"
)
programs = {
    "nx01": bid_ddl
    + "CREATE MATERIALIZED VIEW conv AS SELECT auction, bidder,"
    "  price * 0.908 AS price_eur, date_time FROM bid",
    "nx05": bid_ddl
    + "CREATE LOCAL VIEW counts AS SELECT window_start, auction,"
    "  COUNT(*) AS num FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time),"
    "  INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    "  GROUP BY window_start, auction;"
    "CREATE LOCAL VIEW maxes AS SELECT window_start, MAX(num) AS maxn"
    "  FROM counts GROUP BY window_start;"
    "CREATE MATERIALIZED VIEW hot AS SELECT c.window_start, c.auction,"
    "  c.num FROM counts c JOIN maxes m"
    "  ON c.window_start = m.window_start WHERE c.num >= m.maxn",
    "nx04": bid_ddl
    + "CREATE TABLE category (auction BIGINT, category BIGINT) WITH ('append_only'='true');"
    "CREATE LOCAL VIEW joined AS SELECT c.category, b.price"
    "  FROM bid b JOIN category c ON b.auction = c.auction;"
    "CREATE LOCAL VIEW catmax AS SELECT category, MAX(price) AS final"
    "  FROM joined GROUP BY category;"
    "CREATE MATERIALIZED VIEW avg_cat AS SELECT category,"
    "  AVG(final) AS avg_final FROM catmax GROUP BY category",
    "chain": bid_ddl
    + "CREATE LOCAL VIEW v1 AS SELECT auction, bidder, price * 0.908 AS"
    "  price_eur FROM bid WHERE price > 1;"
    "CREATE LOCAL VIEW v2 AS SELECT auction, price_eur FROM v1"
    "  WHERE price_eur > 2;"
    "CREATE LOCAL VIEW v3 AS SELECT auction, COUNT(*) AS n,"
    "  SUM(price_eur) AS total FROM v2 GROUP BY auction;"
    "CREATE MATERIALIZED VIEW v4 AS SELECT auction, total / n AS avg_eur"
    "  FROM v3",
}
prog = programs[shape]
b = PipelineBuilder(spark).sql(prog)
b.connect_table("bid", bid.limit(0))
if "category" in prog:
    cat = (
        spark.read.parquet(src).select("auction").distinct()
        .withColumn("category", F.col("auction") % 10)
    )
    b.connect_table("category", cat)
p = b.create()

# instrument per-view step timing
timings = []
for name, plan in p._ivm.items():
    orig = plan.step

    def wrap(orig=orig, name=name):
        def stepped(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            timings.append((name, "step", time.perf_counter() - t0))
            return out
        return stepped

    plan.step = wrap()

# instrument the whole _stream_step + job ids
st = spark.sparkContext.statusTracker()
orig_ss = p._stream_step

def traced_ss(decl, spine, df):
    j0 = set(st.getJobIdsForGroup() or [])
    allj0 = st.getActiveJobsIds()
    t0 = time.perf_counter()
    jobs_before = st.getJobIdsForGroup(None)
    orig_ss(decl, spine, df)
    el = time.perf_counter() - t0
    jobs_after = st.getJobIdsForGroup(None)
    nj = len(set(jobs_after or []) - set(jobs_before or []))
    timings.append(("<stream_step>", f"jobs={nj}", el))

p._stream_step = traced_ss

stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", files_per_batch)
    .parquet(src)
)
t0 = time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
el = time.perf_counter() - t0
n_events = spark.read.parquet(src).count()
print(f"\n== {shape}: {n_events} events, {n_batches} batches, {el:.3f}s "
      f"= {int(n_events/el):,} events/s")
for name, kind, t in timings:
    print(f"  {name:16s} {kind:10s} {t*1000:8.1f} ms")
