"""cProfile steps 2..4 of the nx05 shape (driver-phase decomposition:
py4j-blocking calls vs local planning) without replacing any engine
code — wraps only p._stream_step for step boundaries."""
import cProfile
import io
import os
import pstats
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
work = tempfile.mkdtemp(prefix="profc_")
src = f"{work}/bid"
bid.repartition(32).write.mode("overwrite").parquet(src)
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

prof = cProfile.Profile()
state = {"n": 0}
orig = p._stream_step


def timed(decl, spine, df):
    state["n"] += 1
    t0 = time.perf_counter()
    if state["n"] >= 2:
        prof.enable()
        orig(decl, spine, df)
        prof.disable()
    else:
        orig(decl, spine, df)
    print(f"# step {state['n']}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)


p._stream_step = timed
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 8)
    .parquet(src)
)
t0 = time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
p.barrier()
el = time.perf_counter() - t0
print(f"== total {el:.2f}s = {int(2000000 / el):,} ev/s")
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(32)
print(s.getvalue())
