"""cProfile steps 2..4 of the nx04 shape: count py4j round trips
(GatewayClient.send_command) and top cumulative call sites per step."""
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
work = tempfile.mkdtemp(prefix="profc4_")
src = f"{work}/bid"
bid.repartition(32).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

prog = (
    "CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT,"
    " price DOUBLE, date_time TIMESTAMP) WITH ('append_only'='true');"
    "CREATE TABLE category (auction BIGINT, category BIGINT) WITH ('append_only'='true');"
    "CREATE LOCAL VIEW joined AS SELECT c.category, b.price"
    "  FROM bid b JOIN category c ON b.auction = c.auction;"
    "CREATE LOCAL VIEW catmax AS SELECT category, MAX(price) AS final"
    "  FROM joined GROUP BY category;"
    "CREATE MATERIALIZED VIEW avg_cat AS SELECT category,"
    "  AVG(final) AS avg_final FROM catmax GROUP BY category"
)
b = PipelineBuilder(spark).sql(prog)
b.connect_table("bid", bid.limit(0))
cat = (
    spark.read.parquet(src).select("auction").distinct()
    .withColumn("category", F.col("auction") % 10)
)
b.connect_table("category", cat)
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
ps = pstats.Stats(prof, stream=s)
ps.sort_stats("cumulative").print_stats(40)
out = s.getvalue()
print(out)
# count py4j round trips over the 3 profiled steps
for line in out.splitlines():
    if "send_command" in line or "_with_origin" in line or "getActiveSession" in line:
        print("RT:", line)
