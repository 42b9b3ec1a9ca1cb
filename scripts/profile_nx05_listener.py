import os, sys, tempfile, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from feldera_spark.session import get_spark
spark = get_spark(cpus=32)
sc = spark.sparkContext
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.queries.nexmark import _bid

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

prog = ("CREATE TABLE bid (event_id BIGINT, bidder BIGINT, auction BIGINT, price DOUBLE, date_time TIMESTAMP) WITH ('append_only'='true');"
 "CREATE LOCAL VIEW counts AS SELECT window_start, auction, COUNT(*) AS num FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time), INTERVAL '15' MINUTE, INTERVAL '1' HOUR)) GROUP BY window_start, auction;"
 "CREATE LOCAL VIEW maxes AS SELECT window_start, MAX(num) AS maxn FROM counts GROUP BY window_start;"
 "CREATE MATERIALIZED VIEW hot AS SELECT c.window_start, c.auction, c.num FROM counts c JOIN maxes m ON c.window_start = m.window_start WHERE c.num >= m.maxn")
b = PipelineBuilder(spark).sql(prog)
b.connect_table("bid", bid.limit(0))
p = b.create()

stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(src))
t0=time.perf_counter()
q = p.stream_table("bid", stream, checkpoint_dir=f"{work}/ckpt")
q.awaitTermination()
el = time.perf_counter()-t0
print(f"== total {el:.2f}s = {int(2000000/el):,} ev/s")
# dump completed stage info via JVM status store
st = sc.statusTracker()
rows = []
for sid in sorted(st.getJobIdsForGroup() or []):
    pass
# use python statusTracker stage info
for sid in range(0, 400):
    info = st.getStageInfo(sid)
    if info is None:
        continue
    rows.append((sid, (info.name or "").split("\n")[0][:90], info.numTasks, -1))
rows.sort()
for sid, name, nt, dur in rows:
    print(f"  stage {sid:4d} tasks={nt:4d} {dur:6d}ms  {name}")
