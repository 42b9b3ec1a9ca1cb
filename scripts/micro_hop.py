import os, sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from feldera_spark.session import get_spark
spark = get_spark(cpus=32)
from feldera_spark.queries.nexmark import _bid
bid = _bid(spark, "/root/testdata/sf0.1").select("event_id","bidder","auction","price","date_time")
base_n = bid.count()
reps = max(1, 500000 // max(base_n,1))
shift = spark.range(reps).select(F.col("id").alias("__rep"))
bid = (bid.crossJoin(F.broadcast(shift))
       .withColumn("event_id", F.col("event_id")+F.col("__rep")*base_n*2).drop("__rep"))
bid = bid.localCheckpoint(eager=True)   # pin 500k rows like one micro-batch
print("rows:", bid.count())

def t(name, df):
    df.count()  # warm
    t0=time.perf_counter(); n=df.count(); el=time.perf_counter()-t0
    print(f"{name}: {el*1000:.0f} ms ({n} rows)")

# current shape: explode 4 hop windows then aggregate
hop = (bid.select(F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
                  "auction", "date_time")
       .withColumn("window_start",
                   F.timestamp_seconds((F.floor(F.unix_timestamp("date_time")/900) - F.col("i"))*900))
       .groupBy("window_start","auction").agg(F.count("*").alias("num")))
t("explode-then-agg", hop)

# pane shape: aggregate per 15-min pane first, then explode panes
pane = (bid.withColumn("pane", F.timestamp_seconds(F.floor(F.unix_timestamp("date_time")/900)*900))
        .groupBy("pane","auction").agg(F.count("*").alias("pn")))
hop2 = (pane.select(F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"), "pane","auction","pn")
        .withColumn("window_start", F.timestamp_seconds(F.unix_timestamp("pane") - F.col("i")*900))
        .groupBy("window_start","auction").agg(F.sum("pn").alias("num")))
t("pane-then-agg", hop2)
