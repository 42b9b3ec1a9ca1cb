"""Streaming semantics: lateness drop, emit_final, and the Structured
Streaming runner (readStream → foreachBatch → incremental views).

Shapes mirror the reference's LatenessTests/StreamingTests
(sql-to-dbsp-compiler .../sql/streaming/)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from feldera_spark.streaming.incremental import IncrementalAggregateView, wcount
from feldera_spark.streaming.runner import StreamingPipeline
from feldera_spark.streaming.watermark import Waterline, emit_final
from feldera_spark.zset import WEIGHT

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _chunk(spark, rows):
    return spark.createDataFrame(
        [(x, _ts(m)) for x, m in rows], ["x", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_waterline_drops_late_rows(spark):
    """LATENESS 1 HOUR: rows older than max(ts)-1h from PRIOR chunks drop."""
    wl = Waterline("ts", lateness_seconds=3600)
    c1 = _chunk(spark, [(1, 0), (2, 120)])          # max_ts = +120min
    kept1 = wl.step(c1)
    assert kept1.count() == 2                        # first chunk: nothing late
    # waterline is now +60min: a +30min row is late, +90min is fine
    c2 = _chunk(spark, [(3, 30), (4, 90), (5, 200)])
    kept2 = wl.step(c2)
    assert sorted(r["x"] for r in kept2.collect()) == [4, 5]
    # out-of-order WITHIN lateness always survives
    c3 = _chunk(spark, [(6, 150)])
    assert wl.step(c3).count() == 1


def test_emit_final_only_closed_windows(spark):
    wl = Waterline("ts", lateness_seconds=0)
    data = _chunk(spark, [(1, 10), (2, 70), (3, 130)])
    wl.observe(data)                                 # waterline = +130min
    windows = (
        data.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.end").alias("w_end"), "n")
    )
    final = emit_final(windows, "w_end", wl)
    # windows ending at +60 and +120 are closed; +180 is still open
    assert sorted(r["n"] for r in final.collect()) == [1, 1]


def test_streaming_runner_file_source(spark):
    """readStream over a directory of parquet chunks → foreachBatch →
    incremental aggregate; final state == batch recomputation."""
    src = tempfile.mkdtemp(prefix="fs_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="fs_stream_ckpt_")
    try:
        all_rows = [(i, "k" + str(i % 3), i * 1.0) for i in range(100)]
        for part in range(4):
            chunk = [r for r in all_rows if r[0] % 4 == part]
            spark.createDataFrame(chunk, ["id", "k", "v"]).write.mode(
                "append"
            ).parquet(src)

        view = IncrementalAggregateView(
            keys=["k"],
            agg_fn=lambda df: df.groupBy("k").agg(
                wcount().alias("n"),
                F.sum(F.col("v") * F.col(WEIGHT)).alias("total"),
            ),
        )
        pipe = StreamingPipeline(
            views=[("agg", lambda delta: view.step(delta))]
        )
        stream = (
            spark.readStream.schema("id BIGINT, k STRING, v DOUBLE")
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        q = pipe.start(stream, checkpoint_dir=ckpt)
        q.awaitTermination(120)
        assert pipe.batches_seen >= 1

        got = sorted(map(tuple, view.materialized().collect()))
        want = sorted(
            map(
                tuple,
                spark.createDataFrame(all_rows, ["id", "k", "v"])
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
                .collect(),
            )
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
