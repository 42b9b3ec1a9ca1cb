#!/usr/bin/env python3
"""Micro-benchmark: direct _merged_aug_plan construction vs template
rebind, on a representative linear-agg shape. Prints per-call ms for
(a) direct python build, (b) tpl.bind (rebind path), and (c) the
execution wall of each result to catch plan-quality regressions."""
import time

from pyspark.sql import functions as F

from feldera_spark.session import get_spark

spark = get_spark(app_name="micro_template")
spark.sparkContext.setLogLevel("ERROR")

from feldera_spark import zset
from feldera_spark.streaming.incremental import (
    IncrementalLinearAggregateView,
    _merged_aug_plan,
    _templated_aug,
    wcount,
    wsum,
)

v = IncrementalLinearAggregateView(
    keys=["k"], sums={"total": wsum("x"), "cnt": wcount()}
)


def mk(lo, hi):
    return zset.lift(
        spark.range(lo, hi).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("x")
        )
    )


v.step(mk(0, 100000))
v.step(mk(100000, 200000))

d = mk(200000, 250000)

for _ in range(5):
    t0 = time.perf_counter()
    aug_direct = _merged_aug_plan(v, d, v.state, False)
    print(f"direct build: {(time.perf_counter()-t0)*1000:.1f} ms")

for i in range(6):
    t0 = time.perf_counter()
    aug_tpl = _templated_aug(v, d, False)
    print(f"bind call {i}: {(time.perf_counter()-t0)*1000:.1f} ms")

for name, frame in (("direct", aug_direct), ("tpl", aug_tpl)):
    for _ in range(3):
        t0 = time.perf_counter()
        n = frame.count()
        print(f"exec {name}: {(time.perf_counter()-t0)*1000:.1f} ms ({n} rows)")

print("--- explain tpl ---")
aug_tpl.explain("formatted")
