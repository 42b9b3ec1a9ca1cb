"""Waterline derivation through the view DAG (mini-MonotoneAnalyzer) —
transfer-rule unit tests mirror the reference's LatenessTests shapes;
the GC test proves state stays bounded by the derived bound."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from feldera_spark.functions import floor_ts
from feldera_spark.streaming.monotone import (
    FloorTo,
    GcBinding,
    GcDriver,
    MinOf,
    ShiftBy,
    SourceBound,
    WaterlineAnalyzer,
)
from feldera_spark.zset import WEIGHT

T0 = dt.datetime(2024, 1, 1)


def _an(**lateness):
    a = WaterlineAnalyzer()
    for name, secs in lateness.items():
        a.declare_source(name, secs)
    return a


def test_source_bound_is_max_minus_lateness():
    a = _an(s=600)
    assert a.bound(SourceBound("s")) is None
    a.observe("s", T0 + dt.timedelta(hours=1))
    assert a.bound(SourceBound("s")) == T0 + dt.timedelta(minutes=50)
    # monotone: an older max does not regress the bound
    a.observe("s", T0)
    assert a.bound(SourceBound("s")) == T0 + dt.timedelta(minutes=50)


def test_join_min_rule_and_unbounded_poison():
    a = _an(x=0, y=0)
    a.declare_view("j", MinOf((SourceBound("x"), SourceBound("y"))))
    a.observe("x", T0 + dt.timedelta(hours=2))
    # y never observed -> join unbounded (no GC possible)
    assert a.bound("j") is None
    a.observe("y", T0 + dt.timedelta(hours=1))
    assert a.bound("j") == T0 + dt.timedelta(hours=1)


def test_floor_and_shift_rules_compose():
    a = _an(s=0)
    a.observe("s", T0 + dt.timedelta(hours=25, minutes=30))
    day = 86400
    assert a.bound(FloorTo(SourceBound("s"), day)) == T0 + dt.timedelta(days=1)
    assert a.bound(ShiftBy(SourceBound("s"), -3600)) == T0 + dt.timedelta(
        hours=24, minutes=30
    )
    # view-name indirection: agg over a shifted view
    a.declare_view("shifted", ShiftBy(SourceBound("s"), -3600))
    a.declare_view("agg", FloorTo("shifted", day))
    assert a.bound("agg") == T0 + dt.timedelta(days=1)


def test_gc_driver_bounds_join_state(spark):
    """A time-ordered stream through an incremental join: after each step
    the GcDriver truncates the spines to the derived floor(min) bound, so
    live state is bounded by (lateness + chunk span), not stream length —
    and results are unchanged (the oracle-level check is i07)."""
    from feldera_spark.streaming.incremental import IncrementalJoinView

    analyzer = _an(a=3600, b=3600)
    node = FloorTo(MinOf((SourceBound("a"), SourceBound("b"))), 3600)
    jv = IncrementalJoinView(on=["k", "hour"])
    gc = GcDriver(analyzer)
    gc.bind(GcBinding(jv, ("a", "b"), "hour", node))

    def chunk(day_hours):
        rows = [
            (k, (T0 + dt.timedelta(hours=h)).replace(minute=k), h)
            for h in day_hours
            for k in range(3)
        ]
        return (
            spark.createDataFrame(rows, ["k", "ts", "h"])
            .select(
                "k",
                floor_ts(F.col("ts").cast("timestamp_ntz"), "hour").alias(
                    "hour"
                ),
                "h",
            )
            .withColumn(WEIGHT, F.lit(1).cast("long"))
        )

    total = 0
    for start in range(0, 24, 4):
        c = chunk(range(start, start + 4))
        total += c.count()
        jv.step(c, c.withColumnRenamed("h", "h2"))
        mx = T0 + dt.timedelta(hours=start + 3)
        analyzer.observe("a", mx)
        analyzer.observe("b", mx)
        gc.gc()

    live = sum(b.count() for b in jv.a.batches)
    # bound after the last step: floor(max - 1h lateness) = hour 22 →
    # only hours >= 22 retained (2 hours x 3 keys = 6 rows of 72)
    assert total == 72
    assert live <= 6, f"join state not GC'd: {live} rows live"
