"""Z-set algebra unit tests (reference semantics: zset.rs)."""

from __future__ import annotations

from feldera_spark import zset


def _zs(spark, rows):
    return spark.createDataFrame(rows, ["k", "__weight"])


def _collect(df):
    return sorted((r["k"], r["__weight"]) for r in df.collect())


def test_consolidate_merges_and_drops_zero(spark):
    z = _zs(spark, [("a", 1), ("a", 2), ("b", 1), ("b", -1), ("c", -2)])
    assert _collect(zset.consolidate(z)) == [("a", 3), ("c", -2)]


def test_distinct_normalizes_positive_weights(spark):
    z = _zs(spark, [("a", 5), ("b", -1), ("c", 1), ("c", -1)])
    assert _collect(zset.distinct(z)) == [("a", 1)]


def test_neg_plus_cancel(spark):
    z = _zs(spark, [("a", 2), ("b", 1)])
    assert zset.is_zero(zset.plus(z, zset.neg(z)))


def test_integrate_sequence(spark):
    d1 = _zs(spark, [("a", 1)])
    d2 = _zs(spark, [("a", 1), ("b", 1)])
    d3 = _zs(spark, [("a", -2)])
    assert _collect(zset.integrate(d1, d2, d3)) == [("b", 1)]


def test_to_bag_replicates(spark):
    z = _zs(spark, [("a", 3), ("b", 1)])
    rows = sorted(r.k for r in zset.to_bag(z).collect())
    assert rows == ["a", "a", "a", "b"]


def test_from_bag_roundtrip(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    assert _collect(zset.from_bag(df)) == [("a", 2), ("b", 1)]
