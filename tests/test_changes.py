"""insert_delete envelope codec + differentiate."""

from __future__ import annotations

from pyspark.sql import types as T

from feldera_spark import zset
from feldera_spark.sources.changes import decode_insert_delete, encode_insert_delete
from feldera_spark.zset import WEIGHT

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def test_decode_insert_delete(spark):
    lines = [
        ('{"insert": {"k": 1, "v": "a"}}',),
        ('{"insert": {"k": 2, "v": "b"}}',),
        ('{"delete": {"k": 1, "v": "a"}}',),
        ('{"bogus": 1}',),
    ]
    raw = spark.createDataFrame(lines, ["value"])
    changes = decode_insert_delete(raw, SCHEMA)
    got = sorted((r["k"], r["v"], r[WEIGHT]) for r in changes.collect())
    assert got == [(1, "a", -1), (1, "a", 1), (2, "b", 1)]
    # integral nets to just k=2
    final = zset.integrate(changes)
    assert [(r["k"], r["v"]) for r in final.collect()] == [(2, "b")]


def test_encode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", 2), (2, "b", -1)], ["k", "v", WEIGHT]
    )
    encoded = encode_insert_delete(df)
    lines = sorted(r["value"] for r in encoded.collect())
    assert lines == [
        '{"delete":{"k":2,"v":"b"}}',
        '{"insert":{"k":1,"v":"a"}}',
        '{"insert":{"k":1,"v":"a"}}',
    ]
    decoded = decode_insert_delete(encoded, SCHEMA)
    assert sorted(
        (r["k"], r["v"], r[WEIGHT]) for r in zset.consolidate(decoded).collect()
    ) == [(1, "a", 2), (2, "b", -1)]


def test_differentiate_snapshots(spark):
    prev = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    cur = spark.createDataFrame([(2, "b"), (3, "c")], ["k", "v"])
    delta = zset.differentiate(cur, prev)
    got = sorted((r["k"], r["v"], r[WEIGHT]) for r in delta.collect())
    assert got == [(1, "a", -1), (3, "c", 1)]
