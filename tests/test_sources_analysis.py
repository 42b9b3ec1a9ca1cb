"""Datagen source, Debezium CDC decode, chain aggregates, mutual
recursion, and unbounded-state detection."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feldera_spark.operators.recursion import fixpoint_group
from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.sources.changes import decode_debezium
from feldera_spark.sources.datagen import ColumnSpec, datagen, datagen_chunks
from feldera_spark.streaming.analysis import find_unbounded_state
from feldera_spark.streaming.incremental import AppendOnlyAggregateView
from feldera_spark.zset import WEIGHT

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def test_datagen_deterministic_and_distributed(spark):
    cols = {
        "id": ColumnSpec.sequence(),
        "bucket": ColumnSpec.uniform_long(0, 10, salt="b"),
        "kind": ColumnSpec.choice(["a", "b", "c"]),
        "ts": ColumnSpec.timestamp_seq("2024-01-01 00:00:00", 60),
    }
    a = datagen(spark, 1000, cols).collect()
    b = datagen(spark, 1000, cols).collect()
    assert a == b  # bit-identical on re-run
    assert len(a) == 1000
    buckets = {r["bucket"] for r in a}
    assert buckets <= set(range(10)) and len(buckets) == 10
    # chunked replay concatenates to the same dataset
    chunks = list(datagen_chunks(spark, 1000, cols, chunk_rows=300))
    assert len(chunks) == 4
    cat = sorted(sum((c.collect() for c in chunks), []), key=lambda r: r["id"])
    assert cat == sorted(a, key=lambda r: r["id"])


def test_decode_debezium(spark):
    lines = [
        ('{"payload": {"op": "c", "before": null, "after": {"k": 1, "v": "a"}}}',),
        ('{"payload": {"op": "r", "before": null, "after": {"k": 2, "v": "b"}}}',),
        ('{"payload": {"op": "u", "before": {"k": 1, "v": "a"}, "after": {"k": 1, "v": "z"}}}',),
        ('{"payload": {"op": "d", "before": {"k": 2, "v": "b"}, "after": null}}',),
    ]
    raw = spark.createDataFrame(lines, ["value"])
    got = sorted(
        (r["k"], r["v"], r[WEIGHT]) for r in decode_debezium(raw, SCHEMA).collect()
    )
    assert got == [
        (1, "a", -1),  # update retracts before
        (1, "a", 1),   # create
        (1, "z", 1),   # update inserts after
        (2, "b", -1),  # delete retracts
        (2, "b", 1),   # snapshot read
    ]
    from feldera_spark import zset

    final = sorted(
        (r["k"], r["v"]) for r in zset.integrate(decode_debezium(raw, SCHEMA)).collect()
    )
    assert final == [(1, "z")]


def test_chain_aggregate_matches_batch(spark):
    """Append-only MIN/MAX/SUM/COUNT: 3 chunks, result == batch recompute."""
    cols = {
        "g": ColumnSpec.uniform_long(0, 5, salt="g"),
        "x": ColumnSpec.uniform_long(0, 1000, salt="x"),
    }
    view = AppendOnlyAggregateView(
        keys=["g"],
        aggs={
            "n": ("count", "x"),
            "total": ("sum", "x"),
            "lo": ("min", "x"),
            "hi": ("max", "x"),
        },
    )
    for chunk in datagen_chunks(spark, 600, cols, chunk_rows=200):
        out_delta = view.step(chunk)
        assert WEIGHT in out_delta.columns
    full = datagen(spark, 600, cols)
    expect = sorted(
        full.groupBy("g")
        .agg(
            F.count("x").alias("n"),
            F.sum("x").alias("total"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
        .collect()
    )
    got = sorted(view.materialized().collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in expect]
    # O(1) state per key: exactly one state row per group
    assert view.state.count() == 5


def test_fixpoint_group_even_odd(spark):
    """Mutual recursion: even/odd reachability on a path graph 0→1→…→9."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["src", "dst"]
    ).localCheckpoint()
    even_seed = spark.createDataFrame([(0,)], ["n"])
    odd_seed = even_seed.limit(0)

    def step_even(acc):
        return acc["odd"].join(edges, acc["odd"].n == edges.src).select(
            edges.dst.alias("n")
        )

    def step_odd(acc):
        return acc["even"].join(edges, acc["even"].n == edges.src).select(
            edges.dst.alias("n")
        )

    result = fixpoint_group(
        {"even": even_seed, "odd": odd_seed},
        {"even": step_even, "odd": step_odd},
    )
    assert sorted(r["n"] for r in result["even"].collect()) == [0, 2, 4, 6, 8]
    assert sorted(r["n"] for r in result["odd"].collect()) == [1, 3, 5, 7, 9]


def test_find_unbounded_state(spark):
    ddl = """
    CREATE TABLE clicks (ts TIMESTAMP LATENESS INTERVAL 1 HOUR, uid BIGINT);
    CREATE TABLE users (uid BIGINT, name VARCHAR);
    CREATE VIEW bounded_agg AS SELECT uid, count(*) AS n FROM clicks GROUP BY uid;
    CREATE VIEW unbounded_join AS SELECT u.name FROM users u JOIN users v ON u.uid = v.uid;
    CREATE VIEW ok_join AS SELECT c.uid FROM clicks c JOIN users u ON c.uid = u.uid;
    CREATE VIEW plain AS SELECT name FROM users
    """
    b = PipelineBuilder(spark).sql(ddl)
    warnings = find_unbounded_state(b)
    flagged = {w.view for w in warnings}
    assert flagged == {"unbounded_join"}
    assert "join" in warnings[0].operator


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tables join with ZERO shuffles — the 100 TB recurring-
    join strategy (hash-place once, join forever)."""
    from feldera_spark.plans import count_exchanges, explain_formatted
    from feldera_spark.sources.bucketing import bucketed_join, write_bucketed

    orders = spark.range(0, 1000).selectExpr(
        "id AS o_key", "id % 7 AS o_flag", "CAST(id * 1.5 AS DOUBLE) AS total"
    )
    items = spark.range(0, 3000).selectExpr(
        "id % 1000 AS o_key", "id AS line_id", "CAST(id AS DOUBLE) AS qty"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    write_bucketed(orders, "b_orders", ["o_key"], n_buckets=4)
    write_bucketed(items, "b_items", ["o_key"], n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (at 100 TB neither side broadcasts —
        # that's exactly the case bucketing exists for)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "b_orders", "b_items", on=["o_key"])
        plan = explain_formatted(j)
        assert "SortMergeJoin" in plan
        assert count_exchanges(j) == 0  # no shuffle on either side
        assert j.count() == 3000
        # and an aggregation keyed on the bucket column needs no exchange
        agg = spark.table("b_items").groupBy("o_key").count()
        assert count_exchanges(agg) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
