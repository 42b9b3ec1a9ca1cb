"""CREATE FUNCTION / CREATE TYPE / CREATE INDEX DDL and transactions."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from feldera_spark.pipeline import PipelineBuilder
from feldera_spark.streaming.incremental import IncrementalLinearAggregateView, wcount
from feldera_spark.streaming.runner import StreamingPipeline
from feldera_spark.zset import WEIGHT


def test_sql_bodied_function(spark):
    prog = """
    CREATE TABLE items (k BIGINT, price DOUBLE);
    CREATE FUNCTION with_tax(x DOUBLE) RETURNS DOUBLE AS x * 1.1;
    CREATE MATERIALIZED VIEW taxed AS
        SELECT k, with_tax(price) AS gross FROM items
    """
    b = PipelineBuilder(spark).sql(prog)
    assert b.functions["with_tax"].body.strip() == "x * 1.1"
    b.connect_table("items", spark.createDataFrame([(1, 100.0), (2, 50.0)], ["k", "price"]))
    p = b.create()
    got = sorted((r.k, round(r.gross, 6)) for r in p.view("taxed").collect())
    assert got == [(1, 110.0), (2, 55.0)]


def test_external_function_binding(spark):
    prog = """
    CREATE TABLE t (s VARCHAR);
    CREATE FUNCTION shout(s VARCHAR) RETURNS VARCHAR;
    CREATE MATERIALIZED VIEW v AS SELECT shout(s) AS s2 FROM t
    """
    b = PipelineBuilder(spark).sql(prog)
    b.implement_function("shout", lambda s: s.upper() + "!")
    b.connect_table("t", spark.createDataFrame([("hi",)], ["s"]))
    p = b.create()
    assert p.view("v").collect()[0]["s2"] == "HI!"


def test_create_type_and_index(spark):
    prog = """
    CREATE TABLE sales (cust BIGINT, region VARCHAR, amount DOUBLE);
    CREATE TYPE money_pair AS (gross DOUBLE, net DOUBLE);
    CREATE MATERIALIZED VIEW by_region AS
        SELECT region, sum(amount) AS total FROM sales GROUP BY region;
    CREATE INDEX region_idx ON by_region (region)
    """
    b = PipelineBuilder(spark).sql(prog)
    assert "money_pair" in b.types
    b.connect_table(
        "sales",
        spark.createDataFrame(
            [(1, "eu", 10.0), (2, "eu", 5.0), (3, "us", 7.0)],
            ["cust", "region", "amount"],
        ),
    )
    p = b.create()
    idx = p.index("region_idx")
    assert [(r.region, r.total) for r in idx.lookup("eu").collect()] == [("eu", 15.0)]
    assert idx.lookup("us").collect()[0]["total"] == 7.0
    assert idx.lookup("nowhere").count() == 0


def test_transaction_atomicity(spark):
    """Two pushes inside a transaction = ONE step; views never observe the
    partial state (the reference's atomic multi-step input)."""
    seen_counts = []
    view = IncrementalLinearAggregateView(keys=["k"], sums={"n": wcount()})

    def step(delta):
        view.step(delta)
        seen_counts.append(view.materialized().agg(F.sum("n")).collect()[0][0])

    sp = StreamingPipeline(views=[("v", step)])
    d1 = spark.createDataFrame([("a", 1)], ["k", WEIGHT])
    d2 = spark.createDataFrame([("b", 1), ("a", 1)], ["k", WEIGHT])

    sp.start_transaction()
    sp.push(d1)
    sp.push(d2)
    assert seen_counts == []  # nothing applied yet
    sp.commit_transaction()
    assert seen_counts == [3]  # one step saw the union
    assert sp.batches_seen == 1

    # rollback discards
    sp.start_transaction()
    sp.push(d1)
    sp.rollback_transaction()
    assert sp.batches_seen == 1
    # non-transactional push = immediate step
    sp.push(d1)
    assert seen_counts == [3, 4]


def test_adhoc_output_formats(spark, tmp_path):
    """query_arrow / query_parquet — ad-hoc result delivery formats."""
    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE t (k BIGINT, v DOUBLE);
        CREATE MATERIALIZED VIEW s AS SELECT k, sum(v) AS total FROM t GROUP BY k
        """
    )
    b.connect_table(
        "t", spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 4.0)], ["k", "v"])
    )
    p = b.create()
    tbl = p.query_arrow("SELECT * FROM s ORDER BY k")
    assert tbl.num_rows == 2 and tbl.column("total").to_pylist() == [5.0, 4.0]
    out = str(tmp_path / "adhoc_out")
    p.query_parquet("SELECT * FROM s", out)
    assert sorted(
        map(tuple, spark.read.parquet(out).collect())
    ) == [(1, 5.0), (2, 4.0)]


def test_create_aggregate_requires_impl(spark):
    from feldera_spark.pipeline import PipelineBuilder

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE t (k INT, x BIGINT);
        CREATE AGGREGATE myagg(x BIGINT) RETURNS BIGINT;
        CREATE MATERIALIZED VIEW v AS SELECT k, myagg(x) AS a FROM t GROUP BY k
        """
    ).connect_table("t", spark.createDataFrame([(1, 2)], "k INT, x BIGINT"))
    try:
        b.create()
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "implement_aggregate" in str(e)


def test_create_aggregate_linear_flag_recorded(spark):
    from feldera_spark.pipeline import PipelineBuilder

    def total(v: pd.Series) -> int:
        return int(v.sum())

    b = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE t (k INT, x BIGINT);
            CREATE AGGREGATE total(x BIGINT) RETURNS BIGINT;
            CREATE MATERIALIZED VIEW v AS
            SELECT k, total(x) AS tot FROM t GROUP BY k
            """
        )
        .implement_aggregate("total", total, linear=True)
        .connect_table(
            "t", spark.createDataFrame([(1, 2), (1, 3), (2, 5)], "k INT, x BIGINT")
        )
    )
    p = b.create()
    assert p.aggregates["total"].linear is True
    got = {(r["k"], r["tot"]) for r in p.view("v").collect()}
    assert got == {(1, 5), (2, 5)}
