"""Pipeline program model: DDL parsing, view DAG, CSE, upsert tables,
ad-hoc queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.pipeline import PipelineBuilder, split_statements
from feldera_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_split_statements():
    prog = "CREATE TABLE t (x INT); CREATE VIEW v AS SELECT ';' AS s, x FROM t;"
    stmts = split_statements(prog)
    assert len(stmts) == 2
    assert stmts[1].startswith("CREATE VIEW")


def test_sql_program_end_to_end(spark):
    prog = """
    CREATE TABLE orders (
        o_orderkey BIGINT,
        o_custkey BIGINT,
        o_totalprice DOUBLE,
        o_orderdate TIMESTAMP LATENESS INTERVAL 1 HOUR
    );
    CREATE LOCAL VIEW big_orders AS
        SELECT * FROM orders WHERE o_totalprice > 100000;
    CREATE MATERIALIZED VIEW spend AS
        SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS total
        FROM big_orders GROUP BY o_custkey;
    CREATE MATERIALIZED VIEW top_share AS
        SELECT count(*) AS n_custs FROM spend WHERE n >= 2;
    CREATE MATERIALIZED VIEW avg_spend AS
        SELECT sum(total) / sum(n) AS avg_big FROM spend;
    """
    b = PipelineBuilder(spark).sql(prog)
    assert b.tables["orders"].lateness == {"o_orderdate": 3600}
    assert not b.views["big_orders"].materialized
    assert b.views["spend"].materialized

    b.connect_table("orders", load_table(spark, SF_DIR, "orders"))
    p = b.create()

    got = p.view("spend")
    want = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # spend is consumed by 2 views -> cached (cross-view CSE)
    assert p.view("spend").is_cached
    assert p.view("top_share").collect()[0]["n_custs"] >= 0
    # ad-hoc query over materialized state
    adhoc = p.query("SELECT count(*) AS n FROM spend").collect()[0]["n"]
    assert adhoc == got.count()


def test_primary_key_upsert(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "a2"), (2, "b2"), (1, "a3")], ["k", "v"]
    )
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE kv (k BIGINT PRIMARY KEY, v VARCHAR);"
    )
    assert b.tables["kv"].primary_key == ["k"]
    p = b.connect_table("kv", df).create()
    rows = sorted(map(tuple, p.view("kv").collect()))
    assert rows == [(1, "a3"), (2, "b2")]
