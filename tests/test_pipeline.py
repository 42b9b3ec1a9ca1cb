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
    # spend is consumed by 2 views; since round 3 the whole chain
    # (SELECT * filter view -> aggregate) IVM-COMPILES, so its state is
    # checkpoint-materialized — strictly stronger than the cross-view
    # cache the batch path would apply
    assert "spend" in p._ivm and "big_orders" in p._ivm
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


def test_upsert_explicit_sequence_stable_across_read_layouts(spark, tmp_path):
    """input_upsert.rs semantics: with a declared sequence column the
    upsert winner is identical no matter how the source files are split
    or ordered on read."""
    import random

    from feldera_spark.pipeline import PipelineBuilder

    rows = [(k, s, f"v{k}_{s}") for k in range(20) for s in range(5)]
    random.Random(7).shuffle(rows)
    src = spark.createDataFrame(rows, "k INT, seq INT, v STRING")
    # adversarial layout: many small files, rows scattered
    path = str(tmp_path / "upsert_src")
    src.repartition(7).write.mode("overwrite").parquet(path)

    def run(read_partitions):
        df = spark.read.parquet(path).repartition(read_partitions)
        p = (
            PipelineBuilder(spark)
            .add_table("t", df, primary_key=["k"], sequence_col="seq")
            .add_view("latest", sql="SELECT k, v FROM t")
            .create()
        )
        return {(r["k"], r["v"]) for r in p.view("latest").collect()}

    expect = {(k, f"v{k}_4") for k in range(20)}
    assert run(3) == expect
    assert run(11) == expect


def test_upsert_missing_sequence_column_raises(spark):
    from feldera_spark.pipeline import PipelineBuilder

    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    b = PipelineBuilder(spark).add_table(
        "t", df, primary_key=["k"], sequence_col="nope"
    ).add_view("v1", sql="SELECT * FROM t")
    try:
        b.create()
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "sequence column" in str(e)


def test_adhoc_insert_values_and_select(spark):
    """Ad-hoc INSERT (docs/sql/ad-hoc.md:95-98): rows pushed into a
    declared table; dependent views re-evaluate; SELECTs see the new
    state."""
    from feldera_spark.pipeline import PipelineBuilder

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k INT, v DOUBLE")
    p = (
        PipelineBuilder(spark)
        .add_table("t", df)
        .add_view("totals", sql="SELECT k, sum(v) AS total FROM t GROUP BY k")
        .create()
    )
    assert p.execute("SELECT count(*) AS n FROM t").collect()[0]["n"] == 2
    p.execute("INSERT INTO t VALUES (1, 5.0), (3, 7.0)")
    got = sorted(map(tuple, p.view("totals").collect()))
    assert got == [(1, 15.0), (2, 20.0), (3, 7.0)]
    # INSERT INTO ... SELECT
    p.execute("INSERT INTO t SELECT k + 10, v FROM t WHERE k = 3")
    assert p.execute(
        "SELECT v FROM t WHERE k = 13"
    ).collect()[0]["v"] == 7.0


def test_adhoc_insert_upsert_pk(spark):
    """Ad-hoc INSERT into a PRIMARY KEY table: last write wins over
    existing state AND within the statement."""
    from feldera_spark.pipeline import PipelineBuilder

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    p = (
        PipelineBuilder(spark)
        .add_table("t", df, primary_key=["k"])
        .add_view("cur", sql="SELECT * FROM t")
        .create()
    )
    p.execute("INSERT INTO t VALUES (2, 'b2'), (3, 'c'), (2, 'b3')")
    got = sorted(map(tuple, p.view("cur").collect()))
    assert got == [(1, "a"), (2, "b3"), (3, "c")]
