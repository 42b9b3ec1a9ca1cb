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


def test_with_properties_parsed_and_connector_ingestion(spark, tmp_path):
    """Table WITH ('append_only', 'materialized', 'connectors') — the
    connectors JSON is opened at create() when no DataFrame is
    connected (docs/sql/streaming.md:36-57)."""
    p = tmp_path / "sales.csv"
    p.write_text("1,widget,3.5\n2,gadget,1.25\n")
    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE sales (
            id BIGINT,
            item VARCHAR,
            amount DOUBLE
        ) WITH (
            'append_only' = 'true',
            'materialized' = 'true',
            'connectors' = '[{
                "transport": {"name": "file_input", "config": {"path": "%s"}},
                "format": {"name": "csv"}
            }]'
        );
        CREATE MATERIALIZED VIEW totals AS
        SELECT item, sum(amount) AS total FROM sales GROUP BY item
        """
        % str(p)
    )
    decl = b.tables["sales"]
    assert decl.append_only and decl.materialized
    assert decl.columns == {"id": "BIGINT", "item": "STRING", "amount": "DOUBLE"}
    pipe = b.create()
    got = sorted(map(tuple, pipe.view("totals").collect()))
    assert got == [("gadget", 1.25), ("widget", 3.5)]


def test_emit_final_view_property(spark):
    """CREATE VIEW ... WITH ('emit_final' = 'd'): only rows at/below the
    derived waterline (max(ts) - LATENESS, floored through the view's
    day grouping conservatively by the raw bound) are emitted
    (docs/tutorials/time-series.md:341-375)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 10), 10.0),
        (dt.datetime(2024, 1, 2, 10), 20.0),
        (dt.datetime(2024, 1, 5, 12), 30.0),  # max ts; waterline = Jan 4 12:00
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, amount DOUBLE").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE purchase (
            ts TIMESTAMP LATENESS INTERVAL 1 DAY,
            amount DOUBLE
        );
        CREATE VIEW daily_total_final
        WITH ('emit_final' = 'd')
        AS SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d,
                  SUM(amount) AS total
        FROM purchase GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)
        """
    ).connect_table("purchase", df)
    pipe = b.create()
    got = sorted(map(tuple, pipe.view("daily_total_final").collect()))
    # Jan 5 is above the waterline (not final); Jan 1 and 2 are final
    assert [(r[0].day, r[1]) for r in got] == [(1, 10.0), (2, 20.0)]


def test_append_only_suppresses_unbounded_warning(spark):
    from feldera_spark.streaming.analysis import find_unbounded_state

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE log (k VARCHAR, v DOUBLE) WITH ('append_only' = 'true');
        CREATE TABLE raw (k VARCHAR, v DOUBLE);
        CREATE MATERIALIZED VIEW chain_ok AS
        SELECT k, max(v) AS mx FROM log GROUP BY k;
        CREATE MATERIALIZED VIEW still_bad AS
        SELECT k, max(v) AS mx FROM raw GROUP BY k
        """
    )
    warned = {w.view for w in find_unbounded_state(b)}
    assert "chain_ok" not in warned
    assert "still_bad" in warned


def test_select_aggregate_view_by_declaration(spark):
    from feldera_spark.streaming.incremental import (
        AppendOnlyAggregateView,
        IncrementalAggregateView,
        IncrementalLinearAggregateView,
        select_aggregate_view,
    )

    aggs = {"mx": ("max", "v"), "n": ("count", "v")}
    assert isinstance(
        select_aggregate_view(["k"], aggs, append_only=True),
        AppendOnlyAggregateView,
    )
    assert isinstance(
        select_aggregate_view(["k"], aggs, append_only=False),
        IncrementalAggregateView,
    )
    lin = select_aggregate_view(
        ["k"], {"n": ("count", "v"), "s": ("sum", "v")}, append_only=False
    )
    assert isinstance(lin, IncrementalLinearAggregateView)

    # the general strategy must survive a retraction of the current max
    gen = select_aggregate_view(["k"], aggs, append_only=False)
    from feldera_spark.zset import WEIGHT as W

    gen.step(spark.createDataFrame(
        [("a", 5.0, 1), ("a", 3.0, 1)], f"k STRING, v DOUBLE, {W} LONG"))
    gen.step(spark.createDataFrame(
        [("a", 5.0, -1)], f"k STRING, v DOUBLE, {W} LONG"))
    got = [(r["k"], r["mx"], r["n"]) for r in gen.materialized().collect()]
    assert got == [("a", 3.0, 1)]


# ---------------------------------------------------------------------------
# CTE (WITH) desugaring to hidden local views
# ---------------------------------------------------------------------------


def _cte_src(spark):
    return spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(1, 31)],
        "id bigint, k string, v double",
    )


def test_cte_chain_compiles_to_ivm(spark):
    """WITH chains desugar into hidden local views; each CTE and the
    main body compile to IVM independently and chain deltas."""
    df = _cte_src(spark)
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE t (id BIGINT, k VARCHAR, v DOUBLE);"
        "CREATE MATERIALIZED VIEW w AS "
        "WITH filt AS (SELECT id, k, v FROM t WHERE v > 3), "
        "agg AS (SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM filt"
        " GROUP BY k) "
        "SELECT k, sv, n FROM agg"
    )
    b.connect_table("t", df.filter("id <= 15"))
    p = b.create()
    assert {"__cte_w_filt", "__cte_w_agg", "w"} <= set(p._ivm)
    df.filter("id > 15").createOrReplaceTempView("__cte_chunk")
    p.execute("INSERT INTO t SELECT * FROM __cte_chunk")
    p.execute("DELETE FROM t WHERE id % 5 = 2")
    df.createOrReplaceTempView("__cte_all")
    got = sorted(tuple(r) for r in p.view("w").collect())
    exp = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM __cte_all "
            "WHERE v > 3 AND id % 5 != 2 GROUP BY k"
        ).collect()
    )
    assert got == exp


def test_cte_with_batch_fallback_side(spark):
    """A CTE outside the recognizer grammar falls back to batch while
    the rest of the chain still evaluates correctly."""
    df = _cte_src(spark)
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE t (id BIGINT, k VARCHAR, v DOUBLE);"
        "CREATE MATERIALIZED VIEW w AS "
        "WITH ranked AS (SELECT id, k, v,"
        " ROW_NUMBER() OVER (ORDER BY v DESC, id) AS rn FROM t) "
        "SELECT id, k, v FROM ranked WHERE rn <= 5"
    )
    b.connect_table("t", df)
    p = b.create()
    df.createOrReplaceTempView("__cte_all2")
    got = sorted(tuple(r) for r in p.view("w").collect())
    exp = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT id, k, v FROM (SELECT id, k, v,"
            " ROW_NUMBER() OVER (ORDER BY v DESC, id) AS rn"
            " FROM __cte_all2) WHERE rn <= 5"
        ).collect()
    )
    assert got == exp


def test_with_recursive_not_desugared(spark):
    """WITH RECURSIVE passes through untouched (recursion goes through
    DECLARE RECURSIVE VIEW; Spark SQL evaluates plain WITH RECURSIVE...
    bodies as batch where supported) — here just assert the builder
    does not create hidden views for it."""
    b = PipelineBuilder(spark)
    b.add_view(
        "r",
        sql="WITH RECURSIVE x AS (SELECT 1 AS n) SELECT * FROM x",
    )
    assert list(b.views) == ["r"]
    assert "WITH RECURSIVE" in b.views["r"].sql


# ---------------------------------------------------------------------------
# Derived tables (FROM (SELECT ...) AS x) desugar to hidden local views
# ---------------------------------------------------------------------------


def test_derived_table_compiles_to_ivm(spark):
    """A subquery in FROM position extracts into a hidden view; both the
    sub-select and the outer body compile to IVM and chain deltas."""
    df = _cte_src(spark)
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE t (id BIGINT, k VARCHAR, v DOUBLE);"
        "CREATE MATERIALIZED VIEW w AS "
        "SELECT k, sv FROM (SELECT k, SUM(v) AS sv, COUNT(*) AS n FROM t"
        " WHERE v > 3 GROUP BY k) s WHERE n >= 2"
    )
    b.connect_table("t", df.filter("id <= 15"))
    p = b.create()
    assert {"__dt_w_s", "w"} <= set(p._ivm)
    df.filter("id > 15").createOrReplaceTempView("__dt_chunk")
    p.execute("INSERT INTO t SELECT * FROM __dt_chunk")
    p.execute("DELETE FROM t WHERE id % 5 = 2")
    df.createOrReplaceTempView("__dt_all")
    got = sorted(tuple(r) for r in p.view("w").collect())
    exp = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT k, sv FROM (SELECT k, SUM(v) AS sv, COUNT(*) AS n"
            " FROM __dt_all WHERE v > 3 AND id % 5 != 2 GROUP BY k)"
            " WHERE n >= 2"
        ).collect()
    )
    assert got == exp


def test_derived_table_in_join_compiles(spark):
    """JOIN (SELECT ...) agg extracts too; the outer join compiles."""
    df = _cte_src(spark)
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE t (id BIGINT, k VARCHAR, v DOUBLE);"
        "CREATE MATERIALIZED VIEW w AS "
        "SELECT t.id, t.v, agg.sv FROM t "
        "JOIN (SELECT k, SUM(v) AS sv FROM t GROUP BY k) agg"
        " ON t.k = agg.k"
    )
    b.connect_table("t", df.filter("id <= 20"))
    p = b.create()
    assert {"__dt_w_agg", "w"} <= set(p._ivm)
    df.filter("id > 20").createOrReplaceTempView("__dt_chunk2")
    p.execute("INSERT INTO t SELECT * FROM __dt_chunk2")
    df.createOrReplaceTempView("__dt_all2")
    got = sorted(tuple(r) for r in p.view("w").collect())
    exp = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT t.id, t.v, agg.sv FROM __dt_all2 t "
            "JOIN (SELECT k, SUM(v) AS sv FROM __dt_all2 GROUP BY k) agg"
            " ON t.k = agg.k"
        ).collect()
    )
    assert got == exp


def test_string_literal_derived_table_untouched(spark):
    """'FROM (SELECT' inside a string literal is data, not a derived
    table — the body passes through unmodified."""
    b = PipelineBuilder(spark)
    b.add_view("r", sql="SELECT 'FROM (SELECT x) y' AS s, k FROM t")
    assert list(b.views) == ["r"]
