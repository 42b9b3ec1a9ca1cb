"""Relational operator inventory (SURVEY §2.2–§2.5, §2.9) with DuckDB oracles.

Each query exercises one operator family from the reference's
Calcite→DBSP lowering (``CalciteToDBSPCompiler.java:2973-2999``) re-expressed
as idiomatic Spark DataFrame/SQL. Cross-engine determinism conventions are
documented in ``_util.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feldera_spark.queries._util import dec2, dec4, t
from feldera_spark.sources.registry import load_tables

QUERIES = {}
ORACLES = {}


def q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# Aggregation (LogicalAggregate — CalciteToDBSPCompiler.java:948)
# ---------------------------------------------------------------------------

@q(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DOUBLE) AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped linear aggregate (SUM/AVG/COUNT are the
    reference's O(delta) 'linear' class, operator/aggregate.rs:209)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz")
    )
    one = F.lit(1).cast("decimal(6,4)")
    disc_price = dec2("l_extendedprice") * (one - dec4("l_discount"))
    charge = disc_price * (one + dec4("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(dec2("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        (F.sum(dec4("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "q02_filter_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q02_filter_revenue(spark, sf_dir):
    """TPC-H Q6 shape: filter + global aggregate; predicates push to the scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec4("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@q(
    "q03_join_topk",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_join_topk(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + aggregate + deterministic top-K.

    The second join streams LINEITEM and broadcasts the filtered
    customer⋈orders side (explicit hint, guide §3.1): the planner's size
    estimate put the 3-column lineitem projection under the
    auto-broadcast threshold and built the FACT side (a 600k-row
    driver collect + executor-wide rebuild per run, and the side that
    GROWS with scale); the segment-filtered order list is ~20x smaller
    and shrinks further with selectivity — the correct build side at
    any SF."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(6,4)")
    return (
        F.broadcast(c.join(o, c.c_custkey == o.o_custkey))
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec2("l_extendedprice") * (one - dec4("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Joins (LogicalJoin — §2.3)
# ---------------------------------------------------------------------------

@q(
    "q04_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS order_count,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q04_left_outer(spark, sf_dir):
    """Left outer join with NULL padding (operator/join.rs:396 outer_join)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(dec2("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@q(
    "q05_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, count(*) AS cust_cnt
      FROM customer WHERE c_nationkey < 20 GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, count(*) AS supp_cnt
      FROM supplier WHERE s_nationkey > 5 GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
           cust.cust_cnt AS cust_cnt, supp.supp_cnt AS supp_cnt
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def q05_full_outer(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") > 5)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return c.join(s, on="nationkey", how="full").select(
        "nationkey", "cust_cnt", "supp_cnt"
    )


@q(
    "q06_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def q06_semi_join(spark, sf_dir):
    """Semi join (operator/semijoin.rs:28; EXISTS decorrelates to this)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "q07_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q07_anti_join(spark, sf_dir):
    """Anti join (operator/join.rs:374 antijoin; NOT EXISTS)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "q08_star_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q08_star_join(spark, sf_dir):
    """Multi-way star join (multijoin.rs / CreateStarJoins); dims broadcast
    explicitly — on a 1000-executor cluster nation/region are KB-sized and
    must never shuffle the fact table more than once."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(6,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec2("l_extendedprice") * (one - dec4("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregate variants (§2.4)
# ---------------------------------------------------------------------------

@q(
    "q09_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def q09_agg_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@q(
    "q10_agg_filter",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE) AS urgent_total,
           count(*) AS n_all
    FROM orders GROUP BY o_orderstatus
    """,
)
def q10_agg_filter(spark, sf_dir):
    """FILTER (WHERE ...) on aggregates (sqllib _conditional variants,
    aggregates.rs:947-1020). Spark: when()-guarded agg inputs."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", dec2("o_totalprice"))),
            F.lit(0).cast("decimal(12,2)"),
        )
        .cast("double")
        .alias("urgent_total"),
        F.count(F.lit(1)).alias("n_all"),
    )


@q(
    "q11_arg_minmax",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*10000000000 + l_orderkey) AS max_price_order,
           arg_min(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*10000000000 + l_orderkey) AS min_price_order,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q11_arg_minmax(spark, sf_dir):
    """ARG_MIN/ARG_MAX (aggregates.rs:1251-1262) via max_by/min_by with a
    collision-free composite ordering key for determinism."""
    li = t(spark, sf_dir, "lineitem")
    key = (
        F.round(F.col("l_extendedprice") * 100).cast("long") * F.lit(10000000000)
        + F.col("l_orderkey")
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", key).alias("max_price_order"),
        F.min_by("l_orderkey", key).alias("min_price_order"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_extendedprice").alias("min_price"),
    )


@q(
    "q12_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q12_grouping_sets(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


@q(
    "q13_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q13_rollup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "q14_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q14_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@q(
    "q15_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q15_pivot(spark, sf_dir):
    """PIVOT (docs/sql/aggregates.md:240-270) — native Spark pivot."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


# ---------------------------------------------------------------------------
# Window functions (LogicalWindow — §2.5)
# ---------------------------------------------------------------------------

@q(
    "q16_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER w AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 3
    """,
)
def q16_window_rank(spark, sf_dir):
    """ROW_NUMBER/RANK/DENSE_RANK (group/row_number.rs:35, rank.rs:45,148)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@q(
    "q17_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - coalesce(lag(o_totalprice) OVER w, 0) AS price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q17_window_lag_lead(spark, sf_dir):
    """LAG/LEAD (group/lag.rs:37)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (
            F.col("o_totalprice")
            - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0))
        ).alias("price_delta"),
    )


@q(
    "q18_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_total,
           count(*) OVER w AS running_cnt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q18_window_running(spark, sf_dir):
    """Running frame aggregate (time_series/rolling_aggregate.rs:81)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_cnt"),
    )


@q(
    "q19_window_range_interval",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS total_30d,
           count(*) OVER w AS cnt_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def q19_window_range_interval(spark, sf_dir):
    """RANGE frame over time (partitioned_rolling_aggregate,
    rolling_aggregate.rs:160); the reference rewrites ROWS→RANGE
    (RowsToRangeRule.java) — Spark runs RANGE frames natively."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS total_30d,
               count(*) OVER w AS cnt_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """)


@q(
    "q20_first_last_value",
    oracle="""
    SELECT DISTINCT c_nationkey,
           first_value(c_custkey) OVER w AS poorest,
           last_value(c_custkey) OVER w AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q20_first_last_value(spark, sf_dir):
    """FIRST_VALUE/LAST_VALUE with unbounded frame (the only frame shape the
    reference supports for them, docs/sql/unsupported-operations.md)."""
    c = t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        c.select(
            "c_nationkey",
            F.first("c_custkey").over(w).alias("poorest"),
            F.last("c_custkey").over(w).alias("richest"),
        )
        .distinct()
    )


@q(
    "q21_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def q21_topk_per_group(spark, sf_dir):
    """Indexed top-K per group (group/topk.rs:20, DBSPIndexedTopKOperator)."""
    from feldera_spark.operators.keyed import topk_per_group

    o = t(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )


# ---------------------------------------------------------------------------
# Set operations (LogicalUnion/Minus/Intersect — §2.2)
# ---------------------------------------------------------------------------

@q(
    "q22_union_all",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q22_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@q(
    "q23_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < -900
    """,
)
def q23_union_distinct(spark, sf_dir):
    a = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -900)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.unionByName(b).distinct()


@q(
    "q24_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 200
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q24_except_all(spark, sf_dir):
    """EXCEPT ALL via weighted negation (LogicalMinus lowering :1178)."""
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.exceptAll(b)


@q(
    "q25_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 0
    """,
)
def q25_intersect(spark, sf_dir):
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return a.intersect(b)


@q(
    "q26_values_join",
    oracle="""
    SELECT r.r_name, v.bonus
    FROM (VALUES ('AFRICA', 10), ('ASIA', 20), ('EUROPE', 30)) AS v(rname, bonus)
    JOIN region r ON r.r_name = v.rname
    """,
)
def q26_values_join(spark, sf_dir):
    """LogicalValues (constant Z-set, lowering :2369)."""
    v = spark.createDataFrame(
        [("AFRICA", 10), ("ASIA", 20), ("EUROPE", 30)], ["rname", "bonus"]
    )
    r = t(spark, sf_dir, "region")
    return F.broadcast(v).join(r, r.r_name == v.rname).select("r_name", "bonus")


# ---------------------------------------------------------------------------
# UNNEST (Uncollect — lowering :676)
# ---------------------------------------------------------------------------

@q(
    "q27_unnest_words",
    oracle="""
    SELECT word, count(*) AS cnt FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def q27_unnest_words(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(20)
    )


@q(
    "q28_unnest_ordinality",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 5
    """,
)
def q28_unnest_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY → posexplode (1-based to match SQL)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


# ---------------------------------------------------------------------------
# Sort/limit, subqueries, HAVING, conditionals (§2.2, §2.9)
# ---------------------------------------------------------------------------

@q(
    "q29_order_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q29_order_limit(spark, sf_dir):
    """ORDER BY + LIMIT → top-K (LogicalSort lowering :2807). Spark runs
    this as TakeOrderedAndProject — no global sort materialized."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "q30_correlated_subquery",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice FROM part p
    WHERE p_retailprice > (
      SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 1.5
      FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def q30_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (LogicalCorrelate :375; Catalyst
    decorrelates to a join)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_name, p_brand, p_retailprice FROM part p
        WHERE p_retailprice > (
          SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 1.5
          FROM part p2 WHERE p2.p_brand = p.p_brand
        )
    """)


@q(
    "q31_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) AND c_acctbal > 9000
    """,
)
def q31_in_subquery(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        ) AND c_acctbal > 9000
    """)


@q(
    "q32_scalar_subquery",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_above_avg FROM orders
    WHERE o_totalprice > (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) FROM orders
    )
    GROUP BY o_orderstatus
    """,
)
def q32_scalar_subquery(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, count(*) AS n_above_avg FROM orders
        WHERE o_totalprice > (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) FROM orders
        )
        GROUP BY o_orderstatus
    """)


@q(
    "q33_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders FROM orders
    GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def q33_having(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@q(
    "q34_case_expr",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bucket,
           count(*) AS n,
           count(nullif(c_mktsegment, 'MACHINERY')) AS non_machinery,
           greatest(max(c_nationkey), 10) AS g,
           least(min(c_nationkey), 10) AS l
    FROM customer GROUP BY 1
    """,
)
def q34_case_expr(spark, sf_dir):
    """CASE/NULLIF/GREATEST/LEAST (operators.rs, boolean.rs)."""
    c = t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))).alias(
            "non_machinery"
        ),
        F.greatest(F.max("c_nationkey"), F.lit(10)).alias("g"),
        F.least(F.min("c_nationkey"), F.lit(10)).alias("l"),
    )


@q(
    "q35_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           substr(c_name, 1, 8) AS prefix,
           replace(c_name, 'Customer', 'Cust') AS repl,
           length(c_name) AS name_len,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tagged,
           split_part(c_name, '#', 2) AS num_part,
           reverse(c_mktsegment) AS rseg,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS padded,
           ascii(c_mktsegment) AS first_ascii
    FROM customer WHERE c_custkey < 50
    """,
)
def q35_string_funcs(spark, sf_dir):
    """String function dialect layer (sqllib/src/string.rs — all Spark-native)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("tagged"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("padded"),
        F.ascii(F.col("c_mktsegment")).alias("first_ascii"),
    )


@q(
    "q36_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           o_orderdate + INTERVAL 30 DAYS AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders WHERE o_orderkey < 100
    """,
)
def q36_datetime_funcs(spark, sf_dir):
    """Date/time functions (sqllib/src/timestamp.rs). DOW aligned to
    Spark's 1=Sunday convention on both sides."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        # NOT date_trunc(): that returns TIMESTAMP (session-tz-dependent on
        # NTZ input); trunc() on DATE then cast back stays tz-independent.
        F.trunc(F.col("o_orderdate").cast("date"), "month")
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@q(
    "q37_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(abs(l_quantity - 25) AS DOUBLE) AS a,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS s,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q7,
           CAST(round(l_extendedprice * 0.0625, 1) AS DOUBLE) AS tax_round,
           CAST(l_linenumber % 3 AS BIGINT) AS m3,
           CAST(sqrt(l_quantity) AS DOUBLE) AS sq,
           CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS qsq
    FROM lineitem WHERE l_orderkey < 40
    """,
)
def q37_math_funcs(spark, sf_dir):
    """Math functions (sqllib float.rs/operators.rs). sqrt is IEEE
    correctly-rounded → cross-engine exact; exp/ln live in tests, not the
    oracle gate (libm last-ulp divergence)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).cast("double").alias("a"),
        F.signum(F.col("l_quantity") - 25).cast("double").alias("s"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("q7"),
        F.round(F.col("l_extendedprice") * 0.0625, 1).cast("double").alias("tax_round"),
        (F.col("l_linenumber") % 3).cast("long").alias("m3"),
        F.sqrt(F.col("l_quantity")).cast("double").alias("sq"),
        (F.col("l_quantity").cast("long") * F.col("l_quantity").cast("long")).alias("qsq"),
    )


@q(
    "q38_nullsafe_eq",
    oracle="""
    SELECT nullif(o_orderstatus, 'P') AS status_np,
           count(*) AS n,
           count(*) FILTER (WHERE nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O') AS nullsafe_o
    FROM orders GROUP BY 1
    """,
)
def q38_nullsafe_eq(spark, sf_dir):
    """IS NOT DISTINCT FROM / <=> (docs/sql/function-index.md) → eqNullSafe."""
    o = t(spark, sf_dir, "orders")
    ns = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.groupBy(ns.alias("status_np")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(ns.eqNullSafe(F.lit("O")), 1)).alias("nullsafe_o"),
    )


@q(
    "q39_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q39_json_extract(spark, sf_dir):
    """VARIANT/JSON access (sqllib variant.rs; PARSE_JSON + subscript) via
    get_json_object — JVM-side, no UDF."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object(F.col("props"), "$.k").cast("long")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "q40_distinct_multiset",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q40_distinct_multiset(spark, sf_dir):
    """DISTINCT = Z-set weight normalization (zset.rs:149-196)."""
    c = t(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()
