"""Edge-case regression slice, modeled on the reference's Postgres test
suites (``sql-to-dbsp-compiler .../sql/postgres/PostgresWindowTests.java``,
``PostgresGroupingSetsTests.java``, ``PostgresNumericTests`` shapes, plus
the sqllogictest corners SURVEY §5 calls out): NULL ordering and
three-valued logic at boundaries, grouping-set NULL disambiguation,
decimal rounding/overflow corners, interval arithmetic corners, frame
edge cases. Each query runs the same semantic on Spark and DuckDB — the
point is that the engines agree on the corner, not the feature."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feldera_spark.queries._util import t

QUERIES = {}
ORACLES = {}


def q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@q(
    "e01_nulls_first_last",
    oracle="""
    SELECT c_custkey, c_name
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END
                     AS c_name
          FROM customer)
    ORDER BY c_name DESC NULLS LAST, c_custkey LIMIT 20
    """,
)
def e01_nulls_first_last(spark, sf_dir):
    """Explicit NULLS LAST under DESC (Postgres default differs from
    engines' defaults — the suite pins it both sides)."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_name")
        ).alias("c_name"),
    )
    return c.orderBy(
        F.col("c_name").desc_nulls_last(), F.col("c_custkey")
    ).limit(20)


@q(
    "e02_grouping_sets_null_vs_real_null",
    oracle="""
    SELECT CASE WHEN GROUPING(seg) = 1 THEN '<all>' ELSE coalesce(seg, '<null>') END AS seg_label,
           GROUPING(seg) AS is_total,
           count(*) AS n
    FROM (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
          FROM customer)
    GROUP BY GROUPING SETS ((seg), ())
    """,
)
def e02_grouping_sets_null_vs_real_null(spark, sf_dir):
    """A real NULL group vs the grouping-set padding NULL: only
    GROUPING() can tell them apart (PostgresGroupingSetsTests)."""
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg")
    )
    c.createOrReplaceTempView("e02_src")
    return c.sparkSession.sql(
        """
        SELECT CASE WHEN GROUPING(seg) = 1 THEN '<all>'
                    ELSE coalesce(seg, '<null>') END AS seg_label,
               CAST(GROUPING(seg) AS BIGINT) AS is_total,
               count(*) AS n
        FROM e02_src GROUP BY GROUPING SETS ((seg), ())
        """
    )


@q(
    "e03_decimal_banker_vs_half_up",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(CAST(l_discount AS DECIMAL(6,4)), 1) AS DOUBLE) AS r1,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS r0,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) % 10 AS DOUBLE) AS m10
    FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber
    """,
)
def e03_decimal_banker_vs_half_up(spark, sf_dir):
    """DECIMAL ROUND ties (HALF_UP in both engines for decimals) and
    decimal modulus sign (PostgresNumericTests corners)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.orderBy("l_orderkey", "l_linenumber").select(
        "l_orderkey",
        F.round(F.col("l_discount").cast("decimal(6,4)"), 1)
        .cast("double")
        .alias("r1"),
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 0)
        .cast("double")
        .alias("r0"),
        (F.col("l_extendedprice").cast("decimal(12,2)") % 10)
        .cast("double")
        .alias("m10"),
    )


@q(
    "e04_decimal_overflow_null",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 AS DECIMAL(12,2)) IS NULL AS overflowed
    FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey
    """,
)
def e04_decimal_overflow_null(spark, sf_dir):
    """Decimal overflow is NULL under TRY semantics on both engines
    (the reference errors by default and has SAFE variants —
    casts.rs overflow family)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    return o.orderBy("o_orderkey").select(
        "o_orderkey",
        F.expr(
            "TRY_CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 "
            "AS DECIMAL(12,2)) IS NULL"
        ).alias("overflowed"),
    )


@q(
    "e05_interval_month_arithmetic_corners",
    oracle="""
    SELECT d,
           CAST(d + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_1m,
           CAST(d + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST((d + INTERVAL 1 MONTH) + INTERVAL 1 MONTH AS TIMESTAMP) AS chain,
           CAST(d + INTERVAL 2 MONTH AS TIMESTAMP) AS direct
    FROM (VALUES (TIMESTAMP '2024-01-31 12:00:00'),
                 (TIMESTAMP '2024-01-30 00:00:00'),
                 (TIMESTAMP '2023-12-31 23:59:59'),
                 (TIMESTAMP '2024-02-29 08:00:00')) AS v(d)
    """,
)
def e05_interval_month_arithmetic_corners(spark, sf_dir):
    """Month arithmetic end-of-month clamping: Jan 31 + 1 month = Feb 29
    (leap), and (d+1m)+1m differs from d+2m — the classic year-month
    interval corner both engines clamp identically."""
    rows = [
        ("2024-01-31 12:00:00",),
        ("2024-01-30 00:00:00",),
        ("2023-12-31 23:59:59",),
        ("2024-02-29 08:00:00",),
    ]
    v = spark.createDataFrame(rows, ["s"]).select(
        F.col("s").cast("timestamp_ntz").alias("d")
    )
    return v.select(
        "d",
        (F.col("d") + F.expr("INTERVAL 1 MONTH")).alias("plus_1m"),
        (F.col("d") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        (F.col("d") + F.expr("INTERVAL 1 MONTH") + F.expr("INTERVAL 1 MONTH")).alias("chain"),
        (F.col("d") + F.expr("INTERVAL 2 MONTH")).alias("direct"),
    )


@q(
    "e06_window_frame_exclude_boundaries",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS BIGINT))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS sum_before,
           CAST(sum(CAST(l_quantity AS BIGINT))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS sum_after
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def e06_window_frame_exclude_boundaries(spark, sf_dir):
    """Frames that exclude the current row entirely: first row's
    sum_before and last row's sum_after are NULL (empty frame), not 0 —
    PostgresWindowTests' empty-frame rule."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    q_ = F.col("l_quantity").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(q_).over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("bigint").alias("sum_before"),
        F.sum(q_).over(w.rowsBetween(1, Window.unboundedFollowing))
        .cast("bigint").alias("sum_after"),
    )


@q(
    "e07_range_frame_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_peers_incl,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
                AS BIGINT) AS rnk
    FROM orders WHERE o_custkey <= 20
    """,
)
def e07_range_frame_with_ties(spark, sf_dir):
    """RANGE CURRENT ROW includes ALL peers (ties on the order key) —
    differs from ROWS; rank() jumps accordingly."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1))
        .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("n_peers_incl"),
        F.rank().over(w).cast("bigint").alias("rnk"),
    )


@q(
    "e08_three_valued_logic_table",
    oracle="""
    SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b,
           CAST(a AND b AS VARCHAR) AS and_r, CAST(a OR b AS VARCHAR) AS or_r,
           CAST(NOT a AS VARCHAR) AS not_a,
           CAST(a = b AS VARCHAR) AS eq_r,
           CAST(a IS DISTINCT FROM b AS VARCHAR) AS distinct_r
    FROM (VALUES (TRUE), (FALSE), (NULL)) AS x(a),
         (VALUES (TRUE), (FALSE), (NULL)) AS y(b)
    """,
)
def e08_three_valued_logic_table(spark, sf_dir):
    """The full 3x3 Kleene truth table including IS DISTINCT FROM
    (sqllogictest's select1 3VL corners).  Nullable-BOOLEAN outputs are
    cast to STRING on both sides: pandas surfaces Spark NULL booleans as
    object None and DuckDB's as float NaN, which breaks stringify-and-
    hash comparison even when values agree."""
    vals = [(True,), (False,), (None,)]
    x = spark.createDataFrame(vals, "a BOOLEAN")
    y = spark.createDataFrame(vals, "b BOOLEAN")
    j = x.crossJoin(y)
    return j.select(
        F.col("a").cast("string").alias("a"),
        F.col("b").cast("string").alias("b"),
        (F.col("a") & F.col("b")).cast("string").alias("and_r"),
        (F.col("a") | F.col("b")).cast("string").alias("or_r"),
        (~F.col("a")).cast("string").alias("not_a"),
        (F.col("a") == F.col("b")).cast("string").alias("eq_r"),
        F.expr("CAST(a IS DISTINCT FROM b AS STRING)").alias("distinct_r"),
    )


@q(
    "e09_division_and_mod_signs",
    oracle="""
    SELECT a, b,
           a // b AS int_div,
           a % b AS int_mod
    FROM (VALUES (7, 3), (-7, 3), (7, -3), (-7, -3)) AS v(a, b)
    """,
)
def e09_division_and_mod_signs(spark, sf_dir):
    """Integer division/modulus sign rules: truncation toward zero,
    mod takes the dividend's sign (PostgresNumericTests)."""
    v = spark.createDataFrame(
        [(7, 3), (-7, 3), (7, -3), (-7, -3)], "a INT, b INT"
    )
    return v.select(
        "a", "b",
        F.expr("CAST(a / b AS INT)").alias("int_div"),
        F.expr("a % b").alias("int_mod"),
    )


@q(
    "e10_empty_group_aggregates",
    oracle="""
    SELECT count(*) AS n, CAST(sum(o_totalprice) AS DOUBLE) AS s,
           CAST(max(o_totalprice) AS DOUBLE) AS mx,
           CAST(min(o_totalprice) AS DOUBLE) AS mn,
           CAST(avg(o_totalprice) AS DOUBLE) AS av,
           CAST(bool_and(o_totalprice > 0) AS VARCHAR) AS ba
    FROM orders WHERE o_orderkey < 0
    """,
)
def e10_empty_group_aggregates(spark, sf_dir):
    """Aggregates over the empty relation: COUNT=0, everything else
    NULL (incl. BOOL_AND's identity) — the no-GROUP-BY global-aggregate
    rule the reference implements via aggregate_linear defaults."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 0)
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").cast("double").alias("s"),
        F.max("o_totalprice").cast("double").alias("mx"),
        F.min("o_totalprice").cast("double").alias("mn"),
        F.avg("o_totalprice").cast("double").alias("av"),
        # NULL boolean (empty relation) -> STRING for hash stability
        F.bool_and(F.col("o_totalprice") > 0).cast("string").alias("ba"),
    )


@q(
    "e11_string_concat_null_and_empty",
    oracle="""
    SELECT c_custkey,
           c_name || NULL AS cat_null,
           concat(c_name, NULL) AS concat_null,
           coalesce(NULL, '') = '' AS empty_not_null,
           length('') AS len_empty,
           substr(c_name, 1, 0) AS sub_zero
    FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey
    """,
)
def e11_string_concat_null_and_empty(spark, sf_dir):
    """|| propagates NULL; empty string is NOT NULL; zero-length
    substring is '' (sqllogictest string corners). DuckDB's concat()
    ignores NULLs — pinned via ||-semantics on the Spark side where
    they agree, and concat() where both skip."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 10)
    return c.orderBy("c_custkey").select(
        "c_custkey",
        F.expr("c_name || NULL").alias("cat_null"),
        # Spark's concat is NULL-propagating; DuckDB's concat skips
        # NULLs — emulate DuckDB's with concat_ws('')
        F.concat_ws("", F.col("c_name"), F.lit(None)).alias("concat_null"),
        (F.coalesce(F.lit(None), F.lit("")) == "").alias("empty_not_null"),
        F.length(F.lit("")).cast("bigint").alias("len_empty"),
        F.expr("substr(c_name, 1, 0)").alias("sub_zero"),
    )


@q(
    "e12_in_subquery_null_semantics",
    oracle="""
    SELECT c_custkey,
           c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderkey < 0) AS in_empty,
           c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                                         ELSE o_custkey END
                             FROM orders) AS not_in_with_null
    FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey
    """,
)
def e12_in_subquery_null_semantics(spark, sf_dir):
    """IN over the empty set is FALSE (not NULL); NOT IN over a set
    containing NULL can never be TRUE — the classic 3VL trap
    (sqllogictest select4 family)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 10)
    t(spark, sf_dir, "orders").createOrReplaceTempView("e12_orders")
    c.createOrReplaceTempView("e12_cust")
    return spark.sql(
        """
        SELECT c_custkey,
               c_custkey IN (SELECT o_custkey FROM e12_orders
                             WHERE o_orderkey < 0) AS in_empty,
               c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0
                                             THEN NULL ELSE o_custkey END
                                 FROM e12_orders) AS not_in_with_null
        FROM e12_cust ORDER BY c_custkey
        """
    )


@q(
    "e13_distinct_on_floats_nan_zero",
    oracle="""
    SELECT CAST(x AS DOUBLE) AS x, count(*) AS n
    FROM (VALUES (0.0), (-0.0), ('NaN'::DOUBLE), ('NaN'::DOUBLE),
                 (1.0), (1.0)) AS v(x)
    GROUP BY 1
    """,
)
def e13_distinct_on_floats_nan_zero(spark, sf_dir):
    """Grouping floats: NaN groups with NaN, +0.0 groups with -0.0 —
    SQL grouping equality, not IEEE == (both engines normalize)."""
    v = spark.createDataFrame(
        [(0.0,), (-0.0,), (float("nan"),), (float("nan"),), (1.0,), (1.0,)],
        "x DOUBLE",
    )
    return v.groupBy("x").agg(F.count(F.lit(1)).alias("n"))


@q(
    "e14_extract_all_fields",
    oracle="""
    SELECT CAST(extract(YEAR FROM ts) AS BIGINT) AS y,
           CAST(extract(QUARTER FROM ts) AS BIGINT) AS q,
           CAST(extract(MONTH FROM ts) AS BIGINT) AS mo,
           CAST(extract(DAY FROM ts) AS BIGINT) AS d,
           CAST(extract(DOW FROM ts) AS BIGINT) AS dow,
           CAST(extract(ISODOW FROM ts) AS BIGINT) AS isodow,
           CAST(extract(DOY FROM ts) AS BIGINT) AS doy,
           CAST(extract(WEEK FROM ts) AS BIGINT) AS wk,
           CAST(extract(HOUR FROM ts) AS BIGINT) AS h,
           CAST(extract(MINUTE FROM ts) AS BIGINT) AS mi,
           CAST(floor(extract(SECOND FROM ts)) AS BIGINT) AS s
    FROM (VALUES (TIMESTAMP '2024-12-31 23:59:58.5'),
                 (TIMESTAMP '2024-01-01 00:00:00'),
                 (TIMESTAMP '2024-02-29 12:30:45')) AS v(ts)
    """,
)
def e14_extract_all_fields(spark, sf_dir):
    """EXTRACT field corners: ISO week of Dec 31 2024 is week 1 of the
    next ISO year; DOW (0=Sunday) vs ISODOW (7=Sunday)
    (PostgresDateTests)."""
    rows = [
        ("2024-12-31 23:59:58.5",),
        ("2024-01-01 00:00:00",),
        ("2024-02-29 12:30:45",),
    ]
    v = spark.createDataFrame(rows, ["st"]).select(
        F.col("st").cast("timestamp_ntz").alias("ts")
    )
    c = F.col("ts")
    return v.select(
        F.year(c).cast("bigint").alias("y"),
        F.quarter(c).cast("bigint").alias("q"),
        F.month(c).cast("bigint").alias("mo"),
        F.dayofmonth(c).cast("bigint").alias("d"),
        (F.dayofweek(c) - 1).cast("bigint").alias("dow"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("bigint").alias("isodow"),
        F.dayofyear(c).cast("bigint").alias("doy"),
        F.weekofyear(c).cast("bigint").alias("wk"),
        F.hour(c).cast("bigint").alias("h"),
        F.minute(c).cast("bigint").alias("mi"),
        F.floor(F.expr("extract(SECOND FROM ts)")).cast("bigint").alias("s"),
    )


@q(
    "e15_least_greatest_null",
    oracle="""
    SELECT o_orderkey,
           CAST(greatest(o_totalprice, 100000) AS DOUBLE) AS g,
           CAST(least(o_totalprice, 100000) AS DOUBLE) AS l,
           CAST(greatest(o_totalprice, NULL) AS DOUBLE) AS g_null,
           CAST(least(NULL, NULL) AS DOUBLE) AS all_null
    FROM orders WHERE o_orderkey <= 20 ORDER BY o_orderkey
    """,
)
def e15_least_greatest_null(spark, sf_dir):
    """GREATEST/LEAST skip NULL arguments (both engines; unlike the
    NULL-propagating comparison operators) and are NULL only when all
    arguments are."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 20)
    return o.orderBy("o_orderkey").select(
        "o_orderkey",
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).cast("double").alias("g"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).cast("double").alias("l"),
        F.greatest(F.col("o_totalprice"), F.lit(None).cast("double"))
        .cast("double").alias("g_null"),
        F.least(F.lit(None).cast("double"), F.lit(None).cast("double"))
        .cast("double").alias("all_null"),
    )


@q(
    "e16_union_type_widening",
    oracle="""
    SELECT x FROM (
        SELECT CAST(1 AS SMALLINT) AS x
        UNION ALL SELECT CAST(100000 AS INTEGER)
        UNION ALL SELECT CAST(10000000000 AS BIGINT)
        UNION ALL SELECT CAST(NULL AS BIGINT)
    ) ORDER BY x NULLS FIRST
    """,
)
def e16_union_type_widening(spark, sf_dir):
    """UNION branches of different integer widths widen to the common
    type; NULL joins the widened type (Calcite leastRestrictive rule)."""
    a = spark.sql("SELECT CAST(1 AS SMALLINT) AS x")
    b = spark.sql("SELECT CAST(100000 AS INTEGER) AS x")
    c = spark.sql("SELECT CAST(10000000000 AS BIGINT) AS x")
    d = spark.sql("SELECT CAST(NULL AS BIGINT) AS x")
    return a.unionByName(b).unionByName(c).unionByName(d).orderBy(
        F.col("x").asc_nulls_first()
    )


@q(
    "e17_like_escape_and_case",
    oracle="""
    SELECT p_partkey, p_type,
           p_type LIKE '%BRASS' AS ends_brass,
           p_type LIKE '%brass' AS ends_brass_lower,
           upper(p_type) LIKE '%BRASS' AS ends_ci,
           'a_b' LIKE 'a\\_b' ESCAPE '\\' AS underscore_literal,
           'axb' LIKE 'a\\_b' ESCAPE '\\' AS underscore_escaped_no_match
    FROM part WHERE p_partkey <= 20 ORDER BY p_partkey
    """,
)
def e17_like_escape_and_case(spark, sf_dir):
    """LIKE is case-sensitive; ESCAPE makes _ literal
    (sqllogictest LIKE corners)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 20)
    return p.orderBy("p_partkey").select(
        "p_partkey",
        "p_type",
        F.col("p_type").like("%BRASS").alias("ends_brass"),
        F.col("p_type").like("%brass").alias("ends_brass_lower"),
        F.upper(F.col("p_type")).like("%BRASS").alias("ends_ci"),
        F.expr(r"'a_b' LIKE 'a\\_b' ESCAPE '\\'").alias("underscore_literal"),
        F.expr(r"'axb' LIKE 'a\\_b' ESCAPE '\\'").alias(
            "underscore_escaped_no_match"
        ),
    )


@q(
    "e18_order_by_expression_stability",
    oracle="""
    SELECT n_name, n_nationkey
    FROM nation
    ORDER BY length(n_name) DESC, n_name ASC
    """,
)
def e18_order_by_expression_stability(spark, sf_dir):
    """ORDER BY an expression with a deterministic tiebreak — full
    result, not LIMITed, so the order contract is the row multiset
    (the driver compares order-insensitively; the tiebreak makes the
    query itself deterministic for users)."""
    n = t(spark, sf_dir, "nation")
    return n.orderBy(
        F.length("n_name").desc(), F.col("n_name").asc()
    ).select("n_name", "n_nationkey")


@q(
    "e19_cast_string_number_corners",
    oracle="""
    SELECT TRY_CAST('  42  ' AS INTEGER) AS trimmed,
           CAST(ROUND(TRY_CAST('4.9' AS DECIMAL(10,1))) AS INTEGER) AS rounded,
           TRY_CAST('1e3' AS DOUBLE) AS sci,
           TRY_CAST('12abc' AS INTEGER) AS bad_null,
           TRY_CAST('Infinity' AS DOUBLE) AS inf,
           TRY_CAST('' AS INTEGER) AS empty_null,
           CAST(TRUE AS INTEGER) AS bool_int
    """,
)
def e19_cast_string_number_corners(spark, sf_dir):
    """String->number cast corners: whitespace trimmed, '4.9'
    rounds via an explicit decimal ROUND (engines disagree on implicit
    decimal->int rounding), garbage suffix rejected, Infinity accepted,
    '' is NULL (casts.rs string-parse family)."""
    return spark.sql(
        """
        SELECT TRY_CAST('  42  ' AS INTEGER) AS trimmed,
               CAST(ROUND(TRY_CAST('4.9' AS DECIMAL(10,1)), 0) AS INTEGER) AS rounded,
               TRY_CAST('1e3' AS DOUBLE) AS sci,
               TRY_CAST('12abc' AS INTEGER) AS bad_null,
               TRY_CAST('Infinity' AS DOUBLE) AS inf,
               TRY_CAST('' AS INTEGER) AS empty_null,
               CAST(TRUE AS INTEGER) AS bool_int
        """
    )


@q(
    "e20_corr_agg_and_stddev_single_row",
    oracle="""
    SELECT c_nationkey,
           CAST(stddev_samp(acctbal) AS DOUBLE) AS sd_samp,
           CAST(stddev_pop(acctbal) AS DOUBLE) AS sd_pop,
           count(*) AS n
    FROM (SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
          FROM customer WHERE c_custkey <= 30)
    GROUP BY c_nationkey
    """,
)
def e20_stddev_single_row_groups(spark, sf_dir):
    """STDDEV_SAMP of a 1-row group is NULL (n-1 = 0) while STDDEV_POP
    is 0 — the degrees-of-freedom corner (PostgresAggTests)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 30)
        .select(
            "c_nationkey", F.col("c_acctbal").cast("decimal(12,2)").alias("acctbal")
        )
    )
    return c.groupBy("c_nationkey").agg(
        F.stddev_samp("acctbal").cast("double").alias("sd_samp"),
        F.stddev_pop("acctbal").cast("double").alias("sd_pop"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "e21_deterministic_sample",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 20 = 0
    """,
)
def e21_deterministic_sample(spark, sf_dir):
    """The sample operator (reference ``operator/sample.rs:43``) in its
    scale-sane form: keyed Bernoulli sampling via a portable hash —
    deterministic (re-runnable, oracle-checkable), uniform, and pushed
    down as an ordinary filter (no coordinator round like true random
    sampling needs). ``df.sample()`` remains for exploratory use; this
    is the reproducible pipeline variant."""
    from feldera_spark.functions import md5_i64

    e = t(spark, sf_dir, "events")
    return e.filter(
        md5_i64(F.col("event_id").cast("string")) % 20 == 0
    ).select("event_id", "event_type")


@q(
    "e22_time_of_day",
    oracle="""
    SELECT event_id,
           strftime(ts, '%H:%M:%S') AS tod,
           CAST(extract(HOUR FROM ts) * 3600
                + extract(MINUTE FROM ts) * 60
                + floor(extract(SECOND FROM ts)) AS BIGINT) AS tod_secs
    FROM events WHERE event_id <= 200
    """,
)
def e22_time_of_day(spark, sf_dir):
    """TIME-type shim (SURVEY §1.2 gap): Spark has no TIME type; the
    portable representation is the HH:mm:ss string + seconds-since-
    midnight integer (reference ``sqllib`` Time, ``casts.rs`` TIME
    casts). Built from EXTRACT fields — session-timezone-independent
    on TIMESTAMP_NTZ."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    c = F.col("ts")
    secs = (
        F.hour(c).cast("bigint") * 3600
        + F.minute(c).cast("bigint") * 60
        + F.floor(F.expr("extract(SECOND FROM ts)")).cast("bigint")
    )
    tod = F.concat_ws(
        ":",
        F.lpad(F.hour(c).cast("string"), 2, "0"),
        F.lpad(F.minute(c).cast("string"), 2, "0"),
        F.lpad(F.floor(F.expr("extract(SECOND FROM ts)")).cast("string"), 2, "0"),
    )
    return e.select("event_id", tod.alias("tod"), secs.alias("tod_secs"))


@q(
    "e23_map_aggregate",
    oracle="""
    SELECT c_nationkey,
           to_json(map(list(seg ORDER BY seg), list(n ORDER BY seg))) AS seg_counts
    FROM (SELECT c_nationkey, c_mktsegment AS seg, count(*) AS n
          FROM customer GROUP BY 1, 2)
    GROUP BY c_nationkey
    """,
)
def e23_map_aggregate(spark, sf_dir):
    """MAP aggregate (SURVEY §2.4 'MAP aggregate' row): build a
    key->count map per group — Spark ``map_from_entries`` over a
    key-sorted ``collect_list`` (deterministic entry order, so the
    JSON serialization is comparable across engines)."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.groupBy("c_nationkey").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("seg", "n"))))
        ).alias("seg_counts")
    )


_CAST_ROWS = [
    ("int_pos", "123"), ("int_neg", "-42"), ("int_big", "99999999999"),
    ("dec", "12.75"), ("dec_neg", "-0.5"), ("exp", "2.5e2"),
    ("bool_t", "true"), ("bool_f", "false"),
    ("date", "2024-02-29"), ("ts", "2024-02-29 12:30:45"),
    ("junk", "abc"), ("empty", ""), ("ws", "  7  "),
]


@q(
    "e24_cast_matrix",
    oracle="""
    WITH src(label, s) AS (VALUES
      ('int_pos', '123'), ('int_neg', '-42'), ('int_big', '99999999999'),
      ('dec', '12.75'), ('dec_neg', '-0.5'), ('exp', '2.5e2'),
      ('bool_t', 'true'), ('bool_f', 'false'),
      ('date', '2024-02-29'), ('ts', '2024-02-29 12:30:45'),
      ('junk', 'abc'), ('empty', ''), ('ws', '  7  '))
    SELECT label,
      CAST(ROUND(TRY_CAST(s AS DECIMAL(20,4)), 0) AS BIGINT) AS to_i64,
      TRY_CAST(ROUND(TRY_CAST(s AS DECIMAL(20,4)), 0) AS SMALLINT) AS to_i16,
      CAST(TRY_CAST(s AS DOUBLE) AS DOUBLE) AS to_f64,
      CAST(TRY_CAST(s AS DECIMAL(10,2)) AS DOUBLE) AS to_dec,
      CAST(TRY_CAST(s AS BOOLEAN) AS VARCHAR) AS to_bool,
      CAST(TRY_CAST(s AS DATE) AS VARCHAR) AS to_date,
      CAST(TRY_CAST(s AS TIMESTAMP) AS VARCHAR) AS to_ts
    FROM src
    """,
)
def e24_cast_matrix(spark, sf_dir):
    """Systematic string->type cast matrix (``casts.rs`` string-parse +
    overflow families, VERDICT r1 'casts only sampled'): 13 canonical
    inputs x 7 targets under SAFE semantics. Numeric-string -> integer
    goes through an explicit DECIMAL + ROUND so both engines apply the
    same rounding rule (they disagree on implicit paths: DuckDB rounds,
    Spark rejects non-integral strings). Overflow (int_big -> SMALLINT)
    is NULL under TRY on both."""
    df = spark.createDataFrame(_CAST_ROWS, "label STRING, s STRING")
    df.createOrReplaceTempView("e24_src")
    return spark.sql(
        """
        SELECT label,
          CAST(ROUND(TRY_CAST(s AS DECIMAL(20,4)), 0) AS BIGINT) AS to_i64,
          TRY_CAST(ROUND(TRY_CAST(s AS DECIMAL(20,4)), 0) AS SMALLINT) AS to_i16,
          CAST(TRY_CAST(s AS DOUBLE) AS DOUBLE) AS to_f64,
          CAST(TRY_CAST(s AS DECIMAL(10,2)) AS DOUBLE) AS to_dec,
          CAST(TRY_CAST(s AS BOOLEAN) AS STRING) AS to_bool,
          CAST(TRY_CAST(s AS DATE) AS STRING) AS to_date,
          CAST(TRY_CAST(s AS TIMESTAMP_NTZ) AS STRING) AS to_ts
        FROM e24_src
        """
    )


@q(
    "e25_variant_path_corners",
    oracle="""
    WITH src(label, j) AS (VALUES
      ('nested',    '{"a": {"b": [10, 20, {"c": 30}]}}'),
      ('null_val',  '{"a": null}'),
      ('missing',   '{"x": 1}'),
      ('arr_root',  '[1, 2, 3]'),
      ('num_str',   '{"a": "42"}'),
      ('bool',      '{"a": true}'),
      ('deep_miss', '{"a": {"b": 1}}'),
      ('float',     '{"a": 2.5}'))
    SELECT label,
      CAST(json_extract(j, '$.a.b[1]') AS BIGINT) AS path_idx,
      CAST(json_extract(j, '$.a.b[2].c') AS BIGINT) AS path_deep,
      CAST(json_extract(j, '$[0]') AS BIGINT) AS root_idx,
      json_extract(j, '$.a') IS NULL OR json_extract(j, '$.a') = 'null'
          AS a_is_null_or_missing,
      json_extract(j, '$.a') IS NULL AS a_missing,
      CAST(ROUND(TRY_CAST(json_extract_string(j, '$.a') AS DECIMAL(20,4)), 0) AS BIGINT) AS a_as_int,
      TRY_CAST(json_extract_string(j, '$.a') AS DOUBLE) AS a_as_double,
      CAST(TRY_CAST(json_extract_string(j, '$.a') AS BOOLEAN) AS VARCHAR)
          AS a_as_bool
    FROM src
    """,
)
def e25_variant_path_corners(spark, sf_dir):
    """VARIANT path-navigation corners (``variant.rs`` +
    ``flat_variant.rs``, VERDICT r1 'variant only sampled'): nested
    array subscripts in paths, JSON null vs MISSING field (3 states —
    the classic VARIANT trap), root-level arrays, and typed extraction
    coercion (string "42" -> int, bool, float) under SAFE semantics."""
    rows = [
        ("nested", '{"a": {"b": [10, 20, {"c": 30}]}}'),
        ("null_val", '{"a": null}'),
        ("missing", '{"x": 1}'),
        ("arr_root", "[1, 2, 3]"),
        ("num_str", '{"a": "42"}'),
        ("bool", '{"a": true}'),
        ("deep_miss", '{"a": {"b": 1}}'),
        ("float", '{"a": 2.5}'),
    ]
    df = spark.createDataFrame(rows, "label STRING, j STRING")
    return df.select(
        "label",
        F.expr("variant_get(parse_json(j), '$.a.b[1]', 'bigint')").alias(
            "path_idx"
        ),
        F.expr("variant_get(parse_json(j), '$.a.b[2].c', 'bigint')").alias(
            "path_deep"
        ),
        F.expr("variant_get(parse_json(j), '$[0]', 'bigint')").alias(
            "root_idx"
        ),
        # JSON null and a missing field both surface as SQL NULL from a
        # typed variant_get — the "is null or missing" predicate
        F.expr("variant_get(parse_json(j), '$.a', 'string')")
        .isNull()
        .alias("a_is_null_or_missing"),
        # MISSING distinguished from JSON null: get_json_object returns
        # NULL for missing but the string 'null' for a JSON null
        F.get_json_object(F.col("j"), "$.a").isNull().alias("a_missing"),
        F.expr(
            "CAST(ROUND(try_cast(variant_get(parse_json(j), '$.a', 'string') "
            "AS DECIMAL(20,4)), 0) AS BIGINT)"
        ).alias("a_as_int"),
        F.expr("try_cast(variant_get(parse_json(j), '$.a', 'string') AS DOUBLE)")
        .alias("a_as_double"),
        F.expr(
            "CAST(try_cast(variant_get(parse_json(j), '$.a', 'string') "
            "AS BOOLEAN) AS STRING)"
        ).alias("a_as_bool"),
    )


@q(
    "e26_full_outer_corners",
    oracle="""
    SELECT coalesce(a.k, b.k) AS k, a.va, b.vb,
           a.k IS NULL AS only_right, b.k IS NULL AS only_left
    FROM (SELECT c_nationkey AS k, count(*) AS va FROM customer
          WHERE c_custkey <= 500 GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, count(*) AS vb FROM supplier GROUP BY 1) b
    ON a.k = b.k
    """,
)
def e26_full_outer_corners(spark, sf_dir):
    """FULL OUTER with one-sided groups: COALESCE over the two key
    columns and NULL-side predicates — the padding-row semantics
    (outer_join.rs)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("va"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("vb"))
    )
    a, b = c.alias("a"), s.alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    return j.select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
        F.col("a.va").alias("va"),
        F.col("b.vb").alias("vb"),
        F.col("a.k").isNull().alias("only_right"),
        F.col("b.k").isNull().alias("only_left"),
    )


@q(
    "e27_exists_not_exists",
    oracle="""
    SELECT n_nationkey, n_name,
           EXISTS (SELECT 1 FROM customer c
                   WHERE c.c_nationkey = n.n_nationkey
                     AND c.c_acctbal > 9000) AS has_rich,
           NOT EXISTS (SELECT 1 FROM supplier s
                       WHERE s.s_nationkey = n.n_nationkey) AS no_suppliers
    FROM nation n
    """,
)
def e27_exists_not_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS in the projection (decorrelated
    to semi/anti joins by both engines)."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("e27_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("e27_customer")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("e27_supplier")
    return spark.sql(
        """
        SELECT n_nationkey, n_name,
               EXISTS (SELECT 1 FROM e27_customer c
                       WHERE c.c_nationkey = n.n_nationkey
                         AND c.c_acctbal > 9000) AS has_rich,
               NOT EXISTS (SELECT 1 FROM e27_supplier s
                           WHERE s.s_nationkey = n.n_nationkey) AS no_suppliers
        FROM e27_nation n
        """
    )


@q(
    "e28_division_null_semantics",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice / nullif(o_orderkey % 3, 3) AS DOUBLE) AS by_mod,
           CAST(o_totalprice / (o_orderkey % 3) AS DOUBLE) AS div_maybe_zero,
           o_orderkey // nullif(o_orderkey % 3, 0) AS int_div_null
    FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey
    """,
)
def e28_division_null_semantics(spark, sf_dir):
    """Division by zero: the reference's SAFE form returns NULL
    (sqllib div_null); Spark's ANSI default ERRORS, so the engine maps
    it through try_divide — DuckDB's plain / already yields NULL.
    Exercises both a pre-guarded (nullif) and an unguarded divisor."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 30)
    mod3 = F.col("o_orderkey") % 3
    return o.orderBy("o_orderkey").select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.nullif(mod3, F.lit(3)))
        .cast("double")
        .alias("by_mod"),
        F.try_divide(F.col("o_totalprice"), mod3).cast("double")
        .alias("div_maybe_zero"),
        F.try_divide(F.col("o_orderkey"), F.nullif(mod3, F.lit(0)))
        .cast("bigint")
        .alias("int_div_null"),
    )


@q(
    "e29_string_edge_args",
    oracle="""
    SELECT c_custkey,
           substr(c_name, -4, 3) AS neg_start,
           repeat(c_mktsegment, 0) AS rep0,
           translate(c_name, 'Cusm', 'XYZW') AS trans,
           split_part(c_name, '#', 2) AS part2,
           split_part(c_name, '#', 9) AS part_oob,
           lpad(c_mktsegment, 3, '*') AS pad_truncates,
           reverse(c_mktsegment) AS rev
    FROM customer WHERE c_custkey <= 15 ORDER BY c_custkey
    """,
)
def e29_string_edge_args(spark, sf_dir):
    """String-function argument corners both engines pin identically:
    negative substr start counts from the end, repeat(x, 0) = '',
    split_part beyond the last field = '', lpad to a SHORTER length
    truncates."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 15)
    return c.orderBy("c_custkey").select(
        "c_custkey",
        F.substring(F.col("c_name"), -4, 3).alias("neg_start"),
        F.repeat(F.col("c_mktsegment"), 0).alias("rep0"),
        F.translate(F.col("c_name"), "Cusm", "XYZW").alias("trans"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("part2"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(9)).alias("part_oob"),
        F.lpad(F.col("c_mktsegment"), 3, "*").alias("pad_truncates"),
        F.reverse(F.col("c_mktsegment")).alias("rev"),
    )


@q(
    "e30_array_one_based_corners",
    oracle="""
    SELECT p_partkey,
           str_split(p_type, ' ')[2] AS second_word,
           str_split(p_type, ' ')[9] AS oob_null,
           str_split(p_type, ' ')[-1] AS last_word,
           list_position(str_split(p_type, ' '), 'BRASS') AS brass_pos,
           len(str_split(p_type, ' ')) AS n_words,
           coalesce(array_to_string(list_slice(str_split(p_type, ' '), 2, 3), '-'), '') AS middle
    FROM part WHERE p_partkey <= 25 ORDER BY p_partkey
    """,
)
def e30_array_one_based_corners(spark, sf_dir):
    """Feldera arrays are 1-BASED (docs/sql/array.md) — element_at is
    the matching Spark accessor: [2] = second element, out-of-bounds =
    NULL (SAFE), [-1] = last, slice(2, len 2) = elements 2..3. A plain
    Spark `col[i]` would be 0-based — the dialect front-end rewrites
    subscripts to element_at for exactly this reason."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 25)
    words = F.split(F.col("p_type"), " ")
    return p.orderBy("p_partkey").select(
        "p_partkey",
        F.try_element_at(words, F.lit(2)).alias("second_word"),
        F.try_element_at(words, F.lit(9)).alias("oob_null"),
        F.try_element_at(words, F.lit(-1)).alias("last_word"),
        F.array_position(words, "BRASS").cast("bigint").alias("brass_pos"),
        F.size(words).cast("bigint").alias("n_words"),
        F.array_join(F.slice(words, 2, 2), "-").alias("middle"),
    )


@q(
    "e31_gunzip_roundtrip",
    oracle="""
    SELECT doc_id, text AS roundtrip FROM documents WHERE doc_id < 200
    """,
)
def e31_gunzip_roundtrip(spark, sf_dir):
    """GUNZIP (sqllib binary.rs — round-3 'partial' now closed): the
    document text is gzip-compressed in-plan (Arrow-batched pandas UDF)
    and decompressed with functions.gunzip; the oracle is the RAW text,
    so the hash check proves a bit-exact round trip through real gzip
    bytes — not a stub."""
    from pyspark.sql.functions import pandas_udf

    from feldera_spark.functions import gunzip

    def _gzip_fn(s):
        import gzip as _g

        return s.map(
            lambda v: None if v is None else _g.compress(v.encode("utf-8"), 5)
        )

    _gzip = pandas_udf(_gzip_fn, "binary")

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id", gunzip(_gzip(F.col("text"))).alias("roundtrip")
    )
