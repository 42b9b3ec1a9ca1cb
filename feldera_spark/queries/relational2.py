"""Relational coverage, batch 2 (SURVEY §2.4 aggregate variants, §2.9
scalar families: array, map, binary, casts, pattern matching, timestamp
ceil/floor).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.functions import ceil_ts, floor_ts
from feldera_spark.queries._util import dec2, t

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
    "q50_array_funcs",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           len(toks) AS n,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           array_to_string(toks[1:3], '_') AS head3,
           list_contains(toks, 'the') AS has_the,
           coalesce(list_position(toks, 'the'), 0) AS the_pos,
           len(list_distinct(toks)) AS n_distinct,
           list_sort(list_distinct(toks))[1] AS min_tok,
           list_reverse(toks)[1] AS rev_first,
           len(list_intersect(toks, ['the','a','of'])) AS n_common_stop
    FROM tk
    """,
)
def q50_array_funcs(spark, sf_dir):
    """Array function family (sqllib array.rs:12-985): 1-based subscripts
    (element_at matches Feldera's convention), slice, position, distinct,
    sort, reverse, intersect."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("head3"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "the").alias("the_pos"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("min_tok"),
        F.element_at(F.reverse(toks), 1).alias("rev_first"),
        F.size(F.array_intersect(F.array_distinct(toks), F.array(F.lit("the"), F.lit("a"), F.lit("of")))).alias("n_common_stop"),
    )


@q(
    "q51_higher_order_funcs",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 30)
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CAST(to_json(list_transform(toks[1:4], x -> upper(x))) AS VARCHAR) AS head_upper,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars
    FROM tk
    """,
)
def q51_higher_order_funcs(spark, sf_dir):
    """Higher-order array functions (ARRAY_EXISTS/TRANSFORM — array.rs)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.to_json(F.transform(F.slice(toks, 1, 4), lambda x: F.upper(x))).alias("head_upper"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@q(
    "q52_map_funcs",
    oracle="""
    WITH mm AS (
      SELECT n_nationkey,
             map(['name', 'region'], [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
      FROM nation
    )
    SELECT n_nationkey,
           CAST(to_json(map_keys(m)) AS VARCHAR) AS m_keys,
           CAST(to_json(map_values(m)) AS VARCHAR) AS m_vals,
           m['name'][1] AS name_val,
           cardinality(m) AS m_size,
           list_contains(map_keys(m), 'region') AS has_region
    FROM mm
    """,
)
def q52_map_funcs(spark, sf_dir):
    """MAP constructor/subscript/keys/values (sqllib map.rs). Keys/values
    are compared as arrays — DuckDB's Python MAP representation differs
    from Spark's dict, but the construction order is identical."""
    n = t(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("region")),
        F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
    )
    return n.select(
        "n_nationkey",
        F.to_json(F.map_keys(m)).alias("m_keys"),
        F.to_json(F.map_values(m)).alias("m_vals"),
        F.element_at(m, "name").alias("name_val"),
        F.size(m).alias("m_size"),
        F.array_contains(F.map_keys(m), "region").alias("has_region"),
    )


@q(
    "q53_array_agg_ordered",
    oracle="""
    SELECT c_nationkey,
           CAST(to_json(list(c_name ORDER BY c_acctbal DESC, c_custkey)[1:3]) AS VARCHAR) AS top_names,
           count(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def q53_array_agg_ordered(spark, sf_dir):
    """ARRAY_AGG(x ORDER BY ...) (array.rs:633-681) via sort-of-structs —
    Spark's collect_list has no ORDER BY, so sort after collecting (the
    per-group list is bounded; the sort is local, not a shuffle)."""
    c = t(spark, sf_dir, "customer")
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                (-F.col("c_acctbal")).alias("s"),
                F.col("c_custkey").alias("k"),
                F.col("c_name").alias("v"),
            )
        )
    )
    return c.groupBy("c_nationkey").agg(
        F.to_json(F.transform(F.slice(ordered, 1, 3), lambda x: x["v"])).alias("top_names"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "q54_bit_bool_aggs",
    oracle="""
    SELECT c_mktsegment,
           CAST(bit_and(c_nationkey) AS BIGINT) AS band,
           CAST(bit_or(c_nationkey) AS BIGINT) AS bor,
           CAST(bit_xor(c_nationkey) AS BIGINT) AS bxor,
           bool_and(c_acctbal > -1000) AS all_above,
           bool_or(c_acctbal > 9900) AS any_rich,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_debt
    FROM customer GROUP BY c_mktsegment
    """,
)
def q54_bit_bool_aggs(spark, sf_dir):
    """BIT_AND/OR/XOR + BOOL_AND/OR + COUNTIF (aggregates.rs:1405-1419,
    docs/sql/aggregates.md)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bit_and("c_nationkey").cast("long").alias("band"),
        F.bit_or("c_nationkey").cast("long").alias("bor"),
        F.bit_xor("c_nationkey").cast("long").alias("bxor"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above"),
        F.bool_or(F.col("c_acctbal") > 9900).alias("any_rich"),
        F.count_if(F.col("c_acctbal") < 0).cast("long").alias("n_debt"),
    )


@q(
    "q55_stats_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
           (s2 - s1 * s1 / n) / n AS var_pop,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp,
           sqrt((s2 - s1 * s1 / n) / n) AS stddev_pop
    FROM s
    """,
)
def q55_stats_exact(spark, sf_dir):
    """STDDEV/VAR (docs/sql/aggregates.md) via exact decimal moments —
    bit-identical across engines (built-in stddev differs in the last ulps
    between engines because of summation order)."""
    li = t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.sum(dec2("l_quantity")).cast("double").alias("s1"),
        F.sum(dec2("l_quantity") * dec2("l_quantity")).cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    var_samp = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    var_pop = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    return base.select(
        "l_returnflag",
        "n",
        var_samp.alias("var_samp"),
        var_pop.alias("var_pop"),
        F.sqrt(var_samp).alias("stddev_samp"),
        F.sqrt(var_pop).alias("stddev_pop"),
    )


@q(
    "q56_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS roundtrip,
           TRY_CAST(p_name AS INT) AS bad_cast,
           TRY_CAST(p_brand AS DOUBLE) AS bad_double,
           CASE WHEN p_size = 0 THEN NULL ELSE CAST(p_retailprice / p_size AS DOUBLE) END AS price_per_size
    FROM part WHERE p_partkey < 100
    """,
)
def q56_try_cast(spark, sf_dir):
    """SAFE_CAST / error-free casts (sqllib casts.rs, docs/sql/casts.md:
    NULL on failure) → Spark try_cast/try_divide."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").try_cast("int").alias("roundtrip"),
        F.col("p_name").try_cast("int").alias("bad_cast"),
        F.col("p_brand").try_cast("double").alias("bad_double"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size")).alias("price_per_size"),
    )


@q(
    "q57_like_regex",
    oracle="""
    SELECT p_partkey, p_name,
           p_name LIKE '%bolt%' AS has_bolt,
           p_name ILIKE '%BOLT%' AS has_bolt_ci,
           regexp_matches(p_name, '^(red|blue)') AS color_start,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           strpos(p_name, 'e') AS first_e,
           left(p_name, 4) AS head,
           right(p_name, 3) AS tail
    FROM part WHERE p_partkey < 120
    """,
)
def q57_like_regex(spark, sf_dir):
    """LIKE/ILIKE/RLIKE + regexp_replace + POSITION/LEFT/RIGHT
    (string.rs:324-598)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    return p.select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_name").ilike("%BOLT%").alias("has_bolt_ci"),
        F.col("p_name").rlike("^(red|blue)").alias("color_start"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.locate("e", F.col("p_name")).alias("first_e"),
        F.substring("p_name", 1, 4).alias("head"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("tail"),
    )


@q(
    "q58_binary_funcs",
    oracle="""
    SELECT p_partkey,
           lower(hex(encode(p_brand))) AS brand_hex,
           octet_length(encode(p_name)) AS name_bytes,
           base64(encode(p_type)) AS type_b64,
           md5(p_brand) AS brand_md5
    FROM part WHERE p_partkey < 60
    """,
)
def q58_binary_funcs(spark, sf_dir):
    """Binary functions (sqllib binary.rs): TO_HEX, OCTET_LENGTH, base64,
    md5 over byte payloads."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    return p.select(
        "p_partkey",
        F.lower(F.hex(F.encode(F.col("p_brand"), "UTF-8"))).alias("brand_hex"),
        F.octet_length(F.col("p_name")).alias("name_bytes"),
        F.base64(F.encode(F.col("p_type"), "UTF-8")).alias("type_b64"),
        F.md5(F.encode(F.col("p_brand"), "UTF-8")).alias("brand_md5"),
    )


@q(
    "q59_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 300
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q59_intersect_all(spark, sf_dir):
    """INTERSECT ALL (LogicalIntersect :2450) — bag semantics."""
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


@q(
    "q60_ts_ceil_floor",
    oracle="""
    SELECT event_id,
           date_trunc('hour', ts) AS floor_hour,
           CASE WHEN date_trunc('hour', ts) = ts THEN ts
                ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS ceil_hour,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS floor_day,
           CASE WHEN CAST(CAST(ts AS DATE) AS TIMESTAMP) = ts THEN ts
                ELSE CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY END AS ceil_day,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS floor_month
    FROM events WHERE event_id < 200
    """,
)
def q60_ts_ceil_floor(spark, sf_dir):
    """CEIL/FLOOR of timestamps to any unit (timestamp.rs ceil_/floor_
    families) — session-tz-independent NTZ implementations."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        floor_ts(F.col("ts"), "hour").alias("floor_hour"),
        ceil_ts(F.col("ts"), "hour").alias("ceil_hour"),
        floor_ts(F.col("ts"), "day").alias("floor_day"),
        ceil_ts(F.col("ts"), "day").alias("ceil_day"),
        floor_ts(F.col("ts"), "month").alias("floor_month"),
    )
