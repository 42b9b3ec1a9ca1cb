"""Relational coverage, batch 3: JSON/VARIANT surface, UUID formatting,
EXCEPT distinct, LATERAL correlated subqueries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.queries._util import t
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


@q(
    "q61_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_val,
           to_json(struct_pack(id := event_id, t := event_type)) AS packed
    FROM events WHERE event_id < 100
    """,
)
def q61_json_funcs(spark, sf_dir):
    """VARIANT/JSON surface (sqllib variant.rs, PARSE_JSON/TO_JSON +
    subscript): extraction, missing-key NULL, struct→json."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("t"))
        ).alias("packed"),
    )


@q(
    "q62_uuid_format",
    oracle="""
    WITH h AS (SELECT c_custkey, md5(c_name) AS hx FROM customer WHERE c_custkey < 80)
    SELECT c_custkey,
           substr(hx,1,8) || '-' || substr(hx,9,4) || '-' || substr(hx,13,4)
             || '-' || substr(hx,17,4) || '-' || substr(hx,21,12) AS det_uuid
    FROM h
    """,
)
def q62_uuid_format(spark, sf_dir):
    """UUID type surface (sqllib uuid.rs): deterministic content-derived
    UUID (v5-style md5 formatting) — random uuid() can't be oracle-checked."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 80)
    hx = F.md5(F.encode(F.col("c_name"), "UTF-8"))
    return c.select(
        "c_custkey",
        F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        ).alias("det_uuid"),
    )


@q(
    "q63_except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q63_except_distinct(spark, sf_dir):
    """EXCEPT (set semantics) — subtract() is Spark's distinct EXCEPT."""
    a = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.subtract(b)


@q(
    "q64_lateral_join",
    oracle="""
    SELECT r.r_name, l.n_name
    FROM region r, LATERAL (
      SELECT n_name FROM nation WHERE n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2
    ) l
    """,
)
def q64_lateral_join(spark, sf_dir):
    """LATERAL correlated subquery (grammar LATERAL; LogicalCorrelate
    :375) — Spark SQL supports LATERAL natively."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT r.r_name, l.n_name
        FROM region r, LATERAL (
          SELECT n_name FROM nation WHERE n_regionkey = r.r_regionkey
          ORDER BY n_name LIMIT 2
        ) l
    """)
