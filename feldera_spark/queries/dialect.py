"""DDL-driven dialect queries: full Feldera SQL programs submitted through
``PipelineBuilder.sql()`` — TUMBLE/HOP/SESSION table functions, LEFT ASOF
JOIN MATCH_CONDITION, DECLARE RECURSIVE VIEW, SAFE_CAST and 1-based
subscripts all reach the engine from SQL text (frontend.py), not just the
programmatic operators.

These are the "twins" of q41-q45/q48: same semantics, same oracles, but
driven through the dialect front-end, proving a reference user's SQL
program runs unmodified. Reference: ``docs.feldera.com/docs/sql/table.md``,
``grammar.md:730-744``, ``recursion.mdx:30-57``.
"""

from __future__ import annotations

import pandas as pd

from feldera_spark.pipeline import PipelineBuilder
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


def _events_pipeline(spark, sf_dir, ddl: str):
    b = PipelineBuilder(spark).sql(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, ts TIMESTAMP, props VARCHAR);\n"
        + ddl
    )
    return b.connect_table("events", t(spark, sf_dir, "events")).create()


@q(
    "q74_ddl_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q74_ddl_tumble(spark, sf_dir):
    """TUMBLE table function from SQL DDL (table.md:24-63;
    CalciteToDBSPCompiler.java:653-667) → frontend rewrite → window()."""
    p = _events_pipeline(
        spark,
        sf_dir,
        """
        CREATE MATERIALIZED VIEW hourly AS
        SELECT window_start, event_type, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
        """,
    )
    return p.view("hourly")


@q(
    "q75_ddl_hop",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS window_start,
           count(*) AS n
    FROM events, (VALUES (0),(1),(2),(3)) AS offs(k)
    GROUP BY 1
    """,
)
def q75_ddl_hop(spark, sf_dir):
    """HOP table function from SQL DDL (table.md:66-111): slide 15min,
    size 1h — each row lands in 4 windows via Spark's TimeWindowing."""
    p = _events_pipeline(
        spark,
        sf_dir,
        """
        CREATE MATERIALIZED VIEW hopping AS
        SELECT window_start, count(*) AS n
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start
        """,
    )
    return p.view("hopping")


@q(
    "q76_ddl_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q76_ddl_session(spark, sf_dir):
    """SESSION table function from SQL DDL (table.md:114-150) →
    gaps-and-islands rewrite with per-row window_start/window_end."""
    p = _events_pipeline(
        spark,
        sf_dir,
        """
        CREATE MATERIALIZED VIEW sessions AS
        SELECT user_id, window_start AS session_start,
               window_end AS session_end, count(*) AS n_events
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end
        """,
    )
    return p.view("sessions")


@q(
    "q77_ddl_asof",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts AS pts, max(event_id) AS purchase_id,
                      max(CAST(value AS DOUBLE)) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
         ranked AS (
           SELECT v.event_id, v.user_id, v.ts,
                  p.purchase_id, p.purchase_value,
                  row_number() OVER (PARTITION BY v.event_id
                                     ORDER BY p.pts DESC) AS rn
           FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.pts <= v.ts
         )
    SELECT event_id, user_id, ts, purchase_id, purchase_value
    FROM ranked WHERE rn = 1 OR purchase_id IS NULL
    """,
)
def q77_ddl_asof(spark, sf_dir):
    """LEFT ASOF JOIN … MATCH_CONDITION from SQL DDL (grammar.md:730-744)
    → frontend rewrite → operators.joins.asof_join (one per-key shuffle).
    Purchases are pre-deduped per (user, ts) so the as-of match is
    tie-free and deterministic."""
    p = _events_pipeline(
        spark,
        sf_dir,
        """
        CREATE LOCAL VIEW views AS
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view';
        CREATE LOCAL VIEW purchases AS
        SELECT user_id, ts AS pts, max(event_id) AS purchase_id,
               max(CAST(value AS DOUBLE)) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts;
        CREATE MATERIALIZED VIEW attributed AS
        SELECT event_id, user_id, ts, purchase_id, purchase_value
        FROM views v LEFT ASOF JOIN purchases p
        MATCH_CONDITION (v.ts >= p.pts) ON v.user_id = p.user_id
        """,
    )
    return p.view("attributed")


@q(
    "q78_ddl_recursive",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
      FROM supplier WHERE s_suppkey <= 1
      UNION ALL
      SELECT s.s_suppkey AS node, anc.root AS root, anc.depth + 1 AS depth
      FROM supplier s JOIN anc ON CAST(floor(s.s_suppkey / 2) AS BIGINT) = anc.node
      WHERE s.s_suppkey > 1
    )
    SELECT node, root, depth FROM anc
    """,
)
def q78_ddl_recursive(spark, sf_dir):
    """DECLARE RECURSIVE VIEW from SQL DDL (recursion.mdx:30-57) →
    fixpoint evaluation of the self-referencing body (frontend.py)."""
    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR);
        DECLARE RECURSIVE VIEW anc (node BIGINT, root BIGINT, depth INT);
        CREATE MATERIALIZED VIEW anc AS
        SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
        FROM supplier WHERE s_suppkey <= 1
        UNION
        SELECT s.s_suppkey AS node, anc.root AS root, anc.depth + 1 AS depth
        FROM supplier s JOIN anc ON CAST(floor(s.s_suppkey / 2) AS BIGINT) = anc.node
        WHERE s.s_suppkey > 1
        """
    )
    p = b.connect_table(
        "supplier", t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    ).create()
    return p.view("anc")


@q(
    "q79_ddl_scalars",
    oracle="""
    WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           TRY_CAST(text AS INT) AS bad_cast,
           toks[1] AS first_tok,
           toks[2] AS second_tok,
           len(toks) AS n_toks
    FROM tk
    """,
)
def q79_ddl_scalars(spark, sf_dir):
    """SAFE_CAST → try_cast and 1-based subscripts → element_at from SQL
    DDL (docs/sql/casts.md; array.md: Feldera arrays are 1-indexed)."""
    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE documents (doc_id BIGINT, text VARCHAR);
        CREATE LOCAL VIEW tk AS
        SELECT doc_id, text, split(text, ' ') AS toks
        FROM documents WHERE doc_id < 50;
        CREATE MATERIALIZED VIEW scalars AS
        SELECT doc_id,
               SAFE_CAST(text AS INT) AS bad_cast,
               toks[1] AS first_tok,
               toks[2] AS second_tok,
               size(toks) AS n_toks
        FROM tk
        """
    )
    p = b.connect_table(
        "documents", t(spark, sf_dir, "documents").select("doc_id", "text")
    ).create()
    return p.view("scalars")


@q(
    "q80_create_aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ssq,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q80_create_aggregate(spark, sf_dir):
    """CREATE AGGREGATE (DBSPCompiler.java:603-616): user-defined
    aggregate declared in DDL, implemented as an Arrow-batched
    GROUPED_AGG pandas UDF, called from a view body. ``ssq`` (sum of
    squares) is linear — the incremental classification hook marks it
    delta-decomposable."""

    def ssq(v: pd.Series) -> int:
        x = v.astype("int64")
        return int((x * x).sum())

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE lineitem (l_quantity DOUBLE, l_returnflag VARCHAR);
        CREATE AGGREGATE ssq(x BIGINT) RETURNS BIGINT;
        CREATE LOCAL VIEW ssq_v AS
        SELECT l_returnflag, ssq(CAST(l_quantity AS BIGINT)) AS ssq
        FROM lineitem GROUP BY l_returnflag;
        CREATE LOCAL VIEW cnt_v AS
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag;
        CREATE MATERIALIZED VIEW by_flag AS
        SELECT s.l_returnflag, s.ssq, c.n
        FROM ssq_v s JOIN cnt_v c ON s.l_returnflag = c.l_returnflag
        """
    )
    p = (
        b.implement_aggregate("ssq", ssq, linear=True)
        .connect_table(
            "lineitem",
            t(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag"),
        )
        .create()
    )
    return p.view("by_flag")


@q(
    "q81_ddl_emit_final",
    oracle="""
    WITH b AS (SELECT max(ts) - INTERVAL 3 DAY AS bound FROM events)
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events, b
    WHERE CAST(CAST(ts AS DATE) AS TIMESTAMP) <= b.bound
    GROUP BY 1
    """,
)
def q81_ddl_emit_final(spark, sf_dir):
    """WITH-properties end-to-end from DDL: an ``append_only`` table
    with LATENESS feeding an ``emit_final`` view
    (``docs/sql/streaming.md:36-57``,
    ``docs/tutorials/time-series.md:341-375``) — only day-buckets at or
    below the derived waterline (max(ts) − 3 days, the min-over-inputs
    MonotoneAnalyzer rule) are emitted: rows that can never be
    retracted."""
    p = PipelineBuilder(spark).sql(
        """
        CREATE TABLE events (
            ts TIMESTAMP LATENESS INTERVAL 3 DAYS,
            value DOUBLE
        ) WITH ('append_only' = 'true');
        CREATE MATERIALIZED VIEW daily_final
        WITH ('emit_final' = 'd')
        AS SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d,
                  count(*) AS n,
                  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)
        """
    ).connect_table(
        "events", t(spark, sf_dir, "events").select("ts", "value")
    ).create()
    return p.view("daily_final")
