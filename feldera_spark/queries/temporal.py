"""Time-series / streaming-shaped operators (SURVEY §2.6, §2.8) with
batch-evaluable DuckDB oracles.

TUMBLE/HOP/SESSION mirror the reference's table functions
(``docs/sql/table.md``; ``DBSPHopOperator``, ``SessionRewriteRule``);
as-of/range joins mirror ``operator/asof_join.rs`` / ``join_range.rs``;
the recursive query mirrors ``DECLARE RECURSIVE VIEW``
(``docs/sql/recursion.mdx``); ``latest_by_key`` mirrors upsert-keyed
input normalization (``operator/dynamic/input_upsert.rs``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feldera_spark.operators.joins import asof_join, range_join
from feldera_spark.operators.keyed import latest_by_key, neighborhood
from feldera_spark.operators.recursion import fixpoint
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
    "q41_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q41_tumble(spark, sf_dir):
    """TUMBLE(t, DESCRIPTOR(ts), INTERVAL 1 HOUR) → Spark window()."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@q(
    "q42_hop",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS window_start,
           count(*) AS n
    FROM events, (VALUES (0),(1),(2),(3)) AS offs(k)
    GROUP BY 1
    """,
)
def q42_hop(spark, sf_dir):
    """HOP windows (size 1h, slide 15min): each row lands in 4 windows
    (ExpandHop flat-map, CircuitOptimizer.java:143) → Spark sliding window()."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@q(
    "q43_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
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
def q43_session(spark, sf_dir):
    """SESSION windows with 30-minute gap → Spark session_window()."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@q(
    "q44_asof_join",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts AS pts, event_id AS purchase_id, value AS purchase_value
               FROM events WHERE event_type = 'purchase'),
         ranked AS (
           SELECT v.event_id, v.user_id, v.ts,
                  p.purchase_id, p.purchase_value,
                  row_number() OVER (PARTITION BY v.event_id
                                     ORDER BY p.pts DESC, p.purchase_id DESC) AS rn
           FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.pts <= v.ts
         )
    SELECT event_id, user_id, ts, purchase_id, purchase_value
    FROM ranked WHERE rn = 1 OR purchase_id IS NULL
    """,
)
def q44_asof_join(spark, sf_dir):
    """LEFT ASOF JOIN (operator/asof_join.rs:37): for each 'view' event, the
    latest 'purchase' by the same user at-or-before it. Our implementation
    is a single per-key shuffle (union + last_value window), not an
    inequality join."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("pts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="pts",
        right_cols=["purchase_id", "purchase_value"],
        tiebreak="purchase_id",
    ).select("event_id", "user_id", "ts", "purchase_id", "purchase_value")


@q(
    "q45_range_join",
    oracle="""
    SELECT c.event_id, count(v.event_id) AS n_views_1h
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') c
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = c.user_id
     AND v.ts >= c.ts - INTERVAL '1 hour' AND v.ts <= c.ts
    GROUP BY c.event_id
    """,
)
def q45_range_join(spark, sf_dir):
    """Banded range join (operator/join_range.rs:21): views within 1h before
    each purchase, bucketed to equi-join form (no cartesian)."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    joined = range_join(
        purchases,
        views,
        left_ts="ts",
        right_ts="vts",
        lower=F.expr("INTERVAL -1 HOURS"),
        upper=F.expr("INTERVAL 0 SECONDS"),
        on=["user_id"],
        bucket_seconds=3600,
    )
    counts = joined.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_views_1h"))
    # LEFT semantics: purchases with zero in-band views keep count 0.
    return (
        purchases.select("event_id")
        .join(counts, on="event_id", how="left")
        .select("event_id", F.coalesce("n_views_1h", F.lit(0)).alias("n_views_1h"))
    )


@q(
    "q46_latest_by_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q46_latest_by_key(spark, sf_dir):
    """Upsert normalization: latest row per key (input_upsert.rs)."""
    e = t(spark, sf_dir, "events")
    return latest_by_key(
        e, keys=["user_id"], order_by=[F.col("ts"), F.col("event_id")]
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
    )


@q(
    "q47_neighborhood",
    oracle="""
    WITH pos AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS p
      FROM orders
    ), anchor AS (SELECT p AS ap FROM pos WHERE o_orderkey = 500)
    SELECT o_orderkey, o_totalprice, p - ap AS offset
    FROM pos, anchor WHERE p BETWEEN ap - 3 AND ap + 3
    """,
)
def q47_neighborhood(spark, sf_dir):
    """Paginated window around an anchor row (operator/neighborhood.rs:97)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return neighborhood(
        o,
        order_by=[F.col("o_totalprice"), F.col("o_orderkey")],
        anchor_filter=F.col("o_orderkey") == 500,
        before=3,
        after=3,
    ).select("o_orderkey", "o_totalprice", "offset")


@q(
    "q48_recursive_hierarchy",
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
def q48_recursive_hierarchy(spark, sf_dir):
    """DECLARE RECURSIVE VIEW (recursion.mdx; operator/recursive.rs:262):
    depth of each supplier in the implicit binary-tree hierarchy
    (parent(k) = k/2), evaluated semi-naively by the fixpoint driver."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey")
    seed = (
        s.filter(F.col("s_suppkey") <= 1)
        .select(
            F.col("s_suppkey").alias("node"),
            F.col("s_suppkey").alias("root"),
            F.lit(0).alias("depth"),
        )
    )
    children = s.filter(F.col("s_suppkey") > 1).select(
        F.col("s_suppkey").alias("child"),
        F.floor(F.col("s_suppkey") / 2).cast("long").alias("parent"),
    )

    def step(frontier):
        return (
            children.join(frontier, children.parent == frontier.node)
            .select(
                F.col("child").alias("node"),
                F.col("root"),
                (F.col("depth") + 1).alias("depth"),
            )
        )

    return fixpoint(seed, step)


@q(
    "q49_temporal_filter",
    oracle="""
    SELECT event_type, count(*) AS n_recent
    FROM events
    WHERE ts > (SELECT max(ts) - INTERVAL '7 days' FROM events)
    GROUP BY event_type
    """,
)
def q49_temporal_filter(spark, sf_dir):
    """NOW()-style temporal filter (streaming.md:59-100), anchored to
    max(ts) for determinism: WHERE ts > <clock> - INTERVAL 7 DAYS. In
    streaming mode the anchor becomes the trigger-time clock input
    (ImplementNow, CircuitOptimizer.java:81)."""
    e = t(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    return (
        e.join(F.broadcast(anchor))
        .filter(F.col("ts") > F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )


@q(
    "q73_lateness_drop",
    oracle="""
    WITH chunked AS (
      SELECT *, event_id % 4 AS chunk FROM events
    ),
    chunk_max AS (
      SELECT chunk, max(ts) AS mx FROM chunked GROUP BY chunk
    ),
    waterline AS (
      -- waterline IN EFFECT for chunk k = max ts of chunks < k, minus lateness
      SELECT c.chunk,
             (SELECT max(m.mx) FROM chunk_max m WHERE m.chunk < c.chunk)
               - INTERVAL '1' HOUR AS bound
      FROM chunk_max c
    )
    SELECT c.event_id, c.ts, c.user_id
    FROM chunked c JOIN waterline w ON c.chunk = w.chunk
    WHERE w.bound IS NULL OR c.ts >= w.bound
    """,
)
def q73_lateness_drop(spark, sf_dir):
    """LATENESS-driven late-row dropping, end-to-end oracle-checked:
    events arrive in 4 chunks (event_id % 4); rows older than the
    waterline established by PRIOR chunks (max ts − 1h) are dropped at
    ingestion — controlled_filter.rs / DBSPControlledKeyFilterOperator
    semantics, driven by our Waterline."""
    from feldera_spark.streaming.watermark import Waterline

    e = t(spark, sf_dir, "events")
    wl = Waterline("ts", 3600)
    kept = []
    for i in range(4):
        chunk = e.filter(F.col("event_id") % 4 == i).select("event_id", "ts", "user_id")
        kept.append(wl.step(chunk))
    out = kept[0]
    for k in kept[1:]:
        out = out.unionByName(k)
    return out
