"""Nexmark-adapted benchmark queries (SURVEY §6 / BASELINE.md).

The reference's only published benchmark is Nexmark (streaming auctions:
``benchmark/feldera-sql/benchmarks/nexmark/queries/*.sql``, schema
``table.sql``). The driver's testdata has no auction tables, so we derive
bid / auction / person relations *deterministically* from ``events`` —
the SAME derivation in the Spark code and in the DuckDB oracle CTEs, so
every query below stays hash-checkable. Query shapes follow the reference
SQL one-to-one (file cited per query); scale notes:

- ``auction`` is tiny by construction (211 rows at any SF) → broadcast.
- ``person`` is |distinct users| — grows with SF but stays dimension-like
  → broadcast at bench SFs; at 100 TB it would be a shuffle-hash join on
  an already-aggregated (small) side.
- All window/HOP groupings key on (bucket, entity) — high cardinality,
  no hot keys; the only full-fact-table shuffles are the groupBys
  themselves, identical to what the reference's sharded circuit does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Shared derivation: events → bid / auction / person.
# Mirrors nexmark's generator tables (table.sql) at the schema level.
# ---------------------------------------------------------------------------

NEXMARK_CTE = """
    bid AS (
      SELECT event_id,
             user_id AS bidder,
             event_id % 211 AS auction,
             CAST(value AS DECIMAL(12,2)) AS price,
             ts AS date_time
      FROM events
    ),
    auction AS (
      SELECT event_id % 211 AS id,
             (event_id % 211) % 31 AS seller,
             (event_id % 211) % 10 AS category,
             min(ts) AS date_time,
             min(ts) + INTERVAL '36' HOUR AS expires
      FROM events GROUP BY event_id % 211
    ),
    person AS (
      SELECT user_id AS id,
             'user_' || CAST(user_id AS VARCHAR) AS name,
             CASE user_id % 5 WHEN 0 THEN 'OR' WHEN 1 THEN 'ID'
                  WHEN 2 THEN 'CA' WHEN 3 THEN 'WA' ELSE 'NV' END AS state,
             min(ts) AS date_time
      FROM events GROUP BY user_id
    )
"""


def _bid(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").alias("bidder"),
        (F.col("event_id") % 211).alias("auction"),
        F.col("value").cast("decimal(12,2)").alias("price"),
        F.col("ts").alias("date_time"),
    )


def _auction(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("event_id") % 211).alias("id"))
        .agg(F.min("ts").alias("date_time"))
        .withColumn("expires", F.expr("date_time + INTERVAL 36 HOURS"))
        .withColumn("seller", F.col("id") % 31)
        .withColumn("category", F.col("id") % 10)
    )


def _person(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("user_id").alias("id"))
        .agg(F.min("ts").alias("date_time"))
        .withColumn("name", F.concat(F.lit("user_"), F.col("id").cast("string")))
        .withColumn(
            "state",
            F.element_at(
                F.array(F.lit("OR"), F.lit("ID"), F.lit("CA"), F.lit("WA"), F.lit("NV")),
                (F.col("id") % 5).cast("int") + 1,
            ),
        )
    )


# ---------------------------------------------------------------------------


@q(
    "nx01_currency_conversion",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder,
           CAST(price AS DOUBLE) * 0.908 AS price_eur,
           date_time
    FROM bid
    """,
)
def nx01_currency_conversion(spark, sf_dir):
    """Nexmark q1 (queries/q1.sql): stateless map — dollar→euro."""
    b = _bid(spark, sf_dir)
    return b.select(
        "auction",
        "bidder",
        (F.col("price").cast("double") * 0.908).alias("price_eur"),
        "date_time",
    )


@q(
    "nx02_selection",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, price FROM bid WHERE auction % 13 = 0
    """,
)
def nx02_selection(spark, sf_dir):
    """Nexmark q2 (queries/q2.sql): stateless filter (MOD(auction, k) = 0)."""
    b = _bid(spark, sf_dir)
    return b.filter(F.col("auction") % 13 == 0).select("auction", "price")


@q(
    "nx03_local_item_suggestion",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT P.name, P.state, A.id
    FROM auction A JOIN person P ON A.seller = P.id
    WHERE A.category = 3 AND P.state IN ('OR', 'ID', 'CA')
    """,
)
def nx03_local_item_suggestion(spark, sf_dir):
    """Nexmark q3 (queries/q3.sql): dimension join + selective filters.
    Both sides are pre-aggregated (tiny) — broadcast the smaller."""
    a = _auction(spark, sf_dir).filter(F.col("category") == 3)
    p = _person(spark, sf_dir).filter(F.col("state").isin("OR", "ID", "CA"))
    return (
        F.broadcast(a)
        .join(p, a.seller == p.id)
        .select("name", "state", a.id.alias("id"))
    )


@q(
    "nx04_avg_closing_price",
    oracle=f"""
    WITH {NEXMARK_CTE},
    winning AS (
      SELECT A.id, A.category, max(B.price) AS final
      FROM auction A JOIN bid B
        ON A.id = B.auction
       AND B.date_time BETWEEN A.date_time AND A.expires
      GROUP BY A.id, A.category
    )
    SELECT category,
           CAST(CAST(sum(final) AS DOUBLE) / count(*) AS DOUBLE) AS avg_final
    FROM winning GROUP BY category
    """,
)
def nx04_avg_closing_price(spark, sf_dir):
    """Nexmark q4 (queries/q4.sql): temporal-range join + two-level agg.
    auction (211 rows) broadcasts, so the range predicate is evaluated
    map-side — no shuffle for the join, one shuffle for the groupBy."""
    a = _auction(spark, sf_dir)
    b = _bid(spark, sf_dir)
    winning = (
        b.join(
            F.broadcast(a),
            (b.auction == a.id)
            & b.date_time.between(a.date_time, a.expires),
        )
        .groupBy(a.id, a.category)
        .agg(F.max(b.price).alias("final"))
    )
    return winning.groupBy("category").agg(
        (F.sum("final").cast("double") / F.count(F.lit(1))).cast("double").alias("avg_final")
    )


@q(
    "nx05_hot_items",
    oracle=f"""
    WITH {NEXMARK_CTE},
    counts AS (
      SELECT time_bucket(INTERVAL '15 minutes', date_time) - (k * INTERVAL '15 minutes') AS ws,
             auction, count(*) AS num
      FROM bid, (VALUES (0),(1),(2),(3)) AS offs(k)
      GROUP BY 1, 2
    ),
    maxes AS (SELECT ws, max(num) AS maxn FROM counts GROUP BY ws)
    SELECT c.ws AS window_start, c.auction, c.num
    FROM counts c JOIN maxes m ON c.ws = m.ws AND c.num >= m.maxn
    """,
)
def nx05_hot_items(spark, sf_dir):
    """Nexmark q5 (queries/q5.sql): hot items per HOP window (size 1h,
    slide 15m). Count per (window, auction), then keep rows matching the
    per-window max — the per-window maxima table is tiny → broadcast."""
    b = _bid(spark, sf_dir)
    counts = b.groupBy(
        F.window("date_time", "1 hour", "15 minutes").alias("w"), "auction"
    ).agg(F.count(F.lit(1)).alias("num"))
    maxes = counts.groupBy("w").agg(F.max("num").alias("maxn"))
    return (
        counts.join(F.broadcast(maxes), "w")
        .filter(F.col("num") >= F.col("maxn"))
        .select(F.col("w.start").alias("window_start"), "auction", "num")
    )


@q(
    "nx06_avg_price_per_seller",
    oracle=f"""
    WITH {NEXMARK_CTE},
    winning AS (
      SELECT A.id, A.seller, max(B.price) AS final
      FROM auction A JOIN bid B ON A.id = B.auction
      GROUP BY A.id, A.seller
    )
    SELECT id, seller,
           CAST(CAST(sum(final) OVER w AS DOUBLE)
                / (count(*) OVER w) AS DOUBLE) AS avg_last10
    FROM winning
    WINDOW w AS (PARTITION BY seller ORDER BY id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def nx06_avg_price_per_seller(spark, sf_dir):
    """Nexmark q6 (crates/nexmark/src/queries/q6.rs): moving average of a
    seller's last 10 closing prices — ROWS frame over per-auction maxima."""
    from pyspark.sql.window import Window

    a = _auction(spark, sf_dir)
    b = _bid(spark, sf_dir)
    winning = (
        b.join(F.broadcast(a), b.auction == a.id)
        .groupBy(a.id, a.seller)
        .agg(F.max(b.price).alias("final"))
    )
    w = Window.partitionBy("seller").orderBy("id").rowsBetween(-9, 0)
    return winning.select(
        "id",
        "seller",
        (F.sum("final").over(w).cast("double") / F.count(F.lit(1)).over(w))
        .cast("double")
        .alias("avg_last10"),
    )


@q(
    "nx07_highest_bid",
    oracle=f"""
    WITH {NEXMARK_CTE},
    wmax AS (
      SELECT time_bucket(INTERVAL '1 hour', date_time) AS ws,
             max(price) AS maxprice
      FROM bid GROUP BY 1
    )
    SELECT B.auction, B.price, B.bidder, B.date_time
    FROM bid B JOIN wmax
      ON time_bucket(INTERVAL '1 hour', B.date_time) = wmax.ws
     AND B.price = wmax.maxprice
    """,
)
def nx07_highest_bid(spark, sf_dir):
    """Nexmark q7 (queries/q7.sql): highest bid per tumbling window —
    per-window max is tiny → broadcast join back to the bid stream."""
    b = _bid(spark, sf_dir).withColumn("w", F.window("date_time", "1 hour"))
    # rename the grouped window column: a self-referencing b.w == wmax.w
    # would resolve both sides to the SAME lineage (trivially-true predicate)
    wmax = (
        b.groupBy("w")
        .agg(F.max("price").alias("maxprice"))
        .withColumnRenamed("w", "wm")
    )
    return (
        b.join(
            F.broadcast(wmax),
            (F.col("w") == F.col("wm")) & (F.col("price") == F.col("maxprice")),
        )
        .select("auction", "price", "bidder", "date_time")
    )


@q(
    "nx08_monitor_new_users",
    oracle=f"""
    WITH {NEXMARK_CTE},
    pw AS (
      SELECT id, name, time_bucket(INTERVAL '1 hour', date_time) AS ws
      FROM person
    ),
    aw AS (
      SELECT DISTINCT seller, time_bucket(INTERVAL '1 hour', date_time) AS ws
      FROM auction
    )
    SELECT pw.id, pw.name, pw.ws AS window_start
    FROM pw JOIN aw ON pw.id = aw.seller AND pw.ws = aw.ws
    """,
)
def nx08_monitor_new_users(spark, sf_dir):
    """Nexmark q8 (queries/q8.sql): users who joined and opened an auction
    in the same window — equi-join of two windowed (small) aggregates."""
    p = _person(spark, sf_dir).select(
        "id", "name", F.window("date_time", "1 hour").alias("w")
    )
    a = (
        _auction(spark, sf_dir)
        .select("seller", F.window("date_time", "1 hour").alias("w"))
        .distinct()
    )
    return (
        p.join(F.broadcast(a), (p.id == a.seller) & (p.w == a.w))
        .select("id", "name", p.w.start.alias("window_start"))
    )


@q(
    "nx09_winning_bids",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, date_time FROM (
      SELECT auction, bidder, price, date_time,
             row_number() OVER (PARTITION BY auction
                                ORDER BY price DESC, date_time ASC, event_id ASC) AS rn
      FROM bid
    ) WHERE rn = 1
    """,
)
def nx09_winning_bids(spark, sf_dir):
    """Nexmark q9 (queries/q9.sql): winning bid per auction — arg-max by
    (price desc, time asc) with a unique tiebreak; single shuffle on the
    auction key."""
    from pyspark.sql.window import Window

    b = _bid(spark, sf_dir)
    w = Window.partitionBy("auction").orderBy(
        F.col("price").desc(), F.col("date_time").asc(), F.col("event_id").asc()
    )
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("auction", "bidder", "price", "date_time")
    )


@q(
    "nx12_bid_count_per_bidder",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT bidder, time_bucket(INTERVAL '1 hour', date_time) AS window_start,
           count(*) AS bid_count
    FROM bid GROUP BY 1, 2
    """,
)
def nx12_bid_count_per_bidder(spark, sf_dir):
    """Nexmark q12 (queries/q12.sql, event-time variant): bids per bidder
    per tumbling window — partial (map-side) agg then one shuffle."""
    b = _bid(spark, sf_dir)
    return (
        b.groupBy("bidder", F.window("date_time", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("bid_count"))
        .select("bidder", F.col("w.start").alias("window_start"), "bid_count")
    )
