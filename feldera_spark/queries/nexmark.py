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
             CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS price,
             ts AS date_time,
             CASE user_id % 6 WHEN 0 THEN 'Apple' WHEN 1 THEN 'Google'
                  WHEN 2 THEN 'Facebook' WHEN 3 THEN 'Baidu'
                  WHEN 4 THEN 'ch5' ELSE 'ch6' END AS channel,
             'https://s.ex/ch/item_' || CAST(event_id % 211 AS VARCHAR)
               || '/bd_' || CAST(user_id AS VARCHAR)
               || '?channel_id=' || CAST(event_id % 17 AS VARCHAR) AS url,
             props AS extra
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
        F.col("value").cast("decimal(12,2)").cast("double").alias("price"),
        F.col("ts").alias("date_time"),
        F.element_at(
            F.array(*[F.lit(c) for c in ("Apple", "Google", "Facebook", "Baidu", "ch5", "ch6")]),
            (F.col("user_id") % 6).cast("int") + 1,
        ).alias("channel"),
        F.concat(
            F.lit("https://s.ex/ch/item_"),
            (F.col("event_id") % 211).cast("string"),
            F.lit("/bd_"),
            F.col("user_id").cast("string"),
            F.lit("?channel_id="),
            (F.col("event_id") % 17).cast("string"),
        ).alias("url"),
        F.col("props").alias("extra"),
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

    The join is EQUI on ``auction = id`` with the time band as a
    residual filter (JoinConditionAnalyzer.java splits conditions the
    same way), so no hard broadcast hint is needed: Spark broadcasts the
    auction side while it fits ``autoBroadcastJoinThreshold`` (it does
    at sf0.1 — map-side band evaluation, zero join shuffle) and falls
    back to a shuffled hash/sort-merge join when the dimension outgrows
    it at 100× scale (round-3 verdict: the unconditional ``F.broadcast``
    was the scale-killer; plan test in test_plans.py pins both modes)."""
    a = _auction(spark, sf_dir)
    b = _bid(spark, sf_dir)
    winning = (
        b.join(
            a,
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
    per-window max — the per-window maxima table is tiny → broadcast.

    ``counts`` feeds BOTH the join probe side and the maxes build side;
    without a materialization point the scan → HOP explode → count
    subtree is planned (and executed) twice — exchange reuse does not
    unify the copies because the probe side's scan carries the pushed
    ``isnotnull(ts)`` filter and the build side's does not. One lazy
    local checkpoint computes it once (per invocation, from the parquet
    scan — never a cross-run cache); at scale that halves the dominant
    scan+explode pass. (A MAX-OVER-window form was measured SLOWER: it
    sorts the full |windows × auctions| counts frame where the join
    form only re-aggregates it.)"""
    b = _bid(spark, sf_dir)
    counts = b.groupBy(
        F.window("date_time", "1 hour", "15 minutes").alias("w"), "auction"
    ).agg(F.count(F.lit(1)).alias("num"))
    from feldera_spark.materialize import materialize_shared

    counts = materialize_shared(counts)
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
    (price desc, time asc, event_id asc) as ONE ``max_by`` aggregation
    with map-side partial combine. A per-auction window would cap
    parallelism at |auctions| and sort whole groups; the aggregate keeps
    one candidate row per key per task regardless of data size.
    Timestamp negation uses pure NTZ arithmetic (session-tz safe)."""
    b = _bid(spark, sf_dir)
    neg_ts = -F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', date_time)"
    )
    ord_key = F.struct(
        F.col("price").alias("p"),
        neg_ts.alias("nts"),
        (-F.col("event_id")).alias("nid"),
    )
    best = F.max_by(
        F.struct(F.col("bidder"), F.col("price"), F.col("date_time")), ord_key
    )
    return (
        b.groupBy("auction")
        .agg(best.alias("w"))
        .select("auction", "w.bidder", "w.price", "w.date_time")
    )


@q(
    "nx13_side_input_asof",
    oracle=f"""
    WITH {NEXMARK_CTE},
    side_input AS (
      SELECT event_id % 25 AS key, ts AS sdate_time, event_type AS sval
      FROM events WHERE event_id % 50 = 0
    )
    SELECT B.auction, B.bidder, B.price, B.date_time, S.sval AS value
    FROM (SELECT *, auction % 25 AS mod FROM bid) B
    ASOF LEFT JOIN side_input S
      ON B.mod = S.key AND B.date_time >= S.sdate_time
    """,
)
def nx13_side_input_asof(spark, sf_dir):
    """Nexmark q13 (queries/q13.sql): enrich bids against a slowly-
    changing side input via LEFT ASOF JOIN — our asof_join operator
    (union + last_value window, one shuffle, no inequality-join blowup)."""
    from feldera_spark.operators.joins import asof_join

    e = t(spark, sf_dir, "events")
    b = _bid(spark, sf_dir).withColumn("mod", F.col("auction") % 25)
    side = e.filter(F.col("event_id") % 50 == 0).select(
        (F.col("event_id") % 25).alias("mod"),
        F.col("ts").alias("sdate_time"),
        F.col("event_type").alias("sval"),
    )
    # side timestamps are unique per key (one event per event_id) — no
    # tiebreak needed; ASOF picks the latest sdate_time <= date_time
    joined = asof_join(
        b.select("mod", "auction", "bidder", "price", "date_time", "event_id"),
        side,
        on="mod",
        left_ts="date_time",
        right_ts="sdate_time",
        right_cols=["sval"],
    )
    return joined.select(
        "auction", "bidder", "price", "date_time", F.col("sval").alias("value")
    )


@q(
    "nx14_calculated_fields",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder,
           CAST(price AS DOUBLE) * 0.908 AS price_eur,
           CASE WHEN EXTRACT(HOUR FROM date_time) >= 8
                     AND EXTRACT(HOUR FROM date_time) <= 18 THEN 'dayTime'
                WHEN EXTRACT(HOUR FROM date_time) <= 6
                     OR EXTRACT(HOUR FROM date_time) >= 20 THEN 'nightTime'
                ELSE 'otherTime' END AS bid_time_type,
           date_time,
           length(extra) - length(replace(extra, 'k', '')) AS k_counts
    FROM bid
    WHERE CAST(price AS DOUBLE) * 0.908 > 5 AND CAST(price AS DOUBLE) * 0.908 < 50
    """,
)
def nx14_calculated_fields(spark, sf_dir):
    """Nexmark q14 (queries/q14.sql): computed fields + char-count scalar
    function (COUNT_CHAR expanded inline, as the reference's SQL-bodied
    CREATE FUNCTION is inlined by its compiler)."""
    b = _bid(spark, sf_dir)
    eur = F.col("price").cast("double") * 0.908
    hour = F.hour("date_time")
    return (
        b.filter((eur > 5) & (eur < 50))
        .select(
            "auction",
            "bidder",
            eur.alias("price_eur"),
            F.when((hour >= 8) & (hour <= 18), "dayTime")
            .when((hour <= 6) | (hour >= 20), "nightTime")
            .otherwise("otherTime")
            .alias("bid_time_type"),
            "date_time",
            (F.length("extra") - F.length(F.replace(F.col("extra"), F.lit("k"), F.lit("")))).alias(
                "k_counts"
            ),
        )
    )


@q(
    "nx15_bidding_statistics",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT CAST(CAST(date_time AS DATE) AS TIMESTAMP) AS day,
           count(*) AS total_bids,
           count(*) FILTER (WHERE price < 5) AS rank1_bids,
           count(*) FILTER (WHERE price >= 5 AND price < 10) AS rank2_bids,
           count(*) FILTER (WHERE price >= 10) AS rank3_bids,
           count(DISTINCT bidder) AS total_bidders,
           count(DISTINCT bidder) FILTER (WHERE price < 5) AS rank1_bidders,
           count(DISTINCT auction) AS total_auctions,
           count(DISTINCT auction) FILTER (WHERE price >= 10) AS rank3_auctions
    FROM bid GROUP BY CAST(date_time AS DATE)
    """,
)
def nx15_bidding_statistics(spark, sf_dir):
    """Nexmark q15 (queries/q15.sql): per-day bid statistics — multiple
    COUNT DISTINCT with FILTER clauses (RewriteDistinctAggregates handles
    the expansion; the reference's AGGREGATE_EXPAND_DISTINCT path)."""
    b = _bid(spark, sf_dir)
    return b.groupBy(F.col("date_time").cast("date").cast("timestamp_ntz").alias("day")).agg(
        F.count(F.lit(1)).alias("total_bids"),
        F.count_if(F.col("price") < 5).alias("rank1_bids"),
        F.count_if((F.col("price") >= 5) & (F.col("price") < 10)).alias("rank2_bids"),
        F.count_if(F.col("price") >= 10).alias("rank3_bids"),
        F.count_distinct(F.col("bidder")).alias("total_bidders"),
        F.count_distinct(F.when(F.col("price") < 5, F.col("bidder"))).alias("rank1_bidders"),
        F.count_distinct(F.col("auction")).alias("total_auctions"),
        F.count_distinct(F.when(F.col("price") >= 10, F.col("auction"))).alias("rank3_auctions"),
    )


@q(
    "nx16_channel_statistics",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT channel, CAST(CAST(date_time AS DATE) AS TIMESTAMP) AS day,
           strftime(max(date_time), '%H:%M') AS minute,
           count(*) AS total_bids,
           count(DISTINCT bidder) AS total_bidders,
           count(DISTINCT auction) AS total_auctions
    FROM bid GROUP BY channel, CAST(date_time AS DATE)
    """,
)
def nx16_channel_statistics(spark, sf_dir):
    """Nexmark q16 (queries/q16.sql): per-channel/day statistics with a
    last-bid-minute column (format_date → date_format)."""
    b = _bid(spark, sf_dir)
    return b.groupBy("channel", F.col("date_time").cast("date").cast("timestamp_ntz").alias("day")).agg(
        F.date_format(F.max("date_time"), "HH:mm").alias("minute"),
        F.count(F.lit(1)).alias("total_bids"),
        F.count_distinct("bidder").alias("total_bidders"),
        F.count_distinct("auction").alias("total_auctions"),
    )


@q(
    "nx17_auction_statistics",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, CAST(CAST(date_time AS DATE) AS TIMESTAMP) AS day,
           count(*) AS total_bids,
           CAST(min(price) AS DOUBLE) AS min_price,
           CAST(max(price) AS DOUBLE) AS max_price,
           CAST(CAST(sum(price) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
           CAST(sum(price) AS DOUBLE) AS sum_price
    FROM bid GROUP BY auction, CAST(date_time AS DATE)
    """,
)
def nx17_auction_statistics(spark, sf_dir):
    """Nexmark q17 (queries/q17.sql): per-auction/day price statistics."""
    b = _bid(spark, sf_dir)
    return b.groupBy("auction", F.col("date_time").cast("date").cast("timestamp_ntz").alias("day")).agg(
        F.count(F.lit(1)).alias("total_bids"),
        F.min("price").cast("double").alias("min_price"),
        F.max("price").cast("double").alias("max_price"),
        (F.sum("price").cast("double") / F.count(F.lit(1))).cast("double").alias("avg_price"),
        F.sum("price").cast("double").alias("sum_price"),
    )


@q(
    "nx18_last_bid_per_bidder_auction",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, channel, url, date_time FROM (
      SELECT *, row_number() OVER (PARTITION BY bidder, auction
                                   ORDER BY date_time DESC, event_id DESC) AS rn
      FROM bid
    ) WHERE rn = 1
    """,
)
def nx18_last_bid_per_bidder_auction(spark, sf_dir):
    """Nexmark q18 (queries/q18.sql): each bidder's latest bid per
    auction — indexed top-1 (DBSPIndexedTopKOperator)."""
    from pyspark.sql.window import Window

    b = _bid(spark, sf_dir)
    w = Window.partitionBy("bidder", "auction").orderBy(
        F.col("date_time").desc(), F.col("event_id").desc()
    )
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("auction", "bidder", "price", "channel", "url", "date_time")
    )


@q(
    "nx19_top10_bids_per_auction",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, date_time, rn FROM (
      SELECT auction, bidder, price, date_time,
             row_number() OVER (PARTITION BY auction
                                ORDER BY price DESC, event_id ASC) AS rn
      FROM bid
    ) WHERE rn <= 10
    """,
)
def nx19_top10_bids_per_auction(spark, sf_dir):
    """Nexmark q19 (queries/q19.sql): top-10 bids per auction — salted
    two-phase top-K (operators.keyed.topk_per_group_salted): the auction
    key is low-cardinality (211 values) so a plain per-key window would
    make 211 straggler tasks at scale; phase 1 ranks within (auction,
    salt), phase 2 re-ranks the bounded survivors."""
    from feldera_spark.operators.keyed import topk_per_group_salted

    b = _bid(spark, sf_dir)
    return topk_per_group_salted(
        b,
        keys=["auction"],
        order_by=[F.col("price").desc(), F.col("event_id").asc()],
        k=10,
        salt_col="event_id",
    ).select("auction", "bidder", "price", "date_time", "rn")


@q(
    "nx20_expand_bid_with_auction",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT B.auction, B.bidder, B.price, B.channel, B.date_time,
           A.date_time AS a_date_time, A.expires, A.seller, A.category
    FROM bid B JOIN auction A ON B.auction = A.id
    WHERE A.category = 3
    """,
)
def nx20_expand_bid_with_auction(spark, sf_dir):
    """Nexmark q20 (queries/q20.sql): bid enriched with its auction row —
    selective dim filter pushed to the broadcast side."""
    b = _bid(spark, sf_dir)
    a = _auction(spark, sf_dir).filter(F.col("category") == 3)
    return b.join(F.broadcast(a), b.auction == a.id).select(
        "auction",
        "bidder",
        "price",
        "channel",
        b.date_time,
        a.date_time.alias("a_date_time"),
        "expires",
        "seller",
        "category",
    )


@q(
    "nx21_channel_id_extraction",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, channel,
           CASE WHEN lower(channel) = 'apple' THEN '0'
                WHEN lower(channel) = 'google' THEN '1'
                WHEN lower(channel) = 'facebook' THEN '2'
                WHEN lower(channel) = 'baidu' THEN '3'
                ELSE regexp_extract(url, 'channel_id=([0-9]+)', 1) END AS channel_id
    FROM bid
    """,
)
def nx21_channel_id_extraction(spark, sf_dir):
    """Nexmark q21 (queries/q21.sql): channel-id via CASE + regex group
    extraction over the URL (RE_EXTRACT → regexp_extract)."""
    b = _bid(spark, sf_dir)
    lc = F.lower(F.col("channel"))
    return b.select(
        "auction",
        "bidder",
        "price",
        "channel",
        F.when(lc == "apple", "0")
        .when(lc == "google", "1")
        .when(lc == "facebook", "2")
        .when(lc == "baidu", "3")
        .otherwise(F.regexp_extract(F.col("url"), r"channel_id=([0-9]+)", 1))
        .alias("channel_id"),
    )


@q(
    "nx22_url_dirs",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, channel,
           split_part(url, '/', 4) AS dir1,
           split_part(url, '/', 5) AS dir2,
           split_part(url, '/', 6) AS dir3
    FROM bid
    """,
)
def nx22_url_dirs(spark, sf_dir):
    """Nexmark q22 (queries/q22.sql): SPLIT_INDEX over the URL path —
    1-based split_part on both engines."""
    b = _bid(spark, sf_dir)
    return b.select(
        "auction",
        "bidder",
        "price",
        "channel",
        F.split_part(F.col("url"), F.lit("/"), F.lit(4)).alias("dir1"),
        F.split_part(F.col("url"), F.lit("/"), F.lit(5)).alias("dir2"),
        F.split_part(F.col("url"), F.lit("/"), F.lit(6)).alias("dir3"),
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


@q(
    "nx10_log_to_filesystem",
    oracle=f"""
    WITH {NEXMARK_CTE}
    SELECT auction, bidder, price, date_time,
           strftime(date_time, '%Y-%m-%d') AS dt,
           strftime(date_time, '%H:%M') AS hm
    FROM bid
    """,
)
def nx10_log_to_filesystem(spark, sf_dir):
    """Nexmark q10 "log to file system" (queries/q10.sql): every bid
    with formatted date/hour-minute partition columns. In production
    this view feeds a partitioned file sink
    (``-- PARTITIONED BY (dt, hm)`` in the reference SQL) —
    ``sources.connectors.open_sink``'s file transport +
    ``partitionBy(dt, hm)`` on the writer; the query itself is a pure
    projection, so Catalyst keeps it scan-pipelined (no shuffle; at
    100 TB the only cost is the sink's partition fan-out)."""
    b = _bid(spark, sf_dir)
    return b.select(
        "auction", "bidder", "price", "date_time",
        F.date_format("date_time", "yyyy-MM-dd").alias("dt"),
        F.date_format("date_time", "HH:mm").alias("hm"),
    )


@q(
    "nx11_user_sessions",
    oracle=f"""
    WITH {NEXMARK_CTE},
    marked AS (
      SELECT bidder, date_time,
             CASE WHEN date_time - lag(date_time) OVER
                       (PARTITION BY bidder ORDER BY date_time, event_id)
                       > INTERVAL '1 hour' OR
                  lag(date_time) OVER
                       (PARTITION BY bidder ORDER BY date_time, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM bid
    ), sessions AS (
      SELECT bidder, date_time,
             sum(new_session) OVER (PARTITION BY bidder ORDER BY date_time
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT bidder, min(date_time) AS starttime,
           max(date_time) + INTERVAL '1 hour' AS endtime,
           count(*) AS bid_count
    FROM sessions GROUP BY bidder, session_id
    """,
)
def nx11_user_sessions(spark, sf_dir):
    """Nexmark q11 "user sessions": bids per bidder per SESSION window
    (1-hour inactivity gap). The reference benchmark suite omits q11
    (no queries/q11.sql — SESSION arrived later in Feldera; docs
    ``docs.feldera.com`` list SESSION as a table function); implemented
    here via Spark's native ``session_window`` so the 22-query Nexmark
    surface is complete. One shuffle on (bidder) — the session merge is
    per-key local state, the same cost shape as the reference's
    ``window.rs`` session operator."""
    b = _bid(spark, sf_dir)
    return (
        b.groupBy("bidder", F.session_window("date_time", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("bid_count"))
        .select(
            "bidder",
            F.col("w.start").alias("starttime"),
            F.col("w.end").alias("endtime"),
            "bid_count",
        )
    )
