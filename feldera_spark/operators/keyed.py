"""Keyed operators: top-K per group, upsert/latest-by-key, neighborhood.

Reference:
- top-K — ``crates/dbsp/src/operator/group/topk.rs:20,42`` and the
  compiler's ``DBSPIndexedTopKOperator.java``.
- upsert normalization — ``operator/dynamic/input_upsert.rs`` (PRIMARY KEY
  tables keep the latest row per key).
- neighborhood — ``operator/neighborhood.rs:97`` (paginated window of rows
  around an anchor in a total order).

All are single-shuffle window computations; at scale the partition key is
the group key, so they parallelize across groups. ``neighborhood`` over a
GLOBAL order is inherently a total-order operator — we bound it the same
way the reference does (it exists for UI pagination, not bulk compute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame, keys: list[str], order_by: list, k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-K rows per group. ``order_by`` must be deterministic (include a
    unique tiebreak column)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def topk_per_group_salted(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    k: int,
    salt_col: str,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase (salted) top-K per group, for LOW-CARDINALITY group keys.

    With few distinct keys, ``Window.partitionBy(keys)`` caps parallelism
    at |keys| and each task sorts a full group — a straggler at scale.
    Phase 1 ranks within (key, salt) partitions (|keys| × n_salts tasks,
    each over 1/n_salts of a group) and keeps k rows per salt; phase 2
    re-ranks the ≤ n_salts·k survivors per key — bounded input, so the
    final per-key sort is O(n_salts·k·log) regardless of data size.
    ``salt_col`` must be deterministic (its hash is the salt), keeping the
    result oracle-checkable. ``order_by`` must include a unique tiebreak.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_col)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_by)
    partial = (
        salted.withColumn("__prn", F.row_number().over(w1))
        .filter(F.col("__prn") <= k)
        .drop("__prn", "__salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        partial.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def latest_by_key(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Keep the last row per key under ``order_by`` — upsert semantics for
    PRIMARY KEY tables (latest write wins)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def neighborhood(
    df: DataFrame, order_by: list, anchor_filter, before: int, after: int
) -> DataFrame:
    """Rows within (before, after) positions of the anchor row in a total
    order. ``anchor_filter`` is a boolean Column identifying the anchor;
    ``order_by`` must be a unique (tiebroken) ascending order.

    Scale-safe plan: never a global-order window over the relation.
    The anchor's order-key VALUE is broadcast; the page is assembled from
    two distributed top-K scans (TakeOrdered) — rows just below and just
    at/above the anchor value — and only the bounded page (≤ before +
    after + 1 rows) is ranked to compute offsets.
    """
    key = F.struct(*order_by)
    keyed = df.withColumn("__k", key)
    anchor = keyed.filter(anchor_filter).select(F.col("__k").alias("__ak")).limit(1)
    j = keyed.crossJoin(F.broadcast(anchor))
    below = (
        j.filter(F.col("__k") < F.col("__ak"))
        .orderBy(F.col("__k").desc())
        .limit(before)
    )
    at_or_above = (
        j.filter(F.col("__k") >= F.col("__ak"))
        .orderBy(F.col("__k").asc())
        .limit(after + 1)
    )
    page = below.unionByName(at_or_above)
    whole = Window.orderBy(F.col("__k").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pos = F.row_number().over(Window.orderBy(F.col("__k").asc()))
    anchor_pos = (
        F.sum(F.when(F.col("__k") < F.col("__ak"), 1).otherwise(0)).over(whole)
        + 1
    )
    return (
        page.withColumn("offset", pos - anchor_pos)
        .drop("__k", "__ak")
    )
