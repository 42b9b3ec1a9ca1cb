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
    order. ``anchor_filter`` is a boolean Column identifying the anchor."""
    w = Window.orderBy(*order_by)
    pos = df.withColumn("__pos", F.row_number().over(w))
    anchor = pos.filter(anchor_filter).select(F.col("__pos").alias("__anchor"))
    return (
        pos.join(F.broadcast(anchor))
        .filter(
            (F.col("__pos") >= F.col("__anchor") - before)
            & (F.col("__pos") <= F.col("__anchor") + after)
        )
        .withColumn("offset", F.col("__pos") - F.col("__anchor"))
        .drop("__pos", "__anchor")
    )
