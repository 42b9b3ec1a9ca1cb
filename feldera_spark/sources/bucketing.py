"""Bucketed (co-located) tables: shuffle-free joins and aggregations.

Reference counterpart: every stateful operator in the reference runs
sharded by key hash across workers, and two operators sharded the same
way exchange nothing (``shard.rs:64`` — data is hash-placed ONCE). The
Spark equivalent for repeatedly-joined fact tables is **bucketing**:
``bucketBy(n, key)`` at write time hash-places rows into fixed buckets,
and a join of two tables bucketed on the same key by the same bucket
count runs with ZERO Exchange nodes — at 100 TB this removes the
dominant cost (a full-fact-table shuffle) from every recurring join.

Local note: ``saveAsTable`` needs a metastore-backed catalog; the
functions take a table-name prefix and use the session catalog as-is,
so tests point ``spark.sql.warehouse.dir`` at a temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``bucket_cols``.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins (the strongest co-location guarantee).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — planner elides both Exchanges when
    bucket specs line up (verify with plans.count_exchanges == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
