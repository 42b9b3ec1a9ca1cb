"""Shared helpers for query definitions.

Cross-engine determinism conventions (so the DuckDB oracle hash-matches):

- Money arithmetic goes through exact DECIMAL: ``dec2``/``dec4`` cast
  doubles to DECIMAL before SUM so both engines produce bit-identical
  sums; final results are cast back to DOUBLE (an exact conversion).
- Averages are computed as CAST(exact_sum AS DOUBLE) / count — one
  double division of identical inputs on both sides.
- Every ORDER BY used under a LIMIT carries a unique tiebreak column.
- Timestamps stay TIMESTAMP_NTZ end-to-end (both engines read the same
  naive values from parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feldera_spark.sources.registry import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec2(col):
    """Exact 2-decimal money value (prices, balances)."""
    return F.col(col).cast("decimal(12,2)") if isinstance(col, str) else col.cast("decimal(12,2)")


def dec4(col):
    """Exact 4-decimal rate value (discount, tax)."""
    return F.col(col).cast("decimal(6,4)") if isinstance(col, str) else col.cast("decimal(6,4)")


def as_double(col):
    return col.cast("double")
