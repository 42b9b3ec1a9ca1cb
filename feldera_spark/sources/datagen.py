"""Deterministic synthetic data generator (the reference's datagen source).

Reference: ``crates/datagen`` + the ``datagen`` transport
(``crates/adapters/src/transport/``) — a configurable per-table generator
used for demos/benchmarks. Our Spark form is a plan over ``spark.range``:
fully distributed (one partition per core, no driver-side rows) and
deterministic (every column is a pure function of the row id via
``xxhash64`` — re-running yields identical data, so generated inputs are
oracle-checkable and resumable, unlike ``rand()``).

A ``rate``-style streaming source (``transport/clock.rs`` analogue) falls
out of the same spec applied to micro-batch id ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ColumnSpec", "datagen", "datagen_chunks"]


class ColumnSpec:
    """Declarative column generators, all pure functions of the row id."""

    @staticmethod
    def sequence(start: int = 0, step: int = 1):
        return lambda rid: (F.lit(start) + rid * F.lit(step)).cast("long")

    @staticmethod
    def uniform_long(lo: int, hi: int, salt: str = ""):
        """Pseudo-uniform in [lo, hi) — xxhash of (id, salt)."""
        return lambda rid: (
            F.pmod(F.xxhash64(rid, F.lit(salt)), F.lit(hi - lo)) + F.lit(lo)
        ).cast("long")

    @staticmethod
    def uniform_double(lo: float, hi: float, salt: str = ""):
        return lambda rid: (
            F.pmod(F.xxhash64(rid, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0
            * F.lit(hi - lo) + F.lit(lo)
        ).cast("double")

    @staticmethod
    def choice(values: list[str], salt: str = ""):
        arr = F.array(*[F.lit(v) for v in values])
        return lambda rid: F.element_at(
            arr, (F.pmod(F.xxhash64(rid, F.lit(salt)), F.lit(len(values))) + 1).cast("int")
        )

    @staticmethod
    def timestamp_seq(start: str, step_seconds: float):
        """Monotone event time: start + id * step."""
        micros = int(step_seconds * 1_000_000)
        return lambda rid: F.expr(
            f"timestampadd(MICROSECOND, {micros} * __rid, TIMESTAMP_NTZ '{start}')"
        )


def datagen(
    spark: SparkSession,
    n_rows: int,
    columns: dict[str, object],
    start_id: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_rows`` rows with the given column generators.

    ``columns`` maps name -> generator (a ``ColumnSpec`` factory result or
    any ``Column``-returning callable of the row-id column).
    """
    rng = spark.range(start_id, start_id + n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = rng.withColumnRenamed("id", "__rid")
    rid = F.col("__rid")
    for name, gen in columns.items():
        df = df.withColumn(name, gen(rid))
    return df.drop("__rid") if "__rid" not in columns else df


def datagen_chunks(
    spark: SparkSession,
    n_rows: int,
    columns: dict[str, object],
    chunk_rows: int,
):
    """Yield the same dataset as consecutive micro-batches (rate-source
    shape): chunk k covers ids [k*chunk_rows, (k+1)*chunk_rows). Replaying
    gives bit-identical chunks — the property checkpoint/replay needs."""
    for lo in range(0, n_rows, chunk_rows):
        yield datagen(spark, min(chunk_rows, n_rows - lo), columns, start_id=lo)
