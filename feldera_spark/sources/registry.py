"""Table registry over the driver-provided parquet test data.

Mirrors the reference's source surface at the level we need for batch
correctness (reference: file/S3/parquet connectors,
``crates/adapters/src/transport/file.rs``, ``format/parquet``): a declared
set of named relations loaded from columnar files. On a cluster these
reads are plain distributed parquet scans — predicate pushdown and column
pruning reach the scan via Catalyst, nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are constant-size; supplier/part/customer grow with SF but
# stay broadcastable into the TB range relative to fact tables).
BROADCAST_DIMS = frozenset({"region", "nation"})

# Tables with heavy PER-ROW compute downstream (shingling/hashing over
# long text): parallelize the scan when it has fewer splits than cores.
# The driver's testdata is one single-row-group parquet file per table,
# so Spark reads each as ONE task — narrow stages after it would run
# single-core. At real scale (many files / row groups) the scan
# parallelizes naturally and the repartition never triggers. Relational
# tables are deliberately NOT repartitioned: their scans are cheap
# columnar decodes and an extra exchange ahead of every aggregate costs
# more than it saves. ``embeddings`` left this set in r11: every
# consumer's scoring pass became a mapInArrow int64 matmul (sub-ms per
# batch), and the forced 32-way exchange ahead of it cost a full
# shuffle stage per index-build job for parallelism nothing needs.
COMPUTE_HEAVY_TABLES = frozenset({"documents"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanos timestamp
    # type, so read it as raw nanos and rebuild a TIMESTAMP_NTZ at micro
    # precision (identical to DuckDB's nanos→micros truncation). The
    # timestampadd form is session-timezone-independent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    if name in COMPUTE_HEAVY_TABLES:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views (for spark.sql)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Give a CPU-heavy per-row pass (explode-shaped aggregations, N x Q
    dot products) enough input partitions, WITHOUT unconditionally
    shuffling: a single-file parquet input is one row group = one task
    (the whole pass serialized on one core), while a cluster-scale input
    already arrives in many splits where a repartition would be a
    harmful full shuffle. Round-robin repartition ONLY when the scan is
    under-parallel; the partition probe is a driver-side metadata call,
    not a job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * 2 <= target:
        return df.repartition(target)
    return df
