"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship as spark-defaults on a real cluster (AQE on, shuffle
partitions sized to cores locally / to data volume on a cluster, Arrow
enabled for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "feldera_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    At 100 TB scale the only local-mode-specific knobs here are master and
    driver memory; everything else (AQE, adaptive coalescing, skew join,
    Arrow) is exactly what a 1000-executor deployment wants too.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # per-step IVM parallelism (streaming/stepper.py): step scopes
        # run over bounded delta/state slices, not full-table scans —
        # a deep view chain pays (shuffle rounds x tasks) in scheduling
        # at the analytic partition count, and each task of a commit
        # stage pays a near-constant ~100-400 ms of block/shuffle-file
        # plumbing and task deserialization regardless of rows (jstack
        # profile: copyFileStreamNIO + BlockInfoManager locks dominate
        # on 16-100-row state frames). Locally cpus/8 — measured 2x on
        # the nx05 shape vs cpus/2 (ev/s 122k -> 245k avg, commit wall
        # 2.9-4.3 s -> 1.3-1.9 s; parts 2/4/8 are equivalent, 16 is
        # not). On a cluster size to per-step delta volume like a
        # state-store partition count (rows x row_width / ~128MB).
        .config(
            "spark.feldera.step.shufflePartitions",
            str(max(4, cpus // 8)),
        )
        # Sort-based shuffle writer everywhere (threshold 0): the
        # default bypass-merge writer opens one file PER REDUCE
        # PARTITION per map task and then concatenates them
        # (copyFileStreamNIO dominated the commit-stage jstack
        # samples on 16-100-row state frames). The serialized sort
        # writer emits ONE file per map task — on per-step IVM
        # shuffles this cut the commit's file plumbing (interleaved
        # full A/B: batch total -5%, streaming parity-to-better);
        # above the 200-partition default threshold Spark already
        # uses it, so big analytic shuffles are unchanged.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame-debugging hook wraps EVERY DataFrame/
        # Column op with a call-site capture that costs 4 py4j round
        # trips per call (getActiveSession + conf.get + origin set +
        # clear — pyspark/errors/utils.py:_with_origin). cProfile of a
        # warm i05 run: 196 getActiveSession round trips, ~1.5 s of the
        # driver phase, all spent enriching error messages that only
        # matter interactively. Off in the engine session; the flag is
        # read once per process so it must be set at build time.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # CRC-less local filesystem for file:// URIs. Hadoop's default
        # LocalFileSystem/LocalFs are CHECKSUMMED: every WAL write of a
        # streaming query (offsets + commit log via the FileContext-
        # based checkpoint manager) and every source-directory listing
        # pays CRC sidecar I/O on scratch data that is written and read
        # by the same host. Measured per trigger on the nx01 streaming
        # shape (StreamingQueryProgress.durationMs, steady state):
        # walCommit 32→17 ms, commitOffsets 31→17 ms, latestOffset
        # 34→19 ms — 1.65M→2.02M ev/s end-to-end. Applies only to
        # file:// paths, at ANY core count; cluster deployments keep
        # their checkpoints on HDFS/S3 whose own impls are untouched.
        .config(
            "spark.hadoop.fs.file.impl",
            "org.apache.hadoop.fs.RawLocalFileSystem",
        )
        .config(
            "spark.hadoop.fs.AbstractFileSystem.file.impl",
            "org.apache.hadoop.fs.local.RawLocalFs",
        )
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
