"""Cluster-safe materialization of shared per-invocation frames.

Several operators compute a frame once and feed it to multiple
consumers inside one invocation (IVF's prepared corpus, the inverted
index's postings, nx05's shared HOP counts). Locally the cheapest pin
is ``localCheckpoint`` — but it truncates lineage and stores blocks
NON-REPLICATED on executor local disk: on a real cluster one lost
executor fails the query, and pinning a 100 TB intermediate to local
disk is itself a cost. ``spark.feldera.materialize`` picks the
mechanism per deployment (the sharing itself is always right):

- ``localCheckpoint`` (default): lazy local checkpoint — fastest, the
  local/bench mode; fault-fragile on clusters.
- ``persistDisk``: ``persist(DISK_ONLY)`` — keeps lineage, so a lost
  block is recomputed from source instead of failing the query. The
  block cache is populated by whichever consumer runs first.
- ``checkpoint``: reliable checkpoint into
  ``spark.feldera.checkpointDir`` (set as the SparkContext checkpoint
  dir on first use) — survives executor loss AND truncates lineage;
  the right mode when the recompute path itself is expensive.

Every mode materializes per invocation, inside the caller's timed
region — never a cross-run cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MODES = ("localCheckpoint", "persistDisk", "checkpoint")


def materialize_shared(df: DataFrame) -> DataFrame:
    """Pin a frame consumed by several branches of one invocation,
    using the deployment's ``spark.feldera.materialize`` mechanism."""
    spark = df.sparkSession
    mode = spark.conf.get("spark.feldera.materialize", "localCheckpoint")
    if mode == "persistDisk":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    if mode == "checkpoint":
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckdir = spark.conf.get("spark.feldera.checkpointDir", "")
            if not ckdir:
                import tempfile

                ckdir = tempfile.mkdtemp(prefix="feldera_ckpt_")
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=False)
    if mode != "localCheckpoint":
        raise ValueError(
            f"spark.feldera.materialize={mode!r}: expected one of {_MODES}"
        )
    return df.localCheckpoint(eager=False)
