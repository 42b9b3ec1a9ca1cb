"""Join operators Spark lacks natively: as-of join and banded range join.

Reference semantics:
- as-of join — ``crates/dbsp/src/operator/asof_join.rs:37`` and grammar
  ``docs/sql/grammar.md:730-744``: for each left row, match the single
  right row with the same key and the largest right timestamp satisfying
  ``right_ts <= left_ts`` (left-outer semantics: unmatched left rows are
  kept with NULL padding).
- range join — ``operator/join_range.rs:21``: pairs within a time band.

Scale notes (100 TB): the union+window implementation of as-of join costs
exactly ONE shuffle of (left ∪ right) by key — same as a sort-merge join —
and never materializes the (left × right-candidates) blow-up that a
naive inequality join would. The banded range join turns an inequality
join into an equi-join on coarse time buckets (each left row explodes to
the small fixed number of buckets its band covers), so Spark executes it
as a normal hash/SMJ equi-join with a residual filter instead of a
broadcast-nested-loop cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """LEFT ASOF JOIN: latest right row per key with right_ts <= left_ts.

    Implementation: tag both sides, union, and compute ``last_value(...
    IGNORE NULLS)`` of the right payload over a per-key window ordered by
    (ts, side, tiebreak) — right rows sort before left rows at equal
    timestamps, so a right row at exactly left_ts matches (<= semantics).
    ``tiebreak`` breaks ordering ties among right rows with equal
    timestamps deterministically (last one wins).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rtb"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    rtb = (
        F.col(tiebreak).cast("long")
        if tiebreak is not None
        else F.lit(0).cast("long")
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rtb.alias("__rtb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rtb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole right payload as one struct so all matched columns
    # come from the SAME right row even under tiebreak ties.
    with_payload = unioned.withColumn(
        "__rpay",
        F.when(
            F.col("__side") == 0,
            F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]),
        ),
    ).withColumn("__match", F.last("__rpay", ignorenulls=True).over(w))

    out = with_payload.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower,
    upper,
    on: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Join rows where right_ts ∈ [left_ts + lower, left_ts + upper].

    ``lower``/``upper`` are Column interval expressions (e.g.
    ``F.expr("INTERVAL -7 DAYS")``). Left rows are exploded to the coarse
    time buckets their band overlaps; the join is then a pure equi-join on
    (keys…, bucket) plus a residual band filter. Bucket count per row is
    ceil(band/bucket)+1 — constant — so data volume grows by a small
    constant factor instead of quadratically.
    """
    on = on or []
    lb = F.col(left_ts) + lower
    ub = F.col(left_ts) + upper
    lbu = F.unix_timestamp(lb.cast("timestamp"))
    ubu = F.unix_timestamp(ub.cast("timestamp"))
    lhs = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lbu / bucket_seconds), F.floor(ubu / bucket_seconds)
            )
        ),
    ).withColumn("__lb", lb).withColumn("__ub", ub)
    rhs = right.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(F.col(right_ts).cast("timestamp")) / bucket_seconds),
    )
    cond = (F.col(right_ts) >= F.col("__lb")) & (F.col(right_ts) <= F.col("__ub"))
    joined = lhs.join(rhs, on=on + ["__bucket"], how="inner").filter(cond)
    return joined.drop("__bucket", "__lb", "__ub")
