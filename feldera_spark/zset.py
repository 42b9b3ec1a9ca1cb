"""Z-set algebra over DataFrames.

The reference's fundamental abstraction is the Z-set: a multiset of rows
with signed 64-bit weights (multiplicity; negative = retraction) —
``crates/dbsp/src/algebra/zset.rs:33-39`` (``ZWeight = i64``), with
DISTINCT normalizing positive weights to 1 (``zset.rs:149-196``).

Spark encoding: a relation is a DataFrame carrying a ``__weight`` LongType
column. All operators below are thin, shuffle-aware compositions of
built-in DataFrame ops, so Catalyst still optimizes through them:

- ``consolidate`` is one hash aggregation (map-side partial agg included);
- ``plus``/``neg`` are free (union / column negate, no shuffle);
- ``distinct`` piggybacks on consolidate's shuffle.

At scale the only shuffle any of these introduce is the keyed aggregation
in ``consolidate`` — identical to what the reference's ``shard()`` +
consolidation does across workers (``operator/dynamic/communication/
shard.rs:64``, ``operator/consolidate.rs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT = "__weight"


def lift(df: DataFrame, weight: int = 1) -> DataFrame:
    """Turn a plain DataFrame into a Z-set (each row gets weight ±n)."""
    if WEIGHT in df.columns:
        return df
    return df.withColumn(WEIGHT, F.lit(weight).cast("long"))


def data_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c != WEIGHT]


def neg(df: DataFrame) -> DataFrame:
    """Z-set negation (retract everything). Reference ``operator/neg.rs``."""
    return df.withColumn(WEIGHT, -F.col(WEIGHT))


def plus(*dfs: DataFrame) -> DataFrame:
    """Z-set addition = bag union of weighted rows. Reference ``operator/plus.rs``.

    No consolidation is performed (weights for equal rows may appear in
    multiple rows); call :func:`consolidate` when a canonical form is needed.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    return plus(a, neg(b))


def consolidate(df: DataFrame) -> DataFrame:
    """Merge equal rows, sum weights, drop zero-weight rows.

    Reference ``operator/consolidate.rs``. One shuffle on all data columns.
    """
    cols = data_columns(df)
    return (
        df.groupBy(*cols)
        .agg(F.sum(WEIGHT).alias(WEIGHT))
        .filter(F.col(WEIGHT) != 0)
    )


def distinct(df: DataFrame) -> DataFrame:
    """Set-distinct: rows with net positive weight get weight 1.

    Mirrors ``zset.rs:149-196`` (``fn distinct``): rows whose weights sum
    to <= 0 disappear; others normalize to weight 1.
    """
    cols = data_columns(df)
    return (
        df.groupBy(*cols)
        .agg(F.sum(WEIGHT).alias(WEIGHT))
        .filter(F.col(WEIGHT) > 0)
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )


def integrate(*deltas: DataFrame) -> DataFrame:
    """Integral of a sequence of deltas = consolidated sum.

    Reference ``operator/integrate.rs:85``.
    """
    return consolidate(plus(*deltas))


def differentiate(current: DataFrame, previous: DataFrame) -> DataFrame:
    """D: delta between two snapshots (current − previous).

    Reference ``operator/differentiate.rs:38``. Rarely needed when staying
    in delta-land; used to turn snapshot-only sources into change streams.
    """
    return consolidate(plus(lift(current), neg(lift(previous))))


def to_bag(df: DataFrame) -> DataFrame:
    """Expand a Z-set with positive weights into a plain multiset DataFrame.

    Rows with weight w>1 are replicated w times (via an explode — stays
    JVM-side). Weight 0 means "absent" and is dropped; a negative weight is
    an error in a materialized relation and raises at execution time
    (Spark's ``sequence`` would otherwise silently *descend* for stop <
    start, multiplying rows).
    """
    cols = data_columns(df)
    seq = F.expr(
        f"CASE WHEN {WEIGHT} >= 1 THEN sequence(1, {WEIGHT}) "
        f"ELSE sequence(1, CAST(assert_true({WEIGHT} >= 0, "
        f"'to_bag: negative weight in materialized relation') AS BIGINT)) END"
    )
    return (
        df.filter(F.col(WEIGHT) != 0)
        .withColumn("__rep", F.explode(seq))
        .select(*cols)
    )


def from_bag(df: DataFrame) -> DataFrame:
    """Collapse a plain multiset into canonical Z-set form (row, count)."""
    return df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias(WEIGHT))


def is_zero(df: DataFrame) -> bool:
    """True iff the Z-set consolidates to empty. Triggers a job."""
    return consolidate(df).limit(1).count() == 0
