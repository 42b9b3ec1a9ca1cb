"""Incremental view maintenance (IVM) over Z-set deltas.

This is the Spark re-expression of the reference's incrementalization pass
(``OptimizeIncrementalVisitor.java:40-120`` + ``IncrementalizeVisitor``):

- *Linear* operators (project/filter/flatMap/union) are delta-invariant:
  apply them directly to each delta (``OptimizeIncrementalVisitor.java:67-111``).
- *Join* is bilinear: ΔJ = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB with weight products
  (``crates/dbsp/src/operator/dynamic/join.rs``).
- *Aggregate* keeps the integral of its input and re-aggregates only the
  groups touched by the delta (``operator/dynamic/aggregate.rs``; the
  reference keeps the integral for exactly this reason,
  ``docs/sql/aggregates.md:418-434`` — MIN/MAX retraction needs it).
- *Distinct* emits +1/−1 only when a row's net weight crosses zero
  (``zset.rs:149-196``).

State lives in checkpointed DataFrames (local mode) — on a cluster these
become Delta tables / state stores; the delta rules are identical. Each
``step`` is a bounded Spark job: work is proportional to |delta| plus the
touched slice of state, never the full history (the IVM win).

The driving invariant (tested in tests/test_incremental.py, reference
``README.md:67-70``): after any sequence of deltas, the maintained output
equals the batch recomputation over the integrated input.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feldera_spark import zset
from feldera_spark.zset import WEIGHT


def _checkpoint(df: DataFrame) -> DataFrame:
    # lazy: lineage is truncated at first use, without forcing an extra
    # materialization job per delta step (on a cluster this becomes a
    # Delta-table write / state-store commit)
    return df.localCheckpoint(eager=False)


# ---------------------------------------------------------------------------
# Weighted aggregate expression helpers (linear aggregates: O(delta))
# ---------------------------------------------------------------------------

def wcount() -> F.Column:
    return F.sum(F.col(WEIGHT))


def wsum(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c * F.col(WEIGHT))


class IncrementalAggregateView:
    """Grouped aggregate maintained incrementally.

    ``agg_fn(weighted_rows) -> DataFrame`` must aggregate a Z-set DataFrame
    (rows + ``__weight``) grouped by ``keys``, using weight-aware
    expressions (``wcount``/``wsum`` for linear aggregates; plain
    ``F.min``/``F.max`` are fine because retracted rows are already gone
    from the integral — the "general" strategy of
    ``operator/dynamic/aggregate.rs``).
    """

    def __init__(self, keys: list[str], agg_fn: Callable[[DataFrame], DataFrame]):
        self.keys = keys
        self.agg_fn = agg_fn
        self.integral: DataFrame | None = None
        self.output: DataFrame | None = None

    def step(self, delta: DataFrame) -> DataFrame:
        """Apply one input delta; returns the output delta (Z-set)."""
        delta = zset.lift(delta)
        self.integral = _checkpoint(
            zset.integrate(self.integral, delta)
            if self.integral is not None
            else zset.consolidate(delta)
        )
        touched = delta.select(*self.keys).distinct()
        affected = self.integral.join(touched, on=self.keys, how="left_semi")
        new_groups = zset.lift(self.agg_fn(affected))
        if self.output is None:
            out_delta = new_groups
            self.output = _checkpoint(zset.consolidate(new_groups))
            return out_delta
        old_groups = self.output.join(touched, on=self.keys, how="left_semi")
        out_delta = zset.consolidate(zset.minus(new_groups, old_groups))
        untouched = self.output.join(touched, on=self.keys, how="left_anti")
        self.output = _checkpoint(
            zset.consolidate(untouched.unionByName(new_groups))
        )
        return out_delta

    def materialized(self) -> DataFrame:
        assert self.output is not None, "no deltas processed yet"
        return self.output.drop(WEIGHT)


class IncrementalJoinView:
    """Bilinear incremental equi-join: ΔJ = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB."""

    def __init__(self, on: list[str], how: str = "inner"):
        assert how == "inner", "incremental join: inner equi-join (outer via composition)"
        self.on = on
        self.a: DataFrame | None = None
        self.b: DataFrame | None = None
        self.output: DataFrame | None = None

    @staticmethod
    def _wjoin(x: DataFrame, y: DataFrame, on: list[str]) -> DataFrame:
        xr = x.withColumnRenamed(WEIGHT, "__wx")
        yr = y.withColumnRenamed(WEIGHT, "__wy")
        return (
            xr.join(yr, on=on, how="inner")
            .withColumn(WEIGHT, F.col("__wx") * F.col("__wy"))
            .drop("__wx", "__wy")
        )

    def step(self, delta_a: DataFrame | None, delta_b: DataFrame | None) -> DataFrame:
        da = zset.lift(delta_a) if delta_a is not None else None
        db = zset.lift(delta_b) if delta_b is not None else None
        parts = []
        if da is not None and self.b is not None:
            parts.append(self._wjoin(da, self.b, self.on))
        if db is not None and self.a is not None:
            parts.append(self._wjoin(self.a, db, self.on))
        if da is not None and db is not None:
            parts.append(self._wjoin(da, db, self.on))
        if da is not None:
            self.a = _checkpoint(
                zset.integrate(self.a, da) if self.a is not None else zset.consolidate(da)
            )
        if db is not None:
            self.b = _checkpoint(
                zset.integrate(self.b, db) if self.b is not None else zset.consolidate(db)
            )
        if not parts:
            return None
        out_delta = zset.consolidate(zset.plus(*parts))
        self.output = _checkpoint(
            zset.integrate(self.output, out_delta)
            if self.output is not None
            else out_delta
        )
        return out_delta

    def materialized(self) -> DataFrame:
        assert self.output is not None
        return zset.to_bag(self.output)


class IncrementalDistinctView:
    """DISTINCT maintained incrementally: emit ±1 on zero-crossings only."""

    def __init__(self):
        self.integral: DataFrame | None = None

    def step(self, delta: DataFrame) -> DataFrame:
        delta = zset.lift(delta)
        cols = zset.data_columns(delta)
        old = self.integral
        new = _checkpoint(
            zset.integrate(old, delta) if old is not None else zset.consolidate(delta)
        )
        self.integral = new
        touched = delta.select(*cols).distinct()
        new_w = new.join(touched, on=cols, how="left_semi")
        if old is None:
            return zset.distinct(new_w)
        old_w = old.join(touched, on=cols, how="left_semi")
        return zset.consolidate(
            zset.minus(zset.distinct(new_w), zset.distinct(old_w))
        )

    def materialized(self) -> DataFrame:
        assert self.integral is not None
        return zset.distinct(self.integral).drop(WEIGHT)
