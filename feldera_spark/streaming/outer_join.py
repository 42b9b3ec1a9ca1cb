"""Incremental outer / semi / anti joins over Z-set deltas.

Reference: ``crates/dbsp/src/operator/dynamic/join.rs`` — ``outer_join``
(join.rs:396), ``antijoin`` (join.rs:374) and ``semijoin.rs:28``. The
reference maintains outer joins incrementally by composing the bilinear
inner join with anti-join padding; this module is the same algebraic
decomposition expressed over Spark DataFrames:

    semi(A, B)  = A ⋈ Bk            where Bk = distinct(π_on(B))
    anti(A, B)  = A − semi(A, B)
    left (A, B) = inner(A, B) + pad_B(anti(A, B))
    full (A, B) = inner(A, B) + pad_B(anti(A, B)) + pad_A(anti(B, A))

Every term on the right is incrementally maintainable with operators the
engine already has: ``Bk`` is an ``IncrementalDistinctView`` over the key
columns (±1 on zero-crossings — exactly when a key's presence flips), and
``A ⋈ Bk`` is a bilinear ``IncrementalJoinView``. The hard case — a
deletion removing B's LAST row for a key, flipping A's matches from
joined to NULL-padded — falls out of the algebra: ΔBk = −{k} makes
Δsemi = −A[k] and therefore Δanti = +A[k], emitting the padded rows,
while the inner join simultaneously retracts the formerly-matched pairs.

Per-step work is O(|delta| + state restricted to touched keys), the same
IVM bound as the inner join; no full-history rescan on any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feldera_spark import zset
from feldera_spark.zset import WEIGHT

from feldera_spark.streaming.incremental import (
    IncrementalDistinctView,
    IncrementalJoinView,
    Spine,
    step_scoped,
)


class IncrementalOuterJoinView:
    """left / right / full outer, semi, anti equi-join maintained
    incrementally (semi/anti are left-oriented: ``A {semi|anti} B``).

    Padding NULL columns need the other side's schema; it is captured
    from the first delta seen per side, or pass DataFrames (schema
    donors — not scanned) to :meth:`set_schemas` up front when one side
    may pad before the other side's first delta arrives.
    """

    HOWS = ("left", "right", "full", "semi", "anti")

    def __init__(self, on: list[str], how: str):
        assert how in self.HOWS, f"how must be one of {self.HOWS}"
        self.on = on
        self.how = how
        self._with_inner = how in ("left", "right", "full")
        self._with_left_anti = how in ("left", "full", "semi", "anti")
        self._with_right_anti = how in ("right", "full")
        self.inner = IncrementalJoinView(on) if self._with_inner else None
        # left-oriented anti machinery: Bk presence + A ⋈ Bk
        self._bk = IncrementalDistinctView() if self._with_left_anti else None
        self._semi_a = IncrementalJoinView(on) if self._with_left_anti else None
        # right-oriented (for right/full): Ak presence + B ⋈ Ak
        self._ak = IncrementalDistinctView() if self._with_right_anti else None
        self._semi_b = IncrementalJoinView(on) if self._with_right_anti else None
        self.output = Spine()
        self._l_schema: list[tuple[str, str]] | None = None  # non-key cols
        self._r_schema: list[tuple[str, str]] | None = None

    # -- schema capture ------------------------------------------------------

    def set_schemas(self, left: DataFrame, right: DataFrame) -> None:
        self._capture(left, "l")
        self._capture(right, "r")

    def _capture(self, df: DataFrame, side: str) -> None:
        cols = [
            (n, t)
            for n, t in df.dtypes
            if n not in self.on and n != WEIGHT
        ]
        if side == "l" and self._l_schema is None:
            self._l_schema = cols
        if side == "r" and self._r_schema is None:
            self._r_schema = cols

    def _pad(self, df: DataFrame, side: str) -> DataFrame:
        """Add the missing side's non-key columns as typed NULLs."""
        schema = self._r_schema if side == "r" else self._l_schema
        assert schema is not None, (
            "outer-join padding needs the other side's schema before its "
            "first delta — call set_schemas(left_df, right_df) up front"
        )
        for name, dtype in schema:
            df = df.withColumn(name, F.lit(None).cast(dtype))
        return df

    # -- delta algebra -------------------------------------------------------

    @staticmethod
    def _acc(*parts: DataFrame | None) -> DataFrame | None:
        live = [p for p in parts if p is not None]
        if not live:
            return None
        return zset.consolidate(zset.plus(*live))

    @step_scoped
    def step(
        self, delta_a: DataFrame | None, delta_b: DataFrame | None
    ) -> DataFrame | None:
        """Push one step of deltas; returns the output delta (Z-set)."""
        da = zset.lift(delta_a) if delta_a is not None else None
        db = zset.lift(delta_b) if delta_b is not None else None
        if da is not None:
            self._capture(da, "l")
        if db is not None:
            self._capture(db, "r")

        d_inner = (
            self.inner.step(da, db) if self._with_inner else None
        )

        d_anti_a = d_semi = None
        if self._with_left_anti:
            # ΔBk, Δsemi = Δ(A ⋈ Bk), Δanti = ΔA − Δsemi
            dbk = (
                self._bk.step(db.select(*self.on, WEIGHT))
                if db is not None
                else None
            )
            d_semi = self._semi_a.step(da, dbk)
            d_anti_a = self._acc(
                da, zset.neg(d_semi) if d_semi is not None else None
            )
        if self.how == "semi":
            out = d_semi
        elif self.how == "anti":
            out = d_anti_a
        else:
            pads = []
            if self.how in ("left", "full") and d_anti_a is not None:
                pads.append(self._pad(d_anti_a, "r"))
            if self._with_right_anti:
                dak = (
                    self._ak.step(da.select(*self.on, WEIGHT))
                    if da is not None
                    else None
                )
                d_semi_b = self._semi_b.step(db, dak)
                d_anti_b = self._acc(
                    db, zset.neg(d_semi_b) if d_semi_b is not None else None
                )
                if d_anti_b is not None:
                    pads.append(self._pad(d_anti_b, "l"))
            out = self._acc(d_inner, *pads)

        if out is not None:
            return self.output.append(out)
        return out

    def materialized(self) -> DataFrame:
        assert not self.output.empty, "no deltas processed yet"
        return zset.to_bag(self.output.read())
