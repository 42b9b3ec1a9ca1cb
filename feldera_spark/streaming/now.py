"""Incrementalized NOW()-dependent temporal filters.

Reference: ``WHERE ts > NOW() - INTERVAL …`` filters are NOT recomputed
per tick — the ``ImplementNow`` pass (``CircuitOptimizer.java:81``,
``DBSPNowOperator.java``; semantics ``docs/sql/streaming.md:59-100``)
rewires NOW() into a clock input so each tick emits only the DELTA:
new in-window rows, plus retractions for rows that fell out because the
boundary advanced.

Spark form: the integral is time-indexed state; advancing the clock
retracts exactly the ``(old_bound, new_bound]`` slice — a range filter
over state, never a full recomputation. At scale the state is
partitioned by time bucket so the slice read is partition-pruned, and
LATENESS GC (same bound arithmetic) truncates it from below.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feldera_spark import zset
from feldera_spark.streaming.incremental import Spine
from feldera_spark.streaming.watermark import Waterline


class TemporalFilterView:
    """Maintains ``SELECT * FROM t WHERE ts > now − width`` as now advances.

    ``step(delta, now)`` returns the output delta: in-window arrivals
    (+weights from the input delta) and boundary-crossing retractions
    (−weights for state rows with ``old_bound < ts <= new_bound``).
    """

    def __init__(self, ts_col: str, width_seconds: int):
        self.ts_col = ts_col
        self.width = _dt.timedelta(seconds=width_seconds)
        self.integral = Spine()
        self.prev_bound: _dt.datetime | None = None

    def _lit(self, b: _dt.datetime) -> F.Column:
        return Waterline._ts_lit(b)

    def step(self, delta: DataFrame | None, now: _dt.datetime) -> DataFrame | None:
        # Effective bound is monotone even if the wall clock regresses
        # (a non-monotone ``now`` must not re-open the window: rows in
        # (new_bound, prev_bound] were already retracted / never emitted,
        # and filtering arrivals against a regressed bound would emit rows
        # that the falling-out scan never covers).
        new_bound = now - self.width
        eff_bound = (
            new_bound
            if self.prev_bound is None
            else max(self.prev_bound, new_bound)
        )
        parts = []
        # 1) rows falling OUT because the boundary advanced — computed
        #    against the integral BEFORE this tick's arrivals
        if (
            self.prev_bound is not None
            and eff_bound > self.prev_bound
            and not self.integral.empty
        ):
            falling = self.integral.read().filter(
                (F.col(self.ts_col) > self._lit(self.prev_bound))
                & (F.col(self.ts_col) <= self._lit(eff_bound))
            )
            parts.append(zset.neg(falling))
        # 2) this tick's arrivals that are inside the window
        if delta is not None:
            delta = zset.lift(delta)
            self.integral.append(delta)
            parts.append(delta.filter(F.col(self.ts_col) > self._lit(eff_bound)))
        self.prev_bound = eff_bound
        # 3) GC: state at/below the bound can never be emitted or retracted
        #    again (the bound is monotone) — truncate it so the integral is
        #    bounded by the window width, not the full history.
        if not self.integral.empty:
            self.integral.truncate(F.col(self.ts_col) > self._lit(eff_bound))
        if not parts:
            return None
        return zset.consolidate(zset.plus(*parts))

    def materialized(self) -> DataFrame:
        assert self.prev_bound is not None and not self.integral.empty
        return zset.to_bag(
            self.integral.read().filter(
                F.col(self.ts_col) > self._lit(self.prev_bound)
            )
        )
