"""Waterline (watermark) semantics and lateness-driven behavior.

Reference:
- waterline — a monotone lower bound on future timestamps, computed from
  observed data + declared LATENESS (``operator/time_series/
  waterline.rs:41,96``); propagated through views by ``MonotoneAnalyzer``.
- late rows (older than the waterline) are DROPPED at ingestion
  (``DBSPControlledKeyFilterOperator`` / ``operator/controlled_filter.rs``).
- ``emit_final`` views emit only rows that can no longer be retracted —
  i.e. windows entirely below the waterline (``docs/sql/streaming.md:44-57``).

Spark mapping: in Structured Streaming this is ``withWatermark``; in the
explicit incremental loop (our ``foreachBatch``-style evaluator) the
waterline is a ONE-ROW DataFrame maintained lazily: ``observe`` records a
chunk's max-timestamp aggregate without running it, and ``filter_late``
applies the bound IN-PLAN via a broadcast join — so a step issues no
blocking driver scalar at all (at many views × short triggers, one
``.collect()`` per chunk per source serializes the whole loop; this is
the same fix the rolling view's in-plan time bound applies,
incremental.py). Driver-side consumers that genuinely need the Python
scalar (the MonotoneAnalyzer's min/floor algebra, windowed freezing)
pull ``max_ts``/``bound`` which collects ON DEMAND and caches until the
next ``observe``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Waterline:
    """Tracks max(ts) − lateness over the chunks seen so far.

    Semantics mirror the reference: the bound used for step N is the
    waterline computed at the END of step N−1, so rows within a chunk can
    arrive out of order freely; only rows older than (previous chunks'
    max − lateness) are dropped.
    """

    def __init__(self, ts_col: str, lateness_seconds: int):
        self.ts_col = ts_col
        self.lateness_seconds = lateness_seconds
        self.lateness = _dt.timedelta(seconds=lateness_seconds)
        # one-row max-ts aggregates, one per observed chunk (lazy; merged
        # by a tiny union+max at read — no job until someone reads)
        self._max_parts: list[DataFrame] = []
        self._max_cached: _dt.datetime | None = None
        self._cache_valid = True

    # -- lazy scalar access (driver-side consumers) --------------------------

    @property
    def max_ts(self) -> _dt.datetime | None:
        """The observed max timestamp as a Python scalar — collected on
        demand and cached until the next ``observe``."""
        if not self._cache_valid:
            merged = self._max_frame()
            row = merged.collect()[0] if merged is not None else None
            mx = row["__wl_mx"] if row is not None else None
            if mx is not None and (self._max_cached is None or mx > self._max_cached):
                self._max_cached = mx
            self._cache_valid = True
        return self._max_cached

    @max_ts.setter
    def max_ts(self, value: _dt.datetime | None) -> None:
        self._max_cached = value
        self._max_parts = []
        self._cache_valid = True

    @property
    def bound(self) -> _dt.datetime | None:
        if self.max_ts is None:
            return None
        return self.max_ts - self.lateness

    def _max_frame(self) -> DataFrame | None:
        """One-row frame of the running max over all observed chunks."""
        if not self._max_parts:
            return None
        merged = self._max_parts[0]
        if len(self._max_parts) > 1:
            for p in self._max_parts[1:]:
                merged = merged.unionByName(p)
            merged = merged.agg(F.max("__wl_mx").alias("__wl_mx"))
            # collapse the list so repeated reads don't re-deepen
            self._max_parts = [merged]
        return merged

    @staticmethod
    def _ts_lit(value: _dt.datetime) -> F.Column:
        """Session-timezone-independent NTZ literal. ``F.lit(datetime)``
        would build an LTZ literal, and comparing it against a
        TIMESTAMP_NTZ column re-interprets through the session timezone —
        silently shifting the waterline by the UTC offset."""
        return F.lit(value.isoformat(sep=" ")).cast("timestamp_ntz")

    def filter_late(self, chunk: DataFrame) -> DataFrame:
        """Drop rows older than the current waterline (late-row drop).

        Fully in-plan: the bound is a broadcast one-row aggregate, so no
        driver synchronization happens here — the predicate evaluates
        inside the chunk's own job."""
        bound_df = self._max_frame()
        if bound_df is None and self._max_cached is None:
            return chunk
        is_ts = dict(chunk.dtypes).get(self.ts_col, "").startswith("timestamp")
        late = (
            F.expr(f"INTERVAL {self.lateness_seconds} SECONDS")
            if is_ts
            else F.lit(self.lateness_seconds)
        )
        if bound_df is None:
            # scalar-only state (e.g. restored from checkpoint)
            return chunk.filter(
                F.col(self.ts_col) >= self._ts_lit(self._max_cached - self.lateness)
                if is_ts
                else F.col(self.ts_col) >= F.lit(self._max_cached) - late
            )
        if self._max_cached is not None:
            # fold a known scalar floor into the in-plan bound
            floor_lit = (
                self._ts_lit(self._max_cached)
                if is_ts
                else F.lit(self._max_cached)
            )
            bound_df = bound_df.select(
                F.greatest(F.col("__wl_mx"), floor_lit).alias("__wl_mx")
            )
        return (
            chunk.join(F.broadcast(bound_df))
            .filter(
                (F.col(self.ts_col) >= F.col("__wl_mx") - late)
                | F.col("__wl_mx").isNull()
            )
            .drop("__wl_mx")
        )

    def observe(self, chunk: DataFrame) -> None:
        """Record a chunk's max timestamp — LAZILY (no job here)."""
        self._max_parts.append(
            chunk.agg(F.max(self.ts_col).alias("__wl_mx"))
        )
        self._cache_valid = False

    def step(self, chunk: DataFrame) -> DataFrame:
        """filter_late then observe — one ingestion step, zero driver
        synchronization (the bound rides inside the chunk's plan)."""
        kept = self.filter_late(chunk)
        self.observe(chunk)
        return kept


def emit_final(
    windowed: DataFrame, window_end_col: str, waterline: Waterline
) -> DataFrame:
    """Keep only windows that are closed under the waterline — rows that
    will never be retracted (emit_final view property)."""
    if waterline.bound is None:
        return windowed.limit(0)
    return windowed.filter(
        F.col(window_end_col) <= Waterline._ts_lit(waterline.bound)
    )
