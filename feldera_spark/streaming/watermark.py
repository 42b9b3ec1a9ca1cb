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
explicit incremental loop (our ``foreachBatch``-style evaluator) we track
the waterline in the driver — a single scalar per source, computed by a
distributed max — and apply it as an ordinary filter. The filter's
predicate changes per step but the evaluation stays fully distributed.
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
        self.lateness = _dt.timedelta(seconds=lateness_seconds)
        self.max_ts: _dt.datetime | None = None

    @property
    def bound(self) -> _dt.datetime | None:
        if self.max_ts is None:
            return None
        return self.max_ts - self.lateness

    @staticmethod
    def _ts_lit(value: _dt.datetime) -> F.Column:
        """Session-timezone-independent NTZ literal. ``F.lit(datetime)``
        would build an LTZ literal, and comparing it against a
        TIMESTAMP_NTZ column re-interprets through the session timezone —
        silently shifting the waterline by the UTC offset."""
        return F.lit(value.isoformat(sep=" ")).cast("timestamp_ntz")

    def filter_late(self, chunk: DataFrame) -> DataFrame:
        """Drop rows older than the current waterline (late-row drop)."""
        if self.bound is None:
            return chunk
        return chunk.filter(F.col(self.ts_col) >= self._ts_lit(self.bound))

    def observe(self, chunk: DataFrame) -> None:
        """Advance the waterline with a chunk's max timestamp."""
        row = chunk.agg(F.max(self.ts_col).alias("mx")).collect()[0]
        if row["mx"] is not None and (self.max_ts is None or row["mx"] > self.max_ts):
            self.max_ts = row["mx"]

    def step(self, chunk: DataFrame) -> DataFrame:
        """filter_late then observe — one ingestion step."""
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
