"""Waterline derivation through the view DAG (mini-MonotoneAnalyzer).

Reference: the reference does not just track a waterline per SOURCE — its
``MonotoneAnalyzer`` (``MonotoneAnalyzer.java:34``) propagates
monotonicity through every operator of a view, so each stateful operator
gets its own derived GC bound (inserted as retain-keys/retain-values
operators). A derived view's waterline is a *function* of its inputs':

- relational ops (project/filter/union) pass the bound through;
- a join's output can only change where EITHER input can still change →
  its bound is ``min`` over the bounded inputs;
- grouping by a time floor (``TUMBLE``/``date_trunc``) floors the bound:
  window W is sealed once the input bound passes W's end;
- ``ts + INTERVAL d`` shifts the bound by ``d``.

These four rules are exactly the monotone-function transfer the reference
computes per DBSP operator; everything else that is time-insensitive
defaults to ``min(inputs)`` (conservative: never GCs too early).

The analyzer is driver-side scalar arithmetic over per-source observed
maxima — the distributed part (observing a delta's max ts) is one tiny
aggregate already paid by ``Waterline.step``. ``GcDriver`` applies the
derived bounds to the incremental views' spines after each step, turning
caller-driven GC into declaration-driven GC.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field


# -- derivation nodes --------------------------------------------------------


@dataclass(frozen=True)
class SourceBound:
    """Waterline of a declared source: max(observed ts) − lateness."""

    source: str


@dataclass(frozen=True)
class MinOf:
    """Join / union / generic multi-input rule: min over input bounds.
    An input without a bound (no lateness anywhere upstream) makes the
    result unbounded — state under it can never be GC'd."""

    inputs: tuple


@dataclass(frozen=True)
class FloorTo:
    """Grouping by a time floor (TUMBLE / date_trunc): a window is
    sealed once the input bound passes its END, so the bound on the
    window-start column is floor(b − width) + width … conservatively
    floor(b, width)."""

    input: object
    width_seconds: int


@dataclass(frozen=True)
class ShiftBy:
    """ts + INTERVAL d (d may be negative): bound shifts by d."""

    input: object
    shift_seconds: int


class WaterlineAnalyzer:
    """Propagates per-source waterlines through a DAG of derivations.

    Usage: ``declare_source`` for every LATENESS-carrying input,
    ``declare_view(name, node)`` for each derived view (nodes may
    reference other views by name), ``observe(source, max_ts)`` once per
    step (monotone), then ``bound(view)`` yields the view's waterline —
    rows/windows strictly below it are immutable and GC-able.
    """

    def __init__(self):
        self._lateness: dict[str, _dt.timedelta] = {}
        self._max_ts: dict[str, _dt.datetime | None] = {}
        self._views: dict[str, object] = {}

    def declare_source(self, name: str, lateness_seconds: int) -> None:
        self._lateness[name] = _dt.timedelta(seconds=lateness_seconds)
        self._max_ts[name] = None

    def declare_view(self, name: str, node) -> None:
        self._views[name] = node

    def observe(self, source: str, max_ts: _dt.datetime | None) -> None:
        if max_ts is None:
            return
        cur = self._max_ts[source]
        if cur is None or max_ts > cur:
            self._max_ts[source] = max_ts

    def bound(self, name_or_node) -> _dt.datetime | None:
        node = (
            self._views.get(name_or_node, name_or_node)
            if isinstance(name_or_node, str)
            else name_or_node
        )
        if isinstance(node, str):
            # a bare string that is not a view name = a source reference
            node = SourceBound(node)
        if isinstance(node, SourceBound):
            mx = self._max_ts.get(node.source)
            if mx is None:
                return None
            return mx - self._lateness[node.source]
        if isinstance(node, MinOf):
            bounds = [self.bound(i) for i in node.inputs]
            if any(b is None for b in bounds):
                return None
            return min(bounds)
        if isinstance(node, FloorTo):
            b = self.bound(node.input)
            if b is None:
                return None
            w = node.width_seconds
            epoch = _dt.datetime(1970, 1, 1)
            secs = int((b - epoch).total_seconds())
            return epoch + _dt.timedelta(seconds=(secs // w) * w)
        if isinstance(node, ShiftBy):
            b = self.bound(node.input)
            if b is None:
                return None
            return b + _dt.timedelta(seconds=node.shift_seconds)
        raise TypeError(f"unknown derivation node: {node!r}")


# -- automatic GC over incremental views -------------------------------------


@dataclass
class GcBinding:
    """One stateful view's GC rule: truncate state rows with
    ``ts_col < bound(node) - slack``. ``slack`` covers operators that
    must retain a frame context below the bound (e.g. a rolling window
    of width W needs [bound − W, …) to recompute in-lateness rows —
    the retain-values vs retain-keys distinction)."""

    view: object  # any view whose state lives in Spine attrs
    spine_attrs: tuple[str, ...]
    ts_col: str
    node: object
    slack_seconds: int = 0


class GcDriver:
    """Applies derived bounds to view state after each step — the Spark
    side of the reference's ``DBSPIntegrateTraceRetainKeysOperator``
    insertion: GC comes from the declarations, not from each caller."""

    def __init__(self, analyzer: WaterlineAnalyzer):
        self.analyzer = analyzer
        self.bindings: list[GcBinding] = []

    def bind(self, binding: GcBinding) -> None:
        self.bindings.append(binding)

    def gc(self) -> dict[str, _dt.datetime]:
        """Truncate every bound view's spines; returns applied bounds."""
        from pyspark.sql import functions as F

        from feldera_spark.streaming.watermark import Waterline

        applied = {}
        for b in self.bindings:
            bd = self.analyzer.bound(b.node)
            if bd is None:
                continue
            cut = bd - _dt.timedelta(seconds=b.slack_seconds)
            keep = F.col(b.ts_col) >= Waterline._ts_lit(cut)
            for attr in b.spine_attrs:
                spine = getattr(b.view, attr)
                if not spine.empty:
                    spine.truncate(keep)
            applied[type(b.view).__name__ + "." + ",".join(b.spine_attrs)] = cut
        return applied
