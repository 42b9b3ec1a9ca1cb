"""Static unbounded-state detection over a pipeline's view DAG.

Reference: the ``FindUnboundedState`` circuit pass
(``sql-to-dbsp-compiler`` ``visitors/outer/``) warns when a query's state
grows without bound because no LATENESS bound lets the engine GC it
(SURVEY §7 hard part 4). The reference's ``MonotoneAnalyzer`` propagates
timestamp-monotonicity from LATENESS declarations through views; any
stateful operator (join/aggregate/distinct/window) fed only by
non-lateness-bounded streams keeps its whole input forever.

Our analysis mirrors that at the declaration level: walk the view DAG,
mark tables that carry a LATENESS column as *bounded*, propagate
boundedness through views, and flag every stateful view whose inputs are
all unbounded. It is intentionally conservative (syntactic), like the
reference's warning: false positives over exotic SQL are acceptable,
silent unbounded growth is not.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_STATEFUL_PATTERNS = (
    ("join", re.compile(r"\bjoin\b", re.IGNORECASE)),
    ("aggregate", re.compile(r"\bgroup\s+by\b", re.IGNORECASE)),
    ("distinct", re.compile(r"\bdistinct\b", re.IGNORECASE)),
    ("window function", re.compile(r"\bover\s*\(", re.IGNORECASE)),
    ("set op", re.compile(r"\b(intersect|except)\b", re.IGNORECASE)),
)


@dataclass
class StateWarning:
    view: str
    operator: str
    inputs: tuple[str, ...]

    def __str__(self) -> str:
        return (
            f"view {self.view!r}: {self.operator} over unbounded input(s) "
            f"{', '.join(self.inputs)} — state grows forever; declare "
            f"LATENESS on a timestamp column to allow GC"
        )


def find_unbounded_state(builder) -> list[StateWarning]:
    """Analyze a ``PipelineBuilder`` (before or after ``create()``).

    Returns one warning per stateful view whose referenced relations are
    all lateness-free. Views fed by at least one bounded relation are
    treated as GC-able (the waterline lets the evaluator trim state), the
    same monotonicity-propagation rule as ``MonotoneAnalyzer.java:34``.
    """
    bounded: dict[str, bool] = {
        name: bool(decl.lateness) for name, decl in builder.tables.items()
    }
    # append_only tables (docs/sql/streaming.md:36-41): aggregates over
    # them run as chain aggregates with O(keys) state — no integral — so
    # an aggregate-only view over append-only inputs is not a state
    # hazard even without LATENESS (chain_aggregate.rs:28).
    append_only = {
        name
        for name, decl in builder.tables.items()
        if getattr(decl, "append_only", False)
    }
    warnings: list[StateWarning] = []
    for name in builder._view_order:
        decl = builder.views[name]
        if decl.sql is None:
            bounded[name] = False
            continue
        refs = tuple(
            r for r in bounded if re.search(rf"\b{re.escape(r)}\b", decl.sql)
        )
        any_bounded = any(bounded[r] for r in refs)
        stateful = [
            label for label, pat in _STATEFUL_PATTERNS if pat.search(decl.sql)
        ]
        chain_ok = stateful == ["aggregate"] and refs and all(
            r in append_only or bounded[r] for r in refs
        )
        if stateful and refs and not any_bounded and not chain_ok:
            warnings.append(StateWarning(name, " + ".join(stateful), refs))
        # a view is bounded iff some input is bounded (waterline propagates)
        bounded[name] = any_bounded
    return warnings
