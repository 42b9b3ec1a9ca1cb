"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the Spark-native escape hatch equivalent to the reference's
custom operator API (arbitrary stateful operators over keyed streams —
``crates/dbsp`` operator traits; e.g. ``operator/dynamic/aggregate.rs``'s
general aggregator keeps per-key state exactly like a GroupState). Use it
when built-in windowed aggregations can't express the semantics: the
function sees each key's micro-batch rows as Arrow-backed pandas frames
plus a typed per-key state handle, and Spark shards keys across
executors + checkpoints the state — the same sharded-state-plus-
exactly-once contract the reference's circuit provides.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def running_totals(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream.

    The simplest chain-aggregate-shaped custom operator: O(1) state per
    key, one emitted update row per key per micro-batch. Output:
    (key, n, total).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, n long, total double"
    state_schema = "n long, total double"

    def fn(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
    )


def gap_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Session assembly with a custom gap rule — emits CLOSED sessions.

    Shows genuinely custom state (open-session bounds per key) beyond
    what ``session_window`` exposes: a session closes when a row arrives
    more than ``gap_seconds`` after the session's last event; the closed
    session (key, start, end, n_events) is emitted and the new session
    opens. Rows inside a micro-batch are processed in timestamp order.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} string, session_start double, session_end double, n_events long"
    )
    state_schema = "start double, last double, n long"

    def fn(key, pdf_iter, state: GroupState):
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for pdf in pdf_iter:
            for ts in sorted(float(x) for x in pdf[ts_col]):
                if last is not None and ts - last > gap_seconds:
                    closed.append((key[0], start, last, n))
                    start, last, n = ts, ts, 1
                else:
                    start = ts if start is None else start
                    last, n = ts, n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key_col, "session_start", "session_end", "n_events"],
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "Append", GroupStateTimeout.NoTimeout
    )
