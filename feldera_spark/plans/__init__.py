"""Plan introspection: physical-plan checks + the pipeline dataflow graph.

Two reference counterparts:

- ``crates/ir`` (HIR/MIR/LIR JSON dataflow graphs, ``ir/src/lib.rs:1-14``):
  ``view_dag`` emits a JSON-able graph of a pipeline's tables/views with
  the streaming-relevant annotations (stateful operators, lateness
  bounds, boundedness) — what the reference serves for observability.
- The compiler's plan sanity passes: ``scan_info`` / ``count_exchanges``
  / ``has_broadcast`` make the properties that matter at 100 TB
  (pushdown reaching the scan, no redundant shuffles, broadcast dims)
  assertable in tests instead of assumed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scan_info(df: DataFrame) -> list[dict]:
    """Per-parquet-scan: pushed filters + read schema (column pruning)."""
    plan = explain_formatted(df)
    out = []
    for block in plan.split("\n\n"):
        # detail blocks only (the tree section names scans but carries no
        # PushedFilters/ReadSchema attributes)
        if "Scan parquet" not in block or "ReadSchema" not in block:
            continue
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: (.*)", block)
        out.append(
            {
                "pushed_filters": (
                    [f.strip() for f in pushed.group(1).split(",") if f.strip()]
                    if pushed
                    else []
                ),
                "read_schema": schema.group(1).strip() if schema else "",
            }
        )
    return out


def count_exchanges(df: DataFrame, kind: str | None = None) -> int:
    """Number of Exchange (shuffle) nodes; ``kind`` narrows to
    'hashpartitioning' / 'RoundRobinPartitioning' / 'SinglePartition'."""
    plan = explain_formatted(df)
    if kind is None:
        return plan.split("\n\n")[0].count("Exchange")
    return plan.count(f"{kind}(") + plan.count(f"{kind},")


def has_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df) or "BroadcastNestedLoopJoin" in explain_formatted(df)


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (fewer = wider fused spans)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_formatted(df))))


def view_dag(builder) -> dict:
    """JSON-able dataflow graph of a PipelineBuilder's program.

    Nodes: tables (with lateness/PK annotations) and views (with the
    stateful operators detected and whether their state is bounded by an
    upstream lateness). Edges: view → referenced relation. The shape
    mirrors the reference's MIR graph: operator nodes + streams.
    """
    from feldera_spark.streaming.analysis import (
        _STATEFUL_PATTERNS,
        find_unbounded_state,
    )

    unbounded = {w.view for w in find_unbounded_state(builder)}
    nodes, edges = [], []
    for name, decl in builder.tables.items():
        nodes.append(
            {
                "id": name,
                "kind": "table",
                "lateness": decl.lateness,
                "primary_key": decl.primary_key,
            }
        )
    rel_names = list(builder.tables) + list(builder.views)
    for name in builder._view_order:
        decl = builder.views[name]
        stateful = (
            [label for label, pat in _STATEFUL_PATTERNS if pat.search(decl.sql)]
            if decl.sql
            else []
        )
        nodes.append(
            {
                "id": name,
                "kind": "view",
                "materialized": decl.materialized,
                "stateful_ops": stateful,
                "unbounded_state": name in unbounded,
            }
        )
        if decl.sql:
            for other in rel_names:
                if other != name and re.search(rf"\b{re.escape(other)}\b", decl.sql):
                    edges.append({"from": other, "to": name})
    return {"nodes": nodes, "edges": edges}
