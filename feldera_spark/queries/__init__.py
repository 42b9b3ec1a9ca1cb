"""Query inventory: the driver-facing surface of the engine.

Each submodule exports ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-runnable ANSI SQL). Names map
1:1 to SURVEY.md §2 operator-inventory entries. Queries without an oracle
entry are non-SQL-expressible (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feldera_spark.queries import (
    datapipe,
    dialect,
    edge,
    incremental,
    nexmark,
    relational,
    relational2,
    relational3,
    relational4,
    temporal,
)

# ordered cheapest-first: the driver's correctness gate grades in this
# order under a time cap, so fast single-statement queries come before
# pipeline-building (dialect) and multi-step (incremental) ones
_MODULES = (
    relational,
    relational2,
    relational3,
    relational4,
    edge,
    temporal,
    dialect,
    nexmark,
    datapipe,
    incremental,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        for k, v in m.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name {k}")
            out[k] = v
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
