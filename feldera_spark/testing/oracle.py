"""DuckDB-oracle comparison harness.

Mirrors the driver's t2 correctness gate: run the Spark query and the
ANSI-SQL oracle on the same parquet tables, then compare row count,
column names, and values order-insensitively (columns sorted by name,
rows sorted). This is the same golden-oracle strategy the reference uses
with its SqlLogicTest corpus + Postgres suites (SURVEY §5).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from feldera_spark.sources.registry import TABLES

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=FLOAT_REL_TOL, abs_tol=FLOAT_ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_values_close(x, y) for x, y in zip(a, b))
    return a == b


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result matches the DuckDB oracle. Raises AssertionError."""
    con = duckdb_connection(sf_dir)
    try:
        oracle = con.execute(oracle_sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()

    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )

    col_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_rows = [
        tuple(_norm(row[i]) for i in col_order) for row in spark_df.collect()
    ]
    o_perm = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    o_rows = [tuple(_norm(row[i]) for i in o_perm) for row in o_rows]

    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    s_rows.sort(key=_sort_key)
    o_rows.sort(key=_sort_key)
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not _values_close(sr, orow):
            raise AssertionError(
                f"row {i} mismatch:\n  spark : {sr}\n  oracle: {orow}"
            )
