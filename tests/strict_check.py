"""Strict driver-style correctness check: compare Spark vs DuckDB results
as pandas frames with columns sorted by name, rows sorted, and each cell
stringified (so dtype skew like int 1 vs float 1.0 is a failure, mirroring
the driver's value-hash gate).

Usage: python tests/strict_check.py [query ...]   (default: all queries)
"""

from __future__ import annotations

import sys

import pandas as pd

from feldera_spark.session import get_spark
from feldera_spark.testing.oracle import duckdb_connection

SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    def cell(v):
        # floats: round like the driver does (1-ulp summation-order
        # divergence across engines is tolerated; dtype skew is not)
        if isinstance(v, (float, np.floating)):
            return repr(round(float(v), 6))
        return repr(v)

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(cell)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main(names):
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if not names:
        names = list(queries)
    spark = get_spark()
    con = duckdb_connection(SF_DIR)
    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name}: NO-ORACLE rows={len(sdf)}")
                continue
            odf = con.execute(oracles[name]).df()
            s, o = canon(sdf), canon(odf)
            if list(s.columns) != list(o.columns):
                failures.append((name, f"cols spark={list(s.columns)} oracle={list(o.columns)}"))
                print(f"{name}: COLS-MISMATCH")
                continue
            if len(s) != len(o):
                failures.append((name, f"rows spark={len(s)} oracle={len(o)}"))
                print(f"{name}: ROWS-MISMATCH {len(s)} vs {len(o)}")
                continue
            neq = (s != o)
            if neq.any().any():
                bad_cols = [c for c in s.columns if neq[c].any()]
                i = neq.any(axis=1).idxmax()
                failures.append((name, f"cells differ in {bad_cols}; first row {i}:\n  spark : {s.iloc[i].to_dict()}\n  oracle: {o.iloc[i].to_dict()}"))
                print(f"{name}: VALUE-MISMATCH in {bad_cols}")
            else:
                print(f"{name}: OK ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ERROR {type(e).__name__}: {e}"))
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
    con.close()
    print()
    for name, msg in failures:
        print(f"FAIL {name}: {msg}\n")
    print(f"{len(names) - len(failures)}/{len(names)} strict-pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
