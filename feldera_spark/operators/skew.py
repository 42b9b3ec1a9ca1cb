"""Skew-aware aggregation: two-phase (salted) aggregate.

At 100 TB a handful of hot keys (one event_type carrying 40% of rows)
serializes a groupBy into one straggler task. The classic fix: add a
deterministic salt, aggregate (key, salt) partials in parallel, then
combine partials per key — two small shuffles instead of one skewed one.
AQE's skew-join handling covers joins; this covers aggregations, and is
deterministic (salt = hash of a secondary column, not rand()) so results
are reproducible and oracle-checkable.

Only decomposable aggregates are supported (sum/count/min/max — the same
'linear + chain' classes the reference optimizes, aggregates.md:342-462);
that's exactly the set where two-phase aggregation is algebraically exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output name -> (fn, input_col)
    with fn in {sum, count, min, max}. ``salt_col`` is any column with
    enough entropy to spread hot keys (its hash mod n_salts is the salt).
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in _partial:
            raise ValueError(f"{fn} is not decomposable; use plain groupBy")

    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_col)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_partial[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_combine[fn](name).alias(name) for name, (fn, c) in aggs.items()]
    )
