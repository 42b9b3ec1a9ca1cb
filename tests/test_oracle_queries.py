"""Mirror of the driver's t2 gate: every query with an oracle must match
DuckDB exactly at sf0.001 (fast) — run with SPARK_GRAFT_SF_TEST_DIR=
/root/testdata/sf0.01 for the full-size check.

Wall-time shape (r12, VERDICT #5 — the driver's pytest window expired
at ~85% in r11): the ~230 per-query tests are driver-latency-bound,
not CPU-bound (~8% CPU observed), so pure BATCH queries now run
CONCURRENTLY in chunk tests — Spark schedules overlapping jobs from
driver threads (guide §2.6), and each compare builds its own DuckDB
connection. Queries that touch the pipeline/step machinery stay
serial-parametrized: step scopes share a global stack and toggle
session confs, single-circuit-thread by design."""

from __future__ import annotations

import inspect

import pytest

from feldera_spark.queries import all_oracles, all_queries
from feldera_spark.testing.oracle import compare_to_oracle
from tests.conftest import SF_DIR

_QUERIES = all_queries()
_ORACLES = all_oracles()

_PIPELINE_TOKENS = (
    "PipelineBuilder",
    "step_scope",
    "execute_sql",
    "stream_table",
    "_evaluate_views",
)


def _is_pipeline_query(fn) -> bool:
    if fn.__module__ == "feldera_spark.queries.incremental":
        return True
    try:
        src = inspect.getsource(fn)
    except Exception:
        return True  # unknown: keep serial
    return any(tok in src for tok in _PIPELINE_TOKENS)


_SERIAL = sorted(n for n in _ORACLES if _is_pipeline_query(_QUERIES[n]))
_BATCH = sorted(set(_ORACLES) - set(_SERIAL))
_N_CHUNKS = 8
_POOL = 4


@pytest.mark.parametrize("name", _SERIAL)
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    compare_to_oracle(df, _ORACLES[name], SF_DIR)


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_batch_queries_match_oracle(spark, chunk):
    """Pure-batch oracle queries, _POOL at a time (thread-per-query;
    failures aggregated so one bad query never hides another's result)."""
    from concurrent.futures import ThreadPoolExecutor

    names = _BATCH[chunk::_N_CHUNKS]
    errs: list[str] = []

    def one(name: str) -> None:
        try:
            compare_to_oracle(
                _QUERIES[name](spark, SF_DIR), _ORACLES[name], SF_DIR
            )
        except Exception as e:  # aggregate, report all
            errs.append(f"{name}: {e}")

    with ThreadPoolExecutor(max_workers=_POOL) as pool:
        list(pool.map(one, names))
    assert not errs, f"{len(errs)} batch queries failed:\n" + "\n".join(
        sorted(errs)
    )


def test_every_query_has_oracle_or_is_documented():
    missing = set(_QUERIES) - set(_ORACLES)
    # Queries without oracles get the driver's weaker rows-only check;
    # keep this list explicit so nothing silently loses coverage.
    assert missing == set(), f"queries without oracle SQL: {sorted(missing)}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0
