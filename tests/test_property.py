"""Property-based incremental-equals-batch checks (hypothesis).

Mirrors the reference's proptest-based operator tests
(``crates/dbsp/src/operator/*`` ``#[cfg(test)]`` proptest sections, e.g.
``join.rs``, ``distinct.rs``): for ARBITRARY inputs, chunkings, and
delete patterns, the incrementally-maintained state must equal batch
recomputation over the net input (``README.md:67-70``).

Spark jobs are slow per example, so examples are few but each covers an
arbitrary interleaving — the property, not the sample count, carries the
guarantee.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feldera_spark.streaming.incremental import (
    IncrementalDistinctView,
    IncrementalLinearAggregateView,
    wcount,
    wsum,
)
from feldera_spark.zset import WEIGHT

# each element: (key 0..2, value 0..5, chunk 0..2, delete_later?)
ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 5),
        st.integers(0, 2),
        st.booleans(),
    ),
    min_size=1,
    max_size=25,
)


def _chunks_and_net(spark, rows):
    chunks = [[] for _ in range(4)]
    net = Counter()
    for i, (k, v, c, dele) in enumerate(rows):
        chunks[c].append((f"k{k}", v, 1))
        net[(f"k{k}", v)] += 1
        if dele:
            chunks[3].append((f"k{k}", v, -1))
            net[(f"k{k}", v)] -= 1
    dfs = [
        spark.createDataFrame(c, ["k", "v", WEIGHT]) for c in chunks if c
    ]
    return dfs, +net  # +net drops zero/negative entries


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_linear_agg_property(spark, rows):
    dfs, net = _chunks_and_net(spark, rows)
    view = IncrementalLinearAggregateView(
        keys=["k"], sums={"n": wcount(), "total": wsum("v")}
    )
    for d in dfs:
        view.step(d)
    got = {r.k: (r.n, r.total) for r in view.materialized().collect()}
    want: dict[str, tuple[int, int]] = {}
    for (k, v), m in net.items():
        n, tot = want.get(k, (0, 0))
        want[k] = (n + m, tot + v * m)
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_distinct_property(spark, rows):
    dfs, net = _chunks_and_net(spark, rows)
    view = IncrementalDistinctView()
    for d in dfs:
        view.step(d)
    got = {(r.k, r.v) for r in view.materialized().collect()}
    assert got == set(net)


# ---------------------------------------------------------------------------
# compiled (SQL->IVM) views under arbitrary delta schedules
# ---------------------------------------------------------------------------

_COMPILED_SQLS = [
    "SELECT k, COUNT(*) AS n, SUM(v) AS s, AVG(v) AS a FROM t GROUP BY k",
    "SELECT k, MIN(v) AS lo, MAX(v) AS hi FROM t GROUP BY k",
    "SELECT DISTINCT k, v FROM t",
    "SELECT k, v FROM t WHERE v >= 2",
]


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, sql_idx=st.integers(0, len(_COMPILED_SQLS) - 1))
def test_compiled_view_equals_batch_property(spark, rows, sql_idx):
    """For ARBITRARY inputs, chunkings, and delete patterns, a compiled
    view's maintained state equals Spark batch evaluation of the same
    SQL over the net input — the reference invariant driven through the
    SQL->IVM bridge rather than hand-assembled operators."""
    from feldera_spark.streaming.compiler import compile_view

    sql = _COMPILED_SQLS[sql_idx]
    dfs, net = _chunks_and_net(spark, rows)
    plan = compile_view(sql, tables={"t"})
    assert plan is not None
    for d in dfs:
        plan.step({"t": d})
    live = [(k, v) for (k, v), n in net.items() for _ in range(n)]
    if not live:
        got = plan.materialized().collect()
        assert got == []
        return
    spark.createDataFrame(live, ["k", "v"]).createOrReplaceTempView("t")
    expected = sorted(tuple(r) for r in spark.sql(sql).collect())
    got = sorted(tuple(r) for r in plan.materialized().collect())
    assert got == expected


# ---------------------------------------------------------------------------
# compiled-view shapes under arbitrary delta schedules
# ---------------------------------------------------------------------------


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_compiled_setop_property(spark, rows):
    """EXCEPT compiled view == set difference of the net inputs, for
    arbitrary interleavings: rows with even chunk feed t, odd feed u."""
    from feldera_spark.streaming.compiler import compile_view

    t_net, u_net = Counter(), Counter()
    t_chunks, u_chunks = [[] for _ in range(4)], [[] for _ in range(4)]
    for k, v, c, dele in rows:
        side_chunks, side_net = (
            (t_chunks, t_net) if v % 2 == 0 else (u_chunks, u_net)
        )
        side_chunks[c].append((f"k{k}", v, 1))
        side_net[(f"k{k}", v)] += 1
        if dele:
            side_chunks[3].append((f"k{k}", v, -1))
            side_net[(f"k{k}", v)] -= 1
    plan = compile_view(
        "SELECT k, v FROM t EXCEPT SELECT k, v FROM u", tables={"t", "u"}
    )
    for i in range(4):
        td = (
            spark.createDataFrame(t_chunks[i], ["k", "v", WEIGHT])
            if t_chunks[i]
            else None
        )
        ud = (
            spark.createDataFrame(u_chunks[i], ["k", "v", WEIGHT])
            if u_chunks[i]
            else None
        )
        if td is not None or ud is not None:
            plan.step({"t": td, "u": ud})
    t_set = {kv for kv, m in (+t_net).items()}
    u_set = {kv for kv, m in (+u_net).items()}
    want = t_set - u_set
    if not (t_net or u_net):
        return
    got = {(r.k, r.v) for r in plan.materialized().collect()}
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_compiled_having_property(spark, rows):
    from feldera_spark.streaming.compiler import compile_view

    dfs, net = _chunks_and_net(spark, rows)
    plan = compile_view(
        "SELECT k, COUNT(*) AS n FROM t GROUP BY k HAVING COUNT(*) > 2",
        tables={"t"},
    )
    for d in dfs:
        plan.step({"t": d})
    want = {}
    for (k, v), m in net.items():
        want[k] = want.get(k, 0) + m
    want = {k: n for k, n in want.items() if n > 2}
    got = {r.k: r.n for r in plan.materialized().collect()}
    assert got == want
