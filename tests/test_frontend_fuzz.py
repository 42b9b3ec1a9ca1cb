"""Adversarial frontend hardening (round-3 verdict task 4).

The dialect frontend + IVM recognizer are textual; the structural risk
is a silent miscompile on an unanticipated SQL shape. This property
test composes random view bodies from the recognizer grammar UNION
near-miss mutations — string literals containing keywords/brackets,
SQL comments, qualified names, odd whitespace, CTE wrappers, scalar /
NOT IN subqueries — and asserts the engine's evaluation of the view
(compiled OR batch fallback) equals Spark SQL's own evaluation of the
identical statement, or fails LOUDLY at create time. Never a silent
wrong answer.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from feldera_spark.pipeline import PipelineBuilder

T1_ROWS = [
    (1, 10, "a"), (2, 20, "b,c"), (3, None, "UNION"), (4, 40, "x'y"),
    (5, 50, "arr[1]"), (6, 60, None), (7, 20, "GROUP BY"), (8, 80, "d"),
]
T2_ROWS = [(1, 5), (2, None), (3, 7), (9, 9)]


def _ws(rng: random.Random) -> str:
    return rng.choice([" ", "  ", "\n ", "   ", "\t "])


@st.composite
def view_bodies(draw) -> str:
    rng = random.Random(draw(st.integers(0, 2**32 - 1)))
    w = lambda: _ws(rng)

    items_plain = ["k", "v", "s", "t1.k", "k + 1 AS kk", "upper(s) AS us",
                   "'lit UNION (SELECT' AS trap", "coalesce(v, 0) AS cv",
                   # round-8 token-splice rewrites: subscript-looking /
                   # SAFE_CAST-looking literal content must pass through
                   # byte-identical (rewrite_scalars no longer masks)
                   "'a[1] SAFE_CAST' AS sub_trap",
                   "'COUNTIF(x)' AS cif_trap",
                   "element_at(array(v, k), 1) AS ea"]
    items_agg = ["COUNT(*) AS n", "SUM(v) AS sv", "MIN(v) AS mv",
                 "MAX(k) AS mk", "AVG(v) AS av",
                 "SUM(v) + COUNT(*) AS compound"]
    preds = [
        "v > 15",
        "s <> 'a)b'",
        "s IS NOT NULL",
        "k % 2 = 0",
        "v > (SELECT AVG(v) FROM t2x)",
        "k NOT IN (SELECT k FROM t2x WHERE w > 0)",
        "v BETWEEN 10 AND 60",
        "t1.k < 100",
        # non-equi correlated scalar (range-scalar lowering) + a
        # correlated COUNT (COALESCE-0 path)
        "v > (SELECT MAX(w) FROM t2x WHERE t2x.k <= t1.k)",
        "v > (SELECT MAX(w) FROM t2x WHERE t2x.k < t1.k)",
        "v >= (SELECT SUM(w) FROM t2x WHERE t2x.k > t1.k)",
        "(SELECT COUNT(w) FROM t2x WHERE t2x.k = t1.k) < 5",
    ]
    # LATERAL shapes: the round-6 decorrelation rewrite runs before
    # compile AND the batch path — both must equal Spark's own LATERAL
    if draw(st.integers(0, 5)) == 0:
        lat = rng.choice([
            ", LATERAL (SELECT w FROM t2x WHERE t2x.k = a.k) x",
            ", LATERAL (SELECT w FROM t2x WHERE t2x.k = a.k AND w > 5) x",
            " CROSS JOIN LATERAL (SELECT MAX(w) AS mw FROM t2x"
            " WHERE t2x.k = a.k) x",
            " LEFT JOIN LATERAL (SELECT SUM(w) AS sw FROM t2x"
            " WHERE t2x.k = a.k) x ON TRUE",
            " LEFT JOIN LATERAL (SELECT w FROM t2x"
            " WHERE t2x.k = a.k) x ON TRUE",
            # decline shapes (stay batch; must still match Spark)
            ", LATERAL (SELECT w FROM t2x WHERE t2x.k < a.k) x",
            " CROSS JOIN LATERAL (SELECT COUNT(w) AS cw FROM t2x"
            " WHERE t2x.k = a.k) x",
        ])
        out_col = {"x": "x.w"}.get("x")
        lat_item = (
            "x.mw" if " mw " in lat else
            "x.sw" if " sw " in lat else
            "x.cw" if " cw " in lat else "x.w"
        )
        return (
            f"SELECT{w()}a.k, a.v, {lat_item}{w()}FROM{w()}t1 a{lat}"
        )
    grouped = draw(st.booleans())
    if grouped:
        n_items = draw(st.integers(1, 3))
        sel = ["k"] + rng.sample(items_agg, n_items)
    else:
        sel = rng.sample(items_plain, draw(st.integers(1, 4)))
    body = f"SELECT{w()}{(',' + w()).join(sel)}{w()}FROM{w()}t1"
    if draw(st.booleans()):
        chosen = rng.sample(preds, draw(st.integers(1, 2)))
        body += f"{w()}WHERE{w()}{(w() + 'AND' + w()).join(chosen)}"
    if grouped:
        body += f"{w()}GROUP{w()}BY{w()}k"
        if draw(st.booleans()):
            body += f"{w()}HAVING{w()}COUNT(*) >= 1"
    # comment injection: line comments between clauses
    if draw(st.booleans()):
        body = body.replace("FROM", "-- trailing comment\nFROM", 1)
    # CTE wrapper (sometimes colliding with a projected alias)
    wrap = draw(st.sampled_from(["none", "cte", "cte_collide"]))
    if wrap == "cte" and not grouped:
        body = f"WITH base{w()}AS{w()}({body.replace('t1', 't1', 1)}) " \
               f"SELECT{w()}*{w()}FROM{w()}base"
    elif wrap == "cte_collide" and grouped:
        body = (f"WITH n AS ({body}) SELECT{w()}k,{w()}n.{sel[1].split(' AS ')[-1]} "
                f"FROM{w()}n")
    return body


@pytest.fixture(scope="module")
def fuzz_tables(spark):
    spark.createDataFrame(T1_ROWS, "k INT, v INT, s STRING") \
        .createOrReplaceTempView("__fz_t1")
    spark.createDataFrame(T2_ROWS, "k INT, w INT") \
        .createOrReplaceTempView("__fz_t2")
    return spark


_counter = [0]


@settings(max_examples=200, deadline=None, derandomize=True)
@given(body=view_bodies())
def test_fuzzed_view_bodies_never_miscompile(spark, fuzz_tables, body):
    # ground truth: Spark SQL itself over the same relations (the view
    # grammar here is Spark-compatible by construction)
    truth_sql = body.replace("t1", "__fz_t1").replace("t2x", "__fz_t2")
    try:
        truth = sorted(
            tuple(str(c) for c in r) for r in spark.sql(truth_sql).collect()
        )
    except Exception:
        truth = None  # invalid statement: engine must also fail loudly

    _counter[0] += 1
    n = _counter[0]
    pipeline_sql = (
        f"CREATE TABLE t1 (k INT, v INT, s VARCHAR);"
        f"CREATE TABLE t2x (k INT, w INT);"
        f"CREATE MATERIALIZED VIEW fz{n} AS {body}"
    )
    try:
        b = PipelineBuilder(spark).sql(pipeline_sql)
        b.connect_table("t1", spark.table("__fz_t1"))
        b.connect_table("t2x", spark.table("__fz_t2"))
        p = b.create()
        got = sorted(
            tuple(str(c) for c in r) for r in p.view(f"fz{n}").collect()
        )
    except Exception as e:
        if truth is None:
            return  # Spark rejects it too: clean mutual failure
        raise AssertionError(
            f"engine rejects a Spark-valid statement: {body!r}: {e}"
        ) from e
    assert truth is not None, (
        f"engine evaluated a statement Spark SQL rejects: {body!r}"
    )
    assert got == truth, (
        f"MISCOMPILE: {body!r}\n engine={got[:5]}...\n truth={truth[:5]}..."
    )


# ---------------------------------------------------------------------------
# Token-based structural parser (round-5 verdict task #2): differential
# fuzz of the sqlparse-backed position/name functions against the legacy
# regex baselines, plus direct qualified-name coverage the legacy forms
# never supported.
# ---------------------------------------------------------------------------


@st.composite
def structural_bodies(draw) -> str:
    """Bodies exercising the POSITION grammar: joins, self-joins, comma
    FROM lists, derived tables, scalar subqueries, comments, literals
    containing keywords, and odd whitespace."""
    rng = random.Random(draw(st.integers(0, 2**32 - 1)))
    w = lambda: _ws(rng)
    froms = [
        "t1",
        "t1 a",
        "t1 AS a",
        "t1 a JOIN t2x b ON a.k = b.k",
        "t1 JOIN t2x ON t1.k = t2x.k",
        "t1 a, t2x b",
        "t1 a LEFT JOIN t2x b ON a.k = b.k",
        "t1 e1 JOIN t1 e2 ON e1.k = e2.k",
        "(SELECT k, v FROM t1 WHERE v > 0) d",
        "t1 a JOIN (SELECT k FROM t2x) d ON a.k = d.k",
        "t1 CROSS JOIN t2x",
        "t1 a FULL OUTER JOIN t2x b ON a.k = b.k",
    ]
    sels = [
        "*",
        "a.k, b.w" if rng.random() < 0 else "1 AS one, 'FROM t1' AS trap",
        "k + 1 AS kk",
        "count(*) AS n",
    ]
    body = (
        f"SELECT{w()}{rng.choice(sels)}{w()}FROM{w()}{rng.choice(froms)}"
    )
    if draw(st.booleans()):
        body += f"{w()}WHERE{w()}" + rng.choice(
            [
                "v > 1",
                "s <> 'JOIN t1'",
                "k IN (SELECT k FROM t2x)",
                "v > (SELECT AVG(w) FROM t2x)",
                "s = '-- not a comment'",
            ]
        )
    # NOTE: no comment injection here — the legacy regexes misparse
    # keywords inside /* */ comments (that defect is asserted fixed in
    # test_token_positions_ignore_comments); the differential corpus
    # compares only on the grammar legacy got right.
    return body


@settings(max_examples=250, deadline=None, derandomize=True)
@given(body=structural_bodies())
def test_token_positions_match_legacy(body):
    """The token-based walkers agree with the legacy regex forms on the
    single-word-name grammar the legacy forms supported (the migration
    harness the round-5 verdict asked for)."""
    from feldera_spark import frontend as fe

    assert fe.list_table_positions(body) == fe._legacy_list_table_positions(
        body
    ), body
    for name in ("t1", "t2x"):
        assert fe.count_table_positions(body, name) == \
            fe._legacy_count_table_positions(body, name), (body, name)
    # positional substitution: same output text
    positions = fe.list_table_positions(body)
    if positions:
        nm, idx, _al = positions[0]
        plan = {(nm, idx): "__repl"}
        assert fe.substitute_table_positions(body, plan) == \
            fe._legacy_substitute_table_positions(body, plan), body
    mapping = {"t1": "__m1", "t2x": "__m2"}
    assert fe.substitute_table_names(body, mapping) == \
        fe._legacy_substitute_table_names(body, mapping), body


def test_token_positions_qualified_names():
    """db.table qualification — new capability (legacy regexes saw only
    single words)."""
    from feldera_spark import frontend as fe

    sql = (
        "SELECT a.k, b.w FROM db.t1 a JOIN sch.t2 b ON a.k = b.w "
        "WHERE a.k IN (SELECT k FROM db.t1)"
    )
    assert fe.list_table_positions(sql) == [
        ("db.t1", 0, "a"),
        ("sch.t2", 0, "b"),
        ("db.t1", 1, None),
    ]
    assert fe.count_table_positions(sql, "db.t1") == 2
    out = fe.substitute_table_positions(sql, {("db.t1", 1): "__d"})
    assert "(SELECT k FROM __d AS t1)" in out
    # names: full dotted relation replaced; alias-qualified columns kept
    out2 = fe.substitute_table_names(sql, {"db.t1": "__x"})
    assert out2.count("__x") == 2 and "a.k" in out2


def test_tokenizer_structure_basics():
    from feldera_spark.sqlparse import (
        relations,
        split_clauses,
        split_set_ops,
        tokenize,
    )

    toks = tokenize("SELECT 'a''b' -- c\n, \"q id\", k FROM t")
    kinds = [t.kind for t in toks]
    assert "string" in kinds and "qident" in kinds
    assert all(t.text != "c" for t in toks), "comment must be dropped"

    cl = split_clauses(
        "SELECT k, count(*) AS n FROM t WHERE v > (SELECT 1) "
        "GROUP BY k HAVING count(*) > 1 ORDER BY k LIMIT 5"
    )
    assert cl is not None
    assert cl["GROUP"] == "k" and cl["LIMIT"] == "5"
    assert "(SELECT 1)" in cl["WHERE"]

    ops = split_set_ops("SELECT 1 UNION ALL SELECT 2 EXCEPT SELECT 3")
    assert [o for _, o in ops] == [None, "UNION ALL", "EXCEPT"]

    rels = relations(
        "SELECT * FROM t1 a, (SELECT * FROM t2 JOIN t3 ON t2.k = t3.k) d "
        "WHERE x IN (SELECT k FROM t4)"
    )
    names = [(r.name, r.join_kind) for r in rels if r.name]
    assert ("t1", "from") in names
    assert any(n == "t2" for n, _ in names)
    assert any(n == "t3" and k == "join" for n, k in names)
    assert any(n == "t4" for n, _ in names)


def test_token_positions_ignore_comments():
    """Keywords inside comments are data to the tokenizer — the legacy
    regex counted '/* FROM t9 */' as a position (known defect, retired
    by the token walker)."""
    from feldera_spark import frontend as fe

    sql = "SELECT * /* block FROM t9 */ FROM t1 -- JOIN t2x\n WHERE k > 0"
    assert fe.list_table_positions(sql) == [("t1", 0, None)]
    assert fe.count_table_positions(sql, "t9") == 0
    assert fe.count_table_positions(sql, "t2x") == 0


def test_scalar_extraction_literal_and_expression_hardening(spark):
    """Round-7 expression-tokenizer migration: extract_scalar_subqueries
    runs on RAW sql via token walkers — string literals containing
    keywords, parens, subquery-looking text and AND must neither confuse
    the extraction nor corrupt the splice. Results compared against
    Spark's own evaluation of the ORIGINAL body."""
    from feldera_spark import frontend as fe

    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b, FROM", 20.0), (3, "(SELECT", 30.0),
         (4, " AND ", 40.0)],
        "id INT, name STRING, v DOUBLE",
    ).createOrReplaceTempView("tt")
    cols = {"tt": {"id", "name", "v"}}

    bodies = [
        # keyword-looking literals around a genuine scalar subquery
        "SELECT id, name FROM tt WHERE name <> ' FROM UNION ' "
        "AND v > (SELECT AVG(v) FROM tt)",
        # literal containing a fake subquery open
        "SELECT id FROM tt WHERE name <> '(SELECT' "
        "AND v >= (SELECT MIN(v) FROM tt WHERE name <> ') AND (')",
        # literal containing AND inside the subquery's WHERE
        "SELECT id, v FROM tt a WHERE v < (SELECT MAX(v) FROM tt u "
        "WHERE u.name <> ' AND ' AND u.id = a.id) + 100",
    ]
    for body in bodies:
        got = fe.extract_scalar_subqueries(body, "__hx", cols)
        assert got is not None, body
        rewritten, hidden = got
        for nm, hsql in hidden:
            spark.sql(hsql).createOrReplaceTempView(nm)
        want = sorted(map(tuple, spark.sql(body).collect()))
        have = sorted(map(tuple, spark.sql(rewritten).collect()))
        assert have == want, (body, rewritten)

    # non-extractable shapes still decline cleanly (never corrupt text)
    declines = [
        # set op at top level
        "SELECT id FROM tt WHERE v > (SELECT AVG(v) FROM tt) "
        "UNION ALL SELECT id FROM tt",
        # subquery with GROUP BY (cardinality)
        "SELECT id FROM tt WHERE v > (SELECT AVG(v) FROM tt GROUP BY name)",
        # plain non-aggregate subquery
        "SELECT id FROM tt WHERE v > (SELECT v FROM tt WHERE id = 1)",
    ]
    for body in declines:
        assert fe.extract_scalar_subqueries(body, "__hy", cols) is None, body


def test_branch_projection_tokenized():
    """parse_branch_projection on tokens: literal content cannot force
    or fake a projection; quoted/keyword-looking literals in WHERE are
    inert; computed items and literal select items decline."""
    from feldera_spark.streaming.recursive import parse_branch_projection

    ok = parse_branch_projection(
        "SELECT e.a AS x, tc.b AS y FROM e JOIN tc ON e.b = tc.a "
        "WHERE e.note <> ' GROUP BY haha '",
        ["x", "y"],
    )
    assert ok is not None
    positions, col_of = ok
    assert {nm for nm, _i, _al in positions} == {"e", "tc"}
    # literal select item declines (round-5 ADVICE #1 class)
    assert parse_branch_projection(
        "SELECT a, 0 FROM e", ["x", "y"]) is None
    assert parse_branch_projection(
        "SELECT a, NULL FROM e", ["x", "y"]) is None
    # genuine GROUP BY declines
    assert parse_branch_projection(
        "SELECT a, COUNT(*) FROM e GROUP BY a", ["x", "y"]) is None
