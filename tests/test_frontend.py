"""Unit tests for the Feldera SQL dialect front-end (frontend.py)."""

import pytest

from feldera_spark import frontend
from feldera_spark.pipeline import PipelineBuilder


def test_safe_cast_rewrite():
    out = frontend.rewrite_scalars("SELECT SAFE_CAST(x AS INT) FROM t")
    assert out == "SELECT TRY_CAST(x AS INT) FROM t"


def test_subscript_rewrite_one_based():
    out = frontend.rewrite_scalars("SELECT toks[1], m['k'] FROM t")
    assert out == "SELECT element_at(toks, 1), element_at(m, 'k') FROM t"


def test_subscript_rewrite_nested():
    out = frontend.rewrite_scalars("SELECT a[b[1]] FROM t")
    assert out == "SELECT element_at(a, element_at(b, 1)) FROM t"


def test_tumble_rewrite_text():
    sql = (
        "SELECT window_start, count(*) FROM TABLE(TUMBLE(TABLE ev, "
        "DESCRIPTOR(ts), INTERVAL '1' HOUR)) GROUP BY window_start"
    )
    out = frontend.rewrite_table_functions(sql)
    assert "window(ts, '1 hour')" in out
    assert "window_start" in out and "TUMBLE" not in out


def test_hop_rewrite_arg_order():
    # HOP(TABLE, DESCRIPTOR, slide, size) → window(ts, size, slide)
    sql = (
        "SELECT * FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), "
        "INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
    )
    out = frontend.rewrite_table_functions(sql)
    assert "window(ts, '1 hour', '15 minute')" in out


def test_session_rewrite_partition():
    sql = (
        "SELECT * FROM TABLE(SESSION(TABLE ev PARTITION BY uid, "
        "DESCRIPTOR(ts), INTERVAL '30' MINUTE))"
    )
    out = frontend.rewrite_table_functions(sql)
    assert "PARTITION BY uid" in out
    assert "INTERVAL '30' MINUTE" in out
    assert "SESSION" not in out.upper().replace("__S", "")


def test_declare_recursive_parsed():
    b = PipelineBuilder.__new__(PipelineBuilder)
    b.__init__(spark=None)
    b.sql("DECLARE RECURSIVE VIEW r (a INT, b VARCHAR)")
    assert b.recursive_views == {"r": "a INT, b STRING"}


def test_asof_requires_left_latest():
    sql = (
        "SELECT * FROM a LEFT ASOF JOIN b "
        "MATCH_CONDITION (b.ts >= a.ts) ON a.k = b.k"
    )
    with pytest.raises(ValueError, match="LEFT side"):
        frontend._rewrite_asof(None, sql)


def test_ddl_program_end_to_end(spark):
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE ev (k INT, ts TIMESTAMP, v DOUBLE);
            CREATE MATERIALIZED VIEW hourly AS
            SELECT window_start, k, count(*) AS n
            FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
            GROUP BY window_start, k;
            """
        )
        .connect_table(
            "ev",
            spark.createDataFrame(
                [(1, "2024-01-01 10:05:00", 1.0), (1, "2024-01-01 10:55:00", 2.0),
                 (2, "2024-01-01 11:05:00", 3.0)],
                "k INT, ts STRING, v DOUBLE",
            ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "v"),
        )
        .create()
    )
    rows = {(r["k"], str(r["window_start"]), r["n"]) for r in p.view("hourly").collect()}
    assert rows == {
        (1, "2024-01-01 10:00:00", 2),
        (2, "2024-01-01 11:00:00", 1),
    }


def test_ddl_recursive_end_to_end(spark):
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE edge (src INT, dst INT);
            DECLARE RECURSIVE VIEW tc (src INT, dst INT);
            CREATE MATERIALIZED VIEW tc AS
            SELECT src, dst FROM edge
            UNION
            SELECT tc.src, edge.dst FROM tc JOIN edge ON tc.dst = edge.src;
            """
        )
        .connect_table(
            "edge",
            spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src INT, dst INT"),
        )
        .create()
    )
    got = {(r["src"], r["dst"]) for r in p.view("tc").collect()}
    assert got == {(1, 2), (2, 3), (3, 4), (1, 3), (2, 4), (1, 4)}


def test_rewrite_scalars_is_quote_aware():
    from feldera_spark.frontend import rewrite_scalars

    # bracket/keyword text inside string LITERALS is data, not syntax
    sql = "SELECT arr[1] AS x, 'arr[1]' AS lit, 'SAFE_CAST' AS lit2 FROM t"
    out = rewrite_scalars(sql)
    assert "element_at(arr, 1)" in out
    assert "'arr[1]'" in out and "'SAFE_CAST'" in out
    # SAFE_CAST outside literals still rewrites
    assert "TRY_CAST" in rewrite_scalars("SELECT SAFE_CAST(x AS INT) FROM t")


def test_rewrite_cast_timestamp_ms_semantics(spark):
    from feldera_spark.frontend import rewrite_cast_timestamp

    out = rewrite_cast_timestamp(
        "SELECT CAST(ms AS TIMESTAMP) AS ts, CAST(s AS VARCHAR) AS v FROM t"
    )
    assert "timestampadd(MILLISECOND" in out
    assert "CAST(s AS VARCHAR)" in out  # non-timestamp casts untouched
    # literal containing the pattern is untouched
    lit = rewrite_cast_timestamp("SELECT 'CAST(1 AS TIMESTAMP)' AS s FROM t")
    assert "'CAST(1 AS TIMESTAMP)'" in lit
    # runtime dispatch: BIGINT -> ms since epoch; STRING -> parsed NTZ
    spark.createDataFrame(
        [(1704067200123, "2024-01-01 00:00:00")], "ms BIGINT, s STRING"
    ).createOrReplaceTempView("__ts_t")
    row = spark.sql(
        rewrite_cast_timestamp(
            "SELECT CAST(ms AS TIMESTAMP) AS a, CAST(s AS TIMESTAMP) AS b "
            "FROM __ts_t"
        )
    ).collect()[0]
    assert str(row["a"]) == "2024-01-01 00:00:00.123000"
    assert str(row["b"]) == "2024-01-01 00:00:00"


def test_unsigned_ddl_types(spark):
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE u (a INT UNSIGNED, b BIGINT UNSIGNED);
            CREATE MATERIALIZED VIEW v AS SELECT a, b FROM u
            """
        )
        .connect_table(
            "u",
            spark.createDataFrame(
                [(4294967295, __import__("decimal").Decimal(18446744073709551615))],
                "a BIGINT, b DECIMAL(20,0)",
            ),
        )
        .create()
    )
    from feldera_spark.pipeline import _spark_type

    assert _spark_type("BIGINT UNSIGNED") == "DECIMAL(20,0)"
    assert _spark_type("int unsigned") == "BIGINT"
    r = p.view("v").collect()[0]
    assert r["a"] == 4294967295 and int(r["b"]) == 18446744073709551615


def test_multiple_asof_joins_in_one_statement(spark):
    """A program with TWO ASOF joins (one per UNION branch) rewrites
    both — the single-ASOF-per-statement limitation is gone."""
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100.0), (1, "2024-01-01 12:00:00", 200.0)],
        "k INT, ts STRING, px DOUBLE",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "px").createOrReplaceTempView("quotes")
    spark.createDataFrame(
        [(1, "2024-01-01 11:00:00"), (1, "2024-01-01 13:00:00")],
        "k INT, ts STRING",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS tts").createOrReplaceTempView("trades")
    df = frontend.prepare_view(
        spark,
        """
        SELECT t.k, t.tts, q.px FROM trades t LEFT ASOF JOIN quotes q
          MATCH_CONDITION (t.tts >= q.ts) ON t.k = q.k
        UNION ALL
        SELECT t.k, t.tts, q.px FROM trades t LEFT ASOF JOIN quotes q
          MATCH_CONDITION (t.tts >= q.ts) ON t.k = q.k
        """,
    )
    rows = sorted((r["k"], str(r["tts"]), r["px"]) for r in df.collect())
    assert rows == [
        (1, "2024-01-01 11:00:00", 100.0),
        (1, "2024-01-01 11:00:00", 100.0),
        (1, "2024-01-01 13:00:00", 200.0),
        (1, "2024-01-01 13:00:00", 200.0),
    ]


# -- round-3 ADVICE regressions ---------------------------------------------


def test_correlated_count_subquery_zero_default(spark):
    """Correlated scalar COUNT returns 0 (not NULL) for outer rows with
    no matching inner group — the decorrelated LEFT JOIN must COALESCE
    (ADVICE r3 high: rows were silently dropped)."""
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE a (k INT, v INT);
            CREATE TABLE u (k INT, w INT);
            CREATE MATERIALIZED VIEW lonely AS
            SELECT k FROM a WHERE (SELECT COUNT(*) FROM u WHERE u.k = a.k) = 0;
            CREATE MATERIALIZED VIEW counts AS
            SELECT k, (SELECT COUNT(*) FROM u WHERE u.k = a.k) AS n FROM a;
            """
        )
        .connect_table(
            "a", spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k INT, v INT")
        )
        .connect_table(
            "u", spark.createDataFrame([(1, 1), (1, 2)], "k INT, w INT")
        )
        .create()
    )
    assert {r["k"] for r in p.view("lonely").collect()} == {2, 3}
    got = {(r["k"], r["n"]) for r in p.view("counts").collect()}
    assert got == {(1, 2), (2, 0), (3, 0)}


def test_correlated_count_expression_not_extracted():
    """COUNT inside a larger correlated expression can't take the
    0-default post-hoc — it must stay a real subquery (batch path)."""
    from feldera_spark.frontend import extract_scalar_subqueries

    out = extract_scalar_subqueries(
        "SELECT k FROM a WHERE (SELECT COUNT(*) + 1 FROM u WHERE u.k = a.k) = 1",
        "__sq_v",
        {"u": {"k", "w"}, "a": {"k", "v"}},
    )
    assert out is None


def test_cte_name_collides_with_column(spark):
    """A CTE whose name equals a column it projects must not have the
    column reference rewritten (ADVICE r3 medium, verified break)."""
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE t (k INT, v INT);
            CREATE MATERIALIZED VIEW out AS
            WITH totals AS (SELECT k, SUM(v) AS totals FROM t GROUP BY k)
            SELECT k, totals FROM totals;
            """
        )
        .connect_table(
            "t", spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k INT, v INT")
        )
        .create()
    )
    assert {(r["k"], r["totals"]) for r in p.view("out").collect()} == {
        (1, 15), (2, 7)
    }


def test_substitute_table_names_positions():
    from feldera_spark.frontend import substitute_table_names

    m = {"totals": "__h"}
    # FROM / JOIN targets and qualifiers rewrite
    assert substitute_table_names("SELECT x FROM totals", m) == "SELECT x FROM __h"
    assert (
        substitute_table_names("SELECT totals.k FROM totals", m)
        == "SELECT __h.k FROM __h"
    )
    assert (
        substitute_table_names("SELECT a.x FROM a JOIN totals ON a.k = totals.k", m)
        == "SELECT a.x FROM a JOIN __h ON a.k = __h.k"
    )
    # comma-continued FROM list rewrites; select-list column does NOT
    assert (
        substitute_table_names("SELECT k, totals FROM a, totals", m)
        == "SELECT k, totals FROM a, __h"
    )
    # GROUP BY / WHERE column references do not rewrite
    assert (
        substitute_table_names("SELECT totals FROM t GROUP BY totals", m)
        == "SELECT totals FROM t GROUP BY totals"
    )


def test_split_aggregate_group_by_extra_whitespace():
    """'GROUP   BY k' (multi-space) must slice the clause at the keyword
    match end, not a fixed offset (ADVICE r3 low: produced 'GROUP BY Y k')."""
    from feldera_spark.frontend import split_aggregate_for_scalar

    out = split_aggregate_for_scalar(
        "SELECT k, SUM(v) AS s FROM t GROUP   BY k "
        "HAVING SUM(v) > (SELECT AVG(v) FROM t)",
        "__ha_v",
    )
    assert out is not None
    outer_sql, hidden, hidden_sql = out
    assert hidden_sql.rstrip().endswith("GROUP BY k")
    assert "BY Y" not in hidden_sql


def test_substitute_table_positions_occurrence_level():
    from feldera_spark.frontend import substitute_table_positions

    sql = "SELECT e1.x, e2.y FROM ed e1 JOIN ed e2 ON e1.y = e2.x"
    out = substitute_table_positions(sql, {("ed", 1): "__d_ed"})
    assert out == "SELECT e1.x, e2.y FROM ed e1 JOIN __d_ed e2 ON e1.y = e2.x"
    # bare position gets an AS alias so qualified refs keep resolving
    sql2 = "SELECT ed.x FROM ed WHERE ed.y > 1"
    out2 = substitute_table_positions(sql2, {("ed", 0): "__d_ed"})
    assert out2 == "SELECT ed.x FROM __d_ed AS ed WHERE ed.y > 1"
    # multi-table plan, one pass
    sql3 = "SELECT a.x, b.y FROM a JOIN b ON a.y = b.x"
    out3 = substitute_table_positions(sql3, {("a", 0): "__da", ("b", 0): "__ob"})
    assert "__da AS a" in out3 and "__ob AS b" in out3
    # string literals untouched
    sql4 = "SELECT 'FROM ed fake' AS s, e.x FROM ed e"
    out4 = substitute_table_positions(sql4, {("ed", 0): "__d"})
    assert "'FROM ed fake'" in out4 and "FROM __d e" in out4


def test_non_equi_correlated_count_column_and_countif(spark):
    """Round-4 ADVICE #2: the non-equi lowering must rewrite only
    COUNT(*)/COUNT(const) to COUNT(range_col); COUNT(col) must count
    non-NULL col values only, and COUNTIF must not be lowered at all
    (its predicate can be TRUE on the padding row)."""
    rows_u = [(1, 5), (2, None), (3, 7), (9, 1)]  # (c, x)
    rows_o = [(1, 2), (2, 4), (3, 0)]  # (id, ts)
    p = (
        PipelineBuilder(spark)
        .sql(
            """
            CREATE TABLE u (c INT, x INT);
            CREATE TABLE o (id INT, ts INT);
            CREATE MATERIALIZED VIEW cnt_col AS
            SELECT id, (SELECT COUNT(x) FROM u WHERE u.c <= o.ts) AS n FROM o;
            CREATE MATERIALIZED VIEW cnt_star AS
            SELECT id, (SELECT COUNT(*) FROM u WHERE u.c <= o.ts) AS n FROM o;
            CREATE MATERIALIZED VIEW cnt_if AS
            SELECT id, (SELECT COUNTIF(x > 5) FROM u WHERE u.c <= o.ts) AS n FROM o;
            """
        )
        .connect_table("u", spark.createDataFrame(rows_u, "c INT, x INT"))
        .connect_table("o", spark.createDataFrame(rows_o, "id INT, ts INT"))
        .create()
    )

    def expect(agg):
        return {
            (oid, agg([(c, x) for c, x in rows_u if c <= ts]))
            for oid, ts in rows_o
        }

    got_col = {(r["id"], r["n"]) for r in p.view("cnt_col").collect()}
    assert got_col == expect(lambda rs: sum(1 for _, x in rs if x is not None))
    got_star = {(r["id"], r["n"]) for r in p.view("cnt_star").collect()}
    assert got_star == expect(len)
    got_if = {(r["id"], r["n"]) for r in p.view("cnt_if").collect()}
    assert got_if == expect(
        lambda rs: sum(1 for _, x in rs if x is not None and x > 5)
    )


def test_substitute_table_positions_mixed_case_plan_keys():
    """Round-5 ADVICE #3: plan keys are normalized to lowercase inside
    substitute_table_positions — a mixed-case caller key must neither
    KeyError nor silently skip the rewrite."""
    from feldera_spark.frontend import substitute_table_positions

    sql = "SELECT Ed.x FROM Ed JOIN ed e2 ON Ed.y = e2.x"
    out = substitute_table_positions(sql, {("Ed", 0): "__delta"})
    assert "__delta AS Ed" in out
    # the second occurrence (alias e2) untouched
    assert "ed e2" in out


def test_rewrite_lateral_shapes_and_declines():
    """LATERAL decorrelation (round-5 verdict task #7): recognized
    shapes rewrite to plain joins; anything outside the grammar returns
    UNCHANGED (the LATERAL fence then keeps the view on batch — never a
    silent transform)."""
    from feldera_spark.frontend import rewrite_lateral as rl

    # correlated filter: comma lateral = inner join on the correlation
    out = rl("SELECT a.k, x.v FROM t1 a, "
             "LATERAL (SELECT v FROM t2 WHERE t2.k = a.k AND v > 0) x")
    assert "JOIN (SELECT v, k AS __lat_k0 FROM t2 WHERE v > 0) AS x" in out
    assert "x.__lat_k0 = a.k" in out and "LATERAL" not in out.upper()
    # correlated aggregate: grouped hidden relation + LEFT JOIN
    out = rl("SELECT a.k, x.m FROM t1 a CROSS JOIN "
             "LATERAL (SELECT MAX(v) AS m FROM t2 WHERE t2.k = a.k) x")
    assert "GROUP BY k" in out and "LEFT JOIN" in out
    # declines, byte-identical:
    keep = [
        # x.* would leak the hidden key columns
        "SELECT a.k, x.* FROM t1 a, "
        "LATERAL (SELECT v FROM t2 WHERE t2.k = a.k) x",
        # non-equi correlation
        "SELECT a.k, x.v FROM t1 a, "
        "LATERAL (SELECT v FROM t2 WHERE t2.k < a.k) x",
        # COUNT aggregate (needs the COALESCE-0 default)
        "SELECT a.k, x.n FROM t1 a CROSS JOIN "
        "LATERAL (SELECT COUNT(v) AS n FROM t2 WHERE t2.k = a.k) x",
        # outer column in the select list
        "SELECT a.k, x.s FROM t1 a, "
        "LATERAL (SELECT a.k + v AS s FROM t2 WHERE t2.k = a.k) x",
        # LATERAL as the FIRST FROM relation (no lead relation): the
        # splice would emit "FROM JOIN …" — must return unchanged so
        # the fence keeps the view on the batch path (round-6 ADVICE)
        "SELECT x.v FROM LATERAL (SELECT v FROM t2 WHERE v > 0) x",
    ]
    for sql in keep:
        assert rl(sql) == sql, sql


def test_sql_text_rewrite_inventory_pinned():
    """Round-9 tokenizer-migration bar: every RECOGNIZER regex over raw
    SQL text is gone — FROM shapes, aggregate items and ASOF heads are
    token-walked in sqlparse (single_join/single_table/agg_call/
    find_asof). What legitimately remains of the mask-splice-restore
    pattern is pinned here: the _legacy_* differential fuzz oracles
    (which must keep the historical implementation) and the literal-
    masked splice rewriters (safe by construction: literals are opaque
    \\x00N\\x00 placeholders while any regex runs). A new raw-text pass
    would change these counts and fail loudly."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "feldera_spark"
    compiler_src = (root / "streaming" / "compiler.py").read_text()
    # the compiler never protects/regex-scans raw view text for shapes
    assert "_protect_literals" not in compiler_src
    for retired in ("_JOIN_RE", "_CROSS_JOIN_RE", "_TABLE_RE", "_AGG_RE"):
        assert f"{retired} = re.compile" not in compiler_src, retired

    frontend_src = (root / "frontend.py").read_text()
    assert "_ASOF_RE = re.compile" not in frontend_src
    # def site + exactly 11 masked call sites (3 legacy oracles + 8
    # splice rewriters); growth means a NEW raw-text pass slipped in
    assert frontend_src.count("_protect_literals(sql)") == 11, (
        frontend_src.count("_protect_literals(sql)")
    )


def test_single_join_and_agg_call_walkers():
    """Token-walker parity corners for the retired compiler regexes:
    literals carrying keyword text cannot shift the parse."""
    from feldera_spark.sqlparse import agg_call, find_asof, single_join

    j = single_join("a x JOIN b y ON x.k = y.k AND x.s = ' JOIN ON '")
    assert j["kind"] == "join" and j["how"] == "inner"
    assert j["on"] == "x.k = y.k AND x.s = ' JOIN ON '"
    assert single_join("a LEFT OUTER JOIN b ON a.k = b.k")["how"] == "left"
    assert single_join("a LEFT ANTI JOIN b ON a.k = b.k")["how"] == "anti"
    assert single_join("a CROSS JOIN b")["kind"] == "cross"
    assert single_join("db.t JOIN x ON a = b") is None
    assert single_join("(SELECT 1) q") is None
    assert single_join("a JOIN b USING (k)") is None

    names = frozenset(("sum", "count", "max"))
    assert agg_call("SUM(a + b)", names) == ("sum", "a + b")
    assert agg_call("SUM(a) / SUM(b)", names) is None
    assert agg_call("count('(')", names) == ("count", "'('")
    assert agg_call("lower(x)", names) is None

    assert find_asof(
        "SELECT 'FROM a LEFT ASOF JOIN b MATCH_CONDITION (' FROM t"
    ) is None
    m = find_asof(
        "SELECT * FROM tr t LEFT ASOF JOIN qu q "
        "MATCH_CONDITION (t.ts >= q.ts) ON t.s = q.s"
    )
    assert m["lt"] == "tr" and m["ra"] == "q"
