"""Feldera SQL dialect front-end: rewrite Feldera-specific SQL constructs
into Spark-executable form, so a real Feldera program runs end-to-end
through ``PipelineBuilder.sql()``.

Covered constructs (reference files cited per rewrite):

- ``TUMBLE/HOP/SESSION(TABLE t, DESCRIPTOR(ts), …)`` table functions
  (``docs.feldera.com/docs/sql/table.md:24-150``,
  ``CalciteToDBSPCompiler.java:653-667``) → Spark ``window()`` /
  gaps-and-islands SQL producing the same ``window_start``/``window_end``
  columns.
- ``LEFT ASOF JOIN … MATCH_CONDITION (…) ON …``
  (``docs/sql/grammar.md:730-744``) → the repo's scale-safe
  ``operators.joins.asof_join`` (single per-key shuffle, no inequality
  join blow-up).
- ``DECLARE RECURSIVE VIEW`` (``docs/sql/recursion.mdx:30-57``) →
  ``operators.recursion.fixpoint`` semi-naive iteration (handled by
  ``PipelineBuilder``; the view body is compiled here per iteration).
- ``SAFE_CAST`` → ``TRY_CAST`` (``docs/sql/casts.md``).
- 1-based array subscripts ``arr[i]`` → ``element_at(arr, i)``
  (``docs/sql/array.md``: Feldera arrays are 1-indexed; Spark ``[]`` is
  0-indexed, but ``element_at`` is 1-indexed and also covers map keys).

All rewrites are textual and quote-aware where it matters; anything not
recognized passes through to Spark SQL untouched (Catalyst implements the
rest of the surface).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TF_HEAD_RE = re.compile(r"\bTABLE\s*\(\s*(TUMBLE|HOP|SESSION)\s*\(", re.IGNORECASE)
_INTERVAL_RE = re.compile(
    r"INTERVAL\s+'?(\d+)'?\s+(\w+)", re.IGNORECASE
)
_DESCRIPTOR_RE = re.compile(r"DESCRIPTOR\s*\(\s*(\w+)\s*\)", re.IGNORECASE)
# ASOF-join heads are token-walked (sqlparse.find_asof, round-9 —
# retiring _ASOF_RE): the pattern inside a string literal can never
# match.
_asof_counter = 0


def _balanced(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth, i, in_str = 0, open_idx, False
    while i < len(s):
        ch = s[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses in SQL at {open_idx}")


def _split_top_commas(s: str) -> list[str]:
    """Split on depth-0 commas. Token-based (round-5 task #2): string
    literals with ``''`` escapes, quoted identifiers, ``[]`` subscripts
    and comments cannot confuse the depth tracking the way the old
    character scanner could (a quote inside a comment flipped its
    string state)."""
    from feldera_spark.sqlparse import split_top_level, tokenize

    groups = split_top_level(tokenize(s))
    out = [
        s[g[0].start : g[-1].end].strip() if g else "" for g in groups
    ]
    if out and out[-1] == "":  # historical contract: tail only if nonempty
        out.pop()
    return out


def _interval_to_duration(arg: str) -> str:
    """``INTERVAL '10' MINUTE`` / ``INTERVAL 10 MINUTES`` → ``10 minute``."""
    m = _INTERVAL_RE.search(arg)
    if not m:
        raise ValueError(f"expected INTERVAL literal, got: {arg!r}")
    return f"{m.group(1)} {m.group(2).lower()}"


def _interval_literal(arg: str) -> str:
    m = _INTERVAL_RE.search(arg)
    if not m:
        raise ValueError(f"expected INTERVAL literal, got: {arg!r}")
    return f"INTERVAL '{m.group(1)}' {m.group(2).upper()}"


def _parse_table_arg(arg: str) -> tuple[str, list[str]]:
    """``TABLE t [PARTITION BY a, b]`` (optionally ``DATA =>`` prefixed)
    → (table, partition_cols)."""
    a = re.sub(r"^\s*DATA\s*=>\s*", "", arg, flags=re.IGNORECASE)
    m = re.match(
        r"\s*TABLE\s+(\w+)(?:\s+PARTITION\s+BY\s+(.+))?\s*$",
        a,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"table-function TABLE argument must be a plain table/view name: {arg!r}")
    cols = [c.strip() for c in m.group(2).split(",")] if m.group(2) else []
    return m.group(1), cols


def _tumble_sql(src: str, ts: str, size: str, offset: str | None) -> str:
    win = (
        f"window({ts}, '{size}')"
        if offset is None
        else f"window({ts}, '{size}', '{size}', '{offset}')"
    )
    return (
        f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
        f"__w.end AS window_end FROM (SELECT *, {win} AS __w FROM {src}) __tf)"
    )


def _hop_sql(src: str, ts: str, slide: str, size: str) -> str:
    # Spark's TimeWindowing rule explodes each row into the size/slide
    # windows it belongs to — exactly the Calcite HOP table function
    # semantics (``ExpandHop``), with no manual flat-map.
    return (
        f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
        f"__w.end AS window_end FROM "
        f"(SELECT *, window({ts}, '{size}', '{slide}') AS __w FROM {src}) __tf)"
    )


def _session_sql(src: str, part: list[str], ts: str, gap_lit: str) -> str:
    """Per-row session windows via gaps-and-islands — the table-function
    form of what ``session_window()`` does in aggregation position.
    ``window_end`` = last event + gap (Calcite/Spark session semantics)."""
    pb = ", ".join(part) if part else "1"
    lag = f"lag({ts}) OVER (PARTITION BY {pb} ORDER BY {ts})"
    return (
        f"(SELECT * EXCEPT (__sid), "
        f"min({ts}) OVER (PARTITION BY {pb}, __sid) AS window_start, "
        f"max({ts}) OVER (PARTITION BY {pb}, __sid) + {gap_lit} AS window_end "
        f"FROM (SELECT * EXCEPT (__new), "
        f"sum(__new) OVER (PARTITION BY {pb} ORDER BY {ts} "
        f"ROWS UNBOUNDED PRECEDING) AS __sid "
        f"FROM (SELECT *, CASE WHEN {lag} IS NULL "
        f"OR {ts} - {lag} > {gap_lit} THEN 1 ELSE 0 END AS __new "
        f"FROM {src}) __s1) __s2)"
    )


def rewrite_table_functions(sql: str) -> str:
    """Rewrite ``TABLE(TUMBLE|HOP|SESSION(...))`` into Spark subqueries."""
    while True:
        m = _TF_HEAD_RE.search(sql)
        if m is None:
            return sql
        kind = m.group(1).upper()
        inner_open = sql.index("(", m.end() - 1)
        inner_end = _balanced(sql, inner_open)
        outer_end = _balanced(sql, sql.index("(", m.start()))
        args = _split_top_commas(sql[inner_open + 1 : inner_end - 1])
        if kind == "TUMBLE":
            src, _ = _parse_table_arg(args[0])
            ts = _DESCRIPTOR_RE.search(args[1]).group(1)
            size = _interval_to_duration(args[2])
            offset = _interval_to_duration(args[3]) if len(args) > 3 else None
            repl = _tumble_sql(src, ts, size, offset)
        elif kind == "HOP":
            src, _ = _parse_table_arg(args[0])
            ts = _DESCRIPTOR_RE.search(args[1]).group(1)
            slide = _interval_to_duration(args[2])
            size = _interval_to_duration(args[3])
            repl = _hop_sql(src, ts, slide, size)
        else:  # SESSION
            src, part = _parse_table_arg(args[0])
            ts = _DESCRIPTOR_RE.search(args[1]).group(1)
            gap = _interval_literal(args[2])
            repl = _session_sql(src, part, ts, gap)
        sql = sql[: m.start()] + repl + sql[outer_end:]


_STR_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _protect_literals(sql: str) -> tuple[str, list[str]]:
    """Swap string literals for opaque placeholders so textual rewrites
    cannot corrupt data (e.g. a program containing ``'arr[1]'`` as a
    VALUE must pass through byte-identical). Placeholders use \\x00
    sentinels — illegal in SQL, so no collision with real text.

    STATUS after the round-7..9 tokenizer migration: every RECOGNIZER
    (FROM-clause shapes, aggregate items, ASOF heads, scalar rewrites,
    table positions, clause splitting) runs on sqlparse token walkers
    and never sees raw text. What remains on the mask-splice-restore
    pattern is (a) the ``_legacy_*`` functions — kept verbatim as
    differential fuzz ORACLES for the tokenized implementations, and
    (b) the large SPLICE rewriters (derived-table extraction, plan-
    driven table-position substitution, scalar-subquery/NOT-IN/window
    splitters, CAST-timestamp). These are literal-safe BY CONSTRUCTION:
    with every string literal replaced by a ``\\x00N\\x00`` token that
    contains no word characters, no keyword/identifier regex can match
    inside data, and the splice offsets index the masked text whose
    literals are restored only after all edits. The per-site inventory
    is pinned by ``tests/test_frontend.py::
    test_sql_text_rewrite_inventory_pinned`` so a new raw-text pass
    cannot slip in unnoticed; the hypothesis fuzzer
    (test_frontend_fuzz.py) feeds keyword-looking literals through all
    of them against Spark ground truth."""
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return _STR_LIT_RE.sub(stash, sql), lits


def _restore_literals(sql: str, lits: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], sql)


_UNNEST_RE = re.compile(
    r"(?:,|\bCROSS\s+JOIN\b)\s*UNNEST\s*\((?P<e>[^()]*(?:\([^()]*\)[^()]*)*)\)\s+"
    r"AS\s+(?P<al>\w+)\s*\(\s*(?P<c>\w+)\s*\)",
    re.IGNORECASE,
)


def rewrite_unnest(sql: str) -> str:
    """``FROM t, UNNEST(expr) AS w(c)`` (the reference's Uncollect,
    ``docs/sql/grammar.md`` UNNEST) → Spark ``LATERAL VIEW explode``.
    Qualified references ``w.c`` become bare ``c``. WITH ORDINALITY
    stays unsupported in SQL text (programmatic posexplode covers it —
    queries/relational.py q28)."""
    protected, lits = _protect_literals(sql)
    m = _UNNEST_RE.search(protected)
    if m is None:
        return sql
    out = (
        protected[: m.start()]
        + f" LATERAL VIEW explode({m.group('e')}) {m.group('al')} "
        f"AS {m.group('c')}"
        + protected[m.end():]
    )
    out = re.sub(rf"\b{re.escape(m.group('al'))}\.", "", out)
    return _restore_literals(out, lits)


def rewrite_scalars(sql: str) -> str:
    """SAFE_CAST → TRY_CAST; COUNTIF → count_if; 1-based ``arr[i]`` →
    ``element_at``. Token-spliced (round-8, retiring the masked regex
    passes here): a literal like ``'a[1]'`` or ``'SAFE_CAST'`` is one
    string token and can never trigger a rewrite. COUNTIF is Feldera
    dialect (``aggregates.rs``) — Spark's builtin is count_if; the IVM
    compiler maps it in its own function table."""
    from feldera_spark.sqlparse import replace_words, rewrite_subscripts

    sql = replace_words(
        sql,
        {"safe_cast": ("TRY_CAST", False), "countif": ("count_if", True)},
    )
    return rewrite_subscripts(sql)


_CAST_HEAD_RE = re.compile(r"\bCAST\s*\(", re.IGNORECASE)
_AS_TS_TAIL_RE = re.compile(r"\sAS\s+TIMESTAMP\s*$", re.IGNORECASE)


def _top_level_at(s: str, pos: int) -> bool:
    depth, in_str = 0, False
    for ch in s[:pos]:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
    return depth == 0 and not in_str


def rewrite_cast_timestamp(sql: str) -> str:
    """Feldera's ``CAST(int AS TIMESTAMP)`` interprets the integer as
    MILLISECONDS since epoch (``sqllib`` ``casts.rs`` — Calcite integer→
    timestamp semantics), while Spark reads SECONDS. The frontend is
    textual (no type information), so the rewrite dispatches at runtime:
    integer operands become epoch-millis offsets added to the NTZ epoch
    (pure TIMESTAMP_NTZ arithmetic — session-timezone-independent, the
    same idiom as the rolling view's epoch micros), everything else
    round-trips through STRING into TIMESTAMP_NTZ (both branches must
    ANALYZE for every operand type; ``CAST(BIGINT AS TIMESTAMP_NTZ)``
    does not, and ``timestamp_millis`` would yield LTZ and silently
    shift through the session zone). NTZ matches Feldera's timezone-less
    TIMESTAMP. ``typeof`` is per-row but trivially cheap; CASE keeps the
    untaken branch unevaluated (no ANSI cast errors)."""
    sql, lits = _protect_literals(sql)
    return _restore_literals(_rewrite_cast_timestamp_raw(sql), lits)


def _rewrite_cast_timestamp_raw(sql: str) -> str:
    out, i = [], 0
    while True:
        m = _CAST_HEAD_RE.search(sql, i)
        if m is None:
            out.append(sql[i:])
            return "".join(out)
        open_idx = sql.index("(", m.end() - 1)
        end = _balanced(sql, open_idx)
        inner = sql[open_idx + 1 : end - 1]
        tm = _AS_TS_TAIL_RE.search(inner)
        if tm is not None and _top_level_at(inner, tm.start()):
            operand = _rewrite_cast_timestamp_raw(inner[: tm.start()].strip())
            out.append(sql[i : m.start()])
            out.append(
                f"(CASE WHEN typeof({operand}) IN "
                f"('tinyint', 'smallint', 'int', 'bigint') "
                f"THEN timestampadd(MILLISECOND, CAST({operand} AS BIGINT), "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00') "
                f"ELSE CAST(CAST({operand} AS STRING) AS TIMESTAMP_NTZ) END)"
            )
        else:
            out.append(sql[i:end])
        i = end


def _find_on_clause(sql: str, start: int) -> tuple[str, int]:
    """ON conditions from ``start`` up to the next top-level clause."""
    m = re.compile(
        r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION|EXCEPT|INTERSECT)\b",
        re.IGNORECASE,
    ).search(sql, start)
    end = m.start() if m else len(sql)
    return sql[start:end].strip(), end


def _rewrite_asof(spark: SparkSession, sql: str) -> str:
    """Replace a ``LEFT ASOF JOIN … MATCH_CONDITION … ON …`` FROM clause
    with a temp view materializing ``operators.joins.asof_join``."""
    global _asof_counter
    from feldera_spark.operators.joins import asof_join

    from feldera_spark.sqlparse import find_asof

    m = find_asof(sql)
    if m is None:
        return sql
    lt, la = m["lt"], m["la"] or m["lt"]
    rt, ra = m["rt"], m["ra"] or m["rt"]
    m_start = m["start"]
    mc_open = m["mc_open"]
    mc_end = _balanced(sql, mc_open)
    cond = sql[mc_open + 1 : mc_end - 1]
    on_m = re.compile(r"\s*ON\s+", re.IGNORECASE).match(sql, mc_end)
    if on_m is None:
        raise ValueError("ASOF JOIN requires an ON clause")
    on_text, clause_end = _find_on_clause(sql, on_m.end())

    from feldera_spark.sqlparse import cmp_conjunct

    cm = cmp_conjunct(cond, (">=", "<="))
    if cm is None:
        raise ValueError(f"unsupported MATCH_CONDITION: {cond!r}")
    (a_al, a_col), op, (b_al, b_col) = cm
    if a_al is None or b_al is None:
        raise ValueError(f"unsupported MATCH_CONDITION: {cond!r}")
    # normalize to left_ts >= right_ts (latest right at-or-before left)
    if op == "<=":
        a_al, a_col, b_al, b_col = b_al, b_col, a_al, a_col
    if a_al == la and b_al == ra:
        left_ts, right_ts = a_col, b_col
    elif a_al == ra and b_al == la:
        raise ValueError(
            "MATCH_CONDITION must give the LEFT side the latest timestamp "
            "(left.ts >= right.ts)"
        )
    else:
        raise ValueError(f"MATCH_CONDITION aliases {a_al}/{b_al} do not match {la}/{ra}")

    left_keys, renames = [], {}
    for term in _split_top_and_fe(on_text):
        em = cmp_conjunct(term, ("=",))
        if em is None:
            continue  # same tolerance as the historical finditer scan
        (x_al, x_col), _op, (y_al, y_col) = em
        if x_al is None or y_al is None:
            continue
        if x_al == ra:  # normalize to left = right
            x_al, x_col, y_al, y_col = y_al, y_col, x_al, x_col
        if x_al != la or y_al != ra:
            raise ValueError(f"unsupported ON term aliases in: {on_text!r}")
        left_keys.append(x_col)
        renames[y_col] = x_col

    left_df = spark.table(lt)
    right_df = spark.table(rt)
    for r_col, l_col in renames.items():
        if r_col != l_col:
            right_df = right_df.withColumnRenamed(r_col, l_col)
    if right_ts in renames and renames[right_ts] != right_ts:
        right_ts = renames[right_ts]
    right_payload = set(right_df.columns) - set(left_keys) - {right_ts}
    overlap = right_payload & set(left_df.columns)
    if overlap:
        raise ValueError(
            f"ASOF JOIN output column collision: {sorted(overlap)} — alias "
            f"them apart in the source views"
        )
    joined = asof_join(
        left_df, right_df, on=left_keys, left_ts=left_ts, right_ts=right_ts
    )
    _asof_counter += 1
    view = f"__asof_{_asof_counter}"
    joined.createOrReplaceTempView(view)

    rewritten = sql[:m_start] + f"FROM {view} " + sql[clause_end:]
    # strip now-resolved qualifiers — but ONLY within this SELECT's
    # set-operator-delimited segment: a statement may contain several
    # ASOF branches (UNION etc.) reusing the same aliases, and stripping
    # globally would corrupt the not-yet-rewritten branches'
    # MATCH_CONDITIONs
    setop = re.compile(r"\b(UNION(\s+ALL)?|EXCEPT|INTERSECT)\b", re.IGNORECASE)
    seg_start, seg_end = 0, len(rewritten)
    for sm in setop.finditer(rewritten):
        if not _top_level_at(rewritten, sm.start()):
            continue
        if sm.end() <= m_start:
            seg_start = sm.end()
        elif sm.start() >= m_start:
            seg_end = sm.start()
            break
    seg = rewritten[seg_start:seg_end]
    for al in (la, ra):
        seg = re.sub(rf"\b{re.escape(al)}\.", "", seg)
    return rewritten[:seg_start] + seg + rewritten[seg_end:]


def prepare_view(
    spark: SparkSession,
    sql: str,
    recursive_schema: str | None = None,
    view_name: str | None = None,
) -> DataFrame:
    """Compile a Feldera-dialect view body into a DataFrame.

    ``recursive_schema`` (Spark DDL string, from ``DECLARE RECURSIVE
    VIEW``) switches on fixpoint evaluation: the body is iterated with
    ``view_name`` bound to the accumulated result until no new rows
    appear (semi-naive: each round sees the previous frontier).
    """
    sql = rewrite_table_functions(sql)
    sql = rewrite_unnest(sql)
    sql = rewrite_scalars(sql)
    sql = rewrite_cast_timestamp(sql)
    if recursive_schema is not None:
        from feldera_spark.operators.recursion import fixpoint

        assert view_name, "recursive view needs its name for self-reference"

        def run(frontier: DataFrame) -> DataFrame:
            frontier.createOrReplaceTempView(view_name)
            return _run_plain(spark, sql)

        empty = spark.createDataFrame([], schema=recursive_schema)
        empty.createOrReplaceTempView(view_name)
        seed = _run_plain(spark, sql)
        return fixpoint(seed, run)
    return _run_plain(spark, sql)


def _run_plain(spark: SparkSession, sql: str) -> DataFrame:
    # a program may contain several ASOF joins (e.g. a UNION of asof'd
    # branches); each pass rewrites the first remaining occurrence
    from feldera_spark.sqlparse import find_asof as _find_asof

    while _find_asof(sql) is not None:
        sql = _rewrite_asof(spark, sql)
        sql = rewrite_scalars(sql)
    return spark.sql(sql)


# -- CTE desugaring (WITH ... AS (...) SELECT ...) ---------------------------

_WITH_HEAD_RE = re.compile(r"^\s*WITH\s+(RECURSIVE\s+)?", re.IGNORECASE)
_CTE_NAME_RE = re.compile(r"\s*(\w+)\s+AS\s*\(", re.IGNORECASE)


def split_ctes(sql: str) -> tuple[list[tuple[str, str]], str] | None:
    """Parse a top-level ``WITH a AS (...), b AS (...) SELECT ...`` view
    body into ``([(name, body), ...], main_select)``. Returns None when
    the body is not a plain WITH chain (no WITH, or WITH RECURSIVE —
    Feldera recursion goes through DECLARE RECURSIVE VIEW instead).

    Calcite inlines CTEs before lowering; our pipeline desugars them to
    hidden LOCAL views so each CTE compiles (or falls back) on its own
    and the main body sees ordinary view references — IVM delta chaining
    then flows through the whole WITH chain for free."""
    m = _WITH_HEAD_RE.match(sql)
    if m is None or m.group(1) is not None:
        return None
    i = m.end()
    ctes: list[tuple[str, str]] = []
    while True:
        nm = _CTE_NAME_RE.match(sql, i)
        if nm is None:
            return None
        open_idx = nm.end() - 1
        try:
            end = _balanced(sql, open_idx)
        except ValueError:
            return None
        ctes.append((nm.group(1).lower(), sql[open_idx + 1 : end - 1].strip()))
        # skip whitespace; a comma continues the chain, otherwise the
        # main SELECT begins
        j = end
        while j < len(sql) and sql[j].isspace():
            j += 1
        if j < len(sql) and sql[j] == ",":
            i = j + 1
            continue
        main = sql[j:].strip()
        if not re.match(r"^SELECT\b", main, re.IGNORECASE):
            return None
        return ctes, main


def _clause_kw_at(protected: str, pos: int) -> str | None:
    """The nearest clause keyword governing position ``pos`` at its own
    paren depth (a FROM inside an already-closed subquery doesn't count)."""
    depth = 0
    kw_at: dict[int, str | None] = {0: None}
    for mm in re.finditer(
        r"[()]|\b(SELECT|FROM|WHERE|GROUP|HAVING|ORDER|ON|JOIN|USING|SET)\b",
        protected[:pos],
        re.IGNORECASE,
    ):
        tok = mm.group(0)
        if tok == "(":
            depth += 1
            kw_at[depth] = None
        elif tok == ")":
            depth -= 1
        else:
            kw_at[depth] = tok.upper()
    return kw_at.get(depth)


def _legacy_count_table_positions(sql: str, name: str) -> int:
    """How many times ``name`` appears as a RELATION instance (FROM/JOIN
    target or comma-continued FROM-list entry). Qualifier uses
    (``name.col``) and bare column/alias collisions do NOT count — a
    view named like one of its columns must not inflate the count
    (linearity classification in streaming/recursive.py depends on
    this)."""
    protected, _ = _protect_literals(sql)
    count = 0
    for m in re.finditer(rf"\b{re.escape(name)}\b", protected, re.IGNORECASE):
        start = m.start()
        if start > 0 and protected[start - 1] == ".":
            continue
        if protected[m.end() : m.end() + 1] == "(":
            continue
        before = protected[:start]
        if re.search(r"\b(FROM|JOIN)\s*$", before, re.IGNORECASE):
            count += 1
        elif re.search(r",\s*$", before) and _clause_kw_at(
            protected, start
        ) == "FROM":
            count += 1
    return count


def _legacy_substitute_table_names(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite TABLE-POSITION references per ``mapping``: FROM/JOIN
    targets, comma-continued FROM-list entries, and qualified-column
    prefixes (``name.col``). Quote-aware.

    Deliberately does NOT touch bare identifiers in value position: a CTE
    may share its name with a column it projects (``WITH totals AS
    (SELECT k, SUM(v) AS totals …) SELECT k, totals FROM totals``) and
    rewriting the column reference would break resolution (round-3
    ADVICE, verified)."""
    if not mapping:
        return sql
    protected, lits = _protect_literals(sql)

    def sub(m: re.Match) -> str:
        word = m.group(0)
        start = m.start()
        if start > 0 and protected[start - 1] == ".":
            return word  # a column trailer, not a table reference
        tail = protected[m.end() : m.end() + 1]
        if tail == "(":
            return word  # function call
        before = protected[:start]
        if re.search(r"\b(FROM|JOIN)\s*$", before, re.IGNORECASE):
            return mapping.get(word.lower(), word)
        if re.match(r"\s*\.", protected[m.end():]):
            # qualifier use: cte.col
            return mapping.get(word.lower(), word)
        if re.search(r",\s*$", before) and _clause_kw_at(
            protected, start
        ) == "FROM":
            # comma-continued FROM list: FROM a, cte
            return mapping.get(word.lower(), word)
        return word

    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in mapping) + r")\b",
        re.IGNORECASE,
    )
    return _restore_literals(pat.sub(sub, protected), lits)


_NOT_ALIAS_KWS = frozenset(
    """ON WHERE JOIN INNER LEFT RIGHT FULL CROSS OUTER NATURAL USING
    GROUP ORDER HAVING UNION EXCEPT INTERSECT LIMIT SELECT SET WINDOW
    QUALIFY TABLESAMPLE LATERAL FOR""".split()
)


def _legacy_substitute_table_positions(
    sql: str, plan: dict[tuple[str, int], str]
) -> str:
    """Rewrite only the given TABLE-POSITION occurrences, keyed by
    ``(lowercase_name, occurrence_index)`` in textual order. Unlike
    :func:`substitute_table_names` this distinguishes occurrences of the
    SAME table (``FROM ed e1 JOIN ed e2``), which the delta rule for
    deletions needs (streaming/recursive.py — a self-join branch must
    bind one occurrence to the delta and the others to old/new state).
    When a rewritten position has no alias, ``AS <orig>`` is appended so
    qualified column references keep resolving. Quote-aware."""
    if not plan:
        return sql
    # the matcher keys by lowercase name; normalize caller-supplied plan
    # keys here rather than relying on every caller to pre-lowercase (a
    # mixed-case key would otherwise KeyError or silently skip the
    # substitution — round-5 ADVICE #3)
    plan = {(n.lower(), i): v for (n, i), v in plan.items()}
    protected, lits = _protect_literals(sql)
    names = {n for (n, _) in plan}
    counts = {n: 0 for n in names}
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in names) + r")\b",
        re.IGNORECASE,
    )
    out: list[str] = []
    last = 0
    for m in pat.finditer(protected):
        word = m.group(0)
        start = m.start()
        if start > 0 and protected[start - 1] == ".":
            continue
        if protected[m.end() : m.end() + 1] == "(":
            continue
        before = protected[:start]
        is_pos = bool(
            re.search(r"\b(FROM|JOIN)\s*$", before, re.IGNORECASE)
        ) or (
            bool(re.search(r",\s*$", before))
            and _clause_kw_at(protected, start) == "FROM"
        )
        if not is_pos:
            continue
        key = word.lower()
        idx = counts[key]
        counts[key] += 1
        repl = plan.get((key, idx))
        if repl is None:
            continue
        am = re.match(
            r"\s+(?:AS\s+)?([A-Za-z_]\w*)", protected[m.end() :], re.IGNORECASE
        )
        has_alias = am is not None and am.group(1).upper() not in _NOT_ALIAS_KWS
        new = repl if has_alias else f"{repl} AS {word}"
        out.append(protected[last:start])
        out.append(new)
        last = m.end()
    out.append(protected[last:])
    return _restore_literals("".join(out), lits)


def _legacy_list_table_positions(sql: str) -> list[tuple[str, int, str | None]]:
    """Enumerate TABLE-POSITION occurrences (FROM/JOIN targets,
    comma-continued FROM entries) in textual order as
    ``(lowercase_name, per-name occurrence index, alias or None)``.
    Companion to :func:`substitute_table_positions` (same position
    logic); used by the recursive-view rederive to map output columns
    back to source relations."""
    protected, _ = _protect_literals(sql)
    counts: dict[str, int] = {}
    out: list[tuple[str, int, str | None]] = []
    for m in re.finditer(r"\b([A-Za-z_]\w*)\b", protected):
        word = m.group(0)
        start = m.start()
        if start > 0 and protected[start - 1] == ".":
            continue
        if protected[m.end() : m.end() + 1] == "(":
            continue
        before = protected[:start]
        is_pos = bool(
            re.search(r"\b(FROM|JOIN)\s*$", before, re.IGNORECASE)
        ) or (
            bool(re.search(r",\s*$", before))
            and _clause_kw_at(protected, start) == "FROM"
        )
        if not is_pos:
            continue
        key = word.lower()
        idx = counts.get(key, 0)
        counts[key] = idx + 1
        am = re.match(
            r"\s+(?:AS\s+)?([A-Za-z_]\w*)", protected[m.end() :], re.IGNORECASE
        )
        alias = (
            am.group(1).lower()
            if am is not None and am.group(1).upper() not in _NOT_ALIAS_KWS
            else None
        )
        out.append((key, idx, alias))
    return out



# ---------------------------------------------------------------------------
# Token-based structural queries (round-5 verdict task #2): the public
# table-position/name functions run on feldera_spark.sqlparse's lexer +
# relation walker instead of character regexes. The _legacy_* regex
# forms above are retained ONLY as differential-test baselines
# (tests/test_frontend_fuzz.py compares them token-for-token on the
# generated corpus); new callers must use these.
# ---------------------------------------------------------------------------


def count_table_positions(sql: str, name: str) -> int:
    """How many times ``name`` appears as a RELATION instance (FROM/JOIN
    target or comma-continued FROM-list entry). Qualifier uses
    (``name.col``) and bare column/alias collisions do NOT count — a
    view named like one of its columns must not inflate the count
    (linearity classification in streaming/recursive.py depends on
    this). Token-based: quote/comment-aware, ``db.table`` qualified
    names count under their full dotted name."""
    from feldera_spark.sqlparse import relations

    nm = name.lower()
    return sum(1 for r in relations(sql) if r.name == nm)


def list_table_positions(sql: str) -> list[tuple[str, int, str | None]]:
    """Enumerate TABLE-POSITION occurrences (FROM/JOIN targets,
    comma-continued FROM entries) in textual order as
    ``(lowercase_name, per-name occurrence index, alias or None)``.
    Companion to :func:`substitute_table_positions` (same walker);
    used by the recursive-view rederive to map output columns back to
    source relations. ``db.table`` names stay dotted."""
    from feldera_spark.sqlparse import relations

    counts: dict[str, int] = {}
    out: list[tuple[str, int, str | None]] = []
    for r in relations(sql):
        if r.name is None:
            continue
        idx = counts.get(r.name, 0)
        counts[r.name] = idx + 1
        out.append((r.name, idx, r.alias))
    return out


def substitute_table_positions(
    sql: str, plan: dict[tuple[str, int], str]
) -> str:
    """Rewrite only the given TABLE-POSITION occurrences, keyed by
    ``(lowercase_name, occurrence_index)`` in textual order. Unlike
    :func:`substitute_table_names` this distinguishes occurrences of the
    SAME table (``FROM ed e1 JOIN ed e2``), which the delta rule for
    deletions needs (streaming/recursive.py — a self-join branch must
    bind one occurrence to the delta and the others to old/new state).
    When a rewritten position has no alias, ``AS <orig>`` is appended so
    qualified column references keep resolving. Token-based splice on
    exact byte offsets; plan keys are case-normalized here (round-5
    ADVICE #3)."""
    if not plan:
        return sql
    from feldera_spark.sqlparse import relations

    plan = {(n.lower(), i): v for (n, i), v in plan.items()}
    counts: dict[str, int] = {}
    edits: list[tuple[int, int, str]] = []
    for r in relations(sql):
        if r.name is None:
            continue
        idx = counts.get(r.name, 0)
        counts[r.name] = idx + 1
        repl = plan.get((r.name, idx))
        if repl is None:
            continue
        if r.alias is not None:
            edits.append((r.start, r.end, repl))
        else:
            orig = sql[r.start : r.end]
            alias = orig.split(".")[-1]
            edits.append((r.start, r.end, f"{repl} AS {alias}"))
    for start, end, repl in sorted(edits, reverse=True):
        sql = sql[:start] + repl + sql[end:]
    return sql


def substitute_table_names(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite TABLE-POSITION references per ``mapping``: FROM/JOIN
    targets, comma-continued FROM-list entries, and qualified-column
    prefixes (``name.col``). Token-based (quote/comment-aware).

    Deliberately does NOT touch bare identifiers in value position: a CTE
    may share its name with a column it projects (``WITH totals AS
    (SELECT k, SUM(v) AS totals ...) SELECT k, totals FROM totals``) and
    rewriting the column reference would break resolution (round-3
    ADVICE, verified)."""
    if not mapping:
        return sql
    from feldera_spark.sqlparse import relations, tokenize

    mapping = {k.lower(): v for k, v in mapping.items()}
    edits: list[tuple[int, int, str]] = []
    rel_name_spans: list[tuple[int, int]] = []
    for r in relations(sql):
        if r.name is None:
            continue
        rel_name_spans.append((r.start, r.end))
        repl = mapping.get(r.name)
        if repl is not None:
            edits.append((r.start, r.end, repl))
    toks = tokenize(sql)
    in_rel = lambda t: any(s <= t.start < e for s, e in rel_name_spans)
    for i, t in enumerate(toks):
        if t.kind != "word" or t.text.lower() not in mapping:
            continue
        if in_rel(t):
            continue  # relation spans handled above
        # qualifier use: word '.' ... , not itself a column trailer and
        # not a function call
        prev_dot = i > 0 and toks[i - 1].kind == "punct" and toks[i - 1].text == "."
        next_dot = (
            i + 1 < len(toks)
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "."
        )
        if prev_dot or not next_dot:
            continue
        edits.append((t.start, t.end, mapping[t.text.lower()]))
    for start, end, repl in sorted(edits, reverse=True):
        sql = sql[:start] + repl + sql[end:]
    return sql


_DERIVED_RE = re.compile(r"\b(FROM|JOIN)\s*\(\s*SELECT\b", re.IGNORECASE)


def extract_derived_tables(
    sql: str, prefix: str
) -> tuple[str, list[tuple[str, str]]] | None:
    """Pull ``FROM (SELECT ...) AS x`` derived tables out of a view body
    into hidden views named ``{prefix}_{alias}``, returning the rewritten
    body and the extracted ``[(hidden_name, subquery_body), ...]``.
    Returns None when the body has no derived tables. Scalar subqueries
    (``(SELECT ...)`` outside FROM/JOIN position) are left alone.

    Same rationale as CTE desugaring: Calcite treats a derived table as
    an anonymous view; naming it lets the sub-select and the outer body
    each compile to IVM and chain deltas."""
    protected, lits = _protect_literals(sql)
    out: list[tuple[str, str]] = []
    while True:
        m = _DERIVED_RE.search(protected)
        if m is None:
            break
        open_idx = protected.index("(", m.end(1))
        try:
            end = _balanced(protected, open_idx)
        except ValueError:
            return None
        body = protected[open_idx + 1 : end - 1].strip()
        am = re.match(r"\s*(?:AS\s+)?(\w+)", protected[end:], re.IGNORECASE)
        if am is None:
            return None  # alias-less derived table: leave for batch
        alias = am.group(1).lower()
        if alias.upper() in ("ON", "WHERE", "GROUP", "ORDER", "JOIN",
                             "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
                             "UNION", "EXCEPT", "INTERSECT", "HAVING",
                             "LIMIT"):
            return None
        hidden = f"{prefix}_{alias}"
        out.append((hidden, _restore_literals(body, lits)))
        protected = (
            protected[: m.start()]
            + f"{m.group(1)} {hidden} {alias}"
            + protected[end + am.end():]
        )
    if not out:
        return None
    return _restore_literals(protected, lits), out


_SCALAR_SUBQ_RE = re.compile(r"\(\s*SELECT\b", re.IGNORECASE)
_SCALAR_BODY_RE = re.compile(
    r"^SELECT\s+(?P<item>.*?)\s+FROM\s+(?P<t>\w+)"
    r"(?:\s+(?:AS\s+)?(?P<al>(?!WHERE\b)\w+))?"
    r"(?:\s+WHERE\s+(?P<w>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# words allowed in an uncorrelated subquery besides the inner table's
# own columns: SQL keywords, literals, and CAST type names
_SCALAR_OK_WORDS = frozenset(
    """and or not null is in like between case when then else end true
    false as distinct cast interval int integer bigint smallint tinyint
    double float real decimal numeric varchar char string boolean date
    time timestamp day days hour hours minute minutes second seconds
    month months year years unsigned""".split()
)
_SCALAR_AGG_NAMES = frozenset(
    """sum count avg min max stddev stddev_pop stddev_samp var_pop
    var_samp variance arg_min arg_max bool_and bool_or every bit_and
    bit_or bit_xor countif""".split()
)


class _BodyMatch:
    __slots__ = ("_g",)

    def __init__(self, g: dict):
        self._g = g

    def group(self, name: str):
        return self._g.get(name)


def _scalar_body_parts(body: str) -> "_BodyMatch | None":
    """Token segmentation of a scalar-subquery body: ``SELECT <item>
    FROM <t> [AS <al>] [WHERE <w>]`` — the literal-safe replacement for
    the historical ``_SCALAR_BODY_RE``. Trailing clauses (GROUP/ORDER/…)
    land in their own segments and the caller's keyword rejection
    handles them exactly as before."""
    from feldera_spark.sqlparse import split_clauses, tokenize

    cl = split_clauses(body)
    if cl is None or "SELECT" not in cl or "FROM" not in cl:
        return None
    ftoks = tokenize(cl["FROM"])
    if not ftoks or ftoks[0].kind != "word":
        return None
    tbl = ftoks[0].text
    al = None
    if len(ftoks) == 2 and ftoks[1].kind == "word":
        al = ftoks[1].text
    elif (
        len(ftoks) == 3
        and ftoks[1].kind == "word"
        and ftoks[1].up() == "AS"
        and ftoks[2].kind == "word"
    ):
        al = ftoks[2].text
    elif len(ftoks) != 1:
        return None
    return _BodyMatch(
        {"item": cl["SELECT"], "t": tbl, "al": al, "w": cl.get("WHERE")}
    )


def _has_any_word(text: str, words: set[str]) -> bool:
    """Any-depth word-token scan (the literal-safe form of the
    historical keyword-rejection regex)."""
    from feldera_spark.sqlparse import tokenize

    up = {w.upper() for w in words}
    return any(t.kind == "word" and t.up() in up for t in tokenize(text))


def _strip_trailing_as(item: str) -> str:
    """Strip one trailing ``AS <word>`` alias (token form of the old
    lazy-regex alias strip)."""
    from feldera_spark.sqlparse import tokenize

    toks = tokenize(item)
    if (
        len(toks) >= 3
        and toks[-1].kind == "word"
        and toks[-2].kind == "word"
        and toks[-2].up() == "AS"
    ):
        return item[: toks[-2].start]
    return item


def _exact_count_call(item_core: str) -> tuple[str, str] | None:
    """(fn, arg text) when ``item_core`` is EXACTLY one
    COUNT/COUNTIF/COUNT_IF(...) call; None otherwise."""
    from feldera_spark.sqlparse import tokenize

    toks = tokenize(item_core)
    if (
        len(toks) < 3
        or toks[0].kind != "word"
        or toks[0].text.lower() not in ("count", "countif", "count_if")
        or toks[1].kind != "punct"
        or toks[1].text != "("
    ):
        return None
    depth = 0
    for j, t in enumerate(toks[1:], start=1):
        if t.kind == "punct" and t.text == "(":
            depth += 1
        elif t.kind == "punct" and t.text == ")":
            depth -= 1
            if depth == 0:
                if j != len(toks) - 1:
                    return None  # trailing tokens: a larger expression
                return (
                    toks[0].text.lower(),
                    item_core[toks[1].end : t.start],
                )
    return None


def _rename_sq_qualifiers(text: str, target: str) -> str:
    """Replace every ``__sq<N>.`` qualifier with ``<target>.`` by token
    splice (never touches literal content)."""
    from feldera_spark.sqlparse import tokenize

    toks = tokenize(text)
    edits = []
    for i, t in enumerate(toks):
        if (
            t.kind == "word"
            and re.fullmatch(r"__sq\d+", t.text)
            and i + 1 < len(toks)
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "."
        ):
            edits.append((t.start, t.end))
    for s, e in reversed(edits):
        text = text[:s] + target + text[e:]
    return text


def extract_scalar_subqueries(
    sql: str, prefix: str, table_columns: dict[str, set[str]]
) -> tuple[str, list[tuple[str, str]]] | None:
    """Pull UNCORRELATED scalar subqueries — ``(SELECT AGG(...) FROM u
    [WHERE ...])`` in value position — out of a view body into hidden
    global-aggregate views, rewriting each occurrence to a column of a
    CROSS JOIN against that view. Calcite lowers scalar subqueries to
    exactly this plan (a join on the unit key against a single-row
    aggregate); with the hidden view compiled to IVM and the cross join
    incremental, a threshold like ``v > (SELECT AVG(v) FROM t)`` is
    maintained: when the scalar moves, the join's A×ΔS term re-derives
    every row against the new value — the correct DBSP cost model.

    CORRELATED scalar aggregates with equi-correlation — ``(SELECT
    AGG(...) FROM u WHERE u.c = a.oc [AND inner-only terms])`` — extract
    too, Calcite-style: the hidden view aggregates GROUP BY the
    correlation columns and the outer body LEFT JOINs on them. LEFT (not
    inner) is exact: a missing group NULL-pads ``__sv``, which is
    precisely the empty-subquery NULL scalar, so comparisons go UNKNOWN
    and select-position uses stay NULL — no conjunct-position analysis
    needed.

    Conservative recognizer: the subquery must be an aggregate with no
    GROUP BY (exactly one row per binding — a plain ``SELECT v FROM u
    WHERE ...`` can change cardinality, which a join would amplify) over
    one DECLARED table, and every bare identifier in it must resolve to
    that table's own columns (SQL scoping: innermost binding wins).
    Correlation terms must be top-level equi conjuncts against a
    single-table outer FROM. IN/EXISTS subqueries and FROM-position
    derived tables are other passes' business. Returns None when nothing
    extracts."""
    from feldera_spark import sqlparse as _sp

    # token walkers throughout (round-7 expression-tokenizer migration):
    # the lexer skips literals/comments, so keyword-looking DATA cannot
    # confuse any scan below — no literal-protection pass needed
    protected = sql
    # a top-level set-op makes the FROM-splice ambiguous: leave alone
    if _sp.top_keyword_pos(protected, {"UNION", "EXCEPT", "INTERSECT"}) is not None:
        return None
    out: list[tuple[str, str]] = []
    joins: list[str] = []  # spliced join clauses, one per hidden view
    pos = 0
    while True:
        span = _sp.next_subquery_span(protected, pos)
        if span is None:
            break
        start, end = span
        # FROM/JOIN position = derived table; IN/EXISTS have own passes
        btoks = _sp.tokenize(protected[:start])
        if btoks and btoks[-1].kind == "word" and btoks[-1].up() in (
            "FROM", "JOIN", "IN", "EXISTS",
        ):
            pos = start + 1
            continue
        # In a GROUP BY query, the joined scalar column is only legal
        # BELOW the aggregation (the WHERE clause). A ref in the select
        # list or HAVING would not be a grouping column — the rewrite
        # would be invalid SQL, so those positions stay as real
        # subqueries (batch evaluates them fine).
        gb_pos = _sp.top_keyword_pos(protected, {"GROUP"})
        if gb_pos is not None:
            wh_pos = _sp.top_keyword_pos(protected, {"WHERE"})
            if wh_pos is None or not (wh_pos < start and end <= gb_pos):
                pos = end
                continue
        body = protected[start + 1 : end - 1].strip()
        bm = _scalar_body_parts(body)
        parsed = None  # (inner_sql_builder args, join clause builder)
        if bm is not None:
            tbl = bm.group("t").lower()
            item = bm.group("item")
            w = bm.group("w")
            inner_al = (bm.group("al") or tbl).lower()
            outer = _single_outer_table(protected)
            outer_al = outer[1] if outer else None
            _words = _sp.bare_words
            if (
                tbl in table_columns
                and _sp.has_agg_call(item, _SCALAR_AGG_NAMES)
                and not _has_any_word(
                    body,
                    {"GROUP", "ORDER", "LIMIT", "HAVING", "JOIN", "UNION"},
                )
                and not _sp.top_comma(item)
            ):
                item_dots = _sp.qualifier_words(item)
                known = table_columns[tbl] | _SCALAR_OK_WORDS | {inner_al}

                corr: list[tuple[str, str]] = []  # (inner col, outer col)
                ineq: tuple[str, str, str] | None = None  # (ic, oc, op)
                rest: list[str] = []
                bad = not (item_dots <= {inner_al})
                for conj in _split_top_and_fe(w or ""):
                    dots = _sp.qualifier_words(conj)
                    if outer_al is not None and outer_al in dots:
                        pair = _corr_equi_pair(
                            conj, inner_al, outer_al,
                            table_columns[tbl],
                            table_columns.get(outer[0], set()),
                        )
                        if pair is not None:
                            corr.append(pair)
                            continue
                        # NON-EQUI correlation (u.c <= a.oc / >=): at
                        # most one — lowered to a range-scalar view
                        ip = _corr_ineq_pair(
                            conj, inner_al, outer_al,
                            table_columns[tbl],
                            table_columns.get(outer[0], set()),
                        )
                        if ip is None or ineq is not None:
                            bad = True
                            break
                        ineq = ip
                    elif dots <= {inner_al} and _words(conj) <= known:
                        rest.append(conj)
                    else:
                        bad = True
                        break
                # exact-dedupe correlation pairs; two DIFFERENT outer
                # columns tied to one inner column would collapse in the
                # ON clause — bail rather than drop a constraint
                pairs: list[tuple[str, str]] = []
                for p in corr:
                    if p not in pairs:
                        pairs.append(p)
                if len({ic for ic, _ in pairs}) != len(pairs):
                    bad = True
                if not bad and _words(item) <= known:
                    parsed = (tbl, item, rest, pairs, outer_al, ineq)
        if parsed is None:
            pos = end
            continue
        tbl, item, rest, corr, outer_al, ineq = parsed
        n = len(out)
        col, al, hidden = f"__sv{n}", f"__sq{n}", f"{prefix}_{n}"
        item_core = _strip_trailing_as(item).strip()
        # Correlated COUNT/COUNTIF: SQL returns 0 for an outer row with no
        # matching inner group, but the LEFT JOIN NULL-pads — Calcite
        # inserts the 0-default when decorrelating COUNT, so must we
        # (round-3 ADVICE, verified row-dropping bug). Only an item that
        # IS a single COUNT/COUNTIF call gets COALESCE(..., 0); a larger
        # expression containing COUNT (e.g. COUNT(*)+1) can't take the
        # default post-hoc, so it stays a real subquery (batch evaluates
        # it exactly).
        ref = f"{al}.{col}"
        exact_count = False
        count_star = False
        is_countif = False
        if corr or ineq is not None:
            cfn = _exact_count_call(item_core)
            exact_count = cfn is not None
            if exact_count:
                fn_name, arg = cfn
                is_countif = fn_name in ("countif", "count_if")
                # COUNT over a constant argument (*, literals, numeric
                # exprs) counts the LEFT-JOIN padding row too and needs
                # the range-column substitution below; COUNT(col) is
                # already padding-safe (col is NULL on the pad row) and
                # MUST NOT be rewritten (round-4 ADVICE #2 — the old
                # unconditional rewrite silently counted NULL-x rows)
                count_star = not is_countif and (
                    arg.strip() == "*"
                    or not any(
                        t.kind in ("word", "qident")
                        for t in _sp.tokenize(arg)
                    )
                )
                ref = f"COALESCE({al}.{col}, 0)"
            elif _sp.has_agg_call(
                item_core, frozenset({"count", "countif", "count_if"})
            ):
                pos = end
                continue
        if ineq is not None:
            if is_countif:
                # COUNTIF's predicate may be TRUE on the LEFT-JOIN
                # padding row (e.g. COUNTIF(x IS NULL)) — no sound
                # textual substitution exists, so leave it a real
                # subquery (batch path evaluates it exactly;
                # round-4 ADVICE #2)
                pos = end
                continue
            # NON-EQUI correlation: the scalar depends only on the outer
            # row's correlated VALUES, so the hidden view aggregates the
            # inequality prefix per DISTINCT outer value (reference:
            # RangeAggregates — a range/rolling operator, never a
            # nested loop). The derived tables extract into their own
            # hidden views and the remaining 2-relation non-equi LEFT
            # JOIN + GROUP BY compiles to CompiledRangeScalarView.
            icol, ocol, iop = ineq
            item2 = (
                f"COUNT({inner_al}.{icol})" if count_star else item_core
            )
            ksel = [f"{ocol} AS __ok{n}"] + [
                f"{oc2} AS __ek{n}_{i2}" for i2, (_, oc2) in enumerate(corr)
            ]
            right = f"{bm.group('t')} {inner_al}"
            if rest:
                right = (
                    f"(SELECT * FROM {bm.group('t')} "
                    f"WHERE {' AND '.join(rest)}) {inner_al}"
                )
            on_terms = [f"{inner_al}.{icol} {iop} __ksq.__ok{n}"] + [
                f"{inner_al}.{ic2} = __ksq.__ek{n}_{i2}"
                for i2, (ic2, _) in enumerate(corr)
            ]
            gb = [f"__ksq.__ok{n}"] + [
                f"__ksq.__ek{n}_{i2}" for i2 in range(len(corr))
            ]
            hidden_sel = [f"{g} AS {g.split('.')[1]}" for g in gb] + [
                f"{item2} AS {col}"
            ]
            inner_sql = (
                f"SELECT {', '.join(hidden_sel)} "
                f"FROM (SELECT DISTINCT {', '.join(ksel)} "
                f"FROM {outer[0]}) __ksq "
                f"LEFT JOIN {right} ON {' AND '.join(on_terms)} "
                f"GROUP BY {', '.join(gb)}"
            )
            on_outer = [f"{al}.__ok{n} = {outer_al}.{ocol}"] + [
                f"{al}.__ek{n}_{i2} = {outer_al}.{oc2}"
                for i2, (_, oc2) in enumerate(corr)
            ]
            joins.append(
                f" LEFT JOIN {hidden} {al} ON {' AND '.join(on_outer)}"
            )
            out.append((hidden, inner_sql))
            protected = protected[:start] + ref + protected[end:]
            pos = start + len(ref)
            continue
        keys: list[str] = []
        for icol, _ in corr:
            if icol not in keys:
                keys.append(icol)
        # the hidden view's correlation keys take SAFE aliases: exposing
        # them under the inner column name collides with same-named
        # outer columns and turns the body's bare references ambiguous
        # (found by the frontend fuzzer, round 4)
        key_alias = {icol: f"__ck{n}_{j}" for j, icol in enumerate(keys)}
        sel = ", ".join(
            [f"{icol} AS {key_alias[icol]}" for icol in keys]
            + [f"{item_core} AS {col}"]
        )
        inner_sql = f"SELECT {sel} FROM {bm.group('t')}"
        if bm.group("al"):
            inner_sql += f" {bm.group('al')}"
        if rest:
            inner_sql += f" WHERE {' AND '.join(rest)}"
        if keys:
            inner_sql += f" GROUP BY {', '.join(keys)}"
        if corr:
            on = " AND ".join(
                f"{outer_al}.{ocol} = {al}.{key_alias[icol]}"
                for icol, ocol in corr
            )
            joins.append(f" LEFT JOIN {hidden} {al} ON {on}")
        else:
            joins.append(f" CROSS JOIN {hidden} {al}")
        out.append((hidden, inner_sql))
        protected = protected[:start] + ref + protected[end:]
        pos = start + len(ref)
    if not out:
        return None
    if len(out) > 1 and all(j.lstrip().startswith("CROSS") for j in joins):
        # several uncorrelated scalars (e.g. BETWEEN (SELECT MIN…) AND
        # (SELECT MAX…)): fold them left-deep into pairwise 1-row×1-row
        # cross-join combo views, so the outer body needs only ONE cross
        # join — every node in the tree is a compilable binary shape
        acc_cols = ["__sv0"]
        cur = out[0][0]
        for i in range(1, len(out)):
            nm = f"{prefix}_c{i}"
            sel = ", ".join(f"__l.{c} AS {c}" for c in acc_cols)
            out.append((
                nm,
                f"SELECT {sel}, __r.__sv{i} AS __sv{i} "
                f"FROM {cur} __l CROSS JOIN {out[i][0]} __r",
            ))
            acc_cols.append(f"__sv{i}")
            cur = nm
        joins = [f" CROSS JOIN {cur} __sqall"]
        protected = _rename_sq_qualifiers(protected, "__sqall")
    # splice the joins at the end of the top-level FROM clause
    span = _sp.top_from_span(protected)
    if span is None:
        return None
    insert_at = span[1]
    protected = (
        protected[:insert_at].rstrip()
        + "".join(joins)
        + " "
        + protected[insert_at:]
    )
    return protected.strip(), out


def _split_top_and_fe(text: str) -> list[str]:
    """Split on top-level ANDs (token-level, literal-safe)."""
    from feldera_spark.sqlparse import split_and

    return split_and(text)


def _corr_equi_pair(
    conj: str, inner_al: str, outer_al: str,
    inner_cols: set[str], outer_cols: set[str],
) -> tuple[str, str] | None:
    """Parse one correlation conjunct ``inner_col = outer_al.col`` (either
    order); None when it is not a plain equi term. Token-level."""
    from feldera_spark.sqlparse import cmp_conjunct

    m = cmp_conjunct(conj, ("=",))
    if m is None:
        return None
    (xa, xc), _op, (ya, yc) = m
    if xa == outer_al:
        xa, xc, ya, yc = ya, yc, xa, xc
    if ya != outer_al:
        return None
    if xa not in (None, inner_al):
        return None
    if xc not in inner_cols or yc not in outer_cols:
        return None
    return xc, yc


def _corr_ineq_pair(
    conj: str, inner_al: str, outer_al: str,
    inner_cols: set[str], outer_cols: set[str],
) -> tuple[str, str, str] | None:
    """One NON-EQUI correlation conjunct ``inner_col <=|>=|<|> outer.col``
    (either order); returns (inner col, outer col, op) normalized to
    ``inner <op> outer``. Strict </> compile via an exclusive ROWS
    frame (round-5 verdict task #7 — fence retired; the k-row anchor
    tie-sorts outside the equal-value u-rows). ``<=>``/``<>`` cannot
    match (each is ONE punct token, not in the op set). Token-level."""
    from feldera_spark.sqlparse import cmp_conjunct

    m = cmp_conjunct(conj, ("<=", ">=", "<", ">"))
    if m is None:
        return None
    (xa, xc), op, (ya, yc) = m
    if xa == outer_al:
        op = {"<=": ">=", ">=": "<=", "<": ">", ">": "<"}[op]
        xa, xc, ya, yc = ya, yc, xa, xc
    if ya != outer_al or xa not in (None, inner_al):
        return None
    if xc not in inner_cols or yc not in outer_cols:
        return None
    return xc, yc, op


def _single_outer_table(text: str) -> tuple[str, str] | None:
    """(table, alias-or-table) of the top-level FROM clause when it is a
    single plain table reference; None otherwise."""
    from feldera_spark.sqlparse import tokenize

    span = _top_level_from_span(text)
    if span is None:
        return None
    toks = tokenize(text[span[0] : span[1]])
    if not toks or toks[0].kind != "word":
        return None
    t = toks[0].text.lower()
    if len(toks) == 1:
        return t, t
    if len(toks) == 2 and toks[1].kind == "word":
        return t, toks[1].text.lower()
    if (
        len(toks) == 3
        and toks[1].kind == "word"
        and toks[1].up() == "AS"
        and toks[2].kind == "word"
    ):
        return t, toks[2].text.lower()
    return None


def _top_level_kw_pos(text: str, kw_pattern: str) -> int | None:
    r"""Start offset of the first paren-depth-0 occurrence of a keyword.
    Token-level; ``kw_pattern`` keeps its historical regex-alternation
    shape — only each alternative's LEADING word matters for the
    position (e.g. ``GROUP\s+BY`` → the GROUP token)."""
    from feldera_spark.sqlparse import top_keyword_pos

    words = set()
    for alt in kw_pattern.split("|"):
        m = re.match(r"\w+", alt.strip())
        if m:
            words.add(m.group(0).upper())
    return top_keyword_pos(text, words)


def _top_level_from_span(text: str) -> tuple[int, int] | None:
    """(start, end) of the top-level FROM clause body: after the first
    depth-0 FROM, up to the next depth-0 clause keyword (or the end).
    Token-level."""
    from feldera_spark.sqlparse import top_from_span

    return top_from_span(text)


def _mask_parens(text: str) -> str:
    """Blank out parenthesized spans so top-level-only scans (e.g. a
    comma check) ignore function arguments."""
    out, depth = [], 0
    for ch in text:
        if ch == "(":
            depth += 1
            out.append(" ")
        elif ch == ")":
            depth -= 1
            out.append(" ")
        else:
            out.append(ch if depth == 0 else " ")
    return "".join(out)


_AGG_CALL_RE = re.compile(
    r"\b(SUM|COUNT|AVG|MIN|MAX|STDDEV|STDDEV_POP|STDDEV_SAMP|VAR_POP|"
    r"VAR_SAMP|VARIANCE|ARG_MIN|ARG_MAX|BOOL_AND|BOOL_OR|EVERY|"
    r"BIT_AND|BIT_OR|BIT_XOR|COUNTIF)\s*\(",
    re.IGNORECASE,
)


def split_aggregate_for_scalar(
    sql: str, prefix: str
) -> tuple[str, str, str] | None:
    """When a GROUP BY view body holds scalar subqueries ABOVE the
    aggregation (select list or HAVING), split it Calcite-style: the
    aggregate becomes a hidden view and the residual outer query —
    plain select/filter over it — carries the subqueries, where the
    normal scalar-subquery pass can then lower them to IVM joins.

    ``SELECT k, SUM(v) AS s FROM t GROUP BY k
      HAVING SUM(v) > (SELECT AVG(v) FROM t)``
    → hidden: ``SELECT k, SUM(v) AS s FROM t GROUP BY k``
      outer:  ``SELECT k, s FROM <hidden> WHERE s > (SELECT AVG(v) FROM t)``

    Aggregate calls in HAVING/outer positions resolve to hidden select
    aliases (extra hidden items are synthesized for calls not already
    projected). Returns (outer_sql, hidden_name, hidden_sql) or None
    when the body has no above-aggregation subquery or is out of
    grammar (ORDER BY/LIMIT, DISTINCT, unsplittable item)."""
    protected, lits = _protect_literals(sql)
    if re.search(
        r"\b(ORDER\s+BY|LIMIT|DISTINCT|UNION|EXCEPT|INTERSECT|WITH)\b",
        protected, re.IGNORECASE,
    ):
        return None
    gb_pos = _top_level_kw_pos(protected, r"GROUP\s+BY")
    if gb_pos is None or "(" not in protected:
        return None
    # paren-aware clause split (a FROM inside a subquery is not a
    # clause boundary)
    sm = re.match(r"^\s*SELECT\s+", protected, re.IGNORECASE)
    from_pos = _top_level_kw_pos(protected, r"FROM")
    where_pos = _top_level_kw_pos(protected, r"WHERE")
    having_pos = _top_level_kw_pos(protected, r"HAVING")
    if sm is None or from_pos is None:
        return None

    def _clause(start_kw_pos, kw_re, *ends):
        # clause body starts at the END of the keyword match — never a
        # fixed offset ('GROUP   BY k' has 3 spaces; round-3 ADVICE)
        km = re.match(kw_re, protected[start_kw_pos:], re.IGNORECASE)
        end = min([e for e in ends if e is not None] + [len(protected)])
        return protected[start_kw_pos + km.end() : end].strip().rstrip(";")

    class m:  # clause accessor mirroring the old regex group API
        _g = {
            "sel": protected[sm.end() : from_pos].strip(),
            "frm": _clause(from_pos, r"FROM\s*", where_pos, gb_pos),
            "w": (
                _clause(where_pos, r"WHERE\s*", gb_pos)
                if where_pos is not None and where_pos < gb_pos else None
            ),
            "gb": _clause(gb_pos, r"GROUP\s+BY\s*", having_pos),
            "h": (
                _clause(having_pos, r"HAVING\s*")
                if having_pos is not None else None
            ),
        }

        @staticmethod
        def group(k):
            return m._g[k]

    # the split only pays off when a subquery sits ABOVE the aggregation
    above = (m.group("sel") or "") + " " + (m.group("h") or "")
    if not _SCALAR_SUBQ_RE.search(above):
        return None
    # WHERE must not hide a FROM-position or misparsed clause boundary
    hidden_items: list[tuple[str, str]] = []  # (expr, alias)
    outer_items: list[str] = []
    for item in _split_top_commas_fe(m.group("sel")):
        item = item.strip()
        am = re.match(r"^(?P<e>.*?)\s+AS\s+(?P<n>\w+)\s*$", item,
                      re.IGNORECASE | re.DOTALL)
        expr, name = (
            (am.group("e").strip(), am.group("n")) if am else (item, None)
        )
        if _SCALAR_SUBQ_RE.search(item):
            if name is None:
                return None  # subquery items must be aliased
            outer_items.append((expr, name))
        else:
            if name is None:
                if not re.match(r"^\w+(\.\w+)?$", expr):
                    return None
                name = expr.split(".")[-1]
            hidden_items.append((expr, name))
            outer_items.append((name, name))

    def _norm(t: str) -> str:
        return re.sub(r"\s+", "", t).lower()

    alias_of = {_norm(e): n for e, n in hidden_items}

    def _resolve_aggs(text: str) -> str | None:
        """Replace aggregate calls with hidden aliases, synthesizing
        hidden items for calls not already projected."""
        out, i = [], 0
        while True:
            am2 = _AGG_CALL_RE.search(text, i)
            if am2 is None:
                out.append(text[i:])
                break
            # skip calls inside a subquery (they belong to the subquery)
            sq = _SCALAR_SUBQ_RE.search(text, i)
            if sq is not None and sq.start() < am2.start():
                try:
                    sq_end = _balanced(text, text.index("(", sq.start()))
                except ValueError:
                    return None
                out.append(text[i:sq_end])
                i = sq_end
                continue
            open_idx = text.index("(", am2.end() - 1)
            try:
                end = _balanced(text, open_idx)
            except ValueError:
                return None
            call = text[am2.start():end]
            alias = alias_of.get(_norm(call))
            if alias is None:
                alias = f"__hagg{len(hidden_items)}"
                hidden_items.append((call, alias))
                alias_of[_norm(call)] = alias
            out.append(text[i:am2.start()])
            out.append(alias)
            i = end
        return "".join(out)

    resolved_outer = []
    for expr, name in outer_items:
        r = _resolve_aggs(expr)
        if r is None:
            return None
        resolved_outer.append(f"{r} AS {name}" if r != name else name)
    where_out = None
    if m.group("h"):
        where_out = _resolve_aggs(m.group("h"))
        if where_out is None:
            return None
    hidden = f"{prefix}_agg"
    hidden_sql = "SELECT " + ", ".join(
        f"{e} AS {n}" if _norm(e) != _norm(n) else e
        for e, n in hidden_items
    ) + f" FROM {m.group('frm')}"
    if m.group("w"):
        hidden_sql += f" WHERE {m.group('w')}"
    hidden_sql += f" GROUP BY {m.group('gb')}"
    outer_sql = f"SELECT {', '.join(resolved_outer)} FROM {hidden}"
    if where_out:
        outer_sql += f" WHERE {where_out}"
    return (
        _restore_literals(outer_sql, lits),
        hidden,
        _restore_literals(hidden_sql, lits),
    )


def _split_top_commas_fe(text: str) -> list[str]:
    return _split_top_commas(text)


_NOT_IN_RE = re.compile(
    r"(?P<col>\w+(?:\.\w+)?)\s+NOT\s+IN\s*\(\s*SELECT\s+"
    r"(?P<c>\w+(?:\.\w+)?)\s+FROM\s+(?P<u>\w+)(?:\s+(?:AS\s+)?"
    r"(?P<ia>(?!WHERE\b)\w+))?(?:\s+WHERE\s+(?P<w>[^()]*))?\s*\)",
    re.IGNORECASE,
)


def extract_not_in_subqueries(
    sql: str, prefix: str, table_columns: dict[str, set[str]]
) -> tuple[str, list[tuple[str, str]]] | None:
    """Lower ``col NOT IN (SELECT c FROM u [WHERE inner-only])`` —
    whose three-valued NULL semantics are NOT a plain anti join — into
    hidden views the IVM compiler's binary grammar covers (round-3
    verdict task 5; reference: Calcite's null-aware NOT IN
    decorrelation):

    - ``{prefix}_{n}v``  = ``SELECT DISTINCT c AS __c{n} FROM u [WHERE]``
    - ``__sq_{prefix}_nif{n}`` = 1-row ``COUNT(*) / COUNT(c)`` flags
      (the ``__sq_`` prefix rides the scalar-view broadcast hint; the
      global aggregate's empty-group default row makes COUNT(*)=0 real)
    - ``{prefix}_{n}a``  = outer table LEFT ANTI JOIN the values view
      (NULL outer keys pass the anti join — equality is UNKNOWN)
    - outer body: FROM swaps to the anti view, CROSS JOIN the flags,
      and the conjunct becomes
      ``(__n = 0 OR (col IS NOT NULL AND __n = __n_nonnull))``:
      empty set → everything (even NULL col) passes; any inner NULL →
      nothing passes; else non-NULL non-matching rows pass. Exactly
      SQL's 3VL.

    Conservative: single-table outer FROM, uncorrelated inner over one
    declared table. Returns None when nothing extracts (batch evaluates
    NOT IN natively either way — this pass only buys incrementality)."""
    protected, lits = _protect_literals(sql)
    out: list[tuple[str, str]] = []
    n = 0
    while True:
        wh_pos = _top_level_kw_pos(protected, r"WHERE")
        if wh_pos is None:
            break
        gb_pos = _top_level_kw_pos(
            protected, r"GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT"
        )
        clause_end = gb_pos if gb_pos is not None else len(protected)
        m = _NOT_IN_RE.search(protected, wh_pos, clause_end)
        if m is None:
            break
        # must be a depth-0 conjunct: WHERE/AND before, AND/clause-end after
        if not _top_level_at(protected, m.start()):
            break
        before = protected[:m.start()]
        if not re.search(r"\b(WHERE|AND)\s*$", before, re.IGNORECASE):
            break
        if re.match(r"\s*(AND\b|$)", protected[m.end():clause_end],
                    re.IGNORECASE) is None:
            break
        outer = _single_outer_table(protected)
        if outer is None:
            break
        otbl, oal = outer
        u = m.group("u").lower()
        if u not in table_columns or (
            otbl not in table_columns and not otbl.startswith(prefix)
        ):
            break
        inner_al = (m.group("ia") or u).lower()
        c = m.group("c")
        c_base = c.split(".")[-1].lower()
        c_qual = c.split(".")[0].lower() if "." in c else None
        if c_base not in table_columns[u] or c_qual not in (None, inner_al):
            break
        w = m.group("w")
        if w is not None:
            known = table_columns[u] | _SCALAR_OK_WORDS | {inner_al}
            words = {
                t.lower()
                for t in re.findall(r"\b([A-Za-z_]\w*)\b(?!\s*[(.])", w)
            }
            dots = {d.lower() for d in re.findall(r"\b(\w+)\s*\.", w)}
            if not (words <= known and dots <= {inner_al}):
                break
        vals = f"{prefix}_{n}v"
        flags = f"__sq_{prefix.lstrip('_')}_nif{n}"
        anti = f"{prefix}_{n}a"
        inner_from = f"{m.group('u')}" + (
            f" {m.group('ia')}" if m.group("ia") else ""
        )
        inner_where = f" WHERE {w}" if w else ""
        out.append((
            vals,
            _restore_literals(
                f"SELECT DISTINCT {c} AS __c{n} FROM {inner_from}{inner_where}",
                lits,
            ),
        ))
        out.append((
            flags,
            _restore_literals(
                f"SELECT COUNT(*) AS __nin{n}, COUNT({c}) AS __ninn{n} "
                f"FROM {inner_from}{inner_where}",
                lits,
            ),
        ))
        # anti view over the CURRENT outer relation (chains if a prior
        # NOT IN extraction already swapped the FROM)
        o_cols = (
            sorted(table_columns[otbl]) if otbl in table_columns else ["*"]
        )
        col_ref = m.group("col")
        # the compiled join grammar needs BOTH ON sides qualified
        col_q = f"{oal}.{col_ref.split('.')[-1]}"
        out.append((
            anti,
            f"SELECT {', '.join(o_cols)} FROM {otbl} {oal} "
            f"LEFT ANTI JOIN {vals} __niv{n} ON {col_q} = __niv{n}.__c{n}",
        ))
        span = _top_level_from_span(protected)
        protected = (
            protected[: span[0]]
            + f" {anti} {oal} CROSS JOIN {flags} __nif{n} "
            + protected[span[1]:]
        )
        mm2 = _NOT_IN_RE.search(protected)
        assert mm2 is not None
        pred = (
            f"(__nif{n}.__nin{n} = 0 OR ({col_ref} IS NOT NULL "
            f"AND __nif{n}.__nin{n} = __nif{n}.__ninn{n}))"
        )
        protected = protected[: mm2.start()] + pred + protected[mm2.end():]
        if otbl in table_columns:
            table_columns = {**table_columns, anti: set(table_columns[otbl])}
        n += 1
    if not out:
        return None
    return _restore_literals(protected, lits), out


_OVER_PART_RE = re.compile(
    r"OVER\s*\(\s*PARTITION\s+BY\s+(?P<pb>[\w\s,\.]+?)\s+ORDER\s+BY",
    re.IGNORECASE,
)


def split_multi_partition_windows(
    sql: str, prefix: str, table_columns: dict[str, set[str]]
) -> tuple[str, list[tuple[str, str]]] | None:
    """Lower a view whose window functions use DIFFERENT partition keys
    into a CHAIN of hidden single-partition-window views (round-3
    verdict fallback #3). The reference compiles Calcite's
    ``LogicalWindow`` groups into a chain of window operators, one per
    (partition, order) group, each maintaining its own keyed state —
    this is the textual equivalent: the first group's functions move
    into a hidden view that passes ALL source columns through; the
    outer body computes the remaining groups over it. Each link then
    compiles to a ``CompiledRankView`` and chains deltas.

    Conservative: single declared-table FROM, no GROUP BY / DISTINCT /
    set ops / LIMIT, every OVER item aliased. Returns None when fewer
    than two partition groups are present."""
    protected, lits = _protect_literals(sql)
    if re.search(
        r"\b(GROUP\s+BY|DISTINCT|UNION|EXCEPT|INTERSECT|LIMIT|HAVING|JOIN)\b",
        protected, re.IGNORECASE,
    ):
        return None
    m = re.match(
        r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<t>\w+)"
        r"(?:\s+WHERE\s+(?P<w>.*?))?\s*;?\s*$",
        protected, re.IGNORECASE | re.DOTALL,
    )
    if m is None or m.group("t").lower() not in table_columns:
        return None
    tbl = m.group("t").lower()
    # Strip table-qualified references (``t.col`` → ``col``): the hidden
    # links rename the FROM source, so a retained qualifier would fail
    # to resolve in the outer body (round-4 ADVICE #3). Single-table
    # scope makes the rewrite lossless.
    qual = re.compile(
        rf"\b{re.escape(m.group('t'))}\s*\.\s*(?=\w)", re.IGNORECASE
    )
    items = [qual.sub("", it) for it in _split_top_commas(m.group("sel"))]
    where0 = qual.sub("", m.group("w")) if m.group("w") else None
    groups: dict[str, list[int]] = {}
    plain: list[int] = []
    for i, item in enumerate(items):
        om = _OVER_PART_RE.search(item)
        if om is None:
            if re.search(r"\bOVER\b", item, re.IGNORECASE):
                return None  # un-partitioned window: out of scope
            plain.append(i)
            continue
        if not re.search(r"\s+AS\s+\w+\s*$", item, re.IGNORECASE):
            return None
        key = re.sub(r"\s+", " ", om.group("pb").strip().lower())
        groups.setdefault(key, []).append(i)
    if len(groups) < 2:
        return None
    # peel one partition group per hidden view until one group remains
    # on top (each link passes every upstream column through, so later
    # groups' ORDER BY / arguments still resolve)
    out: list[tuple[str, str]] = []
    src = m.group("t")
    avail = sorted(table_columns[tbl])
    where = where0
    n = 0
    while len(groups) > 1:
        first_key = next(iter(groups))
        first_idx = groups.pop(first_key)
        first_items = [items[i] for i in first_idx]
        hidden = f"{prefix}_w{n}"
        hidden_sql = f"SELECT {', '.join(avail + first_items)} FROM {src}"
        if where:
            # WHERE evaluates BEFORE window functions — it belongs in
            # the bottom link only
            hidden_sql += f" WHERE {where}"
            where = None
        first_aliases = [
            re.search(r"\s+AS\s+(\w+)\s*$", it, re.IGNORECASE).group(1)
            for it in first_items
        ]
        for i, al in zip(first_idx, first_aliases):
            items[i] = al
        out.append((hidden, _restore_literals(hidden_sql, lits)))
        avail = avail + first_aliases
        src = hidden
        n += 1
    outer_sql = f"SELECT {', '.join(items)} FROM {src}"
    if where:
        outer_sql += f" WHERE {where}"
    return _restore_literals(outer_sql, lits), out


def rewrite_lateral(sql: str, table_columns: dict[str, list[str]] | None = None) -> str:
    """Decorrelate LATERAL subqueries into plain joins so the IVM
    recognizer's existing join machinery applies (round-5 verdict task
    #7; reference: Calcite decorrelates LATERAL in the planner —
    ``SqlToRelCompiler``). Conservative, token-based; on any
    unrecognized detail the text is returned unchanged and the LATERAL
    fence sends the view to batch (Spark executes LATERAL natively
    there — never a silent wrong answer). Handled shapes:

    - ``, LATERAL (sub) x`` / ``CROSS JOIN LATERAL (sub) x`` /
      ``JOIN LATERAL (sub) x ON TRUE``:
      * sub has NO outer references → plain ``CROSS JOIN (sub) x``;
      * sub = ``SELECT <inner cols> FROM t WHERE <equi-corr AND
        uncorr>`` → ``JOIN (SELECT <cols + hidden corr keys> FROM t
        WHERE uncorr) x ON x.__lat_k = outer.c`` (cross-join-lateral
        over a filter IS the inner join on its correlation);
      * sub = ``SELECT <aggs> FROM t WHERE <equi-corr AND uncorr>``
        (no GROUP BY, non-COUNT aggs) → ``LEFT JOIN (SELECT corr keys,
        aggs FROM t WHERE uncorr GROUP BY keys) x ON keys`` — the
        empty-group NULL pad matches the aggregate-over-empty row.
    - ``LEFT JOIN LATERAL (sub) x ON TRUE`` with the filter shape →
      the same derived join with LEFT semantics.

    Declined (returned unchanged): ``x.*``/bare ``*`` in the outer
    select (hidden key columns would change the schema), COUNT in the
    aggregate form (needs a COALESCE default), non-equi correlation,
    multiple LATERAL clauses referencing each other."""
    from feldera_spark.sqlparse import split_clauses, tokenize

    protected, lits = _protect_literals(sql)
    m = re.search(
        r"(?P<lead>,|\bCROSS\s+JOIN\b|\bLEFT\s+(?:OUTER\s+)?JOIN\b|\bJOIN\b)?"
        r"\s*\bLATERAL\s*\(",
        protected,
        re.IGNORECASE,
    )
    if m is None:
        return sql
    open_idx = protected.index("(", m.end() - 1)
    close_idx = _balanced(protected, open_idx)
    sub = protected[open_idx + 1 : close_idx - 1]
    am = re.match(
        r"\s*(?:AS\s+)?(?P<al>\w+)", protected[close_idx:], re.IGNORECASE
    )
    if am is None:
        return sql
    alias = am.group("al")
    tail_pos = close_idx + am.end()
    if m.group("lead") is None:
        # LATERAL is the FIRST FROM relation: there is no outer row to
        # correlate with and the splice below would emit "FROM JOIN …"
        # (a parse error) — keep the view on the batch path unchanged
        # (round-6 ADVICE low)
        return sql
    lead = (m.group("lead") or "").strip().upper().replace("OUTER ", "")
    left_join = lead.startswith("LEFT")
    if left_join or lead == "JOIN":
        tm = re.match(
            r"\s*ON\s+TRUE\b", protected[tail_pos:], re.IGNORECASE
        )
        if tm is None:
            return sql
        tail_pos += tm.end()
    # a second LATERAL → decline (chained laterals may correlate)
    if re.search(r"\bLATERAL\b", protected[tail_pos:], re.IGNORECASE):
        return sql
    # outer schema: alias/table names declared before the LATERAL
    before = protected[: m.start()]
    outer_aliases = {
        (r.alias or (r.name or "").split(".")[-1])
        for r in __import__(
            "feldera_spark.sqlparse", fromlist=["relations"]
        ).relations(before)
        if r.name is not None or r.alias
    }
    outer_aliases.discard("")
    cl = split_clauses(sub.strip())
    if cl is None or any(
        k in cl for k in ("GROUP", "HAVING", "ORDER", "LIMIT", "DISTINCT")
    ):
        return sql
    inner_from = cl["FROM"].strip()
    fm = re.match(r"^(?P<t>\w+)(?:\s+(?:AS\s+)?(?P<al>\w+))?$", inner_from)
    if fm is None:
        return sql
    inner_al = (fm.group("al") or fm.group("t")).lower()
    # outer references: qualifier.word where qualifier is an outer alias
    def _outer_refs(text: str) -> set[str]:
        refs = set()
        toks = tokenize(text)
        for i, t in enumerate(toks):
            if (
                t.kind == "word"
                and t.text.lower() in outer_aliases
                and i + 2 < len(toks)
                and toks[i + 1].kind == "punct"
                and toks[i + 1].text == "."
            ):
                refs.add(t.text.lower())
        return refs

    sel_items = [s.strip() for s in _split_top_commas(cl["SELECT"])]
    if any(_outer_refs(s) for s in sel_items):
        return sql
    if "*" in cl["SELECT"]:
        return sql
    # outer select must not use alias.* (hidden key cols would leak)
    if re.search(rf"\b{re.escape(alias)}\s*\.\s*\*", protected) or re.search(
        r"SELECT\s+\*", protected[: m.start()], re.IGNORECASE
    ):
        return sql
    corr: list[tuple[str, str, str]] = []  # (inner col, outer alias, outer col)
    uncorr: list[str] = []
    for conj in _split_top_and_fe(cl.get("WHERE", "")) if cl.get("WHERE") else []:
        refs = _outer_refs(conj)
        if not refs:
            uncorr.append(conj)
            continue
        em = re.match(
            r"^\s*(?P<x>\w+)\s*\.\s*(?P<xc>\w+)\s*=\s*"
            r"(?P<y>\w+)\s*\.\s*(?P<yc>\w+)\s*$",
            conj,
        )
        if em is None:
            return sql  # non-equi / complex correlation: decline
        xa, xc, ya, yc = (em.group(g).lower() for g in ("x", "xc", "y", "yc"))
        if xa == inner_al and ya in outer_aliases:
            corr.append((xc, ya, yc))
        elif ya == inner_al and xa in outer_aliases:
            corr.append((yc, xa, xc))
        else:
            return sql
    agg_re = re.compile(
        r"^(SUM|MIN|MAX|AVG|COUNT)\s*\(", re.IGNORECASE
    )
    is_agg = any(agg_re.match(s) for s in sel_items)
    if is_agg and not all(agg_re.match(s) for s in sel_items):
        return sql
    if is_agg and any(s.upper().startswith("COUNT") for s in sel_items):
        return sql  # COUNT needs the COALESCE-0 default: decline
    where_txt = f" WHERE {' AND '.join(uncorr)}" if uncorr else ""
    if not corr:
        if is_agg:
            return sql  # uncorrelated aggregate: scalar-subquery domain
        derived = f"(SELECT {cl['SELECT']} FROM {inner_from}{where_txt})"
        joint = f" CROSS JOIN {derived} AS {alias}"
        if left_join:
            joint = f" LEFT JOIN {derived} AS {alias} ON TRUE"
    else:
        keys = []
        on_terms = []
        for i2, (ic, oa, oc) in enumerate(corr):
            keys.append(f"{ic} AS __lat_k{i2}")
            on_terms.append(f"{alias}.__lat_k{i2} = {oa}.{oc}")
        if is_agg:
            gb = ", ".join(k.split(" AS ")[0] for k in keys)
            derived = (
                f"(SELECT {', '.join(keys)}, {cl['SELECT']} "
                f"FROM {inner_from}{where_txt} GROUP BY {gb})"
            )
            joint = (
                f" LEFT JOIN {derived} AS {alias} ON "
                + " AND ".join(on_terms)
            )
        else:
            derived = (
                f"(SELECT {cl['SELECT']}, {', '.join(keys)} "
                f"FROM {inner_from}{where_txt})"
            )
            how = "LEFT JOIN" if left_join else "JOIN"
            joint = (
                f" {how} {derived} AS {alias} ON " + " AND ".join(on_terms)
            )
    lead_start = m.start() if m.group("lead") else m.start()
    out = protected[:lead_start] + joint + protected[tail_pos:]
    return _restore_literals(out, lits)
