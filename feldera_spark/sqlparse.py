"""Token-stream SQL structure parser for the dialect frontend.

Round-5 verdict task #2: the frontend's structural questions (where are
the table positions? what are the top-level clauses? how do I rewrite
one relation occurrence?) were answered by an accumulation of regexes —
each individually fenced, but the risk class compounded with every new
textual rewrite. This module replaces the character-level guessing with
a real LEXER + small recursive-descent walkers:

- :func:`tokenize` — quote-aware (``'...''...'``, ``"quoted ident"``,
  backtick idents), comment-aware (``--`` and ``/* */``), with byte
  offsets into the original text so rewrites splice precisely.
- :func:`split_top_level` — split a token span on a separator at paren
  depth 0 (the structural form of ``_split_top_commas``).
- :func:`split_clauses` — segment one SELECT block into its clauses
  (SELECT/FROM/WHERE/GROUP BY/HAVING/ORDER BY/LIMIT) at depth 0.
- :func:`relations` — walk the FROM clause's relation tree: base tables
  (including ``db.table`` qualified names), aliases, derived tables,
  comma cross-joins and JOIN chains — each with exact source offsets.

The reference's frontend is a full Calcite parser/validator
(``sql-to-dbsp-compiler/SQL-compiler/src/main/java/org/dbsp/sqlCompiler/
compiler/frontend/SqlToRelCompiler.java``); this is the proportionate
Spark-side equivalent: Spark SQL itself parses and executes the view
bodies, so the frontend only needs STRUCTURE (positions, clauses,
relation occurrences), not full expression ASTs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str  # 'word' | 'number' | 'string' | 'qident' | 'punct' | 'param'
    text: str
    start: int  # byte offset of first char in the original sql
    end: int    # byte offset one past the last char

    def up(self) -> str:
        return self.text.upper() if self.kind == "word" else self.text


_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9$]*")
_NUM_RE = re.compile(r"\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?")
_PARAM_RE = re.compile(r"\x00\d+\x00")  # _protect_literals placeholders


def tokenize(sql: str) -> list[Token]:
    """Lex ``sql`` into tokens with byte offsets. Comments are dropped;
    string literals (with ``''`` escapes), double-quoted and backtick
    identifiers each become ONE token. Never raises on malformed input —
    an unterminated literal swallows to end-of-text (the caller's Spark
    parse will produce the loud error)."""
    toks: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            j = min(j + 1, n)
            toks.append(Token("string", sql[i:j], i, j))
            i = j
            continue
        if c == '"' or c == "`":
            close = c
            j = sql.find(close, i + 1)
            j = n if j < 0 else j + 1
            toks.append(Token("qident", sql[i:j], i, j))
            i = j
            continue
        if c == "\x00":
            m = _PARAM_RE.match(sql, i)
            if m:
                toks.append(Token("param", m.group(0), i, m.end()))
                i = m.end()
                continue
        m = _WORD_RE.match(sql, i)
        if m:
            toks.append(Token("word", m.group(0), i, m.end()))
            i = m.end()
            continue
        m = _NUM_RE.match(sql, i)
        if m:
            toks.append(Token("number", m.group(0), i, m.end()))
            i = m.end()
            continue
        # multi-char operators kept whole so splitters can't cut them
        for op in ("<=>", "<>", "<=", ">=", "!=", "||", "::", "=>", "->"):
            if sql.startswith(op, i):
                toks.append(Token("punct", op, i, i + len(op)))
                i += len(op)
                break
        else:
            toks.append(Token("punct", c, i, i + 1))
            i += 1
    return toks


def split_top_level(
    toks: list[Token], sep: str = ","
) -> list[list[Token]]:
    """Split a token list on ``sep`` punct tokens at paren/bracket depth
    0. Returns the groups (possibly empty when separators are adjacent)."""
    out: list[list[Token]] = []
    cur: list[Token] = []
    depth = 0
    for t in toks:
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        if depth == 0 and t.kind == "punct" and t.text == sep:
            out.append(cur)
            cur = []
            continue
        cur.append(t)
    out.append(cur)
    return out


_CLAUSE_STARTS = {
    "SELECT": ("SELECT",),
    "FROM": ("FROM",),
    "WHERE": ("WHERE",),
    "GROUP": ("GROUP", "BY"),
    "HAVING": ("HAVING",),
    "ORDER": ("ORDER", "BY"),
    "LIMIT": ("LIMIT",),
}
_SET_OPS = {"UNION", "EXCEPT", "INTERSECT", "MINUS"}


def split_set_ops(sql: str) -> list[tuple[str, str | None]]:
    """Split ``sql`` into top-level set-op operands:
    ``[(part_sql, op_before or None), ...]``. ``op`` is e.g.
    ``'UNION'`` / ``'UNION ALL'`` / ``'EXCEPT'``."""
    toks = tokenize(sql)
    parts: list[tuple[str, str | None]] = []
    depth = 0
    last = 0
    i = 0
    pending_op: str | None = None
    while i < len(toks):
        t = toks[i]
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "word" and t.up() in _SET_OPS:
            parts.append((sql[last : t.start].strip(), pending_op))
            op = t.up()
            if (
                i + 1 < len(toks)
                and toks[i + 1].kind == "word"
                and toks[i + 1].up() in ("ALL", "DISTINCT")
            ):
                op = f"{op} {toks[i + 1].up()}"
                i += 1
            pending_op = op
            last = toks[i].end
        i += 1
    parts.append((sql[last:].strip(), pending_op))
    return parts


def split_clauses(sql: str) -> dict[str, str] | None:
    """Segment ONE top-level SELECT block into its clauses at depth 0.
    Returns ``{clause: text}`` with keys among SELECT/DISTINCT/FROM/
    WHERE/GROUP/HAVING/ORDER/LIMIT, or None when the text is not a
    single SELECT block (set ops, WITH, leading garbage)."""
    toks = tokenize(sql)
    if not toks or not (toks[0].kind == "word" and toks[0].up() == "SELECT"):
        return None
    depth = 0
    marks: list[tuple[str, int, int]] = []  # (clause, tok_idx, text_start)
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "word":
            u = t.up()
            if u in _SET_OPS or u == "WITH" and i == 0:
                return None
            if u in _CLAUSE_STARTS:
                kws = _CLAUSE_STARTS[u]
                if len(kws) == 2:
                    if (
                        i + 1 < len(toks)
                        and toks[i + 1].kind == "word"
                        and toks[i + 1].up() == kws[1]
                    ):
                        marks.append((u, i, t.start))
                        i += 2
                        continue
                else:
                    marks.append((u, i, t.start))
        i += 1
    if depth != 0 or not marks or marks[0][0] != "SELECT" or marks[0][1] != 0:
        return None
    # clauses must appear in order, each at most once (SELECT twice =
    # nested select leaked to depth 0 = malformed)
    order = ["SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT"]
    seen_idx = -1
    for c, _ti, _s in marks:
        oi = order.index(c)
        if oi <= seen_idx:
            return None
        seen_idx = oi
    out: dict[str, str] = {}
    for j, (c, ti, s) in enumerate(marks):
        body_start = toks[ti + len(_CLAUSE_STARTS[c]) - 1].end
        end = marks[j + 1][2] if j + 1 < len(marks) else len(sql)
        out[c] = sql[body_start:end].strip()
    dm = re.match(r"DISTINCT\b", out.get("SELECT", ""), re.IGNORECASE)
    if dm:  # word-bounded: a column named distinct_x is NOT a DISTINCT
        out["DISTINCT"] = "DISTINCT"
        out["SELECT"] = out["SELECT"][dm.end():].strip()
    return out


@dataclass(frozen=True)
class Relation:
    """One relation occurrence in a FROM clause.

    ``name``: lowercase dotted name (``db.table`` kept qualified) for a
    base table, or None for a derived table ``(SELECT ...)``.
    ``alias``: lowercase alias or None. ``start``/``end``: byte span of
    the NAME (or the parenthesized subquery) in the original sql.
    ``alias_end``: end of the alias if present (for splice rewrites).
    ``join_kind``: 'from' for the first/comma entries, else the JOIN
    keyword chain ('join', 'left join', 'cross join', ...)."""

    name: str | None
    alias: str | None
    start: int
    end: int
    alias_end: int
    join_kind: str


_NOT_ALIAS = frozenset(
    """ON USING WHERE GROUP HAVING ORDER LIMIT UNION EXCEPT INTERSECT
    MINUS JOIN INNER LEFT RIGHT FULL CROSS NATURAL ASOF LATERAL
    MATCH_CONDITION FOR TABLESAMPLE QUALIFY AS WINDOW FETCH OFFSET
    SET""".split()
)
_JOIN_WORDS = frozenset(
    "JOIN INNER LEFT RIGHT FULL OUTER CROSS NATURAL ASOF".split()
)


def _skip_parens(toks: list[Token], i: int) -> int:
    """``toks[i]`` is '(' — return index one past its matching ')'."""
    depth = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return i


def relations(sql: str) -> list[Relation]:
    """Enumerate relation occurrences of every FROM clause in ``sql``
    (all nesting levels, textual order — matching the historical
    contract of ``list_table_positions``). Handles ``db.table``
    qualified names, derived tables, LATERAL subqueries, comma
    cross-joins and JOIN chains. Table-function calls (``TABLE(...)``,
    ``UNNEST(...)``) and ``name(...)`` calls are NOT relations."""
    toks = tokenize(sql)
    out: list[Relation] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if not (t.kind == "word" and t.up() in ("FROM", "JOIN")):
            i += 1
            continue
        # scan the relation list that follows FROM (or the single
        # relation after JOIN), tracking comma continuation at the
        # clause's own depth
        kind = "from" if t.up() == "FROM" else "join"
        i += 1
        while i < n:
            # skip join modifiers / LATERAL markers
            while i < n and toks[i].kind == "word" and toks[i].up() in (
                "LATERAL",
            ):
                i += 1
            if i >= n:
                break
            t = toks[i]
            if t.kind == "punct" and t.text == "(":
                j = _skip_parens(toks, i)
                # derived table (or LATERAL subquery): record with
                # name None; nested FROMs inside are found by the outer
                # while loop? NO — _skip_parens jumps past them, so
                # recurse into the subtext here.
                inner = sql[t.start + 1 : toks[j - 1].start] if j - 1 < n else ""
                for r in relations(inner):
                    out.append(
                        Relation(
                            r.name,
                            r.alias,
                            r.start + t.start + 1,
                            r.end + t.start + 1,
                            r.alias_end + t.start + 1,
                            r.join_kind,
                        )
                    )
                end = toks[j - 1].end if j - 1 < n else len(sql)
                al, al_end, j2 = _read_alias(toks, j)
                out.append(Relation(None, al, t.start, end, al_end or end, kind))
                i = j2
            elif t.kind == "word":
                u = t.up()
                if u in ("TABLE", "UNNEST") and _next_is(toks, i + 1, "("):
                    # table function: skip its parens; window table
                    # functions contain TABLE t references handled by
                    # their own rewrites, not as positions
                    i = _skip_parens(toks, i + 1)
                    _al, _ae, i = _read_alias(toks, i)
                elif _next_is(toks, i + 1, "("):
                    i = _skip_parens(toks, i + 1)  # function call source
                    _al, _ae, i = _read_alias(toks, i)
                else:
                    # dotted name
                    parts = [t.text]
                    end = t.end
                    j = i + 1
                    while (
                        j + 1 < n
                        and toks[j].kind == "punct"
                        and toks[j].text == "."
                        and toks[j + 1].kind in ("word", "qident")
                    ):
                        parts.append(toks[j + 1].text)
                        end = toks[j + 1].end
                        j += 2
                    al, al_end, j = _read_alias(toks, j)
                    out.append(
                        Relation(
                            ".".join(p.lower() for p in parts),
                            al,
                            t.start,
                            end,
                            al_end or end,
                            kind,
                        )
                    )
                    i = j
            else:
                break
            # after one relation: comma continues the FROM list; a JOIN
            # keyword chain continues with its own kind; anything else
            # ends the clause scan
            if i < n and toks[i].kind == "punct" and toks[i].text == ",":
                if kind.startswith("from") or True:
                    kind = "from"
                    i += 1
                    continue
            jk = []
            j = i
            while j < n and toks[j].kind == "word" and toks[j].up() in _JOIN_WORDS:
                jk.append(toks[j].up().lower())
                j += 1
            if jk and jk[-1] == "join":
                kind = " ".join(jk)
                i = j
                continue
            break
    # textual order
    out.sort(key=lambda r: r.start)
    return out


def _next_is(toks: list[Token], i: int, text: str) -> bool:
    return i < len(toks) and toks[i].kind == "punct" and toks[i].text == text


def _read_alias(
    toks: list[Token], i: int
) -> tuple[str | None, int | None, int]:
    """Optional ``[AS] alias`` after a relation. Returns
    (alias, alias_end_offset, next_index)."""
    n = len(toks)
    if i < n and toks[i].kind == "word" and toks[i].up() == "AS":
        if i + 1 < n and toks[i + 1].kind in ("word", "qident"):
            return toks[i + 1].text.lower(), toks[i + 1].end, i + 2
        return None, None, i + 1
    if (
        i < n
        and toks[i].kind == "word"
        and toks[i].up() not in _NOT_ALIAS
        and not (toks[i].up() in _SET_OPS)
    ):
        # a bare word right after a relation is its alias — unless a
        # dotted continuation follows (can't happen: handled upstream)
        if not _next_is(toks, i + 1, "("):
            return toks[i].text.lower(), toks[i].end, i + 1
    return None, None, i


# ---------------------------------------------------------------------------
# Expression-level walkers (round-7: the expression-tokenizer migration —
# frontend passes that used to regex over literal-protected text call these
# instead; the lexer already skips literals and comments, so none of them
# can be confused by keyword-looking DATA)
# ---------------------------------------------------------------------------


def next_subquery_span(sql: str, pos: int = 0) -> tuple[int, int] | None:
    """Span (offset of ``(``, one past ``)``) of the first
    ``( SELECT ...`` starting at/after ``pos``, ANY depth, with the
    close found by token-level paren matching. None when absent or
    unbalanced."""
    toks = tokenize(sql)
    for i, t in enumerate(toks):
        if t.start < pos or t.kind != "punct" or t.text != "(":
            continue
        if i + 1 >= len(toks) or toks[i + 1].up() != "SELECT":
            continue
        depth = 0
        for j in range(i, len(toks)):
            tj = toks[j]
            if tj.kind == "punct" and tj.text == "(":
                depth += 1
            elif tj.kind == "punct" and tj.text == ")":
                depth -= 1
                if depth == 0:
                    return t.start, tj.end
        return None  # unbalanced
    return None


def top_keyword_pos(sql: str, words: set[str]) -> int | None:
    """Offset of the first depth-0 word token whose upper-case text is
    in ``words``."""
    up = {w.upper() for w in words}
    depth = 0
    for t in tokenize(sql):
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "word" and t.up() in up:
            return t.start
    return None


def top_from_span(sql: str) -> tuple[int, int] | None:
    """(start, end) offsets of the top-level FROM clause body: after the
    first depth-0 FROM, up to the next depth-0 clause keyword (or end).
    Depth-0 JOIN/ON/etc stay inside the span (they are FROM content)."""
    stops = {"WHERE", "GROUP", "HAVING", "ORDER", "LIMIT"}
    depth = 0
    from_at = None
    for t in tokenize(sql):
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "word":
            kw = t.up()
            if kw == "FROM" and from_at is None:
                from_at = t.end
            elif from_at is not None and kw in stops:
                return from_at, t.start
    if from_at is None:
        return None
    return from_at, len(sql)


def split_and(text: str) -> list[str]:
    """Split on depth-0 AND word tokens; returns stripped substrings
    (never raises; empty input → [])."""
    if not text.strip():
        return []
    toks = tokenize(text)
    parts: list[str] = []
    depth = 0
    seg_start = 0
    for t in toks:
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "word" and t.up() == "AND":
            parts.append(text[seg_start:t.start].strip())
            seg_start = t.end
    parts.append(text[seg_start:].strip())
    return [p for p in parts if p]


def bare_words(text: str) -> set[str]:
    """Lower-cased word tokens NOT immediately followed by ``(`` or
    ``.`` — the token equivalent of the historical
    ``\\b([A-Za-z_]\\w*)\\b(?!\\s*[(.])`` scan (a qualified reference's
    COLUMN part is included, its qualifier is not). Literal content
    never matches (it is one string token)."""
    toks = tokenize(text)
    out: set[str] = set()
    for i, t in enumerate(toks):
        if t.kind != "word":
            continue
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if nxt is not None and nxt.kind == "punct" and nxt.text in "(.":
            continue
        out.add(t.text.lower())
    return out


def qualifier_words(text: str) -> set[str]:
    """Lower-cased word tokens immediately followed by ``.`` — the
    token equivalent of the ``\\b(\\w+)\\s*\\.`` qualifier scan."""
    toks = tokenize(text)
    out: set[str] = set()
    for i, t in enumerate(toks):
        if (
            t.kind == "word"
            and i + 1 < len(toks)
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "."
        ):
            out.add(t.text.lower())
    return out


def top_comma(text: str) -> bool:
    """True when a depth-0 ``,`` exists (function arguments don't
    count)."""
    depth = 0
    for t in tokenize(text):
        if t.kind == "punct" and t.text in "([":
            depth += 1
        elif t.kind == "punct" and t.text in ")]":
            depth -= 1
        elif depth == 0 and t.kind == "punct" and t.text == ",":
            return True
    return False


def ident_path(text: str) -> tuple[str | None, str] | None:
    """Parse ``col`` or ``alias.col`` (word tokens only) →
    (qualifier|None, column), lower-cased; None for anything else."""
    toks = tokenize(text)
    if len(toks) == 1 and toks[0].kind == "word":
        return None, toks[0].text.lower()
    if (
        len(toks) == 3
        and toks[0].kind == "word"
        and toks[1].kind == "punct"
        and toks[1].text == "."
        and toks[2].kind == "word"
    ):
        return toks[0].text.lower(), toks[2].text.lower()
    return None


def cmp_conjunct(conj: str, ops: tuple[str, ...]) -> tuple | None:
    """Parse ``<ident-path> <op> <ident-path>`` with ``op`` one of
    ``ops`` → ((xa, xc), op, (ya, yc)); None otherwise. ``<=>`` never
    matches (it is one token, excluded unless listed)."""
    toks = tokenize(conj)
    for i, t in enumerate(toks):
        if t.kind == "punct" and t.text in ops:
            left = ident_path(conj[: t.start])
            right = ident_path(conj[t.end:])
            if left is None or right is None:
                return None
            return left, t.text, right
    return None


def has_agg_call(text: str, agg_names: frozenset) -> bool:
    """True when a word in ``agg_names`` is immediately followed by
    ``(`` — the token form of the aggregate-call scan."""
    toks = tokenize(text)
    for i, t in enumerate(toks):
        if (
            t.kind == "word"
            and t.text.lower() in agg_names
            and i + 1 < len(toks)
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "("
        ):
            return True
    return False


def next_call_span(
    sql: str, names: frozenset, pos: int = 0
) -> tuple[int, int, str] | None:
    """First ``<name>(...)`` call at/after ``pos`` where lower-cased
    ``name`` is in ``names``: (start of name, one past close paren,
    lower name). Token-level balanced matching; None when absent."""
    toks = tokenize(sql)
    for i, t in enumerate(toks):
        if (
            t.start < pos
            or t.kind != "word"
            or t.text.lower() not in names
            or i + 1 >= len(toks)
            or toks[i + 1].kind != "punct"
            or toks[i + 1].text != "("
        ):
            continue
        depth = 0
        for j in range(i + 1, len(toks)):
            tj = toks[j]
            if tj.kind == "punct" and tj.text == "(":
                depth += 1
            elif tj.kind == "punct" and tj.text == ")":
                depth -= 1
                if depth == 0:
                    return t.start, tj.end, t.text.lower()
        return None
    return None


def pred_words(sql: str, exclude: frozenset) -> set[str]:
    """Lower-cased word tokens not immediately followed by ``(`` and
    not in ``exclude`` — column candidates in a predicate (qualifier
    words included, mirroring the historical regex)."""
    toks = tokenize(sql)
    out: set[str] = set()
    for i, t in enumerate(toks):
        if t.kind != "word":
            continue
        nxt = toks[i + 1] if i + 1 < len(toks) else None
        if nxt is not None and nxt.kind == "punct" and nxt.text == "(":
            continue
        lw = t.text.lower()
        if lw not in exclude:
            out.add(lw)
    return out


def replace_words(sql: str, table: dict) -> str:
    """Literal-safe word substitution: each key (lower-case word) maps
    to ``(replacement, call_only)`` — with ``call_only`` the word must
    be immediately followed by ``(`` to rewrite (function names). A
    string literal containing the word is one token and never matches
    (round-8: retires the masked regex passes in rewrite_scalars)."""
    toks = tokenize(sql)
    out, pos = [], 0
    for i, t in enumerate(toks):
        if t.kind != "word":
            continue
        spec = table.get(t.text.lower())
        if spec is None:
            continue
        repl, call_only = spec
        if call_only:
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if nxt is None or nxt.kind != "punct" or nxt.text != "(":
                continue
        out.append(sql[pos : t.start])
        out.append(repl)
        pos = t.end
    out.append(sql[pos:])
    return "".join(out)


def rewrite_subscripts(sql: str) -> str:
    """1-based ``base[expr]`` → ``element_at(base, expr)`` as a token
    splice (round-8, retiring the masked ``_SUBSCRIPT_RE`` pass): the
    base is a word or dotted pair directly before ``[`` (same grammar
    as the historical regex — calls like ``f(x)[1]`` stay untouched),
    innermost-first so ``a[b[1]]`` resolves, and a literal ``'a[1]'``
    is one string token that can never trigger the rewrite. ``ARRAY[…]``
    constructors are excluded (the regex would have mangled them)."""
    while True:
        toks = tokenize(sql)
        # innermost-first: the LAST '[' opener seen before its closer
        spans = []  # (open tok idx, close tok idx)
        stack = []
        for i, t in enumerate(toks):
            if t.kind != "punct":
                continue
            if t.text == "[":
                stack.append(i)
            elif t.text == "]" and stack:
                spans.append((stack.pop(), i))
        done = True
        # spans are emitted innermost-first within each nest
        for oi, ci in spans:
            base_start = None
            bi = oi - 1
            if bi >= 0 and toks[bi].kind in ("word", "qident"):
                if toks[bi].kind == "word" and toks[bi].up() == "ARRAY":
                    continue
                base_start = toks[bi].start
                if (
                    bi >= 2
                    and toks[bi - 1].kind == "punct"
                    and toks[bi - 1].text == "."
                    and toks[bi - 2].kind in ("word", "qident")
                ):
                    base_start = toks[bi - 2].start
            if base_start is None:
                continue
            # inner content must not itself contain a '[' (resolve the
            # nested one first on the next pass — it appears earlier in
            # spans, so this branch is only a guard)
            if any(
                toks[k].kind == "punct" and toks[k].text == "["
                for k in range(oi + 1, ci)
            ):
                continue
            base = sql[base_start : toks[oi].start].rstrip()
            inner = sql[toks[oi].end : toks[ci].start]
            sql = (
                sql[:base_start]
                + f"element_at({base}, {inner.strip()})"
                + sql[toks[ci].end :]
            )
            done = False
            break
        if done:
            return sql


# -- FROM-clause shape walkers (round-9, retiring the compiler's
# -- _JOIN_RE/_CROSS_JOIN_RE/_TABLE_RE and the frontend's _ASOF_RE) ---------

_JOIN_SPEC_WORDS = frozenset(
    "join inner left right full outer semi anti cross".split()
)
_JOIN_HOWS = {
    ("join",): "inner",
    ("inner", "join"): "inner",
    ("left", "join"): "left",
    ("left", "outer", "join"): "left",
    ("right", "join"): "right",
    ("right", "outer", "join"): "right",
    ("full", "join"): "full",
    ("full", "outer", "join"): "full",
    ("left", "semi", "join"): "semi",
    ("left", "anti", "join"): "anti",
    ("cross", "join"): "cross",
}


def _name_alias(toks, i, stop_words):
    """Read ``name [AS alias | alias]`` starting at token ``i`` where
    the name must be a PLAIN word (no dots, no call parens — the IVM
    recognizer grammar). Returns (name, alias, next_index) or None."""
    def w(j):
        return (
            toks[j].text.lower()
            if j < len(toks) and toks[j].kind == "word"
            else None
        )

    if w(i) is None:
        return None
    # a dotted or called name is outside the recognizer grammar
    if i + 1 < len(toks) and toks[i + 1].kind == "punct" and toks[
        i + 1
    ].text in (".", "("):
        return None
    name = toks[i].text
    i += 1
    alias = None
    if w(i) == "as":
        if w(i + 1) is None:
            return None
        alias = toks[i + 1].text
        i += 2
    elif w(i) is not None and w(i) not in stop_words:
        alias = toks[i].text
        i += 1
    return name, alias, i


def single_join(frm: str):
    """Parse a FROM-clause body that is exactly one of::

        t [AS a]
        t1 [AS a] [join-spec] JOIN t2 [AS b] ON <cond>
        t1 [AS a] CROSS JOIN t2 [AS b]

    (plain undotted relation names — the IVM recognizer grammar).
    Returns ``{"kind": "table"|"join"|"cross", ...}`` with lowercase
    ``how`` normalized (``inner/left/right/full/semi/anti``) and ``on``
    the raw condition tail text, or None when the body is any other
    shape (subqueries, comma lists, chained joins, dotted names).
    Token-walking replaces the regex row: a string literal anywhere in
    the ON tail is a single token and cannot shift the structure."""
    toks = tokenize(frm)

    def w(j):
        return (
            toks[j].text.lower()
            if j < len(toks) and toks[j].kind == "word"
            else None
        )

    got = _name_alias(toks, 0, _JOIN_SPEC_WORDS)
    if got is None:
        return None
    lt, la, i = got
    if i == len(toks):
        return {"kind": "table", "lt": lt, "la": la}
    spec: list[str] = []
    while i < len(toks) and w(i) in _JOIN_SPEC_WORDS:
        spec.append(w(i))
        i += 1
        if spec[-1] == "join":
            break
    how = _JOIN_HOWS.get(tuple(spec))
    if how is None:
        return None
    got = _name_alias(toks, i, frozenset(("on",)))
    if got is None:
        return None
    rt, ra, i = got
    if how == "cross":
        if i != len(toks):
            return None
        return {"kind": "cross", "lt": lt, "la": la, "rt": rt, "ra": ra}
    if w(i) != "on" or i + 1 >= len(toks):
        return None
    return {
        "kind": "join",
        "how": how,
        "lt": lt,
        "la": la,
        "rt": rt,
        "ra": ra,
        "on": frm[toks[i + 1].start :],
    }


def single_table(frm: str):
    """``t [AS a]`` (plain undotted name) → (t, alias_or_None); None
    for any other FROM-body shape."""
    got = single_join(frm)
    if got is None or got["kind"] != "table":
        return None
    return got["lt"], got["la"]


def agg_call(expr: str, names: frozenset):
    """``expr`` is exactly ONE call ``name(args)`` with ``name`` in
    ``names`` (case-insensitive) and the argument parens balanced to
    the very end of the text — returns ``(name_lower, args_text)``,
    else None. The token walk makes the old post-hoc balance scan
    unnecessary: ``SUM(a) / SUM(b)`` fails because the first call's
    close paren is not the final token."""
    toks = tokenize(expr)
    if (
        len(toks) < 3
        or toks[0].kind != "word"
        or toks[0].text.lower() not in names
        or toks[1].kind != "punct"
        or toks[1].text != "("
    ):
        return None
    if _skip_parens(toks, 1) != len(toks):
        return None
    return toks[0].text.lower(), expr[toks[1].end : toks[-1].start]


def find_asof(sql: str):
    """Locate the first ``FROM lt [AS la] LEFT ASOF JOIN rt [AS ra]
    MATCH_CONDITION (`` head (round-9, retiring the frontend's
    ``_ASOF_RE``): returns ``{"start": <offset of FROM>, "lt", "la",
    "rt", "ra", "mc_open": <offset of the '(' after MATCH_CONDITION>}``
    or None. Token-walking means the pattern inside a string literal
    can never match."""
    toks = tokenize(sql)

    def w(j):
        return (
            toks[j].text.lower()
            if j < len(toks) and toks[j].kind == "word"
            else None
        )

    for f, t in enumerate(toks):
        if t.kind != "word" or t.text.lower() != "from":
            continue
        got = _name_alias(toks, f + 1, frozenset(("left", "asof")))
        if got is None:
            continue
        lt, la, i = got
        if (w(i), w(i + 1), w(i + 2)) != ("left", "asof", "join"):
            continue
        got = _name_alias(toks, i + 3, frozenset(("match_condition",)))
        if got is None:
            continue
        rt, ra, i = got
        if w(i) != "match_condition":
            continue
        if not (
            i + 1 < len(toks)
            and toks[i + 1].kind == "punct"
            and toks[i + 1].text == "("
        ):
            continue
        return {
            "start": t.start,
            "lt": lt,
            "la": la,
            "rt": rt,
            "ra": ra,
            "mc_open": toks[i + 1].start,
        }
    return None
