"""Incremental maintenance of recursive views.

Reference: the compiler runs ``DECLARE RECURSIVE VIEW`` groups as NESTED
circuits inside the incremental circuit (``crates/dbsp/src/operator/
recursive.rs:262`` — ``delta0``/``z1`` + fixpoint; ``RecursiveComponents``,
``CircuitOptimizer.java:87``; ``DBSPNestedOperator.java``), so a delta to
an input table updates the converged result incrementally instead of
re-running the fixpoint from scratch. In DBSP the Z-weights inside the
nested circuit act as derivation counts and the nested-time ``distinct``
resolves deletions.

Spark re-expression (set semantics, which is what
``docs/sql/recursion.mdx`` specifies for recursive views):

- **Insertions** are pure semi-naive from the CONVERGED state: the new
  frontier is the body evaluated with each changed table bound to its
  delta rows (a new derivation must use at least one new row, so the
  union of per-table delta bindings covers exactly the new facts);
  iterate the recursive rules on the frontier until empty. Rounds =
  depth of the NEW derivations, not the full diameter.
- **Deletions** use delete-rederive (DRed, the classic incremental
  Datalog algorithm — the support-counting alternative the verdict
  offered is what DBSP's nested weights implement natively):
  1. *Overdelete*: the cone of facts with any derivation through a
     deleted row (fixpoint over "derivable from an affected fact"),
     intersected with the converged state.
  2. Remove the cone, then *rederive*: semi-naive fixpoint from the
     reduced state re-adds every fact with a surviving derivation.
  The overdelete cone is delta-driven (bounded by the affected
  subgraph); the rederive seed pays ONE full body evaluation —
  the honest cost of rederivation without per-fact support counts.

Per-step rounds are recorded (``last_rounds`` / ``cold_rounds``) so
tests can assert incremental steps converge in far fewer rounds than the
cold start.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feldera_spark import zset
from feldera_spark.zset import WEIGHT


def _split_top_union(sql: str) -> list[str] | None:
    """Split a view body on top-level UNION [ALL]; None when EXCEPT/
    INTERSECT appear at top level (non-monotone outer shape → batch)."""
    from feldera_spark.frontend import _protect_literals

    protected, _ = _protect_literals(sql)
    parts, depth, last = [], 0, 0
    for m in re.finditer(
        r"[()]|\bUNION(?:\s+ALL)?\b|\bEXCEPT\b|\bINTERSECT\b",
        protected,
        re.IGNORECASE,
    ):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if tok.upper().startswith("UNION"):
                parts.append(sql[last : m.start()])
                last = m.end()
            else:
                return None
    parts.append(sql[last:])
    return [p.strip() for p in parts]


class IncrementalRecursiveView:
    """A ``DECLARE RECURSIVE VIEW`` maintained across input deltas.

    Conforms to the compiled-plan protocol (``sources`` /
    ``bind_schemas`` / ``step`` / ``materialized``) so
    ``Pipeline._evaluate_views`` chains its output deltas downstream
    like any other compiled view.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        sql: str,
        schema_ddl: str,
        tables: set[str],
    ):
        from feldera_spark.frontend import _protect_literals

        self.spark = spark
        self.name = name.lower()
        parts = _split_top_union(sql)
        if parts is None or len(parts) < 2:
            raise ValueError("recursive body must be a top-level UNION")
        for p in parts:
            if not re.match(r"^\s*SELECT\b", p, re.IGNORECASE):
                raise ValueError(f"non-SELECT union branch: {p[:40]!r}")
        from feldera_spark.frontend import count_table_positions

        self.rec_branches: list[str] = []
        self.base_branches: list[str] = []
        for p in parts:
            if count_table_positions(p, self.name) > 0:
                self.rec_branches.append(p)
            else:
                self.base_branches.append(p)
        if not self.rec_branches:
            raise ValueError("no self-referencing branch — not recursive")
        # declared output schema (DECLARE RECURSIVE VIEW column list)
        self.schema_ddl = schema_ddl
        self.out_cols = [
            c.strip().split()[0] for c in schema_ddl.split(",") if c.strip()
        ]
        self._types = [
            c.strip().split(None, 1)[1] for c in schema_ddl.split(",") if c.strip()
        ]
        prot_all, _ = _protect_literals(sql)
        self.sources = [
            t
            for t in tables
            if t != self.name
            and re.search(rf"\b{re.escape(t)}\b", prot_all, re.IGNORECASE)
        ]
        # occurrences per branch (conservative word count): >1 means a
        # delta binding would miss mixed new/old derivations → bind full
        self._occ: dict[tuple[int, str], int] = {}
        self.acc: DataFrame | None = None
        self.last_rounds = 0
        self.cold_rounds = 0
        self._stepped_flag = False
        self.shape = type("S", (), {"out_cols": self.out_cols})()

    # -- protocol ------------------------------------------------------------

    def bind_schemas(self, frames: dict[str, DataFrame]) -> None:
        pass  # tables resolve by name at evaluation time

    @property
    def _stepped(self) -> bool:
        return self._stepped_flag

    def materialized(self) -> DataFrame:
        assert self.acc is not None, "no deltas processed yet"
        return self.acc

    def state_components(self):
        return {}

    # -- evaluation helpers --------------------------------------------------

    def _norm(self, df: DataFrame) -> DataFrame:
        df = df.toDF(*self.out_cols)
        return df.select(
            *[
                F.col(c).cast(t).alias(c)
                for c, t in zip(self.out_cols, self._types)
            ]
        )

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], schema=self.schema_ddl)

    def _occurrences(self, branch: str, table: str) -> int:
        """RELATION-instance count (FROM/JOIN positions only): a column
        or alias sharing the view's name must not flip linear recursion
        into the naive-fallback path."""
        from feldera_spark.frontend import count_table_positions

        return count_table_positions(branch, table)

    def _eval(
        self,
        branches: list[str],
        view_df: DataFrame,
        overrides: dict[str, DataFrame] | None = None,
    ) -> DataFrame | None:
        """Union-evaluate branches with the self-reference bound to
        ``view_df`` and any ``overrides`` tables bound to the given
        frames (others resolve to the registered temp views)."""
        from feldera_spark.frontend import substitute_table_names

        mapping = {self.name: f"__rec_{self.name}_self"}
        view_df.createOrReplaceTempView(mapping[self.name])
        for t, df in (overrides or {}).items():
            tmp = f"__rec_{self.name}_d_{t}"
            df.createOrReplaceTempView(tmp)
            mapping[t] = tmp
        parts = []
        for b in branches:
            parts.append(self._norm(self.spark.sql(
                substitute_table_names(b, mapping)
            )))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def _delta_frontier(
        self, changed: dict[str, DataFrame], view_df: DataFrame
    ) -> DataFrame | None:
        """New one-step derivations from the changed tables' rows: per
        changed table, evaluate the branches referencing it with that
        table bound to its delta (full table when it occurs >1 time in a
        branch — a delta binding would miss mixed new/old derivations).
        Under set semantics the union over changed tables covers every
        derivation that uses at least one changed row."""
        parts = []
        for t, rows in changed.items():
            single, multi = [], []
            for b in self.base_branches + self.rec_branches:
                n = self._occurrences(b, t)
                if n == 1:
                    single.append(b)
                elif n > 1:
                    multi.append(b)
            if single:
                parts.append(self._eval(single, view_df, {t: rows}))
            if multi:
                parts.append(self._eval(multi, view_df))
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def _semi_naive(
        self, acc: DataFrame, frontier: DataFrame, max_rounds: int = 200
    ) -> tuple[DataFrame, DataFrame, int]:
        """Iterate the recursive rules from ``frontier`` until empty.
        Returns (new_acc, all_added, rounds). ``frontier`` must already
        be ``\\ acc``."""
        from feldera_spark.streaming.incremental import _checkpoint

        added = self._empty()
        rounds = 0
        frontier = _checkpoint(frontier)
        while frontier.limit(1).count() > 0:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError("recursive view did not converge")
            acc = _checkpoint(acc.unionByName(frontier))
            added = added.unionByName(frontier)
            nxt_parts = []
            for b in self.rec_branches:
                # linear self-reference: semi-naive (bind the frontier);
                # non-linear: bind the full acc (naive round, still
                # converges — frontier subtraction below bounds it)
                bind = (
                    frontier
                    if self._occurrences(b, self.name) == 1
                    else acc
                )
                nxt_parts.append(self._eval([b], bind))
            nxt = nxt_parts[0]
            for p in nxt_parts[1:]:
                nxt = nxt.unionByName(p)
            frontier = _checkpoint(nxt.distinct().subtract(acc))
        return acc, _checkpoint(added.distinct()), rounds

    # -- the step ------------------------------------------------------------

    def step(self, deltas: dict[str, DataFrame | None]) -> DataFrame | None:
        from feldera_spark.streaming.incremental import _checkpoint
        from feldera_spark.streaming.stepper import step_scope

        with step_scope():
            return self._step_inner(deltas)

    def _step_inner(self, deltas: dict[str, DataFrame | None]) -> DataFrame | None:
        from feldera_spark.streaming.incremental import _checkpoint

        ins: dict[str, DataFrame] = {}
        dels: dict[str, DataFrame] = {}
        for t, d in deltas.items():
            if d is None:
                continue
            d = zset.lift(d)
            ins[t] = d.filter(F.col(WEIGHT) > 0).drop(WEIGHT)
            dels[t] = d.filter(F.col(WEIGHT) < 0).drop(WEIGHT)
        if not ins and not dels:
            return None
        first = self.acc is None
        acc = self.acc if self.acc is not None else self._empty()

        has_del = (not first) and any(
            d.limit(1).count() > 0 for d in dels.values()
        )
        removed_cone = None
        if has_del:
            # -- DRed overdelete: cone of possibly-affected facts -------
            cone = self._empty()
            cur = self._delta_frontier(
                {t: d for t, d in dels.items()}, acc
            )
            cur = (
                self._empty()
                if cur is None
                else _checkpoint(cur.intersect(acc))
            )
            guard = 0
            while cur.limit(1).count() > 0:
                guard += 1
                if guard > 200:
                    raise RuntimeError("overdelete did not converge")
                cone = _checkpoint(cone.unionByName(cur).distinct())
                nxt_parts = []
                for b in self.rec_branches:
                    bind = (
                        cur if self._occurrences(b, self.name) == 1 else acc
                    )
                    nxt_parts.append(self._eval([b], bind))
                nxt = nxt_parts[0]
                for p in nxt_parts[1:]:
                    nxt = nxt.unionByName(p)
                cur = _checkpoint(
                    nxt.distinct().intersect(acc).subtract(cone)
                )
            removed_cone = cone
            acc = _checkpoint(acc.subtract(cone))
            # rederive seed: one full body evaluation over the reduced
            # state + new tables (facts with surviving derivations,
            # plus everything the insertions newly derive)
            frontier = self._eval(
                self.base_branches + self.rec_branches, acc
            )
            frontier = frontier.subtract(acc)
        else:
            # -- insert-only: delta-driven seed -------------------------
            changed = {t: d for t, d in ins.items()}
            frontier = self._delta_frontier(changed, acc)
            if frontier is None:
                return None
            frontier = frontier.subtract(acc)

        new_acc, added, rounds = self._semi_naive(acc, frontier)
        self.last_rounds = rounds
        if first:
            self.cold_rounds = rounds
        self.acc = _checkpoint(new_acc)
        self._stepped_flag = True
        # output delta for downstream chaining: net adds/removes
        if removed_cone is not None:
            net_removed = removed_cone.subtract(added)
            net_added = added.subtract(removed_cone)
        else:
            net_removed = None
            net_added = added
        parts = [zset.lift(net_added, 1)]
        if net_removed is not None:
            parts.append(zset.lift(net_removed, -1))
        return zset.plus(*parts)
