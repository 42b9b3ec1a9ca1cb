"""Pipeline program model: tables + (nested) views, evaluated on Spark.

API shape mirrors the reference's Python SDK
(``python/feldera/pipeline_builder.py:12``, ``pipeline.py:122,286,585``):
declare a program (SQL DDL or programmatic), then query materialized
views. The reference's semantics this reproduces:

- views form a DAG and may reference other views arbitrarily deep
  (``README.md:38-45``);
- ``CREATE MATERIALIZED VIEW`` persists/caches the result, ``LOCAL VIEW``
  is an internal node (``docs/sql/grammar.md:20-29``);
- multi-view common-subexpression sharing: a view used by 2+ other views
  is computed once and reused (the reference's cross-view CSE pass,
  ``CircuitOptimizer.java:102,156``) — Spark won't share across separate
  actions on its own, so shared views are ``.cache()``d;
- table properties: ``PRIMARY KEY`` → upsert normalization on ingest
  (``input_upsert.rs``), ``LATENESS`` on a column → recorded for the
  streaming evaluator (``docs/sql/streaming.md:12-19``);
- ad-hoc queries over materialized state = plain ``spark.sql`` over the
  registered views (the reference's DataFusion path,
  ``adhoc/executor.rs:11-44``).

DDL parsing is intentionally a thin dialect layer: SELECT bodies are
executed by Spark SQL itself (Catalyst implements the whole relational
surface, SURVEY §4.1); we only parse the CREATE statement shells and the
Feldera-specific annotations Spark doesn't know (LATENESS, PRIMARY KEY
shorthand, MATERIALIZED).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_CREATE_TABLE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<name>\w+)\s*\((?P<body>.*)\)\s*(?:WITH\s*\(.*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?P<kind>MATERIALIZED\s+|LOCAL\s+)?VIEW\s+(?P<name>\w+)\s+AS\s+(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_LATENESS_RE = re.compile(
    r"(?P<col>\w+)\s+[\w\(\)\, ]*?LATENESS\s+INTERVAL\s+(?P<n>\d+)\s+(?P<unit>\w+)",
    re.IGNORECASE,
)
_PK_RE = re.compile(r"(?P<col>\w+)\s+[\w\(\), ]*?PRIMARY\s+KEY", re.IGNORECASE)

_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


@dataclass
class TableDecl:
    name: str
    lateness: dict[str, int] = field(default_factory=dict)  # col -> seconds
    primary_key: list[str] = field(default_factory=list)


@dataclass
class ViewDecl:
    name: str
    sql: str | None
    fn: Callable[[SparkSession], DataFrame] | None
    materialized: bool


def split_statements(program: str) -> list[str]:
    """Split a SQL program on top-level semicolons (quote-aware)."""
    out, buf, in_str = [], [], False
    for ch in program:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


class PipelineBuilder:
    """Build a pipeline from SQL DDL and/or programmatic tables/views."""

    def __init__(self, spark: SparkSession, name: str = "pipeline"):
        self.spark = spark
        self.name = name
        self.tables: dict[str, TableDecl] = {}
        self._table_data: dict[str, DataFrame] = {}
        self.views: dict[str, ViewDecl] = {}
        self._view_order: list[str] = []

    # -- declaration ---------------------------------------------------------

    def add_table(
        self,
        name: str,
        df: DataFrame,
        lateness: dict[str, int] | None = None,
        primary_key: list[str] | None = None,
    ) -> "PipelineBuilder":
        self.tables[name] = TableDecl(name, lateness or {}, primary_key or [])
        self._table_data[name] = df
        return self

    def add_view(
        self,
        name: str,
        sql: str | None = None,
        fn: Callable[[SparkSession], DataFrame] | None = None,
        materialized: bool = True,
    ) -> "PipelineBuilder":
        assert (sql is None) != (fn is None), "exactly one of sql/fn"
        self.views[name] = ViewDecl(name, sql, fn, materialized)
        self._view_order.append(name)
        return self

    def sql(self, program: str) -> "PipelineBuilder":
        """Ingest a Feldera-style SQL program (CREATE TABLE / CREATE
        [MATERIALIZED|LOCAL] VIEW statements)."""
        for stmt in split_statements(program):
            m = _CREATE_TABLE_RE.match(stmt)
            if m:
                name = m.group("name").lower()
                body = m.group("body")
                decl = TableDecl(name)
                for lm in _LATENESS_RE.finditer(body):
                    secs = int(lm.group("n")) * _UNIT_SECONDS[lm.group("unit").lower()]
                    decl.lateness[lm.group("col").lower()] = secs
                for pm in _PK_RE.finditer(body):
                    decl.primary_key.append(pm.group("col").lower())
                self.tables[name] = decl
                continue
            m = _CREATE_VIEW_RE.match(stmt)
            if m:
                kind = (m.group("kind") or "").strip().lower()
                self.add_view(
                    m.group("name").lower(),
                    sql=m.group("body"),
                    materialized=kind != "local",
                )
                continue
            raise ValueError(f"unsupported statement: {stmt[:80]}...")
        return self

    def connect_table(self, name: str, df: DataFrame) -> "PipelineBuilder":
        """Bind data to a DDL-declared table (the 'connector' step)."""
        if name not in self.tables:
            raise KeyError(f"table {name} not declared")
        self._table_data[name] = df
        return self

    def create(self) -> "Pipeline":
        return Pipeline(self)


class Pipeline:
    """Evaluated pipeline: views registered, shared subplans cached."""

    def __init__(self, builder: PipelineBuilder):
        self.spark = builder.spark
        self.tables = builder.tables
        self.views = builder.views
        self._frames: dict[str, DataFrame] = {}

        for name, decl in builder.tables.items():
            df = builder._table_data.get(name)
            if df is None:
                raise ValueError(f"table {name} declared but no data connected")
            if decl.primary_key:
                df = self._upsert_normalize(df, decl.primary_key)
            df.createOrReplaceTempView(name)
            self._frames[name] = df

        # evaluate views in declaration order (forward references are not
        # allowed outside recursive groups — same as the reference)
        use_counts: dict[str, int] = {v: 0 for v in self.views}
        for v in self.views.values():
            if v.sql:
                for other in self.views:
                    if other != v.name and re.search(rf"\b{other}\b", v.sql):
                        use_counts[other] += 1
        for name in builder._view_order:
            decl = self.views[name]
            df = (
                self.spark.sql(decl.sql)
                if decl.sql is not None
                else decl.fn(self.spark)
            )
            # cross-view CSE: cache views consumed by 2+ downstream views
            if use_counts.get(name, 0) >= 2:
                df = df.cache()
            df.createOrReplaceTempView(name)
            self._frames[name] = df

    @staticmethod
    def _upsert_normalize(df: DataFrame, keys: list[str]) -> DataFrame:
        """PRIMARY KEY tables: last row per key wins (input_upsert.rs).
        Uses the physical row order of the source as arrival order."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.partitionBy(*keys).orderBy(
            F.monotonically_increasing_id().desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def view(self, name: str) -> DataFrame:
        return self._frames[name]

    def query(self, sql: str) -> DataFrame:
        """Ad-hoc SQL over materialized state (the DataFusion-path
        equivalent — here it's simply Spark SQL over registered views)."""
        return self.spark.sql(sql)

    def listen(self, name: str):
        """Iterator of the view's current rows (SDK ``Pipeline.listen``)."""
        return self.view(name).toLocalIterator()
