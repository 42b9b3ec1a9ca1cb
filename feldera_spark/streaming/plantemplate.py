"""Step plan templates: build each per-step plan tree ONCE, rebind leaves.

The reference compiles its circuit once and then steps it many times
(``dbsp_handle.rs:1712`` — the monomorphized Rust circuit pays zero plan
construction per step). A py4j driver that rebuilds every DataFrame AST
per step pays ~1000 blocking round trips per step on a 3-view DAG
(SCALE.md round-10 profile: ~1.5 s/step of pure driver phase, constant
in data volume). This module is the Spark-side fix, the round-10
verdict's named lever:

- each step-plan construction site builds its tree ONCE over MARKER
  leaves (empty LocalRelations wrapped in uniquely-named
  ``SubqueryAlias`` nodes);
- every subsequent step makes ONE py4j call into a small JVM helper
  (``feldera_spark/java/feldera/spark/PlanTemplate.java``, compiled on
  demand with the JDK's ``javac`` against pyspark's own jars and loaded
  with ``ADD JAR``) that splices the step's real leaf plans into the
  template — attribute exprIds preserved, so the rest of the tree is
  untouched — and re-wraps the result as a Dataset.

Falls back transparently to direct Python construction when javac or the
helper is unavailable, when ``spark.feldera.planTemplates=off``, when a
leaf's schema drifts from the template's, or when a rebind throws: the
``bind()`` contract is exactly "return ``build(leaves)``", just cheaper.
Markers are created with every field nullable (recursively), so the
template's analysis is valid for any actual leaf nullability.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import subprocess
import tempfile
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_JAVA_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "java",
    "feldera",
    "spark",
    "PlanTemplate.java",
)
_CLASS = "feldera.spark.PlanTemplate"
_build_lock = threading.Lock()
_marker_ids = itertools.count()

# ---------------------------------------------------------------------------
# jar build + per-session helper loading


def _pyspark_jars_glob() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")


def _jar_path() -> str | None:
    """Compile the helper (once per source hash) into a cached jar.
    Returns None when javac/jar are unavailable or compilation fails."""
    try:
        with open(_JAVA_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    digest = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"feldera_spark_planjar_{os.getuid()}"
    )
    jar = os.path.join(cache_dir, f"plantemplate-{digest}.jar")
    if os.path.exists(jar):
        return jar
    javac = shutil.which("javac")
    jar_tool = shutil.which("jar")
    if javac is None or jar_tool is None:
        return None
    with _build_lock:
        if os.path.exists(jar):
            return jar
        try:
            os.makedirs(cache_dir, exist_ok=True)
            with tempfile.TemporaryDirectory(dir=cache_dir) as tmp:
                srcdir = os.path.join(tmp, "feldera", "spark")
                os.makedirs(srcdir)
                with open(os.path.join(srcdir, "PlanTemplate.java"), "wb") as f:
                    f.write(src)
                subprocess.run(
                    [
                        javac,
                        "-nowarn",
                        "-cp",
                        _pyspark_jars_glob(),
                        os.path.join(srcdir, "PlanTemplate.java"),
                    ],
                    check=True,
                    cwd=tmp,
                    capture_output=True,
                    timeout=120,
                )
                tmp_jar = os.path.join(tmp, "out.jar")
                subprocess.run(
                    [jar_tool, "cf", tmp_jar, "feldera"],
                    check=True,
                    cwd=tmp,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp_jar, jar)  # atomic publish
            return jar
        except Exception:
            return None


def helper(spark: SparkSession):
    """The per-session JVM helper instance, or None (→ callers fall back
    to direct Python plan construction). Cached on the session object."""
    cached = getattr(spark, "_fs_plan_helper", None)
    if cached is not None:
        return cached if cached != "off" else None
    if (
        spark.conf.get("spark.feldera.planTemplates", "on").lower()
        in ("off", "false", "0")
    ):
        spark._fs_plan_helper = "off"
        return None
    try:
        jar = _jar_path()
        if jar is None:
            raise RuntimeError("no jar")
        spark.sql(f"ADD JAR file://{jar}")
        jvm = spark._jvm
        try:
            cls = (
                jvm.java.lang.Thread.currentThread()
                .getContextClassLoader()
                .loadClass(_CLASS)
            )
        except Exception:
            cls = (
                spark._jsparkSession.sharedState()
                .jarClassLoader()
                .loadClass(_CLASS)
            )
        inst = cls.newInstance()
        spark._fs_plan_helper = inst
        return inst
    except Exception:
        spark._fs_plan_helper = "off"
        return None


# ---------------------------------------------------------------------------
# schema helpers


def _all_nullable(dt: dict) -> dict:
    """Recursively mark every field/element nullable in a DataType json
    dict — markers must be analysis-valid for ANY actual leaf
    nullability (nullable=True is the conservative direction: the
    optimizer keeps null handling it could otherwise prune)."""
    if not isinstance(dt, dict):
        return dt
    t = dt.get("type")
    out = dict(dt)
    if "nullable" in out:
        out["nullable"] = True
    if t == "struct" or out.get("type") == "struct":
        if "fields" in out:
            out["fields"] = [_all_nullable(f) for f in out["fields"]]
    if "elementType" in out:
        out["containsNull"] = True
        out["elementType"] = _all_nullable(out["elementType"])
    if "valueType" in out:
        out["valueContainsNull"] = True
        out["valueType"] = _all_nullable(out["valueType"])
    if "field" in out and isinstance(out.get("field"), dict):
        out["field"] = _all_nullable(out["field"])
    return out


def _sig(schema: StructType) -> tuple:
    """Template-compatibility signature: names + types, nullability
    ignored (markers are built all-nullable)."""

    def norm(dt: dict):
        if not isinstance(dt, dict):
            return dt
        return tuple(
            sorted(
                (k, norm(v) if isinstance(v, dict) else
                 tuple(norm(x) for x in v) if isinstance(v, list) else v)
                for k, v in dt.items()
                if k not in ("nullable", "containsNull",
                             "valueContainsNull", "metadata")
            )
        )

    return tuple((f["name"], norm(f["type"]) if isinstance(f["type"], dict)
                  else f["type"]) for f in schema.jsonValue()["fields"])


# ---------------------------------------------------------------------------
# template cache

_CREATION_POOL = None


def _creation_pool():
    """ONE dedicated thread for background template creation: separate
    from the state-checkpoint pool so queued creations never delay a
    step's state builds (the flush joins those), and single so
    creations serialize — each is a burst of py4j round trips and
    overlapping them buys nothing."""
    global _CREATION_POOL
    if _CREATION_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _CREATION_POOL = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="tpl-create"
        )
    return _CREATION_POOL


def drain_creation() -> None:
    """Barrier on all queued background template creations (tests and
    deterministic A/B harnesses; the engine never needs it — binds fall
    back to direct builds until entries land)."""
    if _CREATION_POOL is not None:
        _creation_pool().submit(lambda: None).result()


class _Entry:
    __slots__ = ("template", "markers", "order", "sigs", "dead")

    def __init__(self, template, markers, order, sigs):
        self.template = template
        self.markers = markers
        self.order = order
        self.sigs = sigs
        self.dead = False


class TemplateCache:
    """Per-owner cache of plan templates.

    ``bind(key, leaves, build)`` behaves exactly like ``build(leaves)``
    — same DataFrame semantics — but after the first call per ``key``
    the tree is spliced JVM-side in one round trip instead of being
    rebuilt op-by-op over py4j. ``build`` MUST be a pure plan
    constructor: no data inspection, no persist/checkpoint, no
    step-varying literals (put those in the key or keep the site
    untemplated), and it must treat its input frames opaquely (markers
    are empty frames with the leaves' schemas)."""

    def __init__(self):
        self._t: dict = {}
        self._building: set = set()

    def bind(
        self,
        key,
        leaves: dict[str, DataFrame],
        build: Callable[[dict[str, DataFrame]], DataFrame],
    ) -> DataFrame:
        try:
            spark = next(iter(leaves.values())).sparkSession
            h = helper(spark)
        except Exception:
            h = None
        if h is None:
            return build(leaves)
        ent = self._t.get(key)
        if ent is not None and ent.dead:
            return build(leaves)
        if ent is None:
            out = build(leaves)  # first step: direct result
            # Template CREATION costs ~3x a direct build (marker
            # frames + a second build() over them + a verification
            # rebind) and used to run inline on the first step — the
            # dominant slice of a streaming pipeline's step-1/2 warm-up
            # (nx04: 1.04 s of a 1.27 s first step was bind()). It is
            # pure driver-side plan construction over immutable
            # analyzed plans, so it runs on a dedicated background
            # thread; binds keep falling back to direct builds until
            # the entry lands. Disable with
            # spark.feldera.planTemplates.async=false (creation then
            # happens inline, the pre-r12 behavior).
            if key in self._building:
                return out
            sync = (
                spark.conf.get(
                    "spark.feldera.planTemplates.async", "true"
                ).lower()
                in ("off", "false", "0")
            )
            if sync:
                try:
                    ent = self._make_entry(spark, leaves, build, out)
                except Exception:
                    ent = _Entry(None, None, None, None)
                    ent.dead = True
                self._t[key] = ent
                return out
            self._building.add(key)
            snapshot = dict(leaves)

            def _create(key=key, leaves=snapshot, build=build, out=out):
                try:
                    e = self._make_entry(spark, leaves, build, out)
                except Exception:
                    e = _Entry(None, None, None, None)
                    e.dead = True
                self._t[key] = e
                self._building.discard(key)

            _creation_pool().submit(_create)
            return out
        # no Python-side schema pre-check: fetching each leaf's schema
        # is a full analysis round trip PER LEAF PER STEP (raw state
        # plans are deep). The JVM splice verifies name+type compat
        # per column (nullability-insensitive) and throws on drift —
        # the except path marks the site dynamic, exactly as the old
        # signature mismatch did.
        try:
            return self._rebind(spark, h, ent, leaves)
        except Exception:
            ent.dead = True
            return build(leaves)

    def _make_entry(self, spark, leaves, build, direct) -> _Entry:
        order = sorted(leaves)
        tid = next(_marker_ids)
        markers = {}
        names = {}
        for n in order:
            schema = StructType.fromJson(
                _all_nullable(leaves[n].schema.jsonValue())
            )
            mname = f"__fstpl{tid}_{n}"
            markers[n] = spark.createDataFrame([], schema).alias(mname)
            names[n] = mname
        template = build(markers)
        ent = _Entry(template, names, order, None)
        # one-time verification: the rebound tree must carry the same
        # columns/types as the direct build (catches a build() that
        # depends on leaf CONTENTS or non-marker-safe construction)
        h = helper(spark)
        rebound = self._rebind(spark, h, ent, leaves)
        if _sig(rebound.schema) != _sig(direct.schema):
            raise RuntimeError("template schema mismatch vs direct build")
        return ent

    def _rebind(self, spark, h, ent: _Entry, leaves) -> DataFrame:
        gw = spark.sparkContext._gateway
        jvm = spark._jvm
        n = len(ent.order)
        arr_s = gw.new_array(jvm.java.lang.String, n)
        arr_o = gw.new_array(jvm.java.lang.Object, n)
        for i, name in enumerate(ent.order):
            arr_s[i] = ent.markers[name]
            arr_o[i] = leaves[name]._jdf
        jds = h.rebind(ent.template._jdf, arr_s, arr_o)
        return DataFrame(jds, spark)
