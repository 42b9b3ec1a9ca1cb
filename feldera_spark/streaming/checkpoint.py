"""Durable view-state checkpointing and exactly-once resume.

Reference: circuit checkpointing — the controller persists every
operator's state plus the step counter, and a restarted pipeline resumes
from the last committed step instead of replaying history
(``crates/dbsp/src/circuit/checkpointer.rs``,
``crates/adapters/src/controller/checkpoint.rs``).

Spark mapping: each incremental view's state frames are written to
parquet under ``<dir>/ckpt-<batch_id>/views/<view>/<component>``; scalar
state (waterline bounds, frozen-window bounds) goes into ``meta.json``,
written LAST as the commit marker — a crash mid-write leaves the
previous committed checkpoint intact. ``StreamingPipeline`` pairs this
with Spark's source ``checkpointLocation``: after a restart the source
replays the uncommitted micro-batches, ``process_batch`` skips batch ids
at or below the committed one (the standard ``foreachBatch`` idempotence
contract), and the restored state makes the pair exactly-once
end-to-end. On a cluster the directory is object storage and the parquet
writes are distributed — no driver-memory bottleneck.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import shutil

from pyspark.sql import DataFrame

from feldera_spark.streaming.incremental import Spine, _checkpoint

# view class name -> (DataFrame/Spine attribute paths, scalar meta
# attribute paths). Dotted paths traverse nested objects
# (WindowedLinearAggregateView keeps its updatable state on .inner).
_SPECS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "IncrementalLinearAggregateView": (("state",), ()),
    "IncrementalRecursiveView": (("acc",), ()),
    "AppendOnlyAggregateView": (("state",), ()),
    "IncrementalAggregateView": (("integral", "output"), ()),
    "IncrementalJoinView": (("a", "b", "output"), ()),
    "IncrementalDistinctView": (("integral",), ()),
    "IncrementalRollingAggregateView": (("integral", "output"), ()),
    "IncrementalKeyedRecomputeView": (("integral", "output"), ()),
    "IncrementalBinaryKeyedRecomputeView": (("a", "b", "output"), ()),
    "WindowedLinearAggregateView": (
        ("inner.state", "frozen"),
        ("frozen_bound",),
    ),
    "TemporalFilterView": (("integral",), ("prev_bound",)),
    # attributes here are NESTED VIEW OBJECTS (saved recursively), plus
    # the output spine; padding schemas are JSON-serializable scalars
    "IncrementalOuterJoinView": (
        ("inner", "_bk", "_semi_a", "_ak", "_semi_b", "output"),
        ("_l_schema", "_r_schema"),
    ),
}


def _get_path(obj, path: str):
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _set_path(obj, path: str, value) -> None:
    parts = path.split(".")
    for part in parts[:-1]:
        obj = getattr(obj, part)
    setattr(obj, parts[-1], value)


def _meta_encode(v):
    if isinstance(v, _dt.datetime):
        return {"__dt": v.isoformat()}
    return v


def _meta_decode(v):
    if isinstance(v, dict) and "__dt" in v:
        return _dt.datetime.fromisoformat(v["__dt"])
    return v


def _is_view_object(val) -> bool:
    return (
        not isinstance(val, (Spine, DataFrame))
        and hasattr(val, "step")
        and (
            type(val).__name__ in _SPECS
            or type(val).__name__
            in (
                "CompiledView", "CompiledSetOpView",
                "CompiledRollingView", "CompiledSessionView",
                "CompiledAsofView", "CompiledChainJoinView",
                "CompiledDistinctAggView", "CompiledGroupingSetsView",
                "CompiledRankView", "EmitFinalView", "CompiledRangeScalarView",
                "CompiledTemporalFilterView",
                "CompiledComposedNowView",
            )
        )
    )


def save_view(view, path: str) -> dict:
    """Write a view's state frames under ``path``; return its scalar meta
    (caller embeds it in the committed meta.json). Recurses into nested
    view objects (outer-join composition, SQL-compiled views)."""
    if type(view).__name__ in (
        "CompiledView", "CompiledSetOpView",
        "CompiledRollingView", "CompiledSessionView", "CompiledAsofView",
        "CompiledChainJoinView", "CompiledDistinctAggView",
        "CompiledGroupingSetsView", "CompiledRankView", "EmitFinalView", "CompiledRangeScalarView",
        "CompiledTemporalFilterView",
                "CompiledComposedNowView",
    ):
        comps = {
            name: save_view(v, f"{path}/{name}")
            if _is_view_object(v)
            else _save_spine(v, f"{path}/{name}")
            for name, v in view.state_components().items()
        }
        scalars = {}
        # emit_final wrapper: persist the emitted bound + per-source
        # observed maxima (waterline scalars)
        if hasattr(view, "_prev_bound") and view._prev_bound is not None:
            scalars["_prev_bound"] = _meta_encode(view._prev_bound)
        if hasattr(view, "_wl"):
            scalars["_wl_max"] = {
                s: _meta_encode(w.max_ts) for s, w in view._wl.items()
                if w.max_ts is not None
            }
        wl = getattr(view, "_waterline", None)
        if wl is not None and wl.max_ts is not None:
            scalars["waterline_max_ts"] = _meta_encode(wl.max_ts)
        # global-aggregate default-row bookkeeping (CompiledView)
        for attr in ("_g_live", "_g_init"):
            if hasattr(view, attr):
                scalars[attr] = getattr(view, attr)
        return {
            "class": type(view).__name__,
            "components": comps,
            "scalars": scalars,
        }
    spec = _SPECS.get(type(view).__name__)
    if spec is None:
        raise TypeError(f"not a checkpointable view: {type(view).__name__}")
    frames, metas = spec
    present, components = [], {}
    for attr in frames:
        val = _get_path(view, attr)
        if val is None or (isinstance(val, Spine) and val.empty):
            continue
        sub = f"{path}/{attr.replace('.', '__')}"
        if _is_view_object(val):
            components[attr] = save_view(val, sub)
            continue
        df = val.read() if isinstance(val, Spine) else val
        df.write.mode("overwrite").parquet(sub)
        present.append(attr)
    out = {
        "class": type(view).__name__,
        "frames": present,
        "scalars": {m: _meta_encode(_get_path(view, m)) for m in metas},
    }
    if components:
        out["components"] = components
    return out


def _save_spine(spine: Spine, path: str) -> dict:
    if spine.empty:
        return {"class": "Spine", "empty": True}
    spine.read().write.mode("overwrite").parquet(path)
    return {"class": "Spine", "empty": False}


def load_view(view, spark, path: str, meta: dict) -> None:
    """Restore state saved by ``save_view`` into a freshly-built view of
    the same configuration (in place)."""
    if meta["class"] != type(view).__name__:
        raise TypeError(
            f"checkpoint is for {meta['class']}, view is {type(view).__name__}"
        )
    if meta["class"] in (
        "CompiledView", "CompiledSetOpView",
        "CompiledRollingView", "CompiledSessionView", "CompiledAsofView",
        "CompiledChainJoinView", "CompiledDistinctAggView",
        "CompiledGroupingSetsView", "CompiledRankView", "EmitFinalView", "CompiledRangeScalarView",
        "CompiledTemporalFilterView",
                "CompiledComposedNowView",
    ):
        comps = view.state_components()
        for name, cmeta in meta["components"].items():
            sub = f"{path}/{name}"
            obj = comps[name]
            if cmeta["class"] == "Spine":
                if not cmeta.get("empty"):
                    obj.batches = [_checkpoint(spark.read.parquet(sub))]
                    # archive generations referenced by the PREVIOUS
                    # process are not this state's: the restored full
                    # copy is authoritative; the next compaction writes
                    # a fresh generation (orphans are never read)
                    obj._archive_paths = []
                    obj._spilled = False
            else:
                load_view(obj, spark, sub, cmeta)
        wl_ts = meta["scalars"].get("waterline_max_ts")
        if wl_ts is not None and getattr(view, "_waterline", None) is not None:
            view._waterline.max_ts = _meta_decode(wl_ts)
        if "_prev_bound" in meta["scalars"] and hasattr(view, "_prev_bound"):
            view._prev_bound = _meta_decode(meta["scalars"]["_prev_bound"])
        for s, enc in meta["scalars"].get("_wl_max", {}).items():
            if hasattr(view, "_wl") and s in view._wl:
                view._wl[s].max_ts = _meta_decode(enc)
        for attr in ("_g_live", "_g_init"):
            if attr in meta["scalars"] and hasattr(view, attr):
                setattr(view, attr, meta["scalars"][attr])
        return
    for attr in meta["frames"]:
        df = spark.read.parquet(f"{path}/{attr.replace('.', '__')}")
        cur = _get_path(view, attr)
        if isinstance(cur, Spine):
            # fresh() keeps the subclass (KeyedStateSpine restores as a
            # keyed state spine with the saved merged frame as its base)
            restored = cur.fresh()
            restored.batches = [df]
            _set_path(view, attr, restored)
        else:
            _set_path(view, attr, _checkpoint(df))
    for attr, cmeta in meta.get("components", {}).items():
        load_view(
            _get_path(view, attr),
            spark,
            f"{path}/{attr.replace('.', '__')}",
            cmeta,
        )
    for name, enc in meta["scalars"].items():
        _set_path(view, name, _meta_decode(enc))


class PipelineCheckpointer:
    """Generational checkpoint store for a set of named views.

    ``commit`` writes every view's state to a fresh ``ckpt-<batch_id>``
    directory, then the commit-marker ``meta.json``, then prunes older
    generations (retaining one predecessor). ``latest``/``restore`` find
    the newest COMMITTED generation — half-written checkpoints (no
    meta.json) are invisible, so restore is crash-safe at any point.
    """

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _gen_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"ckpt-{batch_id:09d}")

    def latest(self) -> tuple[int, str] | None:
        best = None
        for name in os.listdir(self.state_dir):
            m = re.fullmatch(r"ckpt-(\d+)", name)
            if not m:
                continue
            d = os.path.join(self.state_dir, name)
            if not os.path.exists(os.path.join(d, "meta.json")):
                continue  # uncommitted: crashed mid-write
            bid = int(m.group(1))
            if best is None or bid > best[0]:
                best = (bid, d)
        return best

    def commit(
        self, batch_id: int, views: dict[str, object], extra: dict | None = None
    ) -> None:
        # a durable generation must capture state AFTER the last
        # pipelined step commit landed (barrier is a no-op otherwise)
        from feldera_spark.streaming.stepper import join_flush

        join_flush()
        gen = self._gen_dir(batch_id)
        view_meta = {
            name: save_view(v, os.path.join(gen, "views", name))
            for name, v in views.items()
        }
        meta = {"batch_id": batch_id, "views": view_meta, "extra": extra or {}}
        tmp = os.path.join(gen, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(gen, "meta.json"))
        # prune generations older than the predecessor
        committed = sorted(
            int(re.fullmatch(r"ckpt-(\d+)", n).group(1))
            for n in os.listdir(self.state_dir)
            if re.fullmatch(r"ckpt-(\d+)", n)
            and os.path.exists(os.path.join(self.state_dir, n, "meta.json"))
        )
        for old in committed[:-2]:
            shutil.rmtree(self._gen_dir(old), ignore_errors=True)

    def restore(self, spark, views: dict[str, object]) -> dict | None:
        """Load the newest committed generation into ``views`` (matched by
        name; views must be freshly constructed with the same config).
        Returns the meta dict, or None if no committed checkpoint."""
        found = self.latest()
        if found is None:
            return None
        batch_id, gen = found
        with open(os.path.join(gen, "meta.json")) as f:
            meta = json.load(f)
        for name, vmeta in meta["views"].items():
            if name in views:
                load_view(
                    views[name], spark, os.path.join(gen, "views", name), vmeta
                )
        return meta
