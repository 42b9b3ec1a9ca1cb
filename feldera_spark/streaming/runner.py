"""Structured Streaming runner: readStream → incremental views → sinks.

The reference's execution loop (``controller.rs:481,745-766`` +
``dbsp_handle.rs:1712``): accumulate an input delta, run ONE synchronous
step through the whole circuit in topological order, push output deltas.

Spark mapping: ``readStream`` + ``foreachBatch``. Each micro-batch is the
step's input delta; inside ``foreachBatch`` we drive the same
``IncrementalView`` objects used in batch mode (delta rules are engine
code, not mode-specific), in declaration (topological) order — so
per-micro-batch output always equals batch recomputation of the prefix,
the reference's consistency guarantee (``README.md:67-70``).

Checkpointing/exactly-once of the stream source is Spark-native
(``checkpointLocation``); view state lives in the IncrementalViews
(checkpointed DataFrames locally; Delta tables on a cluster).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from feldera_spark.streaming.watermark import Waterline


class StreamingPipeline:
    """One streaming source feeding a chain of incremental views.

    ``views`` is an ordered list of (name, step_fn) where ``step_fn``
    takes the (lateness-filtered) delta DataFrame for this micro-batch.
    """

    def __init__(
        self,
        views: list[tuple[str, Callable[[DataFrame], None]]],
        waterline: Waterline | None = None,
        state_dir: str | None = None,
        spark=None,
        checkpoint_every: int = 1,
    ):
        """``views`` entries are (name, step_fn) or (name, view_object)
        — an object with a ``.step`` method. Passing the objects enables
        durable state: with ``state_dir`` set, every ``checkpoint_every``
        micro-batches the views' state is committed via
        ``PipelineCheckpointer`` and, on construction, the newest
        committed checkpoint is restored and already-committed batch ids
        are skipped when Spark's source checkpoint replays them — the
        exactly-once restart contract (reference
        ``controller/checkpoint.rs``; see streaming/checkpoint.py)."""
        self.views = [
            (name, v.step if hasattr(v, "step") else v) for name, v in views
        ]
        self._view_objects = {
            name: v for name, v in views if hasattr(v, "step")
        }
        self.waterline = waterline
        self.batches_seen = 0
        self.committed_batch_id = -1
        self.checkpoint_every = checkpoint_every
        self._ckpt = None
        if state_dir is not None:
            from feldera_spark.streaming.checkpoint import PipelineCheckpointer

            assert spark is not None, "state_dir requires the spark session"
            missing = [n for n, _ in views if n not in self._view_objects]
            assert not missing, (
                f"state_dir requires view OBJECTS (with .step), got bare "
                f"functions for: {missing}"
            )
            self._ckpt = PipelineCheckpointer(state_dir)
            meta = self._ckpt.restore(spark, self._view_objects)
            if meta is not None:
                self.committed_batch_id = meta["batch_id"]
                wl = meta["extra"].get("waterline_max_ts")
                if wl is not None and self.waterline is not None:
                    import datetime as _dt

                    self.waterline.max_ts = _dt.datetime.fromisoformat(wl)

    def process_batch(self, delta: DataFrame, batch_id: int | None = None) -> None:
        """One synchronous step: lateness filter, then every view in order."""
        if batch_id is not None and batch_id <= self.committed_batch_id:
            return  # replay of an already-committed batch after restart
        if self.waterline is not None:
            delta = self.waterline.step(delta)
        for _name, step_fn in self.views:
            step_fn(delta)
        self.batches_seen += 1
        if (
            self._ckpt is not None
            and batch_id is not None
            and (batch_id + 1) % self.checkpoint_every == 0
        ):
            extra = {}
            if self.waterline is not None and self.waterline.max_ts is not None:
                extra["waterline_max_ts"] = self.waterline.max_ts.isoformat()
            self._ckpt.commit(batch_id, self._view_objects, extra)
            self.committed_batch_id = batch_id

    # -- transactions --------------------------------------------------------
    # Reference: ``start_transaction`` / ``commit_transaction``
    # (``python/feldera/pipeline.py:878``, ``feldera-types/src/
    # transaction.rs``): multiple input pushes become ONE atomic step —
    # downstream views never observe a partial transaction. Here: buffer
    # deltas while a transaction is open; commit unions them into a
    # single delta and runs one synchronous step.

    def start_transaction(self) -> None:
        assert not hasattr(self, "_txn_buffer") or self._txn_buffer is None, (
            "transaction already open"
        )
        self._txn_buffer: list[DataFrame] | None = []

    def push(self, delta: DataFrame) -> None:
        """Push a delta — buffered if a transaction is open, else one step."""
        if getattr(self, "_txn_buffer", None) is not None:
            self._txn_buffer.append(delta)
        else:
            self.process_batch(delta)

    def commit_transaction(self) -> None:
        buf, self._txn_buffer = self._txn_buffer, None
        assert buf is not None, "no open transaction"
        if buf:
            delta = buf[0]
            for d in buf[1:]:
                delta = delta.unionByName(d)
            self.process_batch(delta)

    def rollback_transaction(self) -> None:
        assert getattr(self, "_txn_buffer", None) is not None, "no open transaction"
        self._txn_buffer = None

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        trigger_available_now: bool = True,
    ) -> StreamingQuery:
        """Attach to a streaming DataFrame via foreachBatch."""
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
