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
    ):
        self.views = views
        self.waterline = waterline
        self.batches_seen = 0

    def process_batch(self, delta: DataFrame, batch_id: int | None = None) -> None:
        """One synchronous step: lateness filter, then every view in order."""
        if self.waterline is not None:
            delta = self.waterline.step(delta)
        for _name, step_fn in self.views:
            step_fn(delta)
        self.batches_seen += 1

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
