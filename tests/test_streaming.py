"""True Structured Streaming execution (SURVEY.md §2.9, §5).

The correctness gate checks the batch twins (queries/streaming.py); these
tests run the SAME plans through ``readStream`` file replay and assert the
micro-batch results equal the batch results — the unified-model guarantee
the streaming tier rests on. Also exercises the stateful dedup and the
foreachBatch sink (the streaming twin of the reference's bulk-load sink,
dags/create-data-lake.py:54-61).
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_covid19_brasil_spark.io import load_table
from etl_covid19_brasil_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF, "events")


@pytest.fixture(scope="module")
def stream_events(spark):
    return jobs.file_replay_stream(spark, SF)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_stream_equals_batch(spark, stream_df, batch_df, name, mode="complete"):
    q = jobs.run_to_memory(stream_df, name, mode=mode)
    try:
        got = _sorted(spark.table(name).toPandas())
        want = _sorted(batch_df.toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        q.stop()


def test_tumbling_counts_matches_batch(spark, stream_events, batch_events):
    _assert_stream_equals_batch(
        spark,
        jobs.tumbling_counts(stream_events),
        jobs.tumbling_counts(batch_events),
        "t_tumbling",
    )


def test_sliding_sum_matches_batch(spark, stream_events, batch_events):
    _assert_stream_equals_batch(
        spark,
        jobs.sliding_value_sum(stream_events),
        jobs.sliding_value_sum(batch_events),
        "t_sliding",
    )


def test_session_counts_matches_batch(spark, stream_events, batch_events):
    _assert_stream_equals_batch(
        spark,
        jobs.session_counts(stream_events),
        jobs.session_counts(batch_events),
        "t_session",
    )


def test_dedup_within_watermark(spark, stream_events, batch_events):
    q = jobs.run_to_memory(
        jobs.dedup_within_watermark(stream_events), "t_dedup", mode="append"
    )
    try:
        got = spark.table("t_dedup").count()
        want = batch_events.dropDuplicates(["event_id"]).count()
        assert got == want
    finally:
        q.stop()


def test_foreach_batch_parquet_sink(spark, stream_events, batch_events, tmp_path):
    out = str(tmp_path / "events_sink")
    q = jobs.run_foreach_batch_parquet(
        jobs.dedup_within_watermark(stream_events), out
    )
    try:
        landed = spark.read.parquet(out)
        assert landed.count() == batch_events.dropDuplicates(["event_id"]).count()
        assert set(landed.columns) == set(batch_events.columns)
    finally:
        q.stop()


def test_arbitrary_state_running_totals(spark, batch_events):
    """applyInPandasWithState totals must converge to the batch groupBy."""
    import pyspark.sql.functions as F

    stream = jobs.file_replay_stream(spark, SF, files_per_trigger=1)
    q = jobs.run_to_memory(jobs.running_user_totals(stream), "t_state", mode="update")
    try:
        # update-mode memory sink appends every state snapshot; the final
        # snapshot per user is the one with the highest n_events
        got = (
            spark.table("t_state")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value_cents").alias("total_value_cents"),
            )
        )
        want = batch_events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
        )
        g = {r["user_id"]: (r["n_events"], r["total_value_cents"]) for r in got.collect()}
        w = {r["user_id"]: (r["n_events"], r["total_value_cents"]) for r in want.collect()}
        assert g == w
    finally:
        q.stop()


@pytest.mark.slow  # full-lane tier (r15): >10 s wall-clock
def test_late_data_beyond_watermark_is_dropped(spark, tmp_path):
    """Watermark discard semantics (SURVEY.md §2.9 late_data): once the
    watermark passes a window's end, a late row for it is dropped and the
    already-finalized window does NOT change."""
    import time

    import pyspark.sql.functions as F

    stage = tmp_path / "late_stage"
    stage.mkdir()

    def land(name, rows):
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_{name}"))
        src = next((tmp_path / f"_{name}").glob("*.parquet"))
        (stage / f"{name}.parquet").write_bytes(src.read_bytes())

    import datetime as dt

    t = dt.datetime(2024, 1, 1, 10, 0, 0)

    land("f1", [(t, "a"), (t + dt.timedelta(minutes=1), "a"),
                (t + dt.timedelta(hours=1), "b")])

    schema = spark.read.parquet(str(stage)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage))
    )
    agg = jobs.tumbling_counts(stream, watermark="10 minutes")
    q = agg.writeStream.outputMode("append").format("memory").queryName("t_late").start()
    try:
        q.processAllAvailable()
        # late row for the already-closed 10:00 window + a fresh row
        land("f2", [(t + dt.timedelta(minutes=2), "a"),
                    (t + dt.timedelta(hours=2), "c")])
        time.sleep(0.2)
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in spark.table("t_late").collect()
        }
        # the 10:00-10:05 'a' window finalized with 2 rows; the late third
        # row (10:02, arriving when the watermark was 10:50) is discarded
        assert got[(t, "a")] == 2
    finally:
        q.stop()


class _FakeValueState:
    """Key-scoped ValueState twin: the engine hands each processor an
    implicitly-current-key view of the state store; the fake does the
    same via the handle's ``current_key``."""

    def __init__(self, handle, name):
        self._handle, self._name = handle, name

    def _store(self):
        return self._handle._values.setdefault(self._name, {})

    def exists(self):
        return self._handle.current_key in self._store()

    def get(self):
        return self._store()[self._handle.current_key]

    def update(self, value):
        self._store()[self._handle.current_key] = tuple(value)

    def clear(self):
        self._store().pop(self._handle.current_key, None)


class _FakeProcessorHandle:
    """In-process twin of ``StatefulProcessorHandle`` — value state plus
    event-time timers, both scoped to ``current_key`` exactly as the
    transformWithState state server scopes them to the grouping key.
    Lets the processor lifecycle (init / handleInputRows /
    handleExpiredTimer) run without the state server's protobuf wire
    format, so the processor semantics are verified in this sandbox."""

    def __init__(self):
        self._values = {}  # state name -> {key: tuple}
        self._timers = {}  # key -> set of expiry ms
        self.current_key = None

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return _FakeValueState(self, name)

    def registerTimer(self, expiry_ms):
        self._timers.setdefault(self.current_key, set()).add(int(expiry_ms))

    def deleteTimer(self, expiry_ms):
        self._timers.get(self.current_key, set()).discard(int(expiry_ms))

    def listTimers(self):
        return iter(sorted(self._timers.get(self.current_key, set())))

    def expired(self, watermark_ms):
        """(key, expiry) pairs whose timer the watermark has passed."""
        out = []
        for key, timers in self._timers.items():
            for t in sorted(timers):
                if t <= watermark_ms:
                    out.append((key, t))
        for key, t in out:
            self._timers[key].discard(t)
        return out


def _replay_batches(events_pdf, n_batches):
    """Deterministic event-time-ordered split into micro-batches — the
    same shape file_replay_stream_split feeds the real engine."""
    ordered = events_pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    size = max(len(ordered) // n_batches, 1)
    return [ordered.iloc[i : i + size] for i in range(0, len(ordered), size)]


def test_transform_with_state_totals(spark, batch_events):
    """transformWithStateInPandas (Spark 4 explicit-state API) must
    converge to the same per-user totals as the batch groupBy and the
    applyInPandasWithState twin.

    Always runs: the Totals processor (jobs.make_totals_processor) is
    driven through a fake StatefulProcessorHandle over replayed
    micro-batches — full processor semantics minus the state server's
    protobuf wire format. Where protobuf IS installed, the same
    processor additionally runs on the real engine with the RocksDB
    state store and must agree."""
    import pyspark.sql.functions as F

    events = batch_events.select("user_id", "ts", "value").toPandas()
    want = {
        r["user_id"]: (r["n_events"], r["total_value_cents"])
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .collect()
    }

    proc = jobs.make_totals_processor()
    handle = _FakeProcessorHandle()
    proc.init(handle)
    latest = {}
    for batch in _replay_batches(events, n_batches=4):
        for uid, group in batch.groupby("user_id"):
            handle.current_key = (int(uid),)
            for out in proc.handleInputRows(handle.current_key, iter([group]), None):
                for row in out.itertuples():
                    latest[int(row.user_id)] = (
                        int(row.n_events),
                        int(row.total_value_cents),
                    )
    proc.close()
    assert latest == want

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        return  # engine integration needs the state server's protobuf

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = jobs.file_replay_stream(spark, SF, files_per_trigger=1)
        q = jobs.run_to_memory(
            jobs.user_value_state_totals(stream), "t_tws", mode="update"
        )
        try:
            got = (
                spark.table("t_tws")
                .groupBy("user_id")
                .agg(
                    F.max("n_events").alias("n_events"),
                    F.max("total_value_cents").alias("total_value_cents"),
                )
            )
            want = batch_events.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "total_value_cents"
                ),
            )
            g = {r["user_id"]: (r["n_events"], r["total_value_cents"]) for r in got.collect()}
            w = {r["user_id"]: (r["n_events"], r["total_value_cents"]) for r in want.collect()}
            assert g == w
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_interval_join_matches_batch(spark, batch_events):
    # Stream-stream joins buffer BOTH sides in state; replay each side as
    # its own file-source stream and require append-mode equality with
    # the batch range join.
    left = jobs.file_replay_stream(spark, SF)
    right = jobs.file_replay_stream(spark, SF)
    _assert_stream_equals_batch(
        spark,
        jobs.interval_join_click_purchase(left, right),
        jobs.interval_join_click_purchase(batch_events, batch_events),
        "t_interval_join",
        mode="append",
    )


def test_static_enrich_matches_batch(spark, stream_events, batch_events):
    customer = load_table(spark, SF, "customer")
    _assert_stream_equals_batch(
        spark,
        jobs.static_enrich_segment_sums(stream_events, customer),
        jobs.static_enrich_segment_sums(batch_events, customer),
        "t_static_enrich",
    )


@pytest.mark.slow  # full-lane tier (r15): >10 s wall-clock
def test_inactivity_timers_fire_and_are_correct(spark):
    """Event-time timers: sessions closed by the ABSENCE of events. The
    split replay advances the watermark across batches, so users idle for
    > gap get a timer-fired summary; every emitted row must be consistent
    with the batch event log (correct last_seen, no activity inside the
    gap, exact event count and cents up to that point).

    Always runs: the Inactivity processor (jobs.make_inactivity_processor)
    is driven through the fake handle with real watermark advancement and
    timer firing between micro-batches. Where protobuf is installed the
    same processor additionally runs on the real engine (RocksDB store)
    and its output passes the identical consistency checks."""
    import pandas as pd
    import pyspark.sql.functions as F

    events = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            (F.col("ts").cast("double") * 1000).cast("long").alias("ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )
    gap_ms = 60 * 60_000

    def check_fired(fired):
        assert len(fired) > 0, "no timers fired — watermark never advanced past an idle gap"
        for row in fired.itertuples():
            mine = events[events["user_id"] == row.user_id].sort_values("ms")
            # last_seen is a real event time for this user
            assert (mine["ms"] == row.last_seen_ms).any()
            # the user was genuinely idle through the fired gap
            inside = mine[
                (mine["ms"] > row.last_seen_ms) & (mine["ms"] < row.last_seen_ms + gap_ms)
            ]
            assert inside.empty
            # count + cents match the prefix of events up to last_seen (state
            # accumulates from stream start or the previous fired timeout)
            upto = mine[mine["ms"] <= row.last_seen_ms]
            assert row.n_events <= len(upto)
            prefix = upto.tail(int(row.n_events))
            assert int(prefix["cents"].sum()) == row.value_cents

    # --- fake-handle replay: watermark advances batch-over-batch (delay
    # 0s, as in user_inactivity_timeouts), expired timers fire between
    # batches exactly as the engine fires them
    raw = load_table(spark, SF, "events").select("user_id", "ts", "value").toPandas()
    proc = jobs.make_inactivity_processor(gap_minutes=60)
    handle = _FakeProcessorHandle()
    proc.init(handle)
    fired_rows = []

    def fire(watermark_ms):
        for key, _expiry in handle.expired(watermark_ms):
            handle.current_key = key
            for out in proc.handleExpiredTimer(key, None, None):
                fired_rows.append(out)

    watermark = -1
    for batch in _replay_batches(raw, n_batches=5):
        fire(watermark)  # engine fires on the PREVIOUS batch's watermark
        for uid, group in batch.groupby("user_id"):
            handle.current_key = (int(uid),)
            list(proc.handleInputRows(handle.current_key, iter([group]), None))
        watermark = max(watermark, int(batch["ts"].astype("int64").max() // 1_000_000))
    fire(watermark)
    proc.close()
    assert fired_rows, "no timers fired — watermark never advanced past an idle gap"
    check_fired(pd.concat(fired_rows, ignore_index=True))

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        return  # engine integration needs the state server's protobuf

    # transformWithState needs multiple state column families (values +
    # timers) — RocksDB only; the default HDFSBacked provider rejects it
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = jobs.file_replay_stream_split(spark, SF, n_files=5)
        q = jobs.run_to_memory(
            jobs.user_inactivity_timeouts(stream, gap_minutes=60),
            "t_timers",
            mode="append",
        )
        try:
            fired = spark.table("t_timers").toPandas()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    check_fired(fired)


def test_inactivity_timeout_pandas_state_fires_and_is_correct(spark):
    """The applyInPandasWithState twin of the timer test — runs in this
    sandbox (no protobuf state server involved): idle users get exactly
    one summary per closed session, consistent with the batch event log."""
    import pyspark.sql.functions as F

    stream = jobs.file_replay_stream_split(spark, SF, n_files=5)
    q = jobs.run_to_memory(
        jobs.user_inactivity_timeouts_pandas_state(stream, gap_minutes=60),
        "t_pandas_timeouts",
        mode="append",
    )
    try:
        fired = spark.table("t_pandas_timeouts").toPandas()
    finally:
        q.stop()

    assert len(fired) > 0, "no timeouts fired — watermark never advanced past an idle gap"

    events = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            (F.col("ts").cast("double") * 1000).cast("long").alias("ms"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )
    gap_ms = 60 * 60_000
    for row in fired.itertuples():
        mine = events[events["user_id"] == row.user_id].sort_values("ms")
        assert (mine["ms"] == row.last_seen_ms).any()
        inside = mine[(mine["ms"] > row.last_seen_ms) & (mine["ms"] < row.last_seen_ms + gap_ms)]
        assert inside.empty
        upto = mine[mine["ms"] <= row.last_seen_ms]
        assert row.n_events <= len(upto)
        prefix = upto.tail(int(row.n_events))
        assert int(prefix["cents"].sum()) == row.value_cents


@pytest.mark.slow  # full-lane tier (r15): >10 s wall-clock
def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stop/restart against the same checkpoint must resume from the
    recorded offsets: files processed before the stop are NOT reprocessed,
    and the parquet sink ends up with exactly one copy of every input row
    — the exactly-once contract a 100 TB ingest pipeline restarts rely on."""
    import datetime as dt

    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_{name}"))
        blob = next((tmp_path / f"_{name}").glob("*.parquet"))
        (src / f"{name}.parquet").write_bytes(blob.read_bytes())

    t = dt.datetime(2024, 1, 1, 9, 0, 0)
    land("f1", [(1, t), (2, t + dt.timedelta(minutes=1))])

    schema = spark.read.parquet(str(src)).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    land("f2", [(3, t + dt.timedelta(minutes=2)), (4, t + dt.timedelta(minutes=3))])
    q = start()
    q.processAllAvailable()
    q.stop()

    landed = spark.read.parquet(out)
    ids = sorted(r["event_id"] for r in landed.collect())
    assert ids == [1, 2, 3, 4], ids  # each row exactly once across the restart


def test_rate_stream_feeds_windowed_aggregation(spark):
    """The broker-less rate-micro-batch source must drive the same
    windowed jobs the file-replay source does: run three deterministic
    micro-batches through tumbling_counts and check exact totals."""
    stream = jobs.rate_stream(spark, rows_per_batch=90, num_partitions=3)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    q = (
        jobs.tumbling_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_rate")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.table("t_rate").toPandas()
    # rate-micro-batch with availableNow lands all backlog rows; counts
    # split 30/30/30 across the three event types
    assert int(got["n_events"].sum()) == 90
    assert set(got["event_type"]) == {"click", "view", "purchase"}


def test_kafka_stream_constructor_projects_envelope(spark):
    """format('kafka') needs a connector jar + broker at start(); the
    declared projection (the part this repo owns) must still resolve to
    the documented envelope schema at construction time."""
    try:
        df = jobs.kafka_stream(spark, "broker:9092", "events")
    except Exception as exc:
        # ONLY the connector-jar-missing error may be swallowed (ADVICE
        # r5): any other failure in kafka_stream (bad option, select
        # error) must surface, not silently skip the schema assertion
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
            return
        raise
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "ts",
    ]


def test_windowed_topk_stream_matches_batch(spark, stream_events):
    """The incremental half of stream_windowed_topk (windowed counts) runs
    as a REAL stream; the per-window re-rank applied to its final state
    must equal the registered batch query — the foreachBatch-re-rank
    contract the query's docstring claims."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.queries.streaming import stream_windowed_topk

    counts = (
        stream_events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    q = jobs.run_to_memory(counts, "t_win_topk_counts", mode="complete")
    try:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        got = (
            spark.table("t_win_topk_counts")
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 2)
        )
        want = stream_windowed_topk(spark, SF)
        pd.testing.assert_frame_equal(
            _sorted(got.toPandas()), _sorted(want.toPandas()), check_dtype=False
        )
    finally:
        q.stop()


def test_available_now_backfill_drains_and_terminates(spark, stream_events, batch_events):
    """Trigger.AvailableNow: the job must consume ALL files pending at
    start (multiple micro-batches under maxFilesPerTrigger=1), produce
    exactly the batch answer, and terminate WITHOUT an external stop —
    the bounded-backfill contract that distinguishes it from a
    continuous trigger."""
    finished = jobs.run_backfill_available_now(
        jobs.tumbling_counts(stream_events), "t_backfill_avnow"
    )
    assert finished, "AvailableNow query did not self-terminate"
    got = _sorted(spark.table("t_backfill_avnow").toPandas())
    want = _sorted(jobs.tumbling_counts(batch_events).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_foreach_batch_upsert_batch_split_invariance(spark):
    """Last-write-wins upsert must be associative across micro-batch
    splits: replaying as 1 batch and as 4 time-ordered batches must
    produce the identical final store (the invariant that makes the
    foreachBatch MERGE correct under any trigger cadence / restart
    slicing)."""
    from etl_covid19_brasil_spark.streaming.jobs import run_foreach_batch_upsert

    sf = "/root/testdata/sf0.001"
    one = run_foreach_batch_upsert(spark, sf, n_files=1).toPandas()
    four = run_foreach_batch_upsert(spark, sf, n_files=4).toPandas()
    key = ["user_id"]
    a = one.sort_values(key).reset_index(drop=True)
    b = four.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_foreach_batch_upsert_checkpoint_resume(spark, tmp_path):
    """Exactly-once across RESTART: drain slices 0-1 with a real
    checkpointLocation, then land slices 2-3 and restart the SAME
    checkpoint — the source must resume from the committed offset
    (processing only the new files; pinned by counting sink
    invocations) and the final store must equal the batch
    latest-by-key over the whole corpus. This is the recovery contract
    a production foreachBatch MERGE job actually runs under."""
    import shutil
    from pathlib import Path

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.io import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    sliced = ev.withColumn(
        "__slice", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    all_slices = []
    for i in range(1, 5):
        tmp_i = tmp_path / f"_tmp_{i}"
        (
            sliced.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.parquet(str(tmp_i))
        )
        part = next(Path(tmp_i).glob("part-*.parquet"))
        dest = tmp_path / f"slice_{i - 1:03d}.parquet"
        all_slices.append((part, dest))

    stage = tmp_path / "stage"
    stage.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store_root = tmp_path / "store"
    store_root.mkdir()
    current: list[Path] = []
    batches_seen: list[int] = []

    schema = spark.read.parquet(str(all_slices[0][0])).schema
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def winners(df):
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def sink(batch_df, batch_id):
        batches_seen.append(batch_id)
        batch_win = winners(
            batch_df.select("user_id", "event_id", "ts", "event_type", "value")
        )
        if current:
            merged = winners(spark.read.parquet(str(current[0])).unionByName(batch_win))
        else:
            merged = batch_win
        new = store_root / f"v{batch_id}"
        merged.write.mode("overwrite").parquet(str(new))
        old = current[:]
        current.clear()
        current.append(new)
        for p in old:
            shutil.rmtree(p, ignore_errors=True)

    def run_once():
        ts_col = F.col("ts")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage))
        )
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn("ts", F.timestamp_micros(F.col("ts")))
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # phase 1: only slices 0-1 exist
    for part, dest in all_slices[:2]:
        shutil.copy(part, stage / dest.name)
    run_once()
    first_batches = len(batches_seen)
    assert first_batches >= 1

    # phase 2: land the rest, resume from the SAME checkpoint
    for part, dest in all_slices[2:]:
        shutil.copy(part, stage / dest.name)
    run_once()
    # only the NEW files were processed (no re-delivery of slices 0-1)
    assert len(batches_seen) > first_batches
    assert len(set(batches_seen)) == len(batches_seen)

    final = spark.read.parquet(str(current[0]))
    expected = winners(
        ev.select("user_id", "event_id", "ts", "event_type", "value")
    )
    key = ["user_id"]
    a = final.toPandas().sort_values(key).reset_index(drop=True)
    b = expected.toPandas().sort_values(key).reset_index(drop=True)
    assert a[["user_id", "event_id"]].equals(b[["user_id", "event_id"]])


def test_foreach_batch_upsert_recovers_from_mid_stream_crash(spark, tmp_path):
    """Kill-mid-batch fault injection (the r8 checkpoint-resume pin only
    proved clean restart): the writer crashes AFTER batch 1's store
    commit (pointer swapped) but BEFORE the engine logs the batch — the
    at-least-once window. The restart replays batch 1 with the same
    batch id; the sink's exactly-once-per-batch-id skip must apply it
    zero more times, and the final store must equal the batch
    latest-by-key oracle over the whole corpus — idempotent upsert
    proven UNDER failure, not just replay."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.streaming.jobs import run_foreach_batch_upsert

    sf = "/root/testdata/sf0.001"
    kw = dict(
        n_files=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        store_root=str(tmp_path / "store"),
        stage_dir=str(tmp_path / "stage"),
    )
    with pytest.raises(Exception, match="injected crash after batch 1"):
        run_foreach_batch_upsert(spark, sf, crash_after_batch=1, **kw)

    # crash landed with batches 0-1 applied; the store on disk must
    # already be consistent (pointer names an existing, readable store)
    store = tmp_path / "store"
    committed = (store / "CURRENT").read_text().strip()
    assert committed == "v1"
    assert (store / committed).is_dir()

    # restart from the same checkpoint + stage: batch 1 replays (offset
    # logged, commit not) and is skipped; batches 2-3 then apply
    final = run_foreach_batch_upsert(spark, sf, **kw).toPandas()

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .toPandas()
    )
    a = _sorted(final)
    b = _sorted(want)
    assert len(a) > 0
    assert a.equals(b)
