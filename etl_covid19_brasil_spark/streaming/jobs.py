"""Structured Streaming jobs over the events stream (SURVEY.md §2.9).

The reference is batch-only (schedule_interval=None,
dags/create-data-lake.py:18); this tier is the north-star extension. Each
job takes a (possibly streaming) events DataFrame so the identical plan
runs in batch tests and under ``readStream`` file replay:

    stream = file_replay_stream(spark, sf_dir)       # readStream source
    q = run_to_memory(tumbling_counts(stream), "t")  # micro-batch exec
    ...
    spark.table("t")                                  # results

Watermarks bound state: at 100 TB/day of events the 10-minute watermark
means each executor holds only the open windows, and late rows beyond it
are dropped instead of growing state forever.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window


def file_replay_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Replay events.parquet as a file-source stream.

    Copies the parquet file(s) into a temp dir (a streaming file source
    watches a directory) and reads with the batch-derived schema —
    streaming sources require an explicit schema by design (no inference
    scan on an unbounded source).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = Path(tempfile.mkdtemp(prefix="events_stream_"))
    src = Path(f"{sf_dir}/events.parquet")
    if src.is_dir():
        for i, f in enumerate(sorted(src.glob("*.parquet"))):
            shutil.copy(f, stage / f"part_{i}.parquet")
    else:
        shutil.copy(src, stage / "part_0.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(str(stage))
    )
    ts_dtype = dict(stream.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype == "timestamp_ntz":
        # timestamp_ntz -> timestamp is a relabel under the UTC session TZ;
        # withWatermark() requires TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def rate_stream(
    spark: SparkSession, rows_per_batch: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Built-in deterministic rate source (SURVEY.md §2.9 stream_source,
    non-file tier): ``rate-micro-batch`` emits exactly ``rows_per_batch``
    rows per trigger with a monotonically advancing event time — the
    broker-less generator for load tests and watermark/windowing drills.
    Output is shaped like the events table (ts TIMESTAMP, user_id,
    event_type, value) so every downstream job in this module accepts it
    unchanged.
    """
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 60_000)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.when(F.col("value") % 3 == 0, "click")
        .when(F.col("value") % 3 == 1, "view")
        .otherwise("purchase")
        .alias("event_type"),
        (F.col("value") % 1000).cast("double").alias("value"),
    )


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source constructor (SURVEY.md §2.9 stream_source, broker
    tier): declares the standard ``format("kafka")`` reader and projects
    the binary envelope to (key, value, topic, partition, offset, ts).
    Needs the spark-sql-kafka connector package on the classpath and a
    reachable broker at ``start()`` — neither exists in this sandbox, so
    this path is exercised for construction only (tests assert the
    projected schema); the downstream jobs are source-agnostic and accept
    it unchanged.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("ts"),
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 5-minute counts per event type with a late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sliding_value_sum(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Sliding 10/5-minute exact-cents value sums."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg((F.sum(cents).cast("double") / 100.0).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user (gap-based)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stateful event-id dedup with bounded state (streaming twin of the
    batch distinct; state for ids older than the watermark is dropped)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(
    df: DataFrame, name: str, mode: str = "complete", await_seconds: float = 60.0
) -> StreamingQuery:
    """Execute a streaming plan into an in-memory table and wait for all
    replayed files to drain (processAllAvailable)."""
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    return q


def run_foreach_batch_parquet(df: DataFrame, out_dir: str) -> StreamingQuery:
    """foreachBatch sink: each micro-batch lands via the ordinary batch
    writer — the streaming twin of the reference's bulk-load sink
    (dags/create-data-lake.py:54-61); swap .parquet for .jdbc for exact
    parity.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = df.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    return q


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Arbitrary stateful processing (SURVEY.md §2.9 arbitrary_state):
    per-user running totals maintained in explicit GroupState via
    ``applyInPandasWithState`` — the shape for operators windowed
    aggregation can't express (custom counters, ML feature state,
    cross-event session logic).

    State per user: (n_events, total_value_cents, last_ts). Each
    micro-batch folds its rows into the state and emits the updated
    snapshot. State is keyed and partitioned by user_id — at 100 TB the
    state store shards across executors and each task touches only its
    keys; the watermark bounds state growth via eviction on timeout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value_cents", LongType()),
            StructField("last_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            StructField("total_value_cents", LongType()),
            StructField("last_ts_us", LongType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last_us = max(last_us, int(batch_max.value // 1000))
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def make_totals_processor():
    """Build the per-user totals :class:`StatefulProcessor` used by
    :func:`user_value_state_totals`.

    Module-level (not a closure inside the job builder) so tests can
    drive the processor's ``init`` / ``handleInputRows`` lifecycle
    directly against a fake :class:`StatefulProcessorHandle` — the
    processor logic itself is pure Python over pandas batches and does
    not depend on the transformWithState state server, so its semantics
    are testable in environments where the server's protobuf wire
    format is unavailable (tests/test_streaming.py).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "totals", "n_events long, total_value_cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._st.get() if self._st.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value"].mul(100).round().sum())
            self._st.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return Totals()


def user_value_state_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful processing on the Spark 4 ``transformWithState``
    API — the successor to ``applyInPandasWithState`` with EXPLICIT state
    variables (value/list/map state, timers, TTL) instead of one opaque
    state tuple. Same workload as :func:`running_user_totals` (per-user
    event count + exact-cents value total) so the two APIs are directly
    comparable in tests.

    Scale shape is identical: state is keyed by user_id and sharded
    across executors by the state-store; per-key state here is one fixed
    (count, cents) tuple, so state size is O(distinct users) regardless
    of event volume. Requires the RocksDB state-store provider (state
    lives off-heap, checkpointed incrementally — the 100 TB posture for
    state larger than executor memory) and the protobuf package (the
    transformWithState state server's wire format; environments without
    it fall back to :func:`running_user_totals`).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_totals_processor(),
        outputStructType="user_id long, n_events long, total_value_cents long",
        outputMode="Update",
        timeMode="None",
    )


def interval_join_click_purchase(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str = "2 hours",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click matched to the same user's
    purchases landing within ``horizon`` after it.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH ends, so Spark can expire buffered rows: per executor the
    state holds only ``watermark + horizon`` worth of each stream —
    bounded at any input rate, which is what makes a stream-stream join
    runnable against 100 TB/day. On batch inputs the same plan is an
    ordinary range join (withWatermark is a no-op in batch), which is how
    the differential test checks it.
    """
    c = clicks_src.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases_src.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = c.withWatermark("click_ts", watermark)
    p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
            "lag_us"
        ),
    )


def static_enrich_segment_sums(
    events: DataFrame, customer: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a broadcast
    dimension (customer market segment), then tumbling 5-minute exact-cents
    value sums per segment.

    The static side is re-planned per micro-batch and BROADCAST — no
    stream-side shuffle for the join and no state store involvement (unlike
    stream-stream joins); the only stateful operator is the windowed agg.
    This is the standard 100 TB enrichment shape: the dimension rides the
    executors, the unbounded side streams through.
    """
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
        .select(
            "ts",
            F.coalesce(F.col("c_mktsegment"), F.lit("(none)")).alias("segment"),
            cents.alias("value_cents"),
        )
        .groupBy(F.window("ts", "5 minutes").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("value_cents").cast("double") / F.lit(100.0)).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n_events", "value_sum")
    )


def file_replay_stream_split(
    spark: SparkSession, sf_dir: str, n_files: int = 4, stage_dir: str | None = None
) -> DataFrame:
    """Like :func:`file_replay_stream`, but stages the events as
    ``n_files`` TIME-ORDERED slices so the replay produces that many
    micro-batches with an advancing watermark — required to exercise
    event-time TIMERS, which only fire when a later batch's watermark
    passes their expiry (a single-batch replay never fires any).

    ``stage_dir`` pins the staging location; if it already holds the
    staged slices they are reused verbatim. Required for checkpointed
    RESTART tests: the file-source checkpoint records processed files by
    absolute path, so a resume must see the same staging dir (a fresh
    tempdir would make every slice look unseen and replay from scratch).
    """
    import shutil

    from pyspark.sql.window import Window

    from etl_covid19_brasil_spark.io import load_table

    if stage_dir is not None:
        staged = Path(stage_dir)
        if sorted(staged.glob("slice_*.parquet")):
            return _slice_stream(spark, staged)

    # Spark-native staging (r7 — previously a full-table toPandas, the
    # last driver-transit in the tree): slice the fixture into
    # time-ordered ntiles and write each slice with Spark, renaming the
    # single part file to a controlled, ordered name so the file stream
    # source replays slices in event-time order. The global ntile window
    # is fixture-rig-only (production streams arrive from Kafka/files
    # and are never re-staged at all).
    ev = load_table(spark, sf_dir, "events")
    sliced = ev.withColumn(
        "__slice", F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    )
    stage = Path(stage_dir) if stage_dir is not None else Path(
        tempfile.mkdtemp(prefix="events_stream_split_")
    )
    stage.mkdir(parents=True, exist_ok=True)
    for i in range(1, n_files + 1):
        tmp_i = stage / f"_tmp_{i}"
        (
            sliced.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.parquet(str(tmp_i))
        )
        part = next(Path(tmp_i).glob("part-*.parquet"))
        part.rename(stage / f"slice_{i - 1:03d}.parquet")
        shutil.rmtree(tmp_i)
    return _slice_stream(spark, stage)


def _slice_stream(spark: SparkSession, stage: Path) -> DataFrame:
    schema = spark.read.parquet(str(stage / "slice_000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.col("ts")))
    # watermarks need an instant, not a wall-clock NTZ (session tz is UTC,
    # so the cast is a relabel, not a shift)
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def user_inactivity_timeouts(events: DataFrame, gap_minutes: int = 60) -> DataFrame:
    """Event-time TIMERS on transformWithState: per-user inactivity
    detection. Every input batch re-arms the user's single timer at
    ``last_seen + gap``; when the watermark passes that expiry with no
    newer event, ``handleExpiredTimer`` fires ONCE, emits the closed
    session (count + exact-cents total) and clears the state.

    This is the operator shape Structured Streaming cannot express with
    windows or dropDuplicates — output is triggered by the ABSENCE of
    data, which only a timer can observe. State per user is one fixed
    tuple plus one timer; both are state-store-sharded by key, so the
    100 TB posture is O(active users), not O(events).
    """
    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_inactivity_processor(gap_minutes),
            outputStructType="user_id long, last_seen_ms long, n_events long, value_cents long",
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def make_inactivity_processor(gap_minutes: int = 60):
    """Build the inactivity-timer :class:`StatefulProcessor` used by
    :func:`user_inactivity_timeouts`. Module-level for the same reason as
    :func:`make_totals_processor`: the timer/state logic is pure Python
    and is driven directly by a fake handle in tests where the
    transformWithState state server (protobuf wire format) is absent.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60_000

    class Inactivity(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._st = handle.getValueState("sess", "last_ms long, n long, cents long")

        def handleInputRows(self, key, rows, timerValues):
            last, n, cents = self._st.get() if self._st.exists() else (0, 0, 0)
            for pdf in rows:
                ms = pdf["ts"].astype("int64") // 1_000_000
                last = max(last, int(ms.max()))
                n += len(pdf)
                cents += int(pdf["value"].mul(100).round().sum())
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last + gap_ms)
            self._st.update((last, n, cents))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._st.exists():
                last, n, cents = self._st.get()
                self._st.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "last_seen_ms": [last],
                        "n_events": [n],
                        "value_cents": [cents],
                    }
                )

        def close(self) -> None:
            pass

    return Inactivity()


def user_inactivity_timeouts_pandas_state(
    events: DataFrame, gap_minutes: int = 60
) -> DataFrame:
    """Event-time TIMEOUT on ``applyInPandasWithState`` — the same
    absence-of-data trigger as :func:`user_inactivity_timeouts`, on the
    GroupState API (``setTimeoutTimestamp`` + ``hasTimedOut``): each batch
    re-arms the user's timeout at ``last_seen + gap``; when the watermark
    passes it with no newer event the group is invoked once WITH NO ROWS,
    emits the closed session, and removes its state. Emission happens
    only on timeout (Append mode), so downstream consumers see exactly
    one summary row per closed session.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    gap_ms = gap_minutes * 60_000
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("last_seen_ms", LongType()),
            StructField("n_events", LongType()),
            StructField("value_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ms", LongType()),
            StructField("n", LongType()),
            StructField("cents", LongType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            last, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_seen_ms": [last],
                    "n_events": [n],
                    "value_cents": [cents],
                }
            )
            return
        last, n, cents = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            ms = pdf["ts"].astype("int64") // 1_000_000
            last = max(last, int(ms.max()))
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().sum())
        state.update((last, n, cents))
        state.setTimeoutTimestamp(last + gap_ms)

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_backfill_available_now(
    df: DataFrame, name: str, mode: str = "complete", timeout_seconds: float = 120.0
) -> bool:
    """Trigger.AvailableNow catch-up run — the BACKFILL mode of a
    streaming job: process everything pending at start as a bounded
    sequence of micro-batches (still honoring source rate limits like
    maxFilesPerTrigger, unlike the deprecated one-shot Trigger.Once),
    then terminate on its own. This is how a stopped pipeline replays a
    gap or a new deployment bootstraps state before switching to a
    continuous trigger — same plan, same checkpoint, different trigger.
    Returns True when the query ended by itself within the timeout (the
    bounded-backfill contract); on False the caller gets a stopped query
    and a failed assertion.
    """
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_seconds)
    if not finished:
        q.stop()
    return finished


def run_foreach_batch_upsert(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    timeout_seconds: float = 180.0,
    checkpoint_dir: str | None = None,
    store_root: str | None = None,
    stage_dir: str | None = None,
    crash_after_batch: int | None = None,
) -> DataFrame:
    """foreachBatch UPSERT sink: replay the events as ``n_files``
    time-ordered micro-batches and maintain a keyed parquet store of
    each user's LATEST event — the serving-table pattern (CDC compaction,
    feature freshness, "current state" materialization) that
    ``foreachBatch`` exists for: the sink body is ordinary batch code, so
    MERGE semantics Structured Streaming has no native sink for become a
    per-batch batch job with exactly-once-per-batch-id idempotence.

    Per batch: reduce the batch to per-user winners (max ts, event_id
    tie-break), union with the current store, re-pick winners, and write
    a NEW versioned store directory before retiring the old one (an
    atomic pointer swap — readers never observe a half-written store; a
    table format would give this transactionally, plain parquet gets it
    by rename). Last-write-wins is associative across any batch split,
    so the final store equals the batch latest-by-key over the whole
    corpus — which is exactly what the DuckDB oracle checks.

    At scale the union+re-pick is the compaction a deployment runs
    bucketed on the key (io.py:merge_by_key); the per-batch winner cut
    keeps the store write proportional to |store| + |batch winners|,
    never the raw batch size.

    Crash recovery (the contract a serving table actually needs): the
    store pointer is a FILE (``<store_root>/CURRENT``, swapped with
    os.replace) rather than process memory, so a killed writer leaves a
    consistent store on disk; with ``checkpoint_dir`` set the replay
    resumes from the engine checkpoint, and the sink is idempotent
    per batch id — if the crash landed AFTER the pointer swap but
    BEFORE the engine logged the batch (the at-least-once window), the
    replayed batch sees ``CURRENT`` already at its own version and
    skips. ``crash_after_batch`` injects exactly that worst-case crash
    point for the fault-injection test (tests/test_streaming.py);
    ``stage_dir`` must be pinned across the crash/restart pair because
    the file-source checkpoint records processed slices by path.
    """
    stream = file_replay_stream_split(spark, sf_dir, n_files, stage_dir=stage_dir)
    root = Path(store_root or tempfile.mkdtemp(prefix="upsert_store_"))
    root.mkdir(parents=True, exist_ok=True)
    pointer = root / "CURRENT"

    def read_pointer() -> Path | None:
        try:
            return root / pointer.read_text().strip()
        except OSError:
            return None

    def swap_pointer(new: Path) -> None:
        tmp = root / "CURRENT.tmp"
        tmp.write_text(new.name)
        os.replace(tmp, pointer)  # atomic on POSIX: readers see old or new

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )

    def winners(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        new = root / f"v{batch_id}"
        cur = read_pointer()
        if cur is not None and cur.name == new.name:
            # Replay of a batch whose effects already committed (crash in
            # the window between pointer swap and engine offset log):
            # exactly-once-per-batch-id means SKIP, not re-merge — the
            # store already reflects this batch.
            pass
        else:
            batch_win = winners(
                batch_df.select("user_id", "event_id", "ts", "event_type", "value")
            )
            if cur is not None:
                merged = winners(
                    spark.read.parquet(str(cur)).unionByName(batch_win)
                )
            else:
                merged = batch_win
            merged.write.mode("overwrite").parquet(str(new))
            swap_pointer(new)
            if cur is not None and cur != new:
                shutil.rmtree(cur, ignore_errors=True)
        if crash_after_batch is not None and batch_id == crash_after_batch:
            raise RuntimeError(
                f"injected crash after batch {batch_id} store commit"
            )

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    finished = q.awaitTermination(timeout_seconds)
    if not finished:
        q.stop()
        raise TimeoutError("foreachBatch upsert replay did not finish")
    final = read_pointer()
    if final is None:
        raise RuntimeError("upsert replay committed no batches")
    return spark.read.parquet(str(final)).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


def run_stream_ann_enrich(
    spark: SparkSession,
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_files: int = 3,
    timeout_seconds: float = 180.0,
    route=None,
    order_col: str = "vec_id",
    n_index: int | None = None,
) -> "tuple[DataFrame, int]":
    """Online semantic enrich: stream a query-embedding feed as
    micro-batches against a FROZEN index handle — the first composition
    of the streaming tier with the two-frame retrieval surface (VERDICT
    r15 item 2), and the serving loop an online semantic-dedup /
    contamination-gate / retrieval-enrich pipeline runs: embeddings
    arrive continuously, the index and its trained route are built once
    (``prepare_ann_route``), and every micro-batch is just
    ``ann_search(batch, index, route=handle)`` inside ``foreachBatch``
    — ordinary batch code per trigger, so the whole ann_search tier
    menu (and its plan pins) applies unchanged per batch.

    Correctness is oracle-grade, not merely plausible: per-query top-k
    is independent across queries, so the union of per-batch results is
    EXACTLY the batch ``ann_search`` over all queries at the exact
    tiers — any micro-batch split commutes with the operator. That is
    the invariant that makes streaming retrieval correct under replay,
    and it is what the registered query's DuckDB oracle checks.

    Handle amortization is the point of the composition: the route (and
    on ivf tiers the trained centroids) is constructed BEFORE the
    stream starts and reused by every trigger — no per-batch Lloyd, no
    per-batch routing jobs (asserted by monkeypatch-tripwire in
    tests/test_ann_lifecycle.py). ``route=None`` builds it here via
    :func:`~etl_covid19_brasil_spark.llm.ann.prepare_ann_route`.

    Returns ``(results, n_batches)`` — results read back from the
    append-mode parquet sink, plus the number of micro-batches the
    replay actually executed (the reuse claim needs >= 2)."""
    from etl_covid19_brasil_spark.llm.ann import prepare_ann_route
    from etl_covid19_brasil_spark.llm.search import ann_search

    if route is None:
        route = prepare_ann_route(index)
    if n_index is None:
        # one exact count at stream construction — pinned so every
        # trigger makes the same tier decision (a per-batch estimate
        # could flap tiers mid-stream); caller hint skips the job
        n_index = index.count()

    # stage the query feed as n_files ordered slices (the
    # file_replay_stream_split rig — fixture-only; production feeds
    # arrive from Kafka/files and are never re-staged)
    stage = Path(tempfile.mkdtemp(prefix="ann_enrich_stream_"))
    sliced = queries.withColumn(
        "__slice", F.ntile(n_files).over(Window.orderBy(order_col))
    )
    for i in range(1, n_files + 1):
        tmp_i = stage / f"_tmp_{i}"
        (
            sliced.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.parquet(str(tmp_i))
        )
        part = next(Path(tmp_i).glob("part-*.parquet"))
        part.rename(stage / f"slice_{i - 1:03d}.parquet")
        shutil.rmtree(tmp_i)

    schema = spark.read.parquet(str(stage / "slice_000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    out_dir = Path(tempfile.mkdtemp(prefix="ann_enrich_out_")) / "res"
    seen = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        seen["n"] += 1
        # ordinary batch retrieval per trigger, same frozen handle each
        # time; the append sink is idempotent enough for availableNow
        # replay of a fixture (production would key files by batch_id)
        ann_search(batch_df, index, k=k, route=route, n_index=n_index).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_seconds)
    if not finished:
        q.stop()
        raise TimeoutError("ann enrich replay did not finish")
    return spark.read.parquet(str(out_dir)), seen["n"]


def run_stream_index_ingest(
    spark: SparkSession,
    base: DataFrame,
    delta: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_files: int = 3,
    timeout_seconds: float = 180.0,
    order_col: str = "vec_id",
) -> "tuple[DataFrame, list]":
    """Online index MAINTENANCE: stream a vector feed INTO a frozen
    index handle — the composition of the r16 lifecycle
    (:func:`~etl_covid19_brasil_spark.llm.ann.ann_index_append`) with
    the streaming tier, i.e. the full production serving loop:
    continuous ingestion appends micro-batches to the index through the
    handle's staleness contract (trained-cell assignment, zero re-Lloyd
    while the geometry holds; a measured trigger retrains when it
    drifts), and queries are served from whatever the index has become.

    Per micro-batch the foreachBatch sink (driver-side, ordinary batch
    code) runs ``ann_index_append(handle, index_so_far, batch)`` —
    updating the handle's bookkeeping, re-measuring staleness on the
    BATCH only, and retraining over the union exactly when a trigger
    fires. After the replay drains, the final handle serves the query
    batch over the full union.

    Correctness is oracle-grade at the exact tiers: the served result
    over base UNION all-batches equals the whole-corpus ``ann_search``
    regardless of how ingestion was micro-batched (appends commute with
    unions; per-query top-k is batch-split-invariant) — what the
    registered query's DuckDB oracle checks.

    Returns ``(results, reports)`` — the served top-k and the per-batch
    :class:`AppendReport` list (the staleness audit trail a production
    ingest loop would alert on)."""
    from etl_covid19_brasil_spark.llm.ann import ann_index_append, prepare_ann_route
    from etl_covid19_brasil_spark.llm.search import ann_search

    state = {"route": prepare_ann_route(base), "index": base, "reports": []}

    stage = Path(tempfile.mkdtemp(prefix="index_ingest_stream_"))
    sliced = delta.withColumn(
        "__slice", F.ntile(n_files).over(Window.orderBy(order_col))
    )
    for i in range(1, n_files + 1):
        tmp_i = stage / f"_tmp_{i}"
        (
            sliced.filter(F.col("__slice") == i)
            .drop("__slice")
            .coalesce(1)
            .write.parquet(str(tmp_i))
        )
        part = next(Path(tmp_i).glob("part-*.parquet"))
        part.rename(stage / f"slice_{i - 1:03d}.parquet")
        shutil.rmtree(tmp_i)

    schema = spark.read.parquet(str(stage / "slice_000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # re-read the staged slice as a BATCH frame: the appended index
        # must stay a replayable lazy plan across triggers (a streaming
        # source frame cannot be unioned into later batch queries)
        src = sorted(Path(stage).glob("slice_*.parquet"))[batch_id]
        batch = spark.read.parquet(str(src))
        route, union, report = ann_index_append(
            state["route"], state["index"], batch
        )
        state["route"], state["index"] = route, union
        state["reports"].append(report)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_seconds)
    if not finished:
        q.stop()
        raise TimeoutError("index ingest replay did not finish")
    served = ann_search(queries, state["index"], k=k, route=state["route"])
    return served, state["reports"]
