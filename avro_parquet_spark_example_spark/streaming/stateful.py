"""Group G (part 2) — true Structured Streaming operators (SURVEY.md §2
A7/G4/G5): file stream source, watermark + dedup, stateful aggregation.

Each query builds an incremental plan over the events Parquet treated as a
bounded stream, runs it to completion with ``Trigger.AvailableNow`` into a
memory sink, and returns the sink table. On a real cluster the same plans
run unbounded with micro-batch triggers; watermarks bound the dedup/window
state stores, which is what makes them viable on an infinite 100 TB/day
feed. Checkpoints land in per-query scratch dirs.

``stream_stateful_agg`` is oracle-checked: the stream's final state must
equal the batch GROUP BY — the fundamental Structured Streaming invariant.
The watermark/dedup queries are rows-only (their semantics aren't
SQL-expressible in DuckDB; SURVEY.md §5).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import (
    load,
    normalize_events,
    table_path,
    ts_us,
)

SCRATCH = "/tmp/avro_parquet_spark_example_spark_streams"

#: Micro-batch progress of the most recent :func:`run_to_table` run —
#: ``StreamingQueryProgress`` JSON dicts, newest last. Diagnostic only
#: (tools/stream_profile.py reads it to attribute wall time to batches /
#: state commits / sink setup); queries never consume it.
LAST_STREAM_PROGRESS: list[dict] = []


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — the events Parquet as a file-source stream with declared schema
    (streams cannot infer) and normalized event-time column.

    The file source requires a *directory* to monitor, and the driver ships
    one file per table — stage a symlink into scratch (a real ingest dir
    would accumulate files and the same plan tails it incrementally).
    """
    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        # a real parquet DIRECTORY (multi-file table, e.g. the scale-up
        # dirs): monitor it directly — the file source does not recurse
        # into nested symlinked directories, so staging a dir symlink
        # would silently stream ZERO rows (caught by the r13 streaming
        # 10x legs).
        stage_dir = path
    else:
        # the driver ships one FILE per table; the file source requires
        # a directory to monitor — stage a symlink into scratch (a real
        # ingest dir would accumulate files and the same plan tails it
        # incrementally).
        stage_dir = os.path.join(
            SCRATCH, "src_" + path.strip("/").replace("/", "_")
        )
        os.makedirs(stage_dir, exist_ok=True)
        link = os.path.join(stage_dir, "events.parquet")
        if not os.path.exists(link):
            try:
                os.symlink(path, link)
            except OSError:
                shutil.copyfile(path, link)
    schema = spark.read.parquet(path).schema
    return normalize_events(spark.readStream.schema(schema).parquet(stage_dir))


def stream_state_partitions(spark: SparkSession, sf_dir: str) -> int:
    """State-store partition count SIZED TO THE REPLAY'S INPUT (r14,
    VERDICT task #6): each streaming state partition costs a fixed
    per-micro-batch overhead (HDFSBackedStateStore load + commit +
    checkpoint file per partition PER stateful operator), so a 100k-row
    bounded replay at the session's 32 shuffle partitions spends 4-6x
    more wall time on state plumbing than on data (measured: the
    stream-stream join 18.1 s at 32 parts vs 4.7 s at 8, identical
    output). Sizing rule: one state partition per ~25k input rows,
    floor 4, capped at the session's shuffle parallelism — so the ×100
    scale-up replay (10M rows) gets the full 32 and an unbounded
    production deployment (which sets shuffle partitions to cluster
    width) is uncapped. The parquet row count is metadata-only."""
    n_rows = spark.read.parquet(table_path(sf_dir, "events")).count()
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return max(4, min(cap, n_rows // 25_000))


def run_to_table(
    df: DataFrame,
    output_mode: str,
    state_partitions: int | None = None,
    final_no_data_batch: bool = True,
) -> DataFrame:
    """Run a streaming plan to completion (AvailableNow) into a memory sink.

    ``state_partitions`` overrides ``spark.sql.shuffle.partitions`` for
    this query only (state-store count is frozen into the checkpoint at
    first batch — see :func:`stream_state_partitions` for sizing).
    ``final_no_data_batch=False`` disables the trailing watermark-advance
    micro-batch — ONLY legal when the sink already holds the full answer
    after the data batches: complete-mode aggregations, APPEND INNER
    stream-stream joins, append ``dropDuplicates`` (the kept row emits
    WITH its data batch; the no-data batch only evicts expired dedup
    state), and update-mode arbitrary-state operators with NO timers
    (``applyInPandasWithState``/``transformWithState`` under NoTimeout —
    the function is never invoked on a no-data batch). Append-mode
    queries whose late/closed results emit ON watermark advance (outer
    joins, append windowed aggs, session windows) MUST keep the default.

    NOT REENTRANT: the overrides mutate SESSION-global confs around the
    run (Spark offers no per-query knob for either — the state-store
    partition count comes from the session shuffle conf at first batch,
    and noDataMicroBatches has no writeStream option). Concurrent batch
    or streaming work in the same session during the window sees the
    override, and two concurrent run_to_table calls can restore each
    other's values. All registry/test callers are serial; a production
    deployment would set these per-job at session build instead."""
    spark = df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(SCRATCH, name)
    shutil.rmtree(ckpt, ignore_errors=True)
    saved: dict[str, str] = {}
    overrides: dict[str, str] = {}
    if state_partitions is not None:
        overrides["spark.sql.shuffle.partitions"] = str(state_partitions)
    if not final_no_data_batch:
        overrides["spark.sql.streaming.noDataMicroBatches.enabled"] = "false"
    for k, v in overrides.items():
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        LAST_STREAM_PROGRESS.clear()
        LAST_STREAM_PROGRESS.extend(
            p if isinstance(p, dict) else __import__("json").loads(p.json)
            for p in query.recentProgress
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return spark.table(name)


@register(
    "events_stream_source",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def events_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — stream source: readStream → stateless filter/project → sink.
    Stateless streaming transforms are deterministic, so this is fully
    oracle-checked (promoted from rows-only in round 4): the drained sink
    must hash-equal the batch filter, including the normalized event-time
    column."""
    stream = read_events_stream(spark, sf_dir)
    filtered = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return run_to_table(filtered, "append")


@register(
    "stream_watermark_dedup",
    oracle="""
    SELECT event_id, user_id, ts, event_type FROM (
        SELECT event_id, user_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 — 10-minute watermark + exactly-once dedup on event_id. The
    watermark lets Spark expire dedup state for ids older than
    (max event time − 10 min) — bounded memory on an unbounded stream.

    Oracle-checked (promoted from rows-only in round 4): the fixture's
    event_ids are unique (asserted by tests/test_streaming.py), so the
    bounded replay's kept set is exactly one row per event_id and
    deterministic — the batch ROW_NUMBER dedup. With genuinely duplicated
    ids arriving in different micro-batches, streaming keeps the
    first-SEEN row (arrival order), which a batch oracle can't express —
    that caveat is why the general operator documents rows-only semantics
    even though this dataset admits an exact check."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "ts", "event_type")
    )
    # Append dropDuplicates emits the kept row WITH its data batch; the
    # trailing no-data batch only evicts expired dedup state, so it's
    # elided, and the dedup state store sizes to the replay's input
    # (r16 stream profile: at the session's 32 partitions the RocksDB
    # commit cost dominated — 97 s of aggregate state-commit task time
    # for a 100k-row replay; 7.2 s fn wall -> ~2 s with both levers).
    return run_to_table(
        deduped,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )


@register(
    "stream_stateful_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 — running per-user aggregate in complete mode; the stream's final
    state is oracle-checked to equal the batch GROUP BY."""
    stream = read_events_stream(spark, sf_dir)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("total_value"),
    )
    # COMPLETE mode: the sink holds the full final state after the data
    # batch — trailing no-data batch elided, state store input-sized
    # (r16; the stream_window_unique_users precedent).
    return run_to_table(
        agg,
        "complete",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )


@register(
    "stream_foreach_batch",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'error' AND value > 100
    """,
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — ``foreachBatch`` sink: each micro-batch lands as Parquet via
    arbitrary batch logic (the productionized sink pattern — upserts,
    multi-table writes, external systems). Oracle-checked: the landed data
    equals the batch filter."""
    from avro_parquet_spark_example_spark.sources.catalog import scratch_suffix

    out_dir = os.path.join(SCRATCH, "foreach_batch_out_" + scratch_suffix(sf_dir))
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.filter(F.col("value") > 100)
            .select("event_id", "user_id", "value")
            .write.mode("append")
            .parquet(out_dir)
        )

    stream = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "error"
    )
    name = f"fb_{uuid.uuid4().hex[:12]}"
    query = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(SCRATCH, name))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


@register(
    "stream_custom_stateful",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_custom_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 — arbitrary stateful processing via ``applyInPandasWithState``:
    a hand-rolled per-user accumulator (count + running max) kept in the
    state store across micro-batches — the extension point for operators
    Spark's built-in aggregates can't express (custom sessionization,
    CEP-style patterns, decaying counters). Emits final state at
    end-of-stream; oracle-checked equal to the batch aggregate."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def accumulate(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    stream = read_events_stream(spark, sf_dir)
    result = stream.groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # UPDATE mode + NoTimeout: the handler never runs on a no-data batch,
    # so the sink holds the full answer after the data batches — trailing
    # batch elided, state store input-sized (r16).
    sink = run_to_table(
        result,
        "update",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )
    # In update mode each micro-batch emits a row per touched key; the final
    # state per user is the last emission (AvailableNow ⇒ one batch here,
    # but the dedup-by-latest keeps the contract under any batching).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )


@register(
    "stream_windowed_watermark",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS win_start,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    HAVING win_start + INTERVAL '1 hour'
           <= (SELECT MAX(ts) - INTERVAL '10 minutes' FROM events)
    """,
)
def stream_windowed_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-live — watermarked tumbling-window count as a REAL stream, append
    mode: a window emits only once the watermark (max event time − 10 min)
    passes its end, so the stream's final open window is withheld — the
    oracle's HAVING clause encodes exactly that append-mode contract."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    # APPEND windowed agg: closed windows emit ON watermark advance, so
    # the trailing no-data batch MUST stay; the state store still sizes
    # to the replay's input (r16 — per-partition RocksDB commit cost was
    # the profile's dominant term at the session's 32 partitions).
    return run_to_table(
        agg,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           EPOCH_US(p.ts) - EPOCH_US(v.ts) AS us_between
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8 — watermarked stream⋈stream inner join: every purchase within 30
    minutes after a view by the same user, both sides live streams. The
    time-band condition plus 1-hour watermarks lets Structured Streaming
    EVICT state: a buffered view can stop waiting once the purchase-side
    watermark passes view.ts + 30 min, so state is bounded by (rate ×
    window), not by history — the property that makes an unbounded
    100 TB/day join feasible. On the bounded replay the emitted pairs must
    equal the batch join, which is what the oracle checks."""
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    joined = joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (ts_us(joined, "p_ts") - ts_us(joined, "v_ts")).alias("us_between"),
    )
    # INNER join: every match emits with its data batch; the trailing
    # no-data batch only evicts state, so it's elided (r14 — measured
    # 18.1 s -> 3.0 s at sf0.1 with input-sized state partitions).
    return run_to_table(
        joined,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )


@register(
    "stream_incremental_resume",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def stream_incremental_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 — checkpoint-resume incremental ingest, the exactly-once contract
    that makes streaming ETL restartable: half the events land in the source
    directory and an AvailableNow run drains them into a Parquet sink; the
    OTHER half lands and a SECOND run with the SAME checkpoint processes
    only the new files. The sink must hold every event exactly once — the
    checkpoint's file log is what prevents both reprocessing (duplicates)
    and gaps. Oracle: the plain batch SELECT of the whole table. At 100 TB/
    day this is the production ingest loop — each trigger processes the
    file-log delta, so cost tracks arrival rate, not table size; idempotent
    sink + checkpoint = end-to-end exactly-once."""
    from avro_parquet_spark_example_spark.sources.catalog import scratch_suffix

    cols = ["event_id", "user_id", "event_type", "value"]
    base = os.path.join(SCRATCH, f"incr_{scratch_suffix(sf_dir)}")
    src = os.path.join(base, "src")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    done = os.path.join(base, "_BOTH_BATCHES_DONE")

    if not os.path.exists(done):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(src, exist_ok=True)
        events = spark.read.parquet(table_path(sf_dir, "events")).select(*cols)
        schema = events.schema

        def stage(batch_df, tag: str) -> None:
            tmp = os.path.join(base, f"tmp_{tag}")
            batch_df.write.mode("overwrite").parquet(tmp)
            for i, f in enumerate(sorted(os.listdir(tmp))):
                if f.endswith(".parquet"):
                    shutil.move(
                        os.path.join(tmp, f), os.path.join(src, f"{tag}_{i}.parquet")
                    )
            shutil.rmtree(tmp)

        def drain() -> None:
            q = (
                spark.readStream.schema(schema)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        stage(events.filter(F.col("event_id") % 2 == 0), "batch1")
        drain()
        stage(events.filter(F.col("event_id") % 2 == 1), "batch2")
        drain()  # same checkpoint → processes ONLY batch2's files
        with open(done, "w") as fh:
            fh.write("ok")
    return spark.read.parquet(sink).select(*cols)


@register(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           MIN(EPOCH_US(ts)) AS first_us,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6b — arbitrary stateful processing via Spark 4's
    ``transformWithStateInPandas`` + ``StatefulProcessor``: the successor
    API to ``applyInPandasWithState`` (G6), with NAMED, independently
    evolvable state variables (ValueState/ListState/MapState), timers, and
    TTL — per-user (count, first-seen epoch-µs, running max) kept in one
    ValueState across micro-batches. All three accumulators are
    order-independent (count/min/max), so the final state hash-checks
    against the batch oracle regardless of batch slicing. Same 100 TB
    shape as G6: state is per-key in the state store, the shuffle is the
    groupBy key exchange, nothing driver-side.

    Sandbox gate: transformWithState's state-server protocol speaks
    protobuf (``pyspark.sql.streaming.proto.StateMessage_pb2`` imports
    ``google.protobuf``), which this offline image lacks — when protobuf
    is unavailable the query falls back to the value-identical
    ``applyInPandasWithState`` form (same accumulators, same output
    schema), so the contract stays oracle-checked everywhere and the new
    API path activates automatically where protobuf exists."""
    import pandas as pd

    try:  # find_spec("google.protobuf") raises when the parent pkg is absent
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    stream = read_events_stream(spark, sf_dir)
    keyed = stream.select(
        "user_id", "value", ts_us(stream, "ts").alias("us")
    )
    out_schema = "user_id long, n_events long, first_us long, max_value double"

    def fold(n, first_us, mx, pdfs):
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                batch_min = int(pdf["us"].min())
                first_us = batch_min if first_us is None else min(first_us, batch_min)
                mx = max(mx, float(pdf["value"].max()))
        return n, first_us, mx

    if has_protobuf:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class UserAgg(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getValueState(
                    "agg", "n long, first_us long, mx double"
                )

            def handleInputRows(self, key, rows, timerValues):
                if self._state.exists():
                    n, first_us, mx = self._state.get()
                else:
                    n, first_us, mx = 0, None, float("-inf")
                n, first_us, mx = fold(n, first_us, mx, rows)
                self._state.update((n, first_us, mx))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "first_us": [first_us],
                        "max_value": [mx],
                    }
                )

            def close(self) -> None:
                pass

        result = keyed.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserAgg(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def accumulate(key, pdfs, state: GroupState):
            n, first_us, mx = state.get if state.exists else (0, None, float("-inf"))
            n, first_us, mx = fold(n, first_us, mx, pdfs)
            state.update((n, first_us, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "first_us": [first_us],
                    "max_value": [mx],
                }
            )

        result = keyed.groupBy("user_id").applyInPandasWithState(
            accumulate,
            outputStructType=out_schema,
            stateStructType="n long, first_us long, mx double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    # UPDATE + no timers: full answer after the data batches — trailing
    # batch elided, state store input-sized (r16).
    sink = run_to_table(
        result,
        "update",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )
    # update mode: one row per touched key per micro-batch; latest wins
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "first_us", "max_value")
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS mktsegment,
           n.n_name AS nation, e.value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE e.event_type = 'purchase'
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — stream-static enrichment: the purchase stream inner-joined per
    micro-batch against a STATIC dimension (customer × nation, pre-joined
    and broadcast) — the canonical streaming-ETL enrichment shape,
    complementing stream_stream_join (two watermarked streams). Stream-
    static inner joins are STATELESS on the stream side — no watermark, no
    state store; each micro-batch plans a fresh broadcast hash join, and
    the static side is re-resolvable (a dim refresh is picked up at the
    next batch). Deterministic, so fully oracle-checked: drained sink ==
    batch three-way join.

    Scale: the enrichment dim broadcasts (MB-scale after its own
    broadcast join); the stream side never shuffles — per-batch cost is
    scan + in-memory hash probes, the plan you want at any ingest rate."""
    stream = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    dim = cust.join(
        F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]
    ).select(
        "c_custkey",
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("n_name").alias("nation"),
    )
    joined = (
        stream.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "user_id", "mktsegment", "nation", "value")
    )
    return run_to_table(joined, "append")


@register(
    "stream_stream_join_outer",
    oracle="""
    WITH mv AS (SELECT MAX(ts) AS m FROM events WHERE event_type = 'view'),
    mp AS (SELECT MAX(ts) AS m FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           EPOCH_US(p.ts) - EPOCH_US(v.ts) AS us_between
    FROM v JOIN p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    UNION ALL
    SELECT v.user_id, v.event_id, NULL, NULL
    FROM v, mv, mp
    WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id
          AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE)
      AND v.ts + INTERVAL 90 MINUTE < LEAST(mv.m, mp.m)
    """,
)
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 — watermarked stream⋈stream LEFT OUTER join: every view, paired
    with purchases inside its 30-minute window, or a NULL row once the
    engine can PROVE no purchase can still arrive. That proof is the
    entire semantics gap vs a batch left join, and the oracle encodes it
    exactly: a view's null row emits iff the final global watermark —
    min over both inputs of (max event time − 1 h delay) — has passed
    v_ts + 30 min, so views inside the last 90 minutes of the drained
    stream stay withheld (their window is still open when the source
    runs dry; a later file would resolve them — exactly-once resume is
    stream_incremental_resume's demo). Matched pairs emit on arrival and
    equal the batch inner join regardless. Empirically pinned before
    registration: 1,954 of the batch join's 1,962 unmatched views emit
    at sf0.01 — the withheld 8 are precisely the tail predicate's rows.

    Scale: identical state-eviction math to stream_stream_join — state
    is bounded by rate × (window + delay), never by history; the outer
    side only adds a null-emit at eviction time (no extra state)."""
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    joined = joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (ts_us(joined, "p_ts") - ts_us(joined, "v_ts")).alias("us_between"),
    )
    # OUTER join: NULL-padded rows emit ON watermark advance, so the
    # trailing no-data batch stays; state partitions size to the input
    # (r14 — same per-partition state-store fixed-cost argument as the
    # inner join).
    return run_to_table(
        joined,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )


@register(
    "stream_session_windowed",
    oracle="""
    WITH s AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    ),
    sess AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM g GROUP BY user_id, sid
    ),
    m AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM sess, m
    WHERE session_end <= mx - INTERVAL 1 HOUR
    """,
)
def stream_session_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10 — TRUE streaming session windows (``session_window`` over
    ``readStream`` + 1-hour watermark, append mode), the live counterpart
    of the batch stream_session query. Append mode only emits a session
    once the watermark proves it can no longer grow, and the oracle
    encodes that emission rule exactly: gaps-and-islands sessions (30-min
    gap; end = last event + gap) KEPT only where session_end ≤ final
    watermark (max event time − 1 h) — sessions still open, or closed
    within the last hour of the drained stream, stay in the state store
    awaiting more data. Empirically pinned before registration: 9,525 of
    the batch's 9,549 sessions emit at sf0.01, and the 24 withheld are
    precisely the tail predicate's rows.

    Scale: the session state store holds only OPEN sessions per user
    (merged on arrival, evicted at emission) — memory is rate × gap, not
    history; this is the mechanism that makes sessionization viable on an
    unbounded feed where the batch gaps-and-islands window would need the
    full day's shuffle."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    # APPEND session windows: closed sessions emit ON watermark advance —
    # the trailing no-data batch MUST stay (it is what emits the final
    # closed sessions); the session state store sizes to the replay's
    # input (r16 profile: 32-partition RocksDB commits dominated).
    return run_to_table(
        agg,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )


#: Shared with operators/timeseries.py so the stream and batch
#: sessionization can never disagree on the gap/cap.
from avro_parquet_spark_example_spark.operators.timeseries import (
    SESS_CAP_US as _SESS_CAP_US,
    SESS_GAP_US as _SESS_GAP_US,
)


@register(
    "stream_sessionize_capped",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT user_id AS u, EPOCH_US(ts) AS ts FROM events
    ),
    isl AS (
        SELECT u, ts,
               SUM(CASE WHEN prev IS NULL OR ts - prev > {_SESS_GAP_US}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY u ORDER BY ts) AS island
        FROM (SELECT u, ts,
                     LAG(ts) OVER (PARTITION BY u ORDER BY ts) AS prev
              FROM base)
    ),
    anchors AS (
        SELECT u, island, MIN(ts) AS anchor FROM isl GROUP BY u, island
        UNION ALL
        SELECT a.u, a.island,
               (SELECT MIN(e.ts) FROM isl e
                WHERE e.u = a.u AND e.island = a.island
                  AND e.ts > a.anchor + {_SESS_CAP_US}) AS anchor
        FROM anchors a
        WHERE EXISTS (SELECT 1 FROM isl e
                      WHERE e.u = a.u AND e.island = a.island
                        AND e.ts > a.anchor + {_SESS_CAP_US})
    )
    SELECT i.u AS user_id,
           CAST(MAX(i.island) AS BIGINT) AS n_islands,
           (SELECT COUNT(*) FROM anchors a WHERE a.u = i.u) AS n_sessions,
           COUNT(*) AS n_events
    FROM isl i GROUP BY i.u
    """,
)
def stream_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6b — STREAMING capped sessionization: the ts_sessionize_capped
    semantics (24 h inactivity gap + 72 h max duration) maintained
    incrementally in the state store via ``applyInPandasWithState`` —
    per-user state is four scalars (last ts, island count, current
    anchor, session count), NOT the event history, which is what makes
    custom sessionization viable on an unbounded stream. Emits per-user
    funnel totals (islands / capped sessions / events); the oracle is the
    BATCH recursive-anchor computation aggregated the same way, so the
    check pins stream-final-state == batch semantics exactly.

    Ordering contract: events are applied in event-time order within each
    micro-batch (sorted in the handler); cross-batch regressions would
    need a watermark-buffered variant — the replay source here delivers
    one ordered batch, and the state design (monotone anchors) is the
    same one a production watermark variant carries."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from avro_parquet_spark_example_spark.operators.timeseries import (
        SESS_CAP_US,
        SESS_GAP_US,
    )

    gap_us, cap_us = SESS_GAP_US, SESS_CAP_US

    def sessionize(key, pdfs, state: GroupState):
        prev, islands, anchor, sessions, n_events = (
            state.get if state.exists else (None, 0, None, 0, 0)
        )
        ts_all = []
        for pdf in pdfs:
            if len(pdf):
                ts_all.extend(int(v) for v in pdf["ts_us"])
        for t in sorted(ts_all):
            if prev is None or t - prev > gap_us:
                islands += 1
                anchor = t
                sessions += 1
            elif t > anchor + cap_us:
                anchor = t
                sessions += 1
            n_events += 1
            prev = t
        state.update((prev, islands, anchor, sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_islands": [islands],
                "n_sessions": [sessions],
                "n_events": [n_events],
            }
        )

    stream = read_events_stream(spark, sf_dir)
    keyed = stream.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    result = keyed.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=(
            "user_id long, n_islands long, n_sessions long, n_events long"
        ),
        stateStructType=(
            "prev long, islands long, anchor long, sessions long, n long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # UPDATE + no timers: full answer after the data batches — trailing
    # batch elided, state store input-sized (r16).
    sink = run_to_table(
        result,
        "update",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )
    # update mode re-emits a key per touched batch; keep the final state
    # (largest n_events) per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "stream_window_unique_users",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS win_start,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def stream_window_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 — streaming DISTINCT users per hour window: Spark's streaming
    engine forbids COUNT(DISTINCT) in aggregations, so the production
    composition is ``dropDuplicates`` on (window-bucketed time, user) —
    watermark-bounded dedup state — followed by an ordinary windowed
    count. Two stateful operators chained in one stream, each with
    bounded state (the dedup set and the window counts both expire with
    the watermark); the oracle is the batch COUNT(DISTINCT) the stream
    must converge to. Complete output mode emits the final count per
    window at end-of-stream.

    At scale this is THE uniques-per-window recipe (exact within the
    watermark horizon; beyond it you'd swap the dedup for HLL state)."""
    stream = read_events_stream(spark, sf_dir)
    bucketed = (
        stream.withWatermark("ts", "10 minutes")
        .select(
            F.window("ts", "1 hour").alias("win"),
            "user_id",
        )
        .dropDuplicates(["win", "user_id"])
    )
    agg = bucketed.groupBy("win").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(F.col("win.start").alias("win_start"), "n_users")
    # COMPLETE mode: the sink holds the full final counts after the data
    # batch; the trailing watermark-advance batch is pure state plumbing,
    # elided (r14 — measured 13.3 s -> 1.6 s at sf0.1 with input-sized
    # state partitions).
    return run_to_table(
        agg,
        "complete",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )


@register(
    "stream_session_dynamic_gap",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, ts,
               CASE WHEN event_type = 'click' THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 2 HOUR END AS gap
        FROM events
    ),
    s AS (
        -- an event joins the open session iff its start lies strictly
        -- inside the session's RUNNING max end (touching half-open
        -- windows do not merge), so the break test is against
        -- max(ts+gap) over all preceding events, not just the last one
        SELECT user_id, ts, gap,
               CASE WHEN MAX(ts + gap) OVER w IS NULL
                      OR ts >= MAX(ts + gap) OVER w
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
        SELECT user_id, ts, gap,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    ),
    sess AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts + gap) AS session_end,
               COUNT(*) AS n_events
        FROM g GROUP BY user_id, sid
    ),
    m AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM sess, m
    WHERE session_end <= mx - INTERVAL 1 HOUR
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10b — session windows with a DYNAMIC gap (Spark 4:
    ``session_window(ts, gap_expression)``): the inactivity timeout
    depends on the event — clicks close after 30 min, everything else
    after 2 h — which is how real products define sessions (a checkout
    page deserves a longer timeout than a scroll). Statically-gapped
    sessionization can't express this; per-event gaps change BOTH the
    merge rule (an event extends its session to ts + its own gap) and
    the close rule, and the oracle's gaps-and-islands twin encodes
    exactly those semantics: an event merges into the open session iff
    its start lies strictly inside the session's RUNNING max end
    (max(ts + gap) over preceding members — NOT just the previous
    event's end; touching half-open windows do not merge — both rules
    discovered by hash-mismatch against Spark's own implementation), and
    a session ends at max(ts + gap) over its members. Same append-mode watermark emission contract as
    the fixed-gap query (sessions closed ≤ watermark emit; the tail
    stays in state).

    The state store merges per-event expiry times instead of one fixed
    horizon — same bounded rate × max(gap) memory."""
    # the gap expression must be CalendarIntervalType: interval-literal
    # STRINGS coerce to it (DayTimeInterval F.expr("INTERVAL ...") does not)
    gap_expr = F.when(
        F.col("event_type") == "click", F.lit("30 minutes")
    ).otherwise(F.lit("2 hours"))
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy("user_id", F.session_window("ts", gap_expr))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    # APPEND session windows: trailing no-data batch MUST stay (final
    # closed sessions emit on watermark advance); state store sizes to
    # the replay's input (r16).
    return run_to_table(
        agg,
        "append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )


@register(
    "stream_window_topk_types",
    oracle="""
    WITH c AS (
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS win_start,
               event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT win_start, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY win_start
                                  ORDER BY n DESC, event_type) AS rk
        FROM c
    )
    SELECT win_start, event_type, n, rk FROM r WHERE rk <= 3
    """,
)
def stream_window_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13 — streaming top-k: the 3 busiest event types per hour window.
    Spark's streaming engine forbids rank functions over streams (a rank
    can be invalidated by late data), so the production recipe is the
    two-tier split implemented here: tier 1 is a watermark-bounded
    STREAMING windowed count (incremental state, the only part that must
    see every event); tier 2 is a BATCH window rank over the sink table —
    window-cardinality input, re-ranked cheaply whenever consumed. The
    oracle is the batch equivalent the pair must converge to at
    end-of-stream.

    At 100 TB/day the sink table is (windows × types) rows — the rank
    tier's input is millions of times smaller than the stream, which is
    exactly why the split is the standard pattern (same shape as
    ``stream_stateful_agg``'s final-state contract)."""
    from pyspark.sql import Window

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
    # COMPLETE mode: full counts in the sink after the data batch —
    # trailing batch elided, state store input-sized (r16; the
    # stream_window_unique_users precedent).
    sink = run_to_table(
        agg,
        "complete",
        state_partitions=stream_state_partitions(spark, sf_dir),
        final_no_data_batch=False,
    )
    w = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        sink.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("win_start", "event_type", "n", "rk")
    )
