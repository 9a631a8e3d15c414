"""Streaming semantics over literal fixtures (FIXTURES.md §3 late_events):
dedup drops duplicate ids, stream final state equals batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import get_query
from avro_parquet_spark_example_spark.streaming.stateful import run_to_table

FIXTURE_DIR = "/tmp/avro_parquet_spark_example_spark_test_stream"


def _write_fixture(spark):
    rows = [
        # (event_id, ts, user_id, value) — includes one duplicated event_id
        (1, "2024-01-01 10:00:00", 1, 10.0),
        (2, "2024-01-01 10:05:00", 1, 20.0),
        (2, "2024-01-01 10:05:00", 1, 20.0),  # duplicate
        (3, "2024-01-01 10:20:00", 2, 5.0),
        (4, "2024-01-01 11:00:00", 2, 7.0),
        (5, "2024-01-01 09:00:00", 1, 1.0),  # late arrival (in-batch)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id", "value"]).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "value"
    )
    path = os.path.join(FIXTURE_DIR, "events")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path, df


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_stream_dedup_drops_duplicate_ids(spark):
    path, _ = _write_fixture(spark)
    stream = _read_stream(spark, path)
    out = run_to_table(
        stream.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"]),
        "append",
    )
    rows = out.collect()
    assert len(rows) == 5  # 6 input rows, one duplicate id dropped
    assert sorted(r.event_id for r in rows) == [1, 2, 3, 4, 5]


def test_stream_final_state_equals_batch(spark):
    path, batch_df = _write_fixture(spark)
    stream = _read_stream(spark, path)
    streamed = run_to_table(
        stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("total"),
        ),
        "complete",
    ).collect()
    batch = batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("total"),
    ).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))


def test_stream_queries_run_on_testdata(spark, sf_dir):
    out = get_query("stream_watermark_dedup").fn(spark, sf_dir)
    n = out.count()
    # event_id is unique in the driver data → dedup preserves every row
    batch_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == batch_n


def test_rocksdb_state_store_parity(spark, sf_dir):
    """The 100 TB/day state-store provider (SCALING.md §Streaming): the same
    stateful plan over RocksDB must produce the identical final state as
    the default HDFS-backed provider. RocksDB keeps state off-heap+on-disk,
    so executor memory stops bounding watermark horizons at scale; this
    asserts the swap is semantics-free (and that the provider actually
    loads in this Spark build)."""
    from avro_parquet_spark_example_spark.streaming.stateful import (
        read_events_stream,
        run_to_table,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    agg = lambda: run_to_table(  # noqa: E731
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")),
        "complete",
    ).collect()
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        rocks = sorted(map(tuple, agg()))
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    default = sorted(map(tuple, agg()))
    assert rocks == default and len(rocks) == 5


def test_incremental_resume_exactly_once(spark, sf_dir):
    # Run the op twice in-session: the second invocation finds the _DONE
    # marker and must return the identical exactly-once sink — no dup rows,
    # no gaps, all events present exactly once.
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.sources.catalog import load

    q = get_query("stream_incremental_resume").fn
    first = q(spark, sf_dir)
    events = load(spark, sf_dir, "events")
    assert first.count() == events.count()
    assert first.select("event_id").distinct().count() == events.count()
    again = q(spark, sf_dir)
    assert again.count() == first.count()


def test_event_ids_unique_precondition(spark):
    """Precondition for stream_watermark_dedup's oracle promotion: with
    unique event_ids the streaming first-seen dedup equals the batch
    ROW_NUMBER dedup. A fixture change that introduces duplicate ids makes
    the kept row arrival-order-dependent — fail here with the ids, not as
    an opaque hash mismatch in the gate."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        df = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
        total = df.count()
        distinct = df.select("event_id").distinct().count()
        assert total == distinct, f"{sf}: {total - distinct} duplicate event_ids"


def test_stream_source_reads_directory_tables(spark, sf_dir, tmp_path):
    """r13 regression: a table shipped as a parquet DIRECTORY (multi-file
    — every scale-up dir, any real ingest layout) must stream all its
    rows. The old staging symlinked the directory into the monitor dir,
    where the file source ignores nested directories and silently
    streamed ZERO rows (caught by the r13 streaming 10x legs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    out = str(tmp_path / "dirsf")
    os.makedirs(out, exist_ok=True)
    ev.repartition(4).write.parquet(f"{out}/events.parquet")
    got = get_query("stream_tumbling").fn(spark, out).collect()
    assert len(got) > 0
    assert sum(r.n for r in got) == n
