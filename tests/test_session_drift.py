"""Environment-drift guards (round-3 postmortem).

The sandbox's Spark changed how Parquet INT64 TIMESTAMP(NANOS) is read
between rounds (LongType-under-nanosAsLong → TIMESTAMP_NTZ, flag ignored),
silently breaking six event-time queries. These tests pin the defenses:

  * ``normalize_events`` is total over every observed read type and raises
    on a new one;
  * ``ts_us`` is the single epoch-µs derivation and agrees across dtypes;
  * ``verify_events_readable`` turns drift into a loud boot error;
  * ``configure`` reports (not swallows) configs that fail to apply;
  * an UNCONFIGURED session can still run an event-time query — correctness
    must not depend on a config the engine can't verify is honored.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.session import (
    LAST_UNAPPLIED_CONFIGS,
    configure,
    verify_events_readable,
)
from avro_parquet_spark_example_spark.sources.catalog import (
    HANDLED_TS_DTYPES,
    load,
    normalize_events,
    ts_us,
)

EPOCH_US = 1704067798778549  # 2024-01-01T00:09:58.778549Z
WALL = datetime.datetime(2024, 1, 1, 0, 9, 58, 778549)


def test_events_ts_reads_as_handled_dtype(spark, sf_dir):
    dtype = verify_events_readable(spark, sf_dir)
    assert dtype in HANDLED_TS_DTYPES


def test_normalize_events_yields_timestamp(spark, sf_dir):
    assert dict(load(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"


def test_normalize_events_rejects_unknown_dtype(spark):
    df = spark.createDataFrame([("x",)], ["ts"])  # string ts = drift
    with pytest.raises(TypeError, match="unhandled dtype"):
        normalize_events(df)


def test_ts_us_total_over_read_types(spark):
    """The same instant through all three read paths → identical epoch µs."""
    nanos = spark.createDataFrame([(EPOCH_US * 1000 + 999,)], ["ts"])  # +nanos
    ntz = spark.createDataFrame([(WALL,)], ["ts"]).select(
        F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    tstamp = spark.createDataFrame([(WALL,)], ["ts"]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    for df in (nanos, ntz, tstamp):
        [row] = df.select(ts_us(df).alias("us")).collect()
        assert row.us == EPOCH_US  # nanos truncate, never round
    with pytest.raises(TypeError, match="unhandled dtype"):
        ts_us(spark.createDataFrame([("x",)], ["ts"]))


def test_configure_reports_unapplied_configs(spark):
    configure(spark)
    # On the pinned sandbox Spark everything is runtime-settable; what we
    # really pin is the contract: failures land in the dict, not in a pass.
    assert LAST_UNAPPLIED_CONFIGS == {}


def test_unconfigured_session_runs_event_time_query(spark, sf_dir):
    """A sibling session with DEFAULT configs (no nanosAsLong, no engine
    setup) must still run an event-time query end-to-end: correctness lives
    in normalize_events/ts_us, not in unverifiable config flags."""
    plain = spark.newSession()
    events = normalize_events(
        plain.read.parquet(f"{sf_dir}/events.parquet")
    )
    n = (
        events.select(ts_us(events).alias("us"))
        .filter(F.col("us") > 0)
        .count()
    )
    assert n == events.count() > 0


def test_streaming_state_store_is_rocksdb(spark):
    """r10: configure() routes streaming state to RocksDB (off-heap /
    on-disk) — large keyed state must scale with disk, not executor
    heap, and heap-resident HDFS-backed state maps were a measured
    contributor to long-session heap pressure (SOAK_r10.md)."""
    from avro_parquet_spark_example_spark.session import configure

    configure(spark)
    assert (
        "RocksDBStateStoreProvider"
        in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    )
