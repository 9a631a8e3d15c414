"""Group G (part 1) — event-time windowing over the ``events`` stream table
(SURVEY.md §2-G).

Each windowing shape is declared twice:
  * a batch DataFrame form (oracle-checked against DuckDB island/bucket SQL);
  * the same logical plan runs unchanged under Structured Streaming — see
    ``streaming/stateful.py`` for the live readStream variants.

Window aggregation shuffles once on (window, key); watermarking (stateful
module) bounds state at scale. ``time_bucket``/``window()`` are both
epoch-aligned so bucket starts agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "stream_tumbling",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — 1-hour tumbling windows × event_type."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '15 minutes', ts) - o.k * INTERVAL '15 minutes' AS win_start,
           COUNT(*) AS n
    FROM events, (SELECT UNNEST([0, 1, 2, 3]) AS k) o
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — 1-hour windows sliding every 15 min (each event lands in exactly
    4 windows; the oracle reproduces that by unnesting 4 bucket offsets)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )


@register(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — 30-minute-gap session windows per user. Spark's native
    ``session_window`` (start = first event, end = last event + gap); the
    oracle rebuilds sessions with the classic gaps-and-islands SQL."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_hopping_peak",
    oracle="""
    WITH hourly AS (
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS win_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, win_start, n
    FROM (SELECT event_type, win_start, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, win_start) AS rn
          FROM hourly)
    WHERE rn = 1
    """,
)
def stream_hopping_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1b — composition: windowed counts → per-type peak hour (window agg
    feeding a rank window; two shuffles, both on bounded keys)."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("win_start"))
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "win_start", "n")
    )
