"""Table catalog over the driver's Parquet test universe.

The reference's entire read path — ``newAPIHadoopFile`` + ``ParquetInputFormat``
+ ``AvroReadSupport`` → ``SchemaRDD`` → ``registerTempTable`` (SURVEY.md §3.1
EP2) — collapses to ``spark.read.parquet`` + ``createOrReplaceTempView`` on
modern Spark; Catalyst supplies projection/predicate pushdown automatically
(SURVEY.md §4).

``events.ts`` is Parquet INT64 TIMESTAMP(NANOS): read as LongType under
``spark.sql.legacy.parquet.nanosAsLong=true`` and normalized here to a
microsecond TimestampType column so every downstream query (and the DuckDB
oracle, which reads the same column as µs TIMESTAMP) sees identical values.
"""

from __future__ import annotations

import os

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.session import session_key

#: All driver-generated tables (TESTDATA.md): TPC-H-ish star schema +
#: events stream + LLM-pipeline tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: (session key, sf_dir, table) → DataFrame. DataFrames are immutable plan
#: handles, so sharing one per table is safe and mirrors registering a view
#: once: the file listing, footer schema, and analyzed relation are reused
#: instead of being rebuilt on every query invocation. Keyed by
#: ``session.session_key`` (see its docstring for the aliasing rationale).
_CACHE: dict[tuple[tuple[str, int], str, str], DataFrame] = {}


def scratch_suffix(sf_dir: str) -> str:
    """Injective filesystem-safe token for an sf_dir, shared by every
    scratch-writing operator (batch sinks and streaming landing dirs must
    apply the SAME isolation rule). Sanitized name for readability + a short
    content hash so two sf_dirs can never collide after sanitization."""
    safe = re.sub(r"[^A-Za-z0-9]", "_", sf_dir.strip("/"))
    digest = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    return f"{safe}_{digest}"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. ``events`` gets its ``ts`` normalized to TimestampType."""
    key = (session_key(spark), sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = spark.read.parquet(table_path(sf_dir, name))
        if name == "events":
            df = normalize_events(df)
        _CACHE[key] = df
    return df


def normalize_events(df: DataFrame) -> DataFrame:
    """Convert raw nanos-since-epoch ``ts`` (LongType) to µs TimestampType.

    Matches DuckDB's reading of the same Parquet column (µs TIMESTAMP —
    truncation, not rounding). Keeps all other columns untouched.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        # Integer division: float division of ~1.7e18 nanos loses µs precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (the modern ``registerTempTable``)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
