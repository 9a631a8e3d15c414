"""Group B — projection, filtering, predicates (SURVEY.md §2-B).

The reference's headline queries were projections + WHERE filters over the
registered Avro/Parquet table ("SELECT name FROM users WHERE ...", SURVEY.md
§0 step 4). Re-expressed declaratively: Catalyst pushes both the column set
(ReadSchema) and the predicates (PushedFilters) into the Parquet scan, so at
100 TB only the referenced columns / matching row groups are read —
the modern automatic form of the reference's manual
``AvroParquetInputFormat.setRequestedProjection``.

Float note: row-level arithmetic (e.g. price × (1-discount)) is a fixed
sequence of IEEE ops, bit-identical in Spark and DuckDB — no rounding needed
(only aggregates reorder; see operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "project_rename_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber AS line_no,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity * l_tax AS taxed_qty
    FROM lineitem
    """,
)
def project_rename_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — select, rename, arithmetic expressions; 4-column ReadSchema."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * F.col("l_tax")).alias("taxed_qty"),
    )


@register(
    "filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 24
      AND l_extendedprice >= 10000
      AND l_shipdate > TIMESTAMP '1995-03-15'
      AND l_returnflag <> 'A'
    """,
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — <, >=, >, <> across numeric / timestamp / string; all predicates
    push into the Parquet scan (row-group stats skipping)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24)
        & (F.col("l_extendedprice") >= 10000)
        & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000)
      AND NOT (o_orderpriority = '1-URGENT' AND o_totalprice < 50000)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — AND / OR / NOT combinations."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000))
        & ~((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 50000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 100 AND 5000
      AND c_name LIKE 'Customer#%'
      AND REGEXP_MATCHES(c_name, '[02468]$')
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — IN, BETWEEN, LIKE, RLIKE (regexp) predicates."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(100, 5000)
        & F.col("c_name").like("Customer#%")
        & F.col("c_name").rlike("[02468]$")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "filter_null_semantics",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building,
           NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY' AS nullsafe_mach
    FROM customer
    WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
       OR NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — IS [NOT] NULL and null-safe equality (<=> / IS NOT DISTINCT
    FROM); NULLs injected via NULLIF since the synthetic data has none."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        F.col("c_custkey"),
        seg.alias("seg_or_null"),
        seg.isNull().alias("is_building"),
        seg.eqNullSafe(F.lit("MACHINERY")).alias("nullsafe_mach"),
    ).filter(seg.isNull() | seg.isNotNull())
