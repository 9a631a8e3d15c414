"""Sketch accuracy: the merged-HLL rollup estimate must track the exact
distinct count (the property the rows-only driver check can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import get_query


def test_hll_merge_estimate_close_to_exact(spark, sf_dir):
    est = {
        r.event_type: r.approx_users
        for r in get_query("agg_sketch_merge_rollup").fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for event_type, exact_n in exact.items():
        rel_err = abs(est[event_type] - exact_n) / exact_n
        assert rel_err < 0.02, (event_type, est[event_type], exact_n)


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    est = {
        r.event_type: r.approx_users
        for r in get_query("agg_approx_distinct").fn(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for event_type, exact_n in exact.items():
        assert abs(est[event_type] - exact_n) / exact_n < 0.05
