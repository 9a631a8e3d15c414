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


def test_cms_estimate_bounds_and_determinism(spark, sf_dir):
    """Count-min guarantees: the estimate NEVER undershoots (every counter
    a token hashes into contains at least its own full count), and the
    overshoot is bounded by collisions — ≤ 2·N/width here, far looser
    than the e/width expectation, so a hash-layout regression fails loud.
    The sketch is hash-of-value only, so a rebuilt plan must return the
    identical rows."""
    from avro_parquet_spark_example_spark.operators.aggregates import CMS_WIDTH

    q = get_query("agg_cms_heavy_hitters").fn
    rows = q(spark, sf_dir).collect()
    assert len(rows) == 20
    n_total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    for r in rows:
        assert r.est_c >= r.true_c, (r.token, r.est_c, r.true_c)
        assert r.est_c - r.true_c <= 2 * n_total / CMS_WIDTH, (
            r.token,
            r.est_c,
            r.true_c,
            n_total,
        )
    again = {(r.token, r.true_c, r.est_c) for r in q(spark, sf_dir).collect()}
    assert again == {(r.token, r.true_c, r.est_c) for r in rows}


def test_hll_intersection_bounds_exact_overlap(spark, sf_dir):
    """Inclusion-exclusion over DataSketches HLL lands within 10% of the
    exact per-pair user overlap (generous vs the ~1-2% union error, since
    subtraction compounds), and the pair table is the full canonical
    type-pair set."""
    from avro_parquet_spark_example_spark.registry import get_query

    rows = get_query("agg_hll_intersection").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    users: dict[str, set] = {}
    for e in ev:
        users.setdefault(e.event_type, set()).add(e.user_id)
    types = sorted(users)
    expect_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert {(r.type_a, r.type_b) for r in rows} == expect_pairs
    for r in rows:
        exact = len(users[r.type_a] & users[r.type_b])
        assert r.est_overlap >= 0
        if exact >= 20:
            assert abs(r.est_overlap - exact) <= 0.10 * exact, (
                r.type_a, r.type_b, r.est_overlap, exact,
            )
