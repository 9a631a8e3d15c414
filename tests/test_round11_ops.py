"""Round-11 pins: the at-scale production dials turned into code
(VERDICT r10 task #3) plus the ADVICE r10 fixes with behavior changes.

- ``scaled_anchor_count`` — the √corpus IVF anchor dial (8 → 25 at 10×).
- ``silhouette_sample_hex`` — md5-prefix threshold from a target COUNT.
- ``Engine.silhouette`` — threshold-length fix (ADVICE r10 #2) and the
  new ``target_count`` form.
- ``ivf_candidates`` — the exposed candidate stage agrees with the graph
  it feeds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.engine import Engine
from avro_parquet_spark_example_spark.operators.simsearch import (
    KNN_IVF_ANCHORS,
    ivf_candidates,
    knn_graph_ivf,
    scaled_anchor_count,
    silhouette_sample_hex,
)


def test_scaled_anchor_count_dial():
    # identity at the reference corpus, sqrt growth at 10x/100x
    assert scaled_anchor_count(1000, 1000, 8) == 8
    assert scaled_anchor_count(10_000, 1000, 8) == 25  # 8*sqrt(10)=25.3
    assert scaled_anchor_count(100_000, 1000, 8) == 80
    # never below 1; shrinking corpora shrink the quantizer
    assert scaled_anchor_count(10, 1000, 8) == 1
    with pytest.raises(ValueError):
        scaled_anchor_count(0, 1000)
    with pytest.raises(ValueError):
        scaled_anchor_count(1000, 0)


def test_silhouette_sample_hex_threshold_math():
    # 25% of a pool = the classic 0x4000 / 16^4 threshold
    assert silhouette_sample_hex(1000, 250) == "4000"
    # target >= pool: no filter
    assert silhouette_sample_hex(100, 100) is None
    assert silhouette_sample_hex(100, 500) is None
    # tiny targets still yield a nonzero threshold
    assert silhouette_sample_hex(10**9, 1) == "0001"
    with pytest.raises(ValueError):
        silhouette_sample_hex(0, 10)
    with pytest.raises(ValueError):
        silhouette_sample_hex(10, 0)


def test_silhouette_sample_hex_is_deterministic_and_sized(spark, sf_dir):
    pool = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = pool.count()
    target = max(10, n // 3)
    hx = silhouette_sample_hex(n, target)
    assert hx is not None and len(hx) == 4

    def kept_ids():
        return sorted(
            r["vec_id"]
            for r in pool.filter(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4)
                < F.lit(hx)
            )
            .select("vec_id")
            .collect()
        )

    first, second = kept_ids(), kept_ids()
    # deterministic membership (the md5 trick's whole point)
    assert first == second
    # sized ~target: binomial tolerance, generous for small fixtures
    kept = len(first)
    tol = max(12, int(4 * (target**0.5)))
    assert abs(kept - target) <= tol, (kept, target, tol)


def test_engine_silhouette_threshold_length_respected(spark, sf_dir):
    """ADVICE r10 #2: a 2-digit threshold must compare a 2-digit prefix —
    the old hardcoded length-4 substring turned '40' into a degenerate
    comparison and shifted the sample."""
    eng = Engine(spark)
    pool = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 120)
        .select("vec_id", (F.col("vec_id") % 3).alias("label"), "embedding")
    )
    got = eng.silhouette(pool, sample_hex="40")
    expected_ids = {
        r["vec_id"]
        for r in pool.filter(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) < "40"
        )
        .select("vec_id")
        .collect()
    }
    assert {r["vec_id"] for r in got.collect()} == expected_ids
    with pytest.raises(ValueError):
        eng.silhouette(pool, sample_hex="XYZ")
    with pytest.raises(ValueError):
        eng.silhouette(pool, sample_hex="40", target_count=10)


def test_engine_silhouette_target_count_matches_hex_form(spark, sf_dir):
    eng = Engine(spark)
    pool = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 150)
        .select("vec_id", (F.col("vec_id") % 2).alias("label"), "embedding")
    )
    n = pool.count()
    target = n // 4
    hx = silhouette_sample_hex(n, target)
    via_count = eng.silhouette(pool, target_count=target).collect()
    via_hex = eng.silhouette(pool, sample_hex=hx).collect()
    assert sorted(r["vec_id"] for r in via_count) == sorted(
        r["vec_id"] for r in via_hex
    )


def test_ivf_candidates_feed_the_graph(spark, sf_dir):
    """The exposed candidate stage is exactly what knn_graph_ivf ranks:
    every graph edge is a candidate pair, and the per-src graph is the
    top-k of the candidate scores."""
    pool = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    cand = ivf_candidates(pool, n_anchors=4, nprobe=2)
    graph = knn_graph_ivf(pool, n_anchors=4, nprobe=2, k=3)
    cand_pairs = {
        (r["src"], r["dst"]) for r in cand.select("src", "dst").collect()
    }
    graph_rows = graph.collect()
    assert graph_rows, "graph is empty"
    assert {(r["src"], r["dst"]) for r in graph_rows} <= cand_pairs
    per_src = {}
    for r in graph_rows:
        per_src.setdefault(r["src"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_src.values())
