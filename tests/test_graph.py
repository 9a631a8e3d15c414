"""Graph operators: edge-build invariants and the PageRank properties that
replace a value-hash check for the rows-only query (FIXTURES.md model:
deterministic structure, float values property-tested)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.graph import (
    cooccurrence_edges,
    graph_pagerank,
)


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    return cooccurrence_edges(spark, sf_dir).cache()


def test_edges_oriented_and_distinct(edges):
    """Every edge is stored once, oriented u < v — downstream counts rely
    on this to be exact rather than double-counted."""
    assert edges.filter(F.col("u") >= F.col("v")).count() == 0
    assert edges.count() == edges.distinct().count()


def test_pagerank_mass_conservation(spark, sf_dir, edges):
    """Σrank == n_nodes: with symmetrized edges there are no dangling
    nodes, so power iteration preserves total rank mass exactly (up to
    float fold order)."""
    ranks = graph_pagerank(spark, sf_dir)
    rows = ranks.collect()
    n_nodes = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    assert len(rows) == n_nodes
    total = sum(r.rank for r in rows)
    assert total == pytest.approx(n_nodes, rel=1e-4)
    assert all(r.rank > 0 for r in rows)


def test_pagerank_degree_correlation(spark, sf_dir, edges):
    """On a co-occurrence graph, the max-degree node must out-rank the
    min-degree node — a coarse sanity that the propagation actually
    flowed along edges rather than returning the uniform init."""
    ranks = {r.node: r.rank for r in graph_pagerank(spark, sf_dir).collect()}
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .count()
        .collect()
    )
    by_deg = sorted(deg, key=lambda r: (r["count"], r.n))
    lo, hi = by_deg[0], by_deg[-1]
    assert ranks[hi.n] > ranks[lo.n]
    assert abs(ranks[hi.n] - 1.0) > 1e-3  # moved off the uniform init
