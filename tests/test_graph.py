"""Graph operators: edge-build invariants and the PageRank properties that
replace a value-hash check for the rows-only query (FIXTURES.md model:
deterministic structure, float values property-tested)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import get_query

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


# ---------------------------------------------------------------------------
# graph_shortest_path_k3


def _py_bounded_dists(spark, sf_dir):
    from avro_parquet_spark_example_spark.operators.graph import (
        SP_MAX_USER,
        SP_ROUNDS,
        weighted_cooccurrence_edges,
    )

    adj: dict[int, list[tuple[int, int]]] = {}
    for r in weighted_cooccurrence_edges(
        spark, sf_dir, max_user=SP_MAX_USER
    ).collect():
        adj.setdefault(r.u, []).append((r.v, r.cost))
        adj.setdefault(r.v, []).append((r.u, r.cost))
    out: dict[tuple[int, int], int] = {}
    for s in [n for n in adj if n < 5]:
        dist = {s: 0}
        for _ in range(SP_ROUNDS):
            nxt = dict(dist)
            for u, d in dist.items():
                for v, c in adj.get(u, []):
                    if d + c < nxt.get(v, 1 << 62):
                        nxt[v] = d + c
            dist = nxt
        for n, d in dist.items():
            out[(s, n)] = d
    return out


def test_shortest_path_matches_python_bellman_ford(spark, sf_dir):
    got = {
        (r.source, r.node): r.dist
        for r in get_query("graph_shortest_path_k3").fn(spark, sf_dir).collect()
    }
    assert got == _py_bounded_dists(spark, sf_dir)


def test_shortest_path_relaxation_monotone(spark, sf_dir):
    """d(source, source) = 0 and every emitted distance is positive
    elsewhere and no larger than any single-edge cost from the source."""
    from avro_parquet_spark_example_spark.operators.graph import (
        SP_MAX_USER,
        weighted_cooccurrence_edges,
    )

    rows = get_query("graph_shortest_path_k3").fn(spark, sf_dir).collect()
    dists = {(r.source, r.node): r.dist for r in rows}
    edge = {}
    for r in weighted_cooccurrence_edges(
        spark, sf_dir, max_user=SP_MAX_USER
    ).collect():
        edge[(r.u, r.v)] = r.cost
        edge[(r.v, r.u)] = r.cost
    for (s, n), d in dists.items():
        if s == n:
            assert d == 0
        else:
            assert d > 0
            if (s, n) in edge:
                assert d <= edge[(s, n)]


# ---------------------------------------------------------------------------
# graph_hits_bipartite


def test_hits_matches_python_power_iteration(spark, sf_dir):
    """Scores equal a pure-Python replay of the same quantized max-
    normalized iteration (12dp per round, 6dp report)."""
    from avro_parquet_spark_example_spark.operators.graph import HITS_ROUNDS

    rows = get_query("graph_hits_bipartite").fn(spark, sf_dir).collect()
    inc = {
        (r.l_suppkey, r.l_partkey)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    }
    supps = {s for s, _ in inc}
    h = {s: 1.0 for s in supps}
    a = {}
    for _ in range(HITS_ROUNDS):
        a_raw: dict[int, float] = {}
        for s, p in inc:
            a_raw[p] = round(a_raw.get(p, 0.0) + h[s], 12)
        mx = max(a_raw.values())
        a = {p: round(v / mx, 12) for p, v in a_raw.items()}
        h_raw: dict[int, float] = {}
        for s, p in inc:
            h_raw[s] = round(h_raw.get(s, 0.0) + a[p], 12)
        mx = max(h_raw.values())
        h = {s: round(v / mx, 12) for s, v in h_raw.items()}
    got_h = {r.id: r.score for r in rows if r.kind == "hub"}
    got_a = {r.id: r.score for r in rows if r.kind == "authority"}
    assert set(got_h) == set(h) and set(got_a) == set(a)
    for s, v in h.items():
        assert abs(got_h[s] - v) < 2e-6, (s, got_h[s], v)
    for p, v in a.items():
        assert abs(got_a[p] - v) < 2e-6, (p, got_a[p], v)


def test_hits_scores_normalized_and_positive(spark, sf_dir):
    rows = get_query("graph_hits_bipartite").fn(spark, sf_dir).collect()
    for kind in ("hub", "authority"):
        scores = [r.score for r in rows if r.kind == kind]
        assert scores and max(scores) == 1.0
        assert all(0 < s <= 1.0 for s in scores)


# ---------------------------------------------------------------------------
# graph_modularity


def test_modularity_terms_reconstruct_and_bound(spark, sf_dir):
    """Per-community terms re-derive from recounted edges/degrees over
    the LPA partition, and total modularity sits in [-0.5, 1]."""
    rows = get_query("graph_modularity").fn(spark, sf_dir).collect()
    comm = {
        r.node: r.community
        for r in get_query("graph_label_propagation").fn(spark, sf_dir).collect()
    }
    edges = [
        (r.u, r.v)
        for r in __import__(
            "avro_parquet_spark_example_spark.operators.graph",
            fromlist=["cooccurrence_edges"],
        ).cooccurrence_edges(spark, sf_dir).collect()
    ]
    m = len(edges)
    m_c: dict[int, int] = {}
    d_c: dict[int, int] = {}
    n_c: dict[int, int] = {}
    for u, v in edges:
        if comm[u] == comm[v]:
            m_c[comm[u]] = m_c.get(comm[u], 0) + 1
        d_c[comm[u]] = d_c.get(comm[u], 0) + 1
        d_c[comm[v]] = d_c.get(comm[v], 0) + 1
    for node, c in comm.items():
        n_c[c] = n_c.get(c, 0) + 1
    assert {r.community for r in rows} == set(n_c)
    total = 0.0
    for r in rows:
        assert r.n_nodes == n_c[r.community]
        assert r.internal_edges == m_c.get(r.community, 0)
        assert r.degree_sum == d_c.get(r.community, 0)
        term = r.internal_edges / m - (r.degree_sum / (2 * m)) ** 2
        assert abs(r.modularity_term - round(term, 9)) < 1e-9
        total += r.modularity_term
    assert -0.5 <= total <= 1.0
