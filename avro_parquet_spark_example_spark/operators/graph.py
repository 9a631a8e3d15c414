"""Graph analytics over a co-occurrence graph derived from ``events``.

Training-data pipelines carry graph-shaped work the moment documents or
users reference each other: link-graph quality signals (degree profile,
triangle density distinguishes organic communities from spam link farms)
and PageRank as a document-quality prior (the classic web-corpus
weighting). Near-dup cluster resolution (connected components) is already
covered by operators/dedup.py; this module adds the other two canonical
batch-graph operators on the same edge-building machinery.

Graph construction: an edge joins two users who emitted the SAME event
type inside the SAME 5-minute epoch bucket — the standard "co-occurrence
within a session bucket" projection of a bipartite log onto its user
side. The bucket key is pure integer arithmetic (``epoch_us div 3e8``),
identical in both engines — no timestamp truncation semantics to align.
5-minute buckets keep the projection sparse and BOUNDED: the fixture has
at most ~11 distinct users per (type, bucket), so per-bucket pair
generation is at most C(11,2) = 55 rows — no quadratic blow-up, unlike a
day-bucket projection which yields a near-complete graph.

Scale notes (100 TB of events):
  * Edge build: one distinct-project (map-side combined) + a self-join
    keyed on (type, bucket). The bucket key bounds join fan-out; a skewed
    bucket (a bot minute with 10^4 users) is the one hazard — production
    adds a per-bucket membership cap (``HAVING COUNT(*) < cap``) exactly
    like dedup's LSH band-size ceiling. Orientation (u < v) halves the
    edge set and makes every downstream count exact, not double-counted.
  * Triangles: the ordered edge-join — each triangle u < v < w is found
    exactly once as (u,v)+(v,w)+(u,w). Two shuffle joins on endpoint
    keys; the classic O(E^1.5) plan. AQE splits oversized partitions when
    endpoints skew (celebrity nodes).
  * PageRank: per-iteration cost is one join (ranks × out-edges) + one
    aggregation — all shuffles keyed on node id; ``localCheckpoint``
    truncates lineage so the 10th iteration plans as one round, not ten.
    No driver-side state at all beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.capping import (
    capped_group,
    oversized_groups,
)
from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load, ts_us

#: 5-minute co-occurrence bucket, in epoch microseconds.
BUCKET_US = 300 * 1_000_000


def _edges_sql(max_user: int | None = None) -> str:
    """DuckDB twin of cooccurrence_edges (oriented u < v, deduplicated)."""
    cap = f"WHERE user_id < {max_user}" if max_user is not None else ""
    return f"""
    WITH m AS (
        SELECT DISTINCT event_type,
               EPOCH_US(ts) // {BUCKET_US} AS bucket,
               user_id
        FROM events {cap}
    ),
    edges AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM m a JOIN m b
          ON a.event_type = b.event_type AND a.bucket = b.bucket
         AND a.user_id < b.user_id
    )
"""


def cooccurrence_edges(
    spark: SparkSession, sf_dir: str, max_user: int | None = None
) -> DataFrame:
    """Distinct oriented edges (u < v): users sharing a (type, 5-minute)
    bucket. The distinct-before-join projection is what bounds cost — the
    self-join runs on unique (bucket, user) memberships, not raw events.
    ``max_user`` is the deterministic node cap quadratic consumers use to
    pin their cost at large SFs."""
    e = load(spark, sf_dir, "events")
    if max_user is not None:
        e = e.filter(F.col("user_id") < max_user)
    m = (
        e.select("event_type", ts_us(e).alias("ts_us"), "user_id")
        .select(
            "event_type",
            F.expr(f"ts_us div {BUCKET_US}").alias("bucket"),
            "user_id",
        )
        .distinct()
    )
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )


@register(
    "graph_degree_hist",
    oracle=_edges_sql()
    + """
    , deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR1 — degree distribution of the co-occurrence graph: node degree,
    then a histogram of degrees — the first profiling query on any graph
    (power-law check, max-degree hazard scan before any quadratic op).
    Undirected degree = appearances on either side of the oriented edge
    list. Two map-side-combined aggregations; output is degree-cardinality
    rows regardless of graph size."""
    # edge list materialized once (the assortativity/triangle-count
    # precedent) — the u/v union branches otherwise re-plan the
    # co-occurrence self-join twice (4 events scans in one plan; r15)
    e = cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


#: Node cap for the quadratic triangle join: keeps the sf0.1 wedge count
#: bounded while leaving the sf≤0.01 graph (user_id < 150) untouched.
TRI_MAX_USER = 600


@register(
    "graph_triangle_count",
    oracle=_edges_sql(TRI_MAX_USER)
    + """
    , tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    member AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM member GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR2 — per-node triangle participation via the ordered edge-join:
    each triangle u < v < w matched exactly once as (u,v)+(v,w)+(u,w),
    then exploded to its three members. Triangle density is the standard
    community-vs-spam signal on link graphs (a link farm has high degree
    but few closed triangles). Two shuffle joins on endpoint keys — the
    textbook plan; no node ever holds more than its own neighborhood."""
    e = cooccurrence_edges(spark, sf_dir, max_user=TRI_MAX_USER).localCheckpoint(
        eager=True
    )
    return triangle_counts(e)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) over an oriented (u < v) edge DataFrame — the
    library form the Engine facade exposes; graph_triangle_count is its
    registered oracle-checked instance."""
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    member = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return member.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@register("graph_pagerank")
def graph_pagerank(
    spark: SparkSession,
    sf_dir: str,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """GR3 — PageRank on the undirected co-occurrence graph (each edge
    walked both ways), the classic corpus-quality prior. Rows-only driver
    check: rank values are float sums whose partition fold order varies
    run-to-run (like cluster_kmeans); the invariants — rank mass
    conservation (Σrank == N), positivity, degree correlation — are
    pytest properties (tests/test_graph.py).

    Power iteration, all distributed: share = rank/out_deg per node,
    routed along out-edges (shuffle keyed on node), then summed per
    destination with the damping re-injection. Dangling nodes cannot
    occur here (symmetrized edges ⇒ every node has out-degree ≥ 1)."""
    e = cooccurrence_edges(spark, sf_dir)
    return pagerank_edges(e, damping=damping, iters=iters)


def pagerank_edges(
    edges: DataFrame, damping: float = 0.85, iters: int = 10
) -> DataFrame:
    """(node, rank) over an oriented (u < v) edge DataFrame — the library
    form the Engine facade exposes; graph_pagerank is its registered
    instance. See that docstring for the iteration/scale analysis."""
    e = edges
    # Symmetrize: undirected PageRank walks each edge in both directions.
    out = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    nodes = (
        out.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contribs = (
            ranks.join(nodes, "node")
            .select("node", (F.col("rank") / F.col("out_deg")).alias("share"))
            .join(out, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), F.col("share"))
        )
        ranks = (
            contribs.groupBy("node")
            .agg((F.lit(1 - damping) + F.lit(damping) * F.sum("share")).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous label-propagation round as two CTEs: neighbor-label
    counts, then the deterministic argmax (count DESC, label ASC)."""
    return f"""
    {out}_cnt AS (
        SELECT s.dst AS node, l.lbl, COUNT(*) AS n
        FROM sym s JOIN {prev} l ON l.node = s.src
        GROUP BY s.dst, l.lbl
    ),
    {out} AS (
        SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY n DESC, lbl) AS rn
            FROM {out}_cnt)
        WHERE rn = 1
    )"""


#: Fixed LPA round count — unrolled identically in the SQL oracle.
LPA_ROUNDS = 3


@register(
    "graph_label_propagation",
    oracle=_edges_sql()
    + """
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    lbl0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
    """
    + ",".join(_lpa_round_sql(f"lbl{i}", f"lbl{i+1}") for i in range(LPA_ROUNDS))
    + """
    SELECT node, lbl AS community FROM lbl3
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR4 — community detection by synchronous label propagation
    (Raghavan et al. 2007), made fully DETERMINISTIC: each round every
    node adopts its neighborhood's most frequent label with the tie
    broken toward the smallest label — an integer argmax, so unlike the
    classic randomized-order LPA the result is reproducible across runs,
    partitionings, and engines. Fixed LPA_ROUNDS=3 rounds (synchronous
    LPA may oscillate on bipartite-ish structure rather than converge;
    a fixed budget is the standard remedy and keeps the oracle exact —
    the SQL twin unrolls the same three rounds as nested CTEs, making
    this an ORACLE-CHECKED iterative graph algorithm, unlike the
    rows-only PageRank whose float ranks cannot hash).

    Scale: per round one shuffle join (labels × symmetrized edges) and
    one two-level aggregation — identical profile to the connected-
    components propagation in operators/dedup.py; ``localCheckpoint``
    cuts lineage each round."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    lbl = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(LPA_ROUNDS):
        cnt = (
            sym.join(lbl, lbl["node"] == sym["src"])
            .groupBy(F.col("dst").alias("n2"), "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = F.max_by(
            F.col("lbl"), F.struct(F.col("n"), (-F.col("lbl")).alias("neg"))
        )
        lbl = (
            cnt.groupBy(F.col("n2").alias("node"))
            .agg(best.alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lbl.select("node", F.col("lbl").alias("community"))


def _bfs_round_sql(prev: str, out: str) -> str:
    """One synchronous BFS relaxation round as a CTE: keep every known
    distance, add neighbor distances + 1, take the per-node minimum."""
    return f"""
    {out} AS (
        SELECT node, MIN(d) AS d FROM (
            SELECT node, d FROM {prev}
            UNION ALL
            SELECT s.dst AS node, p.d + 1 AS d
            FROM sym s JOIN {prev} p ON p.node = s.src
        ) GROUP BY node
    )"""


#: Fixed BFS hop budget — unrolled identically in the SQL oracle.
BFS_HOPS = 3

#: Seed predicate: every node whose id is a multiple of 50 (a deterministic
#: stand-in for a labeled seed set — "trusted users", "known-good docs").
BFS_SEED_MOD = 50




def bfs_hops(sym: DataFrame, seeds: DataFrame, hops: int = BFS_HOPS) -> DataFrame:
    """(node, hops) minimum hop distance from ``seeds`` (one ``node``
    column) over symmetrized ``(src, dst)`` edges, bounded to ``hops``
    synchronous min-relaxation rounds — shared by the oracle-checked
    ``graph_bfs_hops`` and ``Engine.bfs``. MIN relaxation is
    order-independent, so no tiebreaks are needed anywhere."""
    dist = seeds.select("node").withColumn("d", F.lit(0))
    for _ in range(hops):
        relaxed = sym.join(dist, dist["node"] == sym["src"]).select(
            F.col("dst").alias("node"), (F.col("d") + 1).alias("d")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    return dist.select("node", F.col("d").alias("hops"))


@register(
    "graph_bfs_hops",
    oracle=_edges_sql()
    + """
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    d0 AS (
        SELECT DISTINCT src AS node, 0 AS d FROM sym
        WHERE src % 50 = 0
    ),
    """
    + ",".join(_bfs_round_sql(f"d{i}", f"d{i+1}") for i in range(BFS_HOPS))
    + """
    SELECT node, d AS hops FROM d3
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR5 — bounded multi-source BFS: the minimum hop distance from a
    seed set (node id ≡ 0 mod 50) to every node reachable within
    BFS_HOPS=3 hops of the co-occurrence graph. This is the
    trust-propagation / crawl-frontier / influence-radius primitive
    (TrustRank seeds, contamination blast radius, friend-of-friend
    features) — and, like label propagation above, an ORACLE-CHECKED
    iterative graph algorithm: min-hop relaxation is exact integer math,
    so the SQL twin unrolls the same three synchronous rounds.

    Determinism: MIN() relaxation is order-independent (idempotent,
    commutative, associative) — no tiebreaks needed anywhere.

    Scale: per round one shuffle join (frontier × symmetrized edges) and
    one min-combine aggregation whose partials fold map-side; distances
    are single longs per node. ``localCheckpoint`` cuts the growing
    lineage each round — the Pregel-on-DataFrames shape at any scale."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    seeds = (
        sym.select(F.col("src").alias("node"))
        .filter(F.col("node") % BFS_SEED_MOD == 0)
        .distinct()
    )
    return bfs_hops(sym, seeds)


@register(
    "graph_jaccard_neighbors",
    oracle=_edges_sql(TRI_MAX_USER)
    + """
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src),
    common AS (
        SELECT e.u, e.v, COUNT(*) AS n_common
        FROM edges e
        JOIN sym a ON a.src = e.u
        JOIN sym b ON b.src = e.v AND b.dst = a.dst
        GROUP BY e.u, e.v
    )
    SELECT e.u, e.v,
           COALESCE(c.n_common, 0) AS n_common,
           du.d AS deg_u, dv.d AS deg_v,
           ROUND(COALESCE(c.n_common, 0) * 1.0
                 / (du.d + dv.d - COALESCE(c.n_common, 0)), 6) AS jaccard
    FROM edges e
    JOIN deg du ON du.node = e.u
    JOIN deg dv ON dv.node = e.v
    LEFT JOIN common c ON c.u = e.u AND c.v = e.v
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR6 — neighborhood Jaccard similarity for every EXISTING edge: the
    standard link-strength / link-prediction feature (|N(u)∩N(v)| /
    |N(u)∪N(v)|, open neighborhoods). Strong ties share most neighbors;
    spam/bridge edges score near zero — the edge-weighting pass run before
    community detection or friend recommendations.

    Same ordered wedge-join shape as triangle_counts (common neighbors of
    an edge = triangles through it), one count aggregation, then two
    degree-table joins and a pure-map Jaccard from inclusion–exclusion.
    Node cap shared with the triangle query pins quadratic wedge cost at
    large SFs; the 100 TB dial is degree capping (drop super-nodes from
    the wedge join — they're never informative ties anyway).

    Exact arithmetic throughout; the single float division is rounded to
    6 on both engines."""
    e = cooccurrence_edges(spark, sf_dir, max_user=TRI_MAX_USER).localCheckpoint(
        eager=True
    )
    sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    a, b = sym.alias("a"), sym.alias("b")
    common = (
        e.join(a, F.col("a.src") == F.col("u"))
        .join(b, (F.col("b.src") == F.col("v")) & (F.col("b.dst") == F.col("a.dst")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    return (
        e.join(du, "u")
        .join(dv, "v")
        .join(common, ["u", "v"], "left")
        .select(
            "u",
            "v",
            nc.alias("n_common"),
            "deg_u",
            "deg_v",
            F.round(
                nc * 1.0 / (F.col("deg_u") + F.col("deg_v") - nc), 6
            ).alias("jaccard"),
        )
    )


def _pr_round_sql(prev: str, out: str) -> str:
    """One exact-PageRank round: 12-decimal share per edge source, exact
    decimal sum per target, deterministic damped update."""
    return f"""
    {out}_c AS (
        SELECT s.dst AS node,
               CAST(ROUND(CAST(p.rank AS DOUBLE) / d.out_deg, 12)
                    AS DECIMAL(20,12)) AS share
        FROM {prev} p
        JOIN deg d ON d.node = p.node
        JOIN sym s ON s.src = p.node
    ),
    {out} AS (
        SELECT node,
               CAST(ROUND(0.15 + 0.85 * CAST(SUM(share) AS DOUBLE), 12)
                    AS DECIMAL(20,12)) AS rank
        FROM {out}_c GROUP BY node
    )"""


#: Exact-PageRank round count — unrolled identically in the SQL oracle.
PR_EXACT_ROUNDS = 3


@register(
    "graph_pagerank_exact",
    oracle=_edges_sql()
    + """
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS out_deg FROM sym GROUP BY src),
    r0 AS (SELECT node, CAST(1.0 AS DECIMAL(20,12)) AS rank FROM deg),
    """
    + ",".join(_pr_round_sql(f"r{i}", f"r{i+1}") for i in range(PR_EXACT_ROUNDS))
    + """
    SELECT node, ROUND(CAST(rank AS DOUBLE), 6) AS rank FROM r3
    """,
)
def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR3b — ORACLE-CHECKED PageRank: the same power iteration as the
    rows-only graph_pagerank, made hash-comparable by quantizing each
    node's per-edge share to 12 decimals (stored DECIMAL(20,12), so the
    per-target sum is EXACT and order-independent — the dsum rule applied
    inside an iterative algorithm) and applying the damped update through
    one fixed IEEE sequence per round. Quantization error is ≤ deg·5e-13
    per node per round — far below the 6-decimal reporting grid — while
    making three unrolled rounds bit-identical between Spark and the
    DuckDB recursive-CTE twin. The rows-only float variant remains the
    production form (no per-round rounding cost); THIS one exists to pin
    the iteration's semantics cross-engine.

    Scale profile identical to graph_pagerank: per round one key join +
    one map-side-combining decimal sum; localCheckpoint cuts lineage."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    ).localCheckpoint(eager=True)
    ranks = deg.select("node", F.lit(1.0).cast("decimal(20,12)").alias("rank"))
    for _ in range(PR_EXACT_ROUNDS):
        shares = (
            ranks.join(deg, "node")
            .select(
                "node",
                F.round(
                    F.col("rank").cast("double") / F.col("out_deg"), 12
                )
                .cast("decimal(20,12)")
                .alias("share"),
            )
            .join(sym, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), "share")
        )
        ranks = (
            shares.groupBy("node")
            .agg(
                F.round(
                    F.lit(0.15) + F.lit(0.85) * F.sum("share").cast("double"),
                    12,
                )
                .cast("decimal(20,12)")
                .alias("rank")
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round(F.col("rank").cast("double"), 6).alias("rank"))


def _kcore_round_sql(prev: str, out: str, k: int) -> str:
    """One k-core peel: degrees over the surviving edge set, keep nodes
    with degree ≥ k, keep edges between kept nodes. Every CTE is
    MATERIALIZED (r13, the HITS-oracle lesson): each round references
    the previous edge set twice, so DuckDB's CTE inlining re-evaluated
    the whole peel chain exponentially."""
    return f"""
    {out}_deg AS MATERIALIZED (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM {prev}
            UNION ALL
            SELECT v FROM {prev}
        ) GROUP BY node
    ),
    {out}_keep AS MATERIALIZED (SELECT node FROM {out}_deg WHERE d >= {k}),
    {out} AS MATERIALIZED (
        SELECT e.u, e.v FROM {prev} e
        JOIN {out}_keep a ON a.node = e.u
        JOIN {out}_keep b ON b.node = e.v
    )"""


#: k-core parameters: threshold and fixed peel rounds (unrolled in SQL).
KCORE_K = 5
KCORE_ROUNDS = 3


@register(
    "graph_kcore_peel",
    oracle=_edges_sql()
    + ", e0 AS MATERIALIZED (SELECT u, v FROM edges),"
    + ",".join(
        _kcore_round_sql(f"e{i}", f"e{i+1}", KCORE_K)
        for i in range(KCORE_ROUNDS)
    )
    + f"""
    SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM e{KCORE_ROUNDS}
        UNION ALL
        SELECT v FROM e{KCORE_ROUNDS}
    ) GROUP BY node
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR7 — k-core decomposition by iterative peeling (k=5, 3 unrolled
    rounds): repeatedly remove nodes with fewer than k surviving
    neighbors; what's left approaches the 5-core — the dense backbone
    used to separate engaged communities from drive-by noise, and the
    third ORACLE-CHECKED iterative graph algorithm here (min-relaxation
    BFS, label propagation, now subgraph-restriction peeling — each with
    a different fixpoint structure). Fixed round count keeps the oracle
    an exact unrolled-CTE twin; peeling is monotone, so 3 rounds is a
    sound over-approximation of the core that converges from above
    (documented, not hidden).

    Scale: per round one degree aggregation (map-side combining) + one
    semi-join-shaped edge filter; edge set only shrinks. localCheckpoint
    per round cuts lineage — the same Pregel-on-DataFrames profile as
    BFS/LPA."""
    e = cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= KCORE_K).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


# ---------------------------------------------------------------------------
# Weighted bounded-hop shortest path (Bellman–Ford, K rounds)

#: Node cap for the shortest-path demo (quadratic ORACLE cost: the 3-hop
#: path union in DuckDB is |edges|·deg² — the engine itself is per-round
#: linear in edges and needs no cap).
SP_MAX_USER = 300

#: Hop bound K: 3 relaxation rounds = exact distances over paths of ≤ 3
#: edges (the "friends-of-friends-of-friends" radius).
SP_ROUNDS = 3


def weighted_cooccurrence_edges(
    spark: SparkSession, sf_dir: str, max_user: int | None = None
) -> DataFrame:
    """(u, v, n_shared, cost) oriented u < v: like
    :func:`cooccurrence_edges` but keeping the shared-bucket COUNT as a
    tie-strength weight, mapped to an integer traversal cost
    ``floor(1e6 / n_shared) + 1`` (stronger ties are cheaper; exact
    integer arithmetic in both engines)."""
    e = load(spark, sf_dir, "events")
    if max_user is not None:
        e = e.filter(F.col("user_id") < max_user)
    m = (
        e.select("event_type", ts_us(e).alias("ts_us"), "user_id")
        .select(
            "event_type",
            F.expr(f"ts_us div {BUCKET_US}").alias("bucket"),
            "user_id",
        )
        .distinct()
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn(
            "cost",
            (F.floor(F.lit(1_000_000) / F.col("n_shared")) + 1).cast(
                "bigint"
            ),
        )
    )


def _wedges_sql(max_user: int) -> str:
    """DuckDB twin of weighted_cooccurrence_edges + symmetrization."""
    return f"""
    WITH m AS (
        SELECT DISTINCT event_type,
               EPOCH_US(ts) // {BUCKET_US} AS bucket,
               user_id
        FROM events WHERE user_id < {max_user}
    ),
    wedges AS (
        SELECT a.user_id AS u, b.user_id AS v,
               CAST(FLOOR(1000000 / COUNT(*)) AS BIGINT) + 1 AS cost
        FROM m a JOIN m b
          ON a.event_type = b.event_type AND a.bucket = b.bucket
         AND a.user_id < b.user_id
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT u, v, cost FROM wedges
        UNION ALL
        SELECT v, u, cost FROM wedges
    )
"""


@register(
    "graph_shortest_path_k3",
    oracle=_wedges_sql(SP_MAX_USER)
    + """
    , src AS (SELECT DISTINCT u AS s FROM sym WHERE u < 5),
    p1 AS (
        SELECT s.s, e1.v AS node, e1.cost AS d
        FROM src s JOIN sym e1 ON e1.u = s.s
    ),
    p2 AS (
        SELECT p1.s, e2.v AS node, p1.d + e2.cost AS d
        FROM p1 JOIN sym e2 ON e2.u = p1.node
    ),
    p3 AS (
        SELECT p2.s, e3.v AS node, p2.d + e3.cost AS d
        FROM p2 JOIN sym e3 ON e3.u = p2.node
    ),
    allp AS (
        SELECT s, s AS node, CAST(0 AS BIGINT) AS d FROM src
        UNION ALL SELECT * FROM p1
        UNION ALL SELECT * FROM p2
        UNION ALL SELECT * FROM p3
    )
    SELECT s AS source, node, MIN(d) AS dist
    FROM allp GROUP BY 1, 2
    """,
)
def graph_shortest_path_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G — single-source shortest path, weighted, hop-bounded: exact
    min-cost distances from each source (nodes with id < 5) over paths of
    at most ``SP_ROUNDS`` edges in the tie-strength-weighted co-occurrence
    graph. This is distributed Bellman–Ford with a fixed round count —
    the bounded-hop semantics every large-graph engine actually ships
    (unbounded Dijkstra doesn't distribute; K-round relaxation is one
    equi-join + one min-aggregate per round, all shuffles keyed on node).

    The oracle expands the path space explicitly (1-, 2-, 3-edge unions,
    then MIN) — correct and quadratic, hence ``SP_MAX_USER``; the engine
    relaxes a frontier whose size is bounded by |nodes|·|sources|, linear
    in edges per round at any scale.

    Determinism: integer costs, MIN over exact integers; sources and the
    node cap are value-pinned, not data-ordered."""
    we = weighted_cooccurrence_edges(spark, sf_dir, max_user=SP_MAX_USER)
    sym = (
        we.select("u", "v", "cost")
        .unionByName(
            we.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "cost"
            )
        )
        .localCheckpoint(eager=False)
    )
    dist = (
        sym.select(F.col("u").alias("source"))
        .filter(F.col("source") < 5)
        .distinct()
        .select(
            "source",
            F.col("source").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
    )
    for _ in range(SP_ROUNDS):
        ext = dist.join(sym, dist["node"] == sym["u"]).select(
            "source",
            F.col("v").alias("__node"),
            (F.col("dist") + F.col("cost")).alias("__d"),
        ).withColumnRenamed("__node", "node").withColumnRenamed("__d", "dist")
        dist = (
            dist.unionByName(ext)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


# ---------------------------------------------------------------------------
# Bipartite projection (part–supplier → supplier co-part graph)

#: Part-key fixture filter bounding the ORACLE's (and engine's) input to a
#: hash-checkable subgraph. The SCALE defense is separate and real:
#: ``max_part_degree`` below.
BIPART_MAX_PART = 2000

#: Minimum shared parts for a projected edge (support threshold — the
#: projection without one is almost complete on dense categories).
BIPART_MIN_SHARED = 2

#: Per-part degree cap (suppliers per part) for the projection self-join —
#: the C(deg, 2) fan-out dial. TPC-H parts have ~4 suppliers each, so the
#: registered query runs the exact-or-fail ``error`` mode far above every
#: organic fixture degree (the ``dedup_minhash_verified`` contract): output
#: is bit-identical to uncapped semantics, and a future mega-part fails
#: LOUDLY instead of silently diverging from the uncapped oracle.
BIPART_MAX_DEGREE = 256


def bipartite_project(
    memberships: DataFrame,
    max_part_degree: int | None = BIPART_MAX_DEGREE,
    on_oversized: str = "drop",
    min_shared: int = BIPART_MIN_SHARED,
) -> DataFrame:
    """(s1, s2, co_parts) — project a DISTINCT (part, supp) membership
    frame onto suppliers, weighting each pair by shared parts. The
    self-join equi-joins on the part key; per-part pair fan-out is
    C(deg, 2), so a hot part (one shipped by thousands of suppliers) is
    the same hazard class as an LSH mega-bucket and takes the SAME dial —
    the shared :func:`~avro_parquet_spark_example_spark.operators.capping.
    capped_group` (``drop`` excludes + observe via
    :func:`graph_oversized_parts`; ``error`` is exact-or-fail for
    hash-checked callers; ``split`` sub-partitions the hot part's
    supplier set — recall within the hot part is ~1/n_sub per pass since
    a pair only survives when both suppliers hash to the same sub-part,
    the availability-over-recall trade for projections where hot parts
    are boilerplate). Delivers the cap VERDICT r9 flagged as
    documented-but-absent (finding #1)."""
    m, keys = capped_group(
        memberships,
        ["part"],
        max_part_degree,
        on_oversized,
        split_salt_cols=["supp", "part"],
        min_group_size=2,
        cap_name="max_part_degree",
        label="bipartite part",
    )
    a, b = m.alias("a"), m.alias("b")
    cond = (F.col("a.supp") < F.col("b.supp"))
    for k in keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return (
        a.join(b, cond)
        .groupBy(F.col("a.supp").alias("s1"), F.col("b.supp").alias("s2"))
        .agg(F.count(F.lit(1)).alias("co_parts"))
        .filter(F.col("co_parts") >= min_shared)
    )


def graph_oversized_parts(
    memberships: DataFrame, max_part_degree: int = BIPART_MAX_DEGREE
) -> DataFrame:
    """(part, group_size) for parts whose supplier degree exceeds the cap
    — the monitoring half of drop-with-log (``lsh_oversized_buckets``
    twin). Delegates to the shared :func:`~avro_parquet_spark_example_
    spark.operators.capping.oversized_groups`."""
    return oversized_groups(memberships, ["part"], max_part_degree)


@register(
    "graph_bipartite_projection",
    oracle=f"""
    WITH m AS (
        SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
        FROM lineitem WHERE l_partkey < {BIPART_MAX_PART}
    )
    SELECT a.supp AS s1, b.supp AS s2,
           CAST(COUNT(*) AS BIGINT) AS co_parts
    FROM m a JOIN m b ON a.part = b.part AND a.supp < b.supp
    GROUP BY 1, 2
    HAVING COUNT(*) >= {BIPART_MIN_SHARED}
    """,
)
def graph_bipartite_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """G — bipartite projection: collapse the part–supplier incidence
    graph (from lineitem) onto suppliers, weighting each supplier pair
    by the number of parts both ship — the standard co-purchase /
    co-authorship construction, and the candidate generator for
    supplier-substitution recommendations. Same plan skeleton as
    ``cooccurrence_edges``: DISTINCT memberships first (one shuffle —
    the step that makes a part shipped in 10,000 lineitems contribute
    its supplier set ONCE), equi-join on the part key (never a cross
    join), count aggregate with a support threshold.

    Scale: per-part pair fan-out is C(deg, 2) — bounded by the supplier
    catalog per part after the distinct, and CAPPED by
    ``max_part_degree`` via the shared ``capped_group`` (this registered
    query runs ``on_oversized="error"``: exact-or-fail against the
    uncapped oracle, a mega-part raises instead of silently diverging).
    Exact integer weights."""
    m = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < BIPART_MAX_PART)
        .select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    return bipartite_project(m, on_oversized="error")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (quantized power iteration, oracle-checked)

#: HITS round count — unrolled identically in the SQL oracle.
HITS_ROUNDS = 3

#: Largest node set graph_hits_bipartite will force-broadcast as a score
#: frame. A score row is ~24 bytes (bigint key + decimal(20,12)), so 4M
#: rows is ~100 MB hashed — comfortably inside a standard executor; above
#: it the per-round joins fall back to shuffle (still linear in edges).
HITS_BROADCAST_MAX_NODES = 4_000_000


def _hits_round_sql(h_prev: str, a_out: str, h_out: str) -> str:
    """One exact HITS round: authority = Σ incident hub scores, hub =
    Σ incident authority scores, each max-normalized and quantized to
    12 decimals so sums stay order-independent.

    Every CTE is MATERIALIZED (r13): each score frame is referenced
    twice (the normalizer's MAX subquery + the next half-round's join),
    and DuckDB inlines plain CTEs, so the unrolled 3-round chain was
    re-evaluating the incidence join tree ~2^6 times (~20 s at sf0.1).
    Materializing makes the oracle one linear pass per half-round —
    the iteration-table form the Spark side already has via
    localCheckpoint. DuckDB-only syntax; values are unchanged."""
    return f"""
    {a_out}_raw AS MATERIALIZED (
        SELECT e.part, CAST(SUM(h.score) AS DECIMAL(38,12)) AS s
        FROM inc e JOIN {h_prev} h ON h.supp = e.supp GROUP BY e.part
    ),
    {a_out} AS MATERIALIZED (
        SELECT part,
               CAST(ROUND(CAST(s AS DOUBLE)
                          / (SELECT CAST(MAX(s) AS DOUBLE) FROM {a_out}_raw),
                          12) AS DECIMAL(20,12)) AS score
        FROM {a_out}_raw
    ),
    {h_out}_raw AS MATERIALIZED (
        SELECT e.supp, CAST(SUM(a.score) AS DECIMAL(38,12)) AS s
        FROM inc e JOIN {a_out} a ON a.part = e.part GROUP BY e.supp
    ),
    {h_out} AS MATERIALIZED (
        SELECT supp,
               CAST(ROUND(CAST(s AS DOUBLE)
                          / (SELECT CAST(MAX(s) AS DOUBLE) FROM {h_out}_raw),
                          12) AS DECIMAL(20,12)) AS score
        FROM {h_out}_raw
    )"""


@register(
    "graph_hits_bipartite",
    oracle="""
    WITH inc AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS supp, l_partkey AS part FROM lineitem
    ),
    h0 AS MATERIALIZED (
        SELECT DISTINCT supp, CAST(1.0 AS DECIMAL(20,12)) AS score FROM inc
    ),
    """
    + ",".join(
        _hits_round_sql(f"h{i}", f"a{i + 1}", f"h{i + 1}")
        for i in range(HITS_ROUNDS)
    )
    + f"""
    SELECT 'hub' AS kind, supp AS id,
           ROUND(CAST(score AS DOUBLE), 6) AS score
    FROM h{HITS_ROUNDS}
    UNION ALL
    SELECT 'authority', part, ROUND(CAST(score AS DOUBLE), 6)
    FROM a{HITS_ROUNDS}
    """,
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR — HITS (Kleinberg's hubs & authorities) on the supplier→part
    incidence graph: a supplier is a strong HUB if it ships many strong-
    authority parts; a part is a strong AUTHORITY if strong hubs ship
    it — the mutual-reinforcement ranking PageRank can't express on
    bipartite incidence (and on a symmetric graph the two scores
    degenerate into one, so the DIRECTED bipartite edge set is the
    honest fixture). Three power-iteration rounds, max-normalized —
    the ``vec_power_iteration_top_pc`` normalizer precedent — with each
    score quantized to DECIMAL(20,12) per round (the
    ``graph_pagerank_exact`` dsum rule), so every per-node sum is exact
    and order-independent and the DuckDB unrolled-CTE twin matches
    bit-for-bit at 6dp.

    Scale: per round, two incidence-keyed equi-joins + two map-side-
    combined decimal sums + two 1-row max normalizers — linear in
    edges, the same profile as PageRank; localCheckpoint cuts lineage
    per round.

    Stage-attributed r10 (tools/hits_profile.py — VERDICT r9 asked for
    the minhash_profile treatment of the registry's cost outlier): the
    score frames are NODE-cardinality (≤ |supp|+|part|) but, coming off
    a checkpoint+crossJoin, carry no stats, so Spark shuffle-joined the
    full incidence frame per half-round. Forcing ``F.broadcast(score)``
    into each join removes all six incidence shuffles — measured 5.19 s
    → 3.34 s warm at sf0.1 (standalone fresh run 14.3 s → ~7 s); the
    checkpoint now cuts lineage on the RAW aggregate, with max +
    normalize derived lazily (one materialization per half-round)."""
    inc = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The forced broadcast is only safe while the node sets fit a
    # driver/executor hashed relation; at the 100 TB regime |supp| or
    # |part| can exceed that, so gate on an explicit node-count bound
    # and fall back to the shuffle join above it (ADVICE r10 #4). One
    # cheap count pass over the checkpointed incidence frame.
    counts = inc.agg(
        F.countDistinct("supp").alias("ns"),
        F.countDistinct("part").alias("np"),
    ).first()
    small_nodes = max(counts["ns"], counts["np"]) <= HITS_BROADCAST_MAX_NODES
    h = inc.select("supp").distinct().select(
        "supp", F.lit(1.0).cast("decimal(20,12)").alias("score")
    )
    a = None
    for _ in range(HITS_ROUNDS):
        for key, join_key in (("part", "supp"), ("supp", "part")):
            score = h if key == "part" else a
            raw = (
                inc.join(
                    F.broadcast(score) if small_nodes else score, join_key
                )
                .groupBy(key)
                .agg(F.sum("score").alias("s"))
                .localCheckpoint(eager=True)
            )
            mx = raw.agg(F.max("s").cast("double").alias("mx"))
            out = raw.crossJoin(F.broadcast(mx)).select(
                key,
                F.round(F.col("s").cast("double") / F.col("mx"), 12)
                .cast("decimal(20,12)")
                .alias("score"),
            )
            if key == "part":
                a = out
            else:
                h = out
    hubs = h.select(
        F.lit("hub").alias("kind"),
        F.col("supp").alias("id"),
        F.round(F.col("score").cast("double"), 6).alias("score"),
    )
    auths = a.select(
        F.lit("authority").alias("kind"),
        F.col("part").alias("id"),
        F.round(F.col("score").cast("double"), 6).alias("score"),
    )
    return hubs.unionByName(auths)


@register(
    "graph_modularity",
    oracle=_edges_sql()
    + """
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    lbl0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
    """
    + ",".join(
        _lpa_round_sql(f"lbl{i}", f"lbl{i + 1}") for i in range(LPA_ROUNDS)
    )
    + f""",
    comm AS (SELECT node, lbl AS community FROM lbl{LPA_ROUNDS}),
    mtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    internal AS (
        SELECT ca.community, CAST(COUNT(*) AS BIGINT) AS m_c
        FROM edges e
        JOIN comm ca ON ca.node = e.u
        JOIN comm cb ON cb.node = e.v AND cb.community = ca.community
        GROUP BY ca.community
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src),
    dsum AS (
        SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d.d) AS BIGINT) AS d_c
        FROM comm c JOIN deg d ON d.node = c.node
        GROUP BY c.community
    )
    SELECT ds.community, ds.n_nodes,
           COALESCE(i.m_c, 0) AS internal_edges,
           ds.d_c AS degree_sum,
           ROUND(COALESCE(i.m_c, 0) * 1.0 / mt.m
                 - (ds.d_c * 0.5 / mt.m) * (ds.d_c * 0.5 / mt.m), 9)
               AS modularity_term
    FROM dsum ds LEFT JOIN internal i ON i.community = ds.community
    CROSS JOIN mtot mt
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR — Newman modularity of the label-propagation communities:
    per community c, Q_c = m_c/m − (d_c/2m)² (internal-edge share minus
    the share a degree-preserving random graph would put inside c);
    Σ Q_c is THE standard "did the community detection find real
    structure" score, and the quantity Louvain greedily optimizes —
    this operator is that algorithm's evaluation step, computed from
    exact integers (edge counts, degree sums) with one fixed IEEE
    expression per community. Composes two existing oracle-checked
    pieces: ``cooccurrence_edges`` and the deterministic synchronous
    LPA (same unrolled rounds in the oracle).

    Scale: the partition join (edges ⋈ community×2) is edge-linear and
    key-shuffled; degree/count aggregates are map-side combined; the
    1-row edge total broadcasts. 100 TB-safe."""
    e = cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    comm = graph_label_propagation(spark, sf_dir).localCheckpoint(
        eager=True
    )
    m_row = F.broadcast(e.agg(F.count(F.lit(1)).alias("m")))
    ca = comm.select(F.col("node").alias("u"), F.col("community"))
    cb = comm.select(
        F.col("node").alias("v"), F.col("community").alias("community_b")
    )
    internal = (
        e.join(ca, "u")
        .join(cb, "v")
        .filter(F.col("community") == F.col("community_b"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    sym = e.select(F.col("u").alias("node")).unionByName(
        e.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    dsum = comm.join(deg, "node").groupBy("community").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("d_c")
    )
    mc = F.coalesce(F.col("m_c"), F.lit(0))
    half_share = F.col("d_c") * 0.5 / F.col("m")
    return (
        dsum.join(internal, "community", "left")
        .crossJoin(m_row)
        .select(
            "community",
            "n_nodes",
            mc.alias("internal_edges"),
            F.col("d_c").alias("degree_sum"),
            F.round(
                mc * 1.0 / F.col("m") - half_share * half_share, 9
            ).alias("modularity_term"),
        )
    )


# ---------------------------------------------------------------------------
# GR3c — personalized PageRank (exact, seed-restart power iteration)

#: Seed count for the personalized restart set: the PPR_SEEDS lowest
#: node ids (deterministic, SQL-expressible — the anchor-selection
#: precedent of vec_knn_graph_ivf).
PPR_SEEDS = 3

#: Personalized-PageRank round count — unrolled identically in the oracle.
PPR_ROUNDS = 3


def _ppr_round_sql(prev: str, out: str) -> str:
    """One exact personalized-PageRank round: 12-decimal share per edge
    source, exact decimal sum per target, restart mass ONLY on seeds."""
    return f"""
    {out}_c AS (
        SELECT s.dst AS node,
               CAST(ROUND(CAST(p.rank AS DOUBLE) / d.out_deg, 12)
                    AS DECIMAL(20,12)) AS share
        FROM {prev} p
        JOIN deg d ON d.node = p.node
        JOIN sym s ON s.src = p.node
        WHERE p.rank <> 0
    ),
    {out} AS (
        SELECT d.node,
               CAST(ROUND(CASE WHEN sd.node IS NOT NULL THEN 0.15 ELSE 0.0 END
                          + 0.85 * COALESCE(CAST(c.s AS DOUBLE), 0.0), 12)
                    AS DECIMAL(20,12)) AS rank
        FROM deg d
        LEFT JOIN (SELECT node, SUM(share) AS s FROM {out}_c GROUP BY node) c
          ON c.node = d.node
        LEFT JOIN seeds sd ON sd.node = d.node
    )"""


@register(
    "graph_personalized_pagerank",
    oracle=_edges_sql()
    + f"""
    , sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS out_deg FROM sym GROUP BY src),
    seeds AS (SELECT node FROM deg ORDER BY node LIMIT {PPR_SEEDS}),
    r0 AS (
        SELECT d.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 1.0 ELSE 0.0 END
                    AS DECIMAL(20,12)) AS rank
        FROM deg d LEFT JOIN seeds s ON s.node = d.node
    ),
    """
    + ",".join(
        _ppr_round_sql(f"r{i}", f"r{i+1}") for i in range(PPR_ROUNDS)
    )
    + f"""
    SELECT node, ROUND(CAST(rank AS DOUBLE), 6) AS rank
    FROM r{PPR_ROUNDS}
    WHERE rank <> 0
    """,
)
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GR3c — EXACT personalized PageRank: the power iteration of
    ``graph_pagerank_exact`` with the restart mass concentrated on a
    deterministic SEED set (the {PPR_SEEDS} lowest node ids) instead of
    spread uniformly — the "related to THESE nodes" ranking behind
    people-you-may-know, related-document retrieval, and seed-expansion
    labeling (finding more of a known-good corpus slice at 100 TB).
    Nodes the seeds' mass hasn't reached stay at exactly 0 (decimal
    arithmetic, no float dust) and are filtered on both engines — after
    3 rounds the output IS the seeds' 3-hop neighborhood, ranked.

    Exactness: the graph_pagerank_exact dsum contract verbatim —
    12-decimal quantized per-edge shares (DECIMAL(20,12) exact sums),
    restart term through one fixed IEEE sequence per round; the
    rank <> 0 sparsity filter also keeps each round's join linear in
    the TOUCHED frontier, not the node count (at 100 TB a PPR from a
    handful of seeds touches a vanishing fraction of the graph).

    Scale: per round one frontier join + map-side-combined decimal sum
    + broadcast seed membership; localCheckpoint cuts lineage."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(
            e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    seeds = deg.select("node").orderBy("node").limit(PPR_SEEDS)
    is_seed = F.col("seed_node").isNotNull()
    ranks = deg.join(
        F.broadcast(seeds.withColumnRenamed("node", "seed_node")),
        deg["node"] == F.col("seed_node"),
        "left",
    ).select(
        "node",
        F.when(is_seed, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .cast("decimal(20,12)")
        .alias("rank"),
    )
    for _ in range(PPR_ROUNDS):
        shares = (
            ranks.filter(F.col("rank") != 0)
            .join(deg, "node")
            .select(
                "node",
                F.round(
                    F.col("rank").cast("double") / F.col("out_deg"), 12
                )
                .cast("decimal(20,12)")
                .alias("share"),
            )
            .join(sym, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), "share")
        )
        summed = shares.groupBy("node").agg(F.sum("share").alias("s"))
        ranks = (
            deg.select("node")
            .join(summed, "node", "left")
            .join(
                F.broadcast(seeds.withColumnRenamed("node", "seed_node")),
                F.col("node") == F.col("seed_node"),
                "left",
            )
            .select(
                "node",
                F.round(
                    F.when(is_seed, F.lit(0.15)).otherwise(F.lit(0.0))
                    + F.lit(0.85)
                    * F.coalesce(
                        F.col("s").cast("double"), F.lit(0.0)
                    ),
                    12,
                )
                .cast("decimal(20,12)")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.filter(F.col("rank") != 0).select(
        "node", F.round(F.col("rank").cast("double"), 6).alias("rank")
    )


@register(
    "graph_clustering_coefficient",
    oracle=_edges_sql(TRI_MAX_USER)
    + """
    , tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    member AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ),
    tcount AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t
               FROM member GROUP BY node),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
           ROUND(CAST(2 * COALESCE(t.t, 0) AS DOUBLE)
                 / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
             AS local_cc
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    WHERE d.degree >= 2
    """,
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GR2' — local clustering coefficient per node: the fraction of a
    node's neighbor pairs that are themselves connected, lcc(v) =
    2·T(v) / (deg(v)·(deg(v)−1)) — the community-tightness signal that
    separates organic neighborhoods (high lcc) from hub spam (high
    degree, near-zero lcc), complementing ``graph_triangle_count``'s raw
    counts with the degree-normalized form analysts actually threshold.
    Triangle participation reuses the ordered edge-join
    (:func:`triangle_counts`); degrees come from one edge-list roll-up;
    zero-triangle nodes survive via left join (lcc 0), degree-1 nodes
    are excluded (undefined denominator). Integer numerator and
    denominator, one double division through the same tree both engines.

    Scale shape: identical to triangle counting (two endpoint-keyed
    shuffle joins, the per-node work bounded by neighborhood size) plus
    a degree aggregate — no new hazard class; the same ``max_user``
    deterministic cap pins the wedge count at large SFs."""
    e = cooccurrence_edges(spark, sf_dir, max_user=TRI_MAX_USER).localCheckpoint(
        eager=True
    )
    return local_clustering_coefficients(e)


def local_clustering_coefficients(e: DataFrame) -> DataFrame:
    """(node, degree, n_triangles, local_cc) over an oriented (u < v)
    edge DataFrame — the library form the Engine facade exposes;
    ``graph_clustering_coefficient`` is its registered oracle-checked
    instance (the facade-parity single-source rule)."""
    tcount = triangle_counts(e).withColumnRenamed("n_triangles", "t")
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    t = F.coalesce(F.col("t"), F.lit(0)).cast("bigint")
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tcount, "node", "left")
        .select(
            "node",
            "degree",
            t.alias("n_triangles"),
            F.round(
                (2 * t).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                6,
            ).alias("local_cc"),
        )
    )


@register(
    "graph_degree_assortativity",
    oracle=_edges_sql()
    + """
    , deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) GROUP BY node
    ),
    sym AS (
        SELECT u AS s, v AS t FROM edges
        UNION ALL
        SELECT v AS s, u AS t FROM edges
    ),
    pairs AS (
        SELECT ds.d AS j, dt.d AS k
        FROM sym JOIN deg ds ON ds.node = sym.s
                 JOIN deg dt ON dt.node = sym.t
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(j) AS BIGINT) AS sj,
               CAST(SUM(k) AS BIGINT) AS sk,
               SUM(CAST(j AS HUGEINT) * k) AS sjk,
               SUM(CAST(j AS HUGEINT) * j) AS sjj,
               SUM(CAST(k AS HUGEINT) * k) AS skk
        FROM pairs
    )
    SELECT m // 2 AS n_edges,
           ROUND((CAST(m AS DOUBLE) * CAST(sjk AS DOUBLE)
                  - CAST(sj AS DOUBLE) * CAST(sk AS DOUBLE))
                 / (SQRT(CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
                         - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
                    * SQRT(CAST(m AS DOUBLE) * CAST(skk AS DOUBLE)
                           - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))),
                 6) AS assortativity
    FROM sums
    """,
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GR1' — Newman degree assortativity of the co-occurrence graph:
    the Pearson correlation of endpoint degrees over the symmetrized
    edge list — positive r means hubs attach to hubs (social/citation
    shape), negative means hubs fan out to leaves (infrastructure /
    spam-hub shape); the one-number complement to
    ``graph_degree_hist``'s full distribution and the degree-mixing
    diagnostic run before any community detection. Each undirected edge
    contributes both orientations (the standard symmetric estimator),
    so j- and k-marginals coincide and r is orientation-free. Degree
    joins and all five moment sums are BIGINT-exact; the final Pearson
    is one fixed IEEE tree (two separate SQRTs — their argument product
    overflows int64 at web scale).

    Scale shape: one degree aggregate + two node-keyed joins decorating
    the edge list + one global moment roll-up (map-side combined to a
    single row). No quadratic stage at any size; skewed hubs only skew
    the degree-join partitions, the same hazard PageRank already
    carries (AQE splits them). (The ``degree_assortativity`` library
    form the Engine facade exposes.)"""
    # materialize the derived edge list once (the graph_triangle_count
    # precedent): the library form consumes it through four lazy union
    # branches (nodes u/v, sym u/v), so the unmaterialized form
    # re-planned the co-occurrence self-join pipeline 4x — 46 Exchanges
    # in one plan (r15)
    return degree_assortativity(
        cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    )


def degree_assortativity(e: DataFrame) -> DataFrame:
    """(n_edges, assortativity) Newman degree assortativity of an
    undirected (u, v) edge frame — the library form the Engine facade
    exposes; ``graph_degree_assortativity`` is its registered
    oracle-checked instance (facade-parity single-source rule)."""
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    pairs = (
        sym.join(deg.withColumnRenamed("node", "s").withColumnRenamed("d", "j"), "s")
        .join(deg.withColumnRenamed("node", "t").withColumnRenamed("d", "k"), "t")
        .select("j", "k")
    )
    # degree-product moment sums in DECIMAL(38,0): Σ d_j·d_k over the
    # 2m oriented rows is O(m·d_max²) — hub degrees on power-law graphs
    # push this past int64 long before m does (r12 overflow-headroom
    # audit; oracle uses HUGEINT for the same intermediates). Linear
    # sums (sj, sk) stay BIGINT.
    sums = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("j").cast("bigint").alias("sj"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("j").cast("decimal(38,0)") * F.col("k")).alias("sjk"),
        F.sum(F.col("j").cast("decimal(38,0)") * F.col("j")).alias("sjj"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("skk"),
    )
    md = F.col("m").cast("double")
    varj = md * F.col("sjj").cast("double") - F.col("sj").cast(
        "double"
    ) * F.col("sj").cast("double")
    vark = md * F.col("skk").cast("double") - F.col("sk").cast(
        "double"
    ) * F.col("sk").cast("double")
    r = (
        md * F.col("sjk").cast("double")
        - F.col("sj").cast("double") * F.col("sk").cast("double")
    ) / (F.sqrt(varj) * F.sqrt(vark))
    # degenerate-margin guard (r15 ANSI sweep): a REGULAR graph (every
    # endpoint the same degree — e.g. a cycle) zeroes the excess-degree
    # variance; the Pearson r is undefined (networkx raises there too)
    # — ANSI Spark threw where DuckDB returns NULL
    return sums.select(
        F.expr("m div 2").alias("n_edges"),
        F.when((varj == 0) | (vark == 0), F.lit(None).cast("double"))
        .otherwise(F.round(r, 6))
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Strongly connected components (bounded condensation graph)

#: Trade-flow edge threshold: keep (supplier_nation -> customer_nation)
#: edges whose lineitem volume exceeds 1.5x the mean edge volume, decided
#: in exact integers (n * n_edges * 2 > 3 * total).
_SCC_NUM, _SCC_DEN = 3, 2

#: Path-doubling rounds: covers paths up to 2^5 = 32 > 25 nodes.
_SCC_ROUNDS = 5


@register(
    "graph_scc",
    oracle=f"""
    WITH RECURSIVE vol AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(n) AS BIGINT) AS total
        FROM vol
    ),
    edges AS (
        SELECT v.src, v.dst FROM vol v, tot t
        WHERE v.n * t.cnt * {_SCC_DEN} > {_SCC_NUM} * t.total
    ),
    reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst
        FROM reach r JOIN edges e ON e.src = r.dst
    ),
    mutual AS (
        SELECT a.src AS u, a.dst AS v
        FROM reach a JOIN reach b ON b.src = a.dst AND b.dst = a.src
    ),
    sid AS (
        SELECT n.n_nationkey AS node,
               LEAST(n.n_nationkey,
                     COALESCE(MIN(m.v), n.n_nationkey)) AS scc_id
        FROM nation n LEFT JOIN mutual m ON m.u = n.n_nationkey
        GROUP BY 1
    )
    SELECT s.node, s.scc_id,
           CAST(COUNT(*) OVER (PARTITION BY s.scc_id) AS BIGINT)
               AS scc_size
    FROM sid s
    """,
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR — STRONGLY connected components of the directed nation trade
    graph (supplier nation → customer nation, edges kept where lineitem
    volume exceeds 1.5× the mean edge volume — an exact-integer
    threshold): the directed counterpart of the engine's undirected
    connected components (dedup_cluster_cc), answering "which nation
    groups trade with each other in BOTH directions at scale". SCC is
    computed as mutual reachability: transitive closure by PATH
    DOUBLING (5 unrolled rounds ≥ log₂ diameter), then u ~ v iff
    closure holds both ways; scc_id = min member; the oracle runs the
    same closure as a recursive CTE.

    Exactness: everything is integer — edge selection clears the mean
    denominator (n·|E|·2 > 3·Σn), closure/mutual joins are set ops,
    scc_id is an integer MIN. No floats anywhere.

    Scale: this operator targets BOUNDED condensation graphs (domain
    metadata: nations, types, shards — ≤ thousands of nodes) where the
    closure frame is ≤ nodes² rows; the volume aggregation below it is
    the only row-scale stage (one shuffle to the 600-cell grid). For
    row-scale graphs the SCC path is forward-backward label
    propagation over the LPA machinery — out of scope here by design
    (documented, not silently capped)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = vol.agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("n").cast("bigint").alias("total"),
    )
    edges = (
        vol.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n") * F.col("cnt") * _SCC_DEN
            > _SCC_NUM * F.col("total")
        )
        .select("src", "dst")
    )
    nodes = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    return scc(edges, nodes)


def scc(
    edges: DataFrame, nodes: DataFrame, rounds: int = _SCC_ROUNDS
) -> DataFrame:
    """(node, scc_id, scc_size) — strongly connected components of a
    BOUNDED directed graph via path-doubling transitive closure +
    mutual reachability (the library form the Engine facade exposes;
    ``graph_scc`` is its registered oracle-checked instance). ``edges``
    has integer columns (src, dst); ``nodes`` has (node) covering every
    vertex (isolated vertices become singleton SCCs). Targets
    condensation/domain graphs (≤ thousands of nodes) where the
    closure frame is ≤ nodes² rows; ``rounds`` must be ≥ log₂ of the
    longest simple path (the loop also stops early on convergence)."""
    edges = (
        edges
        # the closure frame is <= nodes^2 rows by construction: collapse
        # it to ONE partition so the doubling rounds pay no 32-way
        # shuffle overhead (grid-sized data, fixed-cost stages)
        .coalesce(1)
        .localCheckpoint(eager=True)  # consumed every doubling round
    )
    reach = edges
    n_reach = reach.count()
    for _ in range(rounds):
        hop = (
            reach.alias("a")
            .join(
                reach.alias("b"), F.col("a.dst") == F.col("b.src")
            )
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        reach = (
            reach.unionByName(hop).distinct().coalesce(1)
            .localCheckpoint(eager=True)
        )
        n_next = reach.count()  # cached frame — a cheap driver scalar
        if n_next == n_reach:  # closure converged before the bound
            break
        n_reach = n_next
    mutual = (
        reach.alias("x")
        .join(
            reach.alias("y"),
            (F.col("y.src") == F.col("x.dst"))
            & (F.col("y.dst") == F.col("x.src")),
        )
        .select(F.col("x.src").alias("u"), F.col("x.dst").alias("v"))
    )
    sid = (
        nodes.join(mutual, F.col("node") == F.col("u"), "left")
        .groupBy("node")
        .agg(
            F.least(
                F.col("node"), F.coalesce(F.min("v"), F.col("node"))
            ).alias("scc_id")
        )
    )
    sizes = sid.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size")
    )
    return sid.join(sizes, "scc_id").select("node", "scc_id", "scc_size")
