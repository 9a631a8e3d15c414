"""Iterative clustering over the embedding column — the "iterative
algorithm" operator family (SURVEY.md §2 group H extension; the driver's
contract explicitly carves out iterative algorithms as rows-only-checked).

K-means is THE canonical corpus-organization pass in training-data
pipelines (domain balancing, semantic dedup blocking, curriculum
bucketing). The implementation is a driver-side loop over pure DataFrame
ops, shaped for scale:

  * the DATASET never leaves the cluster — each iteration is one scan:
    assign each vector to its nearest centroid (k JVM-side higher-order
    distance expressions, whole-stage codegen'd, no Python), then
    recompute centroids with posexplode → (cluster, dim) partial means
    (map-side combined, shuffle rows = k × dim, independent of N);
  * only the CENTROIDS (k × dim doubles — bytes, regardless of N) are
    collected and re-broadcast as literals each iteration, the textbook
    Lloyd's-on-MapReduce layout;
  * centroids are rounded to 9 decimals each iteration, which pins down
    float-sum order nondeterminism → byte-stable assignments run-to-run;
  * convergence by centroid drift with an iteration cap, so the loop is
    bounded even on adversarial data.

Checked rows-only by the driver; tests/test_clustering.py property-checks
determinism, assignment optimality (every point sits with its nearest
centroid), inertia monotonicity, and cluster-count correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

K = 8
MAX_ITERS = 12
DRIFT_EPS = 1e-7


def _sq_dist(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<float> column and a literal
    centroid — a fold over zip_with, evaluated JVM-side."""
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit_c, lambda x, y: (x.cast("double") - y) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """vectors(vec_id, embedding) → + cluster (nearest centroid id) and
    sq_dist. One narrow projection, no shuffle."""
    dists = F.array(*[_sq_dist(F.col("embedding"), c) for c in centroids])
    return vectors.select(
        "vec_id",
        "embedding",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.array_min(dists).alias("sq_dist"),
    )


def _recompute(assigned: DataFrame, k: int, dim: int) -> list[list[float]]:
    """New centroids: per-(cluster, dimension) means via posexplode. The
    shuffle carries at most k × dim combined partials; the collect is
    k × dim doubles — both independent of the number of vectors."""
    rows = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.avg(F.col("val").cast("double")).alias("mean"))
        .collect()
    )
    by_cluster: dict[int, list[float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["dim"]] = round(r["mean"], 9)
    # an emptied cluster keeps its previous position only if absent entirely
    return [by_cluster.get(c) for c in range(k)]


def kmeans_fit(
    vectors: DataFrame, k: int = K, max_iters: int = MAX_ITERS
) -> tuple[list[list[float]], int]:
    """Lloyd's algorithm; deterministic init = the k vectors with the
    smallest ids (stable across runs and partitionings). Returns
    (centroids, iterations_run)."""
    first = vectors.orderBy("vec_id").limit(k).collect()
    if not first:
        raise ValueError("kmeans_fit: input has no rows")
    # fewer rows than k → fit the clusters the data can support (keeps
    # _recompute's k-sized slot math consistent with len(centroids))
    k = min(k, len(first))
    dim = len(first[0]["embedding"])
    centroids = [[round(float(x), 9) for x in r["embedding"]] for r in first]
    iters = 0
    for _ in range(max_iters):
        assigned = assign_clusters(vectors, centroids)
        new = _recompute(assigned, k, dim)
        new = [n if n is not None else centroids[i] for i, n in enumerate(new)]
        iters += 1
        drift = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(centroids, new)
        )
        centroids = new
        if drift < DRIFT_EPS:
            break
    return centroids, iters


@register("cluster_kmeans")
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12 — k-means corpus clustering (k=8 over the 64-d embeddings):
    per-cluster size and mean within-cluster squared distance (inertia
    contribution), the summary a pipeline uses for domain balancing.
    Iterative; rows-only driver check, property-tested in
    tests/test_clustering.py."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids, _ = kmeans_fit(e)
    assigned = assign_clusters(e, centroids)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("sq_dist"), 6).alias("mean_sq_dist"),
    )
