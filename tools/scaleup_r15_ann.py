"""×100 scale legs for the ANN/vector tier (VERDICT r14 task #1): the
last 100 TB-claimed family with no two-decade measurement. Embeddings
×100 (200k × 64-d) through every candidate-generation design in
operators/simsearch.py, reporting wall time, α, cell/bucket occupancy,
scored-candidate selectivity, and recall@k vs exact — the quantities
each operator's docstring claims stay bounded.

Growth direction ("more vectors, same distribution"): disjoint id-space
copies with a small deterministic per-(vec_id, dim) jitter (xxhash64 →
uniform ±0.02, ≈16% of the 0.125 per-component RMS of these unit-norm
vectors) so copies are DISTINCT points from the same distribution —
exact-copy growth would be degenerate for ANN (100-way score ties, IVF
cells growing as stacked duplicates). Copy 0 is the identity, so the
1× leg is the registered fixture byte-for-byte and QUERY_VEC_ID keeps
its exact original embedding at every factor.

Legs (each timed warm — 2nd run on rebuilt plans; α =
ln(t_100/t_1)/ln(100), 1.0 = linear; raw seconds reported because 1×
absolutes are sub-second and session overhead deflates α):

* brute      — the exact linear baseline (also ground truth for the
               single-query recall@10 numbers).
* pq         — simsearch_pq_topk: bounded 4096-row training + the
               full-corpus encode pass (the corpus-proportional term)
               + ADC top-k. recall@10 vs brute.
* lsh        — simsearch_lsh_topk: multi-table multiprobe. recall@10,
               scored-candidate fraction, per-(table,key) bucket
               occupancy.
* hamming    — simsearch_hamming_topk: sign-bit prefilter + rerank.
               recall@10, prefilter survivor fraction.
* ivf_kmeans — simsearch_ivf_kmeans_topk: trained coarse quantizer,
               nprobe=3. recall@10, cell occupancy.
* knn_graph  — the IVF-cell-blocked kNN graph, THREE measurements
               because the full scored ×100 graph is Θ(n^1.5) BY
               DESIGN (the flat-quantizer boundary scaled_anchor_count
               documents — ~1.5e9 candidate dots, hours of interpreted
               fold, not a regression but the stated design boundary):
               (a) the linear ASSIGNMENT pass over the full ×100
               corpus with the √corpus anchor dial (80 anchors),
               (b) the exact candidate-pair COUNT (column-pruned — no
               dots evaluated) vs the Θ(n^1.5) theory line ×1000,
               with cell occupancy,
               (c) a 500-source BATCH of the scored+ranked graph
               against the full ×100 index (the realistic
               query-batch-vs-big-index shape; Catalyst pushes the
               src filter below the score projection so only batch
               candidates are scored), recall@3 vs a numpy exact
               ground truth for those sources.

Usage: python tools/scaleup_r15_ann.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALEUP_BASE", "/root/testdata/sf0.1")
SCRATCH = "/tmp/avro_parquet_spark_example_spark_scaleup_r15_ann"
FACTOR = 100
KEYSPACE = 10_000_000
JITTER_EPS = 0.02
SRC_BATCH = 500  # sources in the scored kNN-graph batch leg
KNN_RECALL_SOURCES = 200  # sources given numpy exact ground truth

SIBLINGS = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
)


def synth_embeddings(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"emb_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = []
    for i in range(factor):
        d = e.select(
            (F.col("vec_id") + F.lit(i * KEYSPACE)).alias("vec_id"),
            "embedding",
            "label",
        )
        if i > 0:
            jit = F.transform(
                "embedding",
                lambda x, idx: (
                    x.cast("double")
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), idx), F.lit(2001)
                        ).cast("double")
                        - 1000.0
                    )
                    / 1000.0
                    * JITTER_EPS
                ).cast("float"),
            )
            d = d.select("vec_id", jit.alias("embedding"), "label")
        parts.append(d)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in SIBLINGS:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def timed(fn, *args) -> tuple[float, object]:
    fn(*args)  # warm-up (page cache + JIT); plans rebuilt per call
    t0 = time.time()
    out = fn(*args)
    return time.time() - t0, out


def load_numpy(path: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{path}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = ids.argsort()
    return ids[order], mat[order]


def recall(got_ids: list[int], exact_ids: list[int]) -> float:
    return len(set(got_ids) & set(exact_ids)) / len(exact_ids)


def run_query(spark, name: str, sf_dir: str) -> list:
    from avro_parquet_spark_example_spark.registry import get_query

    return get_query(name).fn(spark, sf_dir).collect()


def leg_alpha(t1: float, tf: float) -> float:
    return math.log(tf / max(t1, 1e-9)) / math.log(FACTOR)


def occupancy(df, keys) -> tuple[int, float, int]:
    """(n_groups, mean, max) row-occupancy of df grouped by keys."""
    from pyspark.sql import functions as F

    rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("g"),
            F.avg("c").alias("mean"),
            F.max("c").alias("mx"),
        )
        .collect()[0]
    )
    return int(rows["g"]), float(rows["mean"]), int(rows["mx"])


def _session(app: str):
    from avro_parquet_spark_example_spark import session as sess

    # the x100 knn candidate stage plans are far larger than the gate's
    # (80-anchor flat assignment expressions, 1.5e9-row joins): give the
    # single-JVM driver=executor more heap than the 8g gate default
    sess.BUILD_CONFIGS = {**sess.BUILD_CONFIGS, "spark.driver.memory": "32g"}
    spark = sess.get_session(app_name=app)
    return sess.configure(spark)


def phase_queries() -> int:
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators import simsearch as ss

    spark = _session("scaleup_r15_ann_queries")
    print("== synthesizing ==", flush=True)
    d1 = synth_embeddings(spark, 1)
    d100 = synth_embeddings(spark, FACTOR)
    n1 = spark.read.parquet(f"{d1}/embeddings.parquet").count()
    nf = spark.read.parquet(f"{d100}/embeddings.parquet").count()
    print(f"rows: 1x={n1} {FACTOR}x={nf}")
    results: dict[str, dict] = {}

    # -- single-query ANN tiers: time + recall@10 vs brute ---------------
    exact10 = {
        d: [r["vec_id"] for r in run_query(spark, "simsearch_bruteforce_topk", d)]
        for d in (d1, d100)
    }
    t1, _ = timed(run_query, spark, "simsearch_bruteforce_topk", d1)
    tf, _ = timed(run_query, spark, "simsearch_bruteforce_topk", d100)
    results["brute"] = {"t1": t1, "tf": tf, "alpha": leg_alpha(t1, tf)}

    for leg, qname in (
        ("pq", "simsearch_pq_topk"),
        ("lsh", "simsearch_lsh_topk"),
        ("hamming", "simsearch_hamming_topk"),
        ("ivf_kmeans", "simsearch_ivf_kmeans_topk"),
    ):
        t1, r1 = timed(run_query, spark, qname, d1)
        tf, rf = timed(run_query, spark, qname, d100)
        results[leg] = {
            "t1": t1,
            "tf": tf,
            "alpha": leg_alpha(t1, tf),
            "recall@10_1x": recall([r["vec_id"] for r in r1], exact10[d1]),
            "recall@10_100x": recall([r["vec_id"] for r in rf], exact10[d100]),
        }
        print(f"[{leg}] {results[leg]}", flush=True)

    # -- selectivity / occupancy of the candidate stages ------------------
    e100 = spark.read.parquet(f"{d100}/embeddings.parquet")

    planes = ss.hyperplanes()
    signed = e100.withColumn("keys", ss.lsh_table_keys(F.col("embedding"), planes))
    exploded = signed.select("vec_id", F.posexplode("keys").alias("tbl", "key"))
    g, mean, mx = occupancy(exploded, ["tbl", "key"])
    qkeys = [
        r["key"]
        for r in signed.filter(F.col("vec_id") == ss.QUERY_VEC_ID)
        .select(F.explode(ss.multiprobe_keys(F.col("keys"))).alias("key"))
        .distinct()
        .collect()
    ]
    scored = (
        exploded.filter(F.col("key").isin(qkeys))
        .select("vec_id")
        .distinct()
        .count()
    )
    results["lsh"].update(
        {
            "buckets": g,
            "bucket_mean": round(mean, 1),
            "bucket_max": mx,
            "scored_frac_100x": round(scored / nf, 4),
        }
    )
    print(f"[lsh occupancy] {results['lsh']}", flush=True)

    qrow = e100.filter(F.col("vec_id") == ss.QUERY_VEC_ID).collect()[0]
    qcode_df = e100.filter(F.col("vec_id") == ss.QUERY_VEC_ID).select(
        ss.signbit_words(F.col("embedding")).alias("qcode")
    )
    survivors = (
        e100.filter(F.col("vec_id") != ss.QUERY_VEC_ID)
        .crossJoin(F.broadcast(qcode_df))
        .withColumn(
            "hd", ss.hamming(ss.signbit_words(F.col("embedding")), F.col("qcode"))
        )
        .filter(F.col("hd") <= ss.HAMMING_RADIUS)
        .count()
    )
    results["hamming"]["survivor_frac_100x"] = round(survivors / nf, 4)
    print(f"[hamming selectivity] {results['hamming']}", flush=True)

    _summary(results)
    return 0


def phase_knn() -> int:
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators import simsearch as ss

    spark = _session("scaleup_r15_ann_knn")
    d1 = synth_embeddings(spark, 1)
    d100 = synth_embeddings(spark, FACTOR)
    n1 = spark.read.parquet(f"{d1}/embeddings.parquet").count()
    nf = spark.read.parquet(f"{d100}/embeddings.parquet").count()
    results: dict[str, dict] = {}

    # -- kNN graph: assignment / candidate count / scored source batch ----
    print("== knn_graph_ivf legs ==", flush=True)
    pool1 = spark.read.parquet(f"{d1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    pool100 = spark.read.parquet(f"{d100}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    anchors1 = ss.KNN_IVF_ANCHORS
    anchors100 = ss.scaled_anchor_count(nf, n1)
    print(f"anchors: 1x={anchors1} {FACTOR}x={anchors100} (sqrt-corpus dial)")

    def cand_frame(pool, n_anchors):
        return ss.ivf_candidates(pool, n_anchors=n_anchors)

    def count_candidates(pool, n_anchors):
        # select src/dst ONLY: column pruning drops the score projection,
        # so this counts join rows without evaluating any dot product
        return cand_frame(pool, n_anchors).select("src", "dst").count()

    t1, c1 = timed(count_candidates, pool1, anchors1)
    tf, cf = timed(count_candidates, pool100, anchors100)
    theory = FACTOR**1.5
    results["knn_candidates"] = {
        "t1": t1,
        "tf": tf,
        "pairs_1x": c1,
        "pairs_100x": cf,
        "pairs_ratio": round(cf / c1, 1),
        "theory_n1.5": theory,
    }
    print(f"[knn candidates] {results['knn_candidates']}", flush=True)

    def assignment_only(pool, n_anchors):
        # the linear term: one flat-codegen scan assigning primary cell +
        # probe cells (ivf_candidates' first stage, via its own code path)
        return cand_frame(pool, n_anchors)  # materializes assignment

    t1, _ = timed(assignment_only, pool1, anchors1)
    tf, _ = timed(assignment_only, pool100, anchors100)
    results["knn_assignment"] = {"t1": t1, "tf": tf, "alpha": leg_alpha(t1, tf)}
    print(f"[knn assignment] {results['knn_assignment']}", flush=True)

    # cell occupancy at 100x (assignment reruns inside ivf_candidates)
    assigned = cand_frame(pool100, anchors100)
    g, mean, mx = occupancy(
        assigned.select("dst", "pcell").distinct(), ["pcell"]
    )
    results["knn_assignment"].update(
        {"cells_100x": g, "cell_mean": round(mean, 1), "cell_max": mx}
    )
    print(f"[knn cells] {results['knn_assignment']}", flush=True)

    batch1 = [r["vec_id"] for r in pool1.orderBy("vec_id").limit(SRC_BATCH).collect()]
    batchf = batch1  # copy-0 ids exist at both factors

    def scored_batch(pool, n_anchors, batch):
        scored = cand_frame(pool, n_anchors).filter(F.col("src").isin(batch))
        w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= ss.KNN_GRAPH_K)
            .select("src", "dst", "rnk")
            .collect()
        )

    t1, r1 = timed(scored_batch, pool1, anchors1, batch1)
    tf, rf = timed(scored_batch, pool100, anchors100, batchf)
    results["knn_batch"] = {
        "t1": t1,
        "tf": tf,
        "alpha": leg_alpha(t1, tf),
        "sources": SRC_BATCH,
        "per_source_ms_100x": round(tf / SRC_BATCH * 1000, 2),
    }

    # recall@3 vs numpy exact for the first KNN_RECALL_SOURCES sources
    ids, mat = load_numpy(d100)
    pos = {int(v): i for i, v in enumerate(ids)}
    got: dict[int, list[int]] = {}
    for row in rf:
        got.setdefault(row["src"], []).append(row["dst"])
    hits = total = 0
    for src in batchf[:KNN_RECALL_SOURCES]:
        sims = mat @ mat[pos[src]]
        sims[pos[src]] = -np.inf
        # top-k by (-score, vec_id) — the operator's tiebreak
        order = np.lexsort((ids, -sims))[: ss.KNN_GRAPH_K]
        exact = {int(ids[i]) for i in order}
        hits += len(exact & set(got.get(src, [])))
        total += ss.KNN_GRAPH_K
    results["knn_batch"]["recall@3_100x"] = round(hits / total, 4)
    print(f"[knn batch] {results['knn_batch']}", flush=True)

    _summary(results)
    return 0


def phase_lsh_sweep() -> int:
    """The (K, scored-fraction, recall) dial at ×100: the fixture K=4
    scores ~99% of a 200k corpus (16 buckets/table — no pruning left);
    scaled_lsh_bits says K=11 here. Sweep K and measure what each step
    buys."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators import simsearch as ss

    spark = _session("scaleup_r15_ann_lsh")
    d100 = synth_embeddings(spark, FACTOR)
    e = spark.read.parquet(f"{d100}/embeddings.parquet")
    nf = e.count()
    exact = [
        r["vec_id"]
        for r in run_query(spark, "simsearch_bruteforce_topk", d100)
    ]
    k_scaled = ss.scaled_lsh_bits(nf, nf // FACTOR)
    results: dict[str, dict] = {}
    for k in sorted({ss.K_BITS, 8, k_scaled}):
        planes = ss.hyperplanes(n_planes=ss.L_TABLES * k)
        signed = e.withColumn(
            "keys", ss.lsh_table_keys(F.col("embedding"), planes, k=k)
        )
        qkeys = F.broadcast(
            signed.filter(F.col("vec_id") == ss.QUERY_VEC_ID)
            .select(
                F.explode(
                    ss.multiprobe_keys(F.col("keys"), k_bits=k)
                ).alias("key")
            )
            .distinct()
        )
        cand = (
            signed.filter(F.col("vec_id") != ss.QUERY_VEC_ID)
            .select("vec_id", "embedding", F.explode("keys").alias("key"))
            .join(qkeys, "key")
            .dropDuplicates(["vec_id"])
        )
        qvec = F.broadcast(
            e.filter(F.col("vec_id") == ss.QUERY_VEC_ID).select(
                F.col("embedding").alias("qvec")
            )
        )

        def topk():
            return (
                cand.crossJoin(qvec)
                .withColumn(
                    "score",
                    ss.dot_product(F.col("embedding"), F.col("qvec")),
                )
                .orderBy(F.desc("score"), F.asc("vec_id"))
                .limit(10)
                .collect()
            )

        t, rows = timed(topk)
        scored = cand.count()
        results[f"K={k}"] = {
            "t_100x": t,
            "scored_frac": round(scored / nf, 4),
            "recall@10": recall([r["vec_id"] for r in rows], exact),
            "scaled_dial": k == k_scaled,
        }
        print(f"[lsh K={k}] {results[f'K={k}']}", flush=True)
    _summary(results)
    return 0


def _summary(results: dict) -> None:
    print("== summary ==")
    for leg, info in results.items():
        line = {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in info.items()
        }
        print(f"{leg}: {line}")


def main() -> int:
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase == "queries":
        return phase_queries()
    if phase == "knn":
        return phase_knn()
    if phase == "lsh_sweep":
        return phase_lsh_sweep()
    # "all": each phase in its own process so one phase's heap/plan
    # residue can't starve the next (single-JVM local mode)
    import subprocess

    for p in ("queries", "knn", "lsh_sweep"):
        rc = subprocess.call([sys.executable, os.path.abspath(__file__), p])
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
