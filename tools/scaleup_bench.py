"""10× scale-up measurement harness (SCALING.md §Measured scale-up).

Synthesizes a 10× copy of the sf0.1 `documents` and `embeddings` tables in
scratch (key-shifted unions — same value distributions, 10× rows), then
times the round-2 curation/clustering operators at 1× vs 10× to verify the
linear-scaling claims. Timings are warm (2nd run); output is one line per
(operator, scale).

Usage: python tools/scaleup_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALEUP_BASE", "/root/testdata/sf0.1")
SCRATCH = "/tmp/avro_parquet_spark_example_spark_scaleup"
FACTOR = 10

#: operators to time (all read only documents/embeddings)
OPS = [
    "text_pii_redact",
    "text_repetition_filter",
    "dedup_contamination",
    "sample_train_test_split",
    "cluster_kmeans",
    "text_chunk_overlap",
    "pack_sequences",
    "shuffle_seeded_shards",
    "mixture_downsample",
    "text_unigram_logprob",
]


def synthesize(spark) -> str:
    """Write key-shifted ×FACTOR unions of documents/embeddings; link the
    rest of the tables unchanged (the ops above don't read them)."""
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"x{FACTOR}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()

    big_docs = None
    big_emb = None
    for i in range(FACTOR):
        d = docs.withColumn("doc_id", (F.col("doc_id") + F.lit(i * n_docs)))
        e = emb.withColumn("vec_id", (F.col("vec_id") + F.lit(i * n_emb)))
        big_docs = d if big_docs is None else big_docs.unionByName(d)
        big_emb = e if big_emb is None else big_emb.unionByName(e)
    big_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    big_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)
    open(marker, "w").close()
    return out


def time_op(fn, spark, sf_dir: str) -> tuple[float, int]:
    fn(spark, sf_dir).collect()  # warm (plan cache + JIT + page cache)
    t0 = time.time()
    rows = fn(spark, sf_dir).collect()
    return time.time() - t0, len(rows)


def _orig_id(doc_id: int, n_base: int) -> int:
    """Map a 10×-corpus doc_id back to its 1× original: injected duplicates
    live at +100000 (with_injected_duplicates), key-shifted copies at
    +i*n_base (synthesize)."""
    if doc_id >= 100000:
        return doc_id - 100000
    return doc_id % n_base


#: fact-table 100× stress set (tables each op reads are synthesized ×100)
FACTS_OPS = [
    "agg_scan_group",        # lineitem: scan + decimal group agg
    "tpch_q6",               # lineitem: pushdown-filter scan agg
    "join_shuffle_equi",     # orders⋈lineitem fact join + customer dim
    "window_rank",           # orders: partitioned window
    "events_agg",            # events: time-bucket agg
    "dedup_exact",           # documents: hash-group dedup
    "curation_token_budget_select",  # documents: distributed prefix sum
]


def synthesize_facts(spark, factor: int) -> str:
    """Key-shifted ×factor unions of the FACT tables (lineitem, orders,
    events, documents); dims symlink unchanged. Order/doc keys shift by
    i*10^7 per copy so FK joins stay consistent (each customer gains
    ×factor orders — fan-out growth, the realistic direction)."""
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"facts_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    KEYSPACE = 10_000_000
    shifted_cols = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": [],
        "documents": ["doc_id"],
    }
    for t, keys in shifted_cols.items():
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        big = None
        for i in range(factor):
            d = src
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * KEYSPACE))
            big = d if big is None else big.unionByName(d)
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    open(marker, "w").close()
    return out


def facts_scaleup(spark, factor: int) -> int:
    """Warm-timed FACTS_OPS at 1× vs ×factor; prints the scaling exponent
    alpha = ln(t_f/t_1)/ln(factor) per op (1.0 = linear). Raw registry fns:
    the plan is rebuilt per run so every shuffle re-executes (the wrapped
    form's repeated collect skips completed map stages — see registry.py)."""
    import math

    from avro_parquet_spark_example_spark.registry import get_query

    big = synthesize_facts(spark, factor)
    for name in FACTS_OPS:
        raw = get_query(name).fn
        t1, r1 = time_op(raw, spark, BASE)
        tf, rf = time_op(raw, spark, big)
        alpha = math.log(tf / max(t1, 1e-9)) / math.log(factor)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {factor}x {tf:.2f}s "
            f"({rf} rows) | ratio {tf / max(t1, 1e-9):.1f} | alpha {alpha:.2f}"
        )
    return 0


def dedup_scaleup(spark, big: str) -> int:
    """Full MinHash→LSH→verify→CC pipeline at 1× vs 10× (degenerate ~90%
    dup-rate stress: every doc gains 10 exact copies). Reports the wall-time
    scaling exponent alpha = ln(t10/t1)/ln(10) (1.0 = linear) and asserts the
    identical-components invariant: mapping every 10× member back to its 1×
    original must reproduce the 1× cluster sets exactly — exact copies share
    signatures, so every copy provably lands in its original's component."""
    import math

    from avro_parquet_spark_example_spark.registry import all_queries, get_query
    from avro_parquet_spark_example_spark.session import configure

    # the wrapped registry fns plan-cache their DataFrame, and the dedup
    # pipeline's CC loop runs eagerly at build time (localCheckpoint) —
    # time raw fns so build+execute is what the clock sees (bench's
    # REBUILD_EACH_RUN protocol). configure() replaces the wrapper's
    # self-configuration.
    configure(spark)
    qs = all_queries()
    n_base = spark.read.parquet(f"{BASE}/documents.parquet").count()

    def cluster_sets(sf_dir: str) -> set[frozenset[int]]:
        rows = qs["dedup_minhash_lsh"](spark, sf_dir).collect()
        out: set[frozenset[int]] = set()
        for r in rows:
            origs = frozenset(
                _orig_id(int(m), n_base) for m in r["member_ids"].split(",")
            )
            if len(origs) >= 2:  # singleton originals = pure-copy clusters
                out.add(origs)
        return out

    status = 0
    for name in ("dedup_minhash_verified", "dedup_minhash_lsh"):
        raw = get_query(name).fn
        t1, r1 = time_op(raw, spark, BASE)
        t10, r10 = time_op(raw, spark, big)
        alpha = math.log(t10 / max(t1, 1e-9)) / math.log(FACTOR)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {FACTOR}x {t10:.2f}s "
            f"({r10} rows) | ratio {t10 / max(t1, 1e-9):.1f} | alpha {alpha:.2f}"
        )

    c1, c10 = cluster_sets(BASE), cluster_sets(big)
    ok = c1 == c10
    print(
        f"components invariant: 1x {len(c1)} multi-original clusters | "
        f"{FACTOR}x mapped-back {len(c10)} | identical: {ok}"
    )
    if not ok:
        print(f"  only-1x: {sorted(map(sorted, c1 - c10))[:5]}")
        print(f"  only-10x: {sorted(map(sorted, c10 - c1))[:5]}")
        status = 1
    return status


def degenerate_dedup(spark, factor: int) -> int:
    """The 99%-duplicate boundary: at ×factor the key-shifted corpus gives
    every doc `factor` exact copies. MinHash DIRECTLY on it explodes — every
    band bucket holds all copies, and the intra-bucket pair expansion is
    quadratic in the copy count (measured: OOM at factor=100 on this JVM).
    The production composition is EXACT dedup first (identical text ⇒ one
    canonical per group), then MinHash over canonicals only — this runs it
    and asserts the canonical set matches the 1× corpus, i.e. near-dup cost
    returns to 1× no matter how high the exact-dup rate goes."""
    import time as _time

    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.dedup import (
        LSH_MAX_BUCKET,
        keep_first_per_text,
        minhash_candidate_pairs,
    )

    big = synthesize_facts(spark, factor)
    docs = spark.read.parquet(f"{big}/documents.parquet").select("doc_id", "text")
    n_raw = docs.count()
    t0 = _time.time()
    canon = keep_first_per_text(docs).localCheckpoint(eager=True)
    n_canon = canon.count()
    t_exact = _time.time() - t0
    t0 = _time.time()
    n_pairs = minhash_candidate_pairs(canon, sim_threshold=0.5).count()
    t_near = _time.time() - t0
    # the 1× corpus itself holds a few organic exact dups — the invariant is
    # canonicals(×factor) == canonicals(1×), not == raw 1× rows
    n_base_canon = keep_first_per_text(
        spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")
    ).count()
    ok = n_canon == n_base_canon
    print(
        f"degenerate x{factor}: {n_raw:,} docs -> exact-collapse {n_canon:,} "
        f"canonicals in {t_exact:.1f}s (1x canonicals {n_base_canon:,}: {ok}) -> "
        f"minhash on canonicals: {n_pairs} candidate pairs in {t_near:.1f}s"
    )
    # Second line of defense (VERDICT-r6 #1): the CAPPED band join directly
    # on the RAW degenerate corpus — NO exact-dedup pre-stage. Every doc's
    # copy group (factor+1 members, identical signatures) fills each band
    # bucket past the cap, which is exactly the organic-boilerplate shape
    # exact-collapse cannot fix; the uncapped form OOMs here (measured,
    # SCALING.md). The cap must be below the copy-group size to bite — at
    # real scale the production default (LSH_MAX_BUCKET=256) is that cap;
    # for factor ≤ 256 we tighten it to factor//2 so the same mechanism is
    # exercised. Bound: pairs ≤ n_buckets · cap² by construction.
    cap = LSH_MAX_BUCKET if factor > LSH_MAX_BUCKET else max(2, factor // 2)
    t0 = _time.time()
    n_capped = minhash_candidate_pairs(
        docs, sim_threshold=0.5, max_bucket_size=cap
    ).count()
    t_capped = _time.time() - t0
    # with every copy-group bucket (size factor+1 > cap) dropped, what
    # remains is the organic near-dup tail — the same order as the 1×
    # corpus, NOT the quadratic copy mass
    bounded = n_capped <= max(10 * n_pairs, 1000)
    print(
        f"capped-no-collapse x{factor}: cap={cap} -> {n_capped} candidate "
        f"pairs in {t_capped:.1f}s on {n_raw:,} raw docs "
        f"(bounded vs canonical-path {n_pairs}: {bounded})"
    )
    return 0 if (ok and bounded) else 1


def synthesize_graph(spark, factor: int) -> str:
    """×factor events as DISJOINT ISOMORPHIC copies: user ids shift by 10^6
    and timestamps by i·366 days per copy, so each copy contributes its own
    co-occurrence component — the realistic "longer log, more users" growth
    direction, with an exact invariant: every graph statistic must be
    EXACTLY ×factor the base value."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.sources.catalog import load

    out = os.path.join(SCRATCH, f"graph_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ev = load(spark, BASE, "events")
    big = None
    for i in range(factor):
        d = (
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 366} DAYS"))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
        big = d if big is None else big.unionByName(d)
    big.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    open(marker, "w").close()
    return out


def graph_scaleup(spark, factor: int) -> int:
    """Edge build → triangle count (uncapped) and PageRank at 1× vs
    ×factor. Prints wall-time scaling exponents AND asserts the
    isomorphic-copies invariant: edge/triangle totals at ×factor are
    EXACTLY factor× the base totals (disjoint copies can neither merge
    nor create cross-copy structure)."""
    import math

    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.graph import (
        cooccurrence_edges,
        graph_pagerank,
    )

    big = synthesize_graph(spark, factor)

    def tri_total(sf_dir: str) -> tuple[float, int, int]:
        t0 = time.time()
        e = cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
        n_edges = e.count()
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        n_tri = (
            e1.join(e2, F.col("e2.u") == F.col("e1.v"))
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.u"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .count()
        )
        return time.time() - t0, n_edges, n_tri

    t1, edges1, tri1 = tri_total(BASE)
    tf, edgesf, trif = tri_total(big)
    alpha = math.log(tf / max(t1, 1e-9)) / math.log(factor)
    print(
        f"edges+triangles: 1x {t1:.2f}s ({edges1} e, {tri1} tri) | "
        f"{factor}x {tf:.2f}s ({edgesf} e, {trif} tri) | alpha {alpha:.2f}"
    )
    assert edgesf == factor * edges1, (edgesf, factor * edges1)
    assert trif == factor * tri1, (trif, factor * tri1)
    print(f"invariant OK: edges and triangles exactly x{factor}")

    t0 = time.time()
    s1 = graph_pagerank(spark, BASE).agg(F.sum("rank")).collect()[0][0]
    t1 = time.time() - t0
    t0 = time.time()
    sf = graph_pagerank(spark, big).agg(F.sum("rank")).collect()[0][0]
    tf = time.time() - t0
    alpha = math.log(tf / max(t1, 1e-9)) / math.log(factor)
    print(
        f"pagerank(10 it): 1x {t1:.2f}s (mass {s1:.1f}) | "
        f"{factor}x {tf:.2f}s (mass {sf:.1f}) | alpha {alpha:.2f}"
    )
    assert abs(sf - factor * s1) / (factor * s1) < 1e-6
    print(f"invariant OK: rank mass exactly x{factor}")
    return 0


def retrieval_scaleup(spark, factor: int = FACTOR) -> int:
    """Sparse-cosine and BM25 retrieval at 1× vs ×factor documents (the
    ×factor corpus carries factor−1 extra key-shifted copies of every
    text). Wall-time exponents PLUS an exact invariant: the query doc's
    factor−1 extra copies are perfect matches, so the sparse top-10 must
    carry exactly factor−1 rows at cosine 1.0; and since EVERY doc exists
    factor times with identical tf/dl, every score group in the BM25
    top-20 must have exactly factor members (decimal-exact scores make
    the equality exact, not approximate)."""
    import math

    from avro_parquet_spark_example_spark.registry import get_query

    big = synthesize(spark)
    for name in ("text_sparse_cosine_topk", "text_bm25_topk"):
        raw = get_query(name).fn
        t1, r1 = time_op(raw, spark, BASE)
        tf_, rf = time_op(raw, spark, big)
        alpha = math.log(tf_ / max(t1, 1e-9)) / math.log(factor)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {factor}x {tf_:.2f}s "
            f"({rf} rows) | alpha {alpha:.2f}"
        )
    sparse = get_query("text_sparse_cosine_topk").fn(spark, big).collect()
    n_perfect = sum(1 for r in sparse if r.cosine == 1.0)
    assert n_perfect == factor - 1, (n_perfect, factor - 1)
    # BM25's length saturation can legitimately rank a short doc matching
    # many high-idf terms ABOVE the query's own full-length copies — so the
    # copy invariant is on score multiplicity, not on who leads: every doc
    # in the ×factor corpus exists factor times, hence every score group in
    # the top-20 must have exactly factor members (the 20-row LIMIT is
    # group-aligned because 20 ≡ 0 mod factor... asserted too).
    bm = get_query("text_bm25_topk").fn(spark, big).collect()
    assert len(bm) % factor == 0, len(bm)
    from collections import Counter

    for score, n in Counter(r.score for r in bm).items():
        assert n == factor, (score, n, factor)
    print(
        f"invariant OK: {factor - 1} perfect sparse matches; every BM25 "
        f"score group has exactly {factor} members"
    )
    return 0


def synthesize_vectors(spark, factor: int) -> str:
    """×factor embeddings + events under /tmp: factor−1 extra copies of
    every embedding (shifted vec_ids, SAME vectors/labels) and of every
    event (shifted event_ids, SAME user/type/ts) — duplication leaves
    population covariance, the Gram direction, and per-type distinct-user
    counts mathematically unchanged, which is what the invariants pin."""
    import os

    from pyspark.sql import functions as F

    out = f"/tmp/scaleup_vectors_x{factor}"
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
        parts = [emb]
        for k in range(1, factor):
            parts.append(
                emb.withColumn("vec_id", F.col("vec_id") + 1_000_000 * k)
            )
        big_e = parts[0]
        for p_ in parts[1:]:
            big_e = big_e.unionByName(p_)
        big_e.write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )
        ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
        eparts = [ev]
        for k in range(1, factor):
            eparts.append(
                ev.withColumn("event_id", F.col("event_id") + 10_000_000 * k)
            )
        big_v = eparts[0]
        for p_ in eparts[1:]:
            big_v = big_v.unionByName(p_)
        big_v.write.mode("overwrite").parquet(
            os.path.join(out, "events.parquet")
        )
    return out


def vectors_scaleup(spark, factor: int = FACTOR) -> int:
    """Spectral + bitmap ops at 1× vs ×factor with duplication invariants:
    covariance and the power-iteration direction are invariant to exact
    row duplication (sums and n scale together), and bitmap distincts are
    invariant to duplicate events (same user ids OR to the same bits)."""
    import math

    from avro_parquet_spark_example_spark.registry import get_query

    big = synthesize_vectors(spark, factor)
    results = {}
    for name in (
        "vec_covariance_matrix",
        "vec_power_iteration_top_pc",
        "agg_bitmap_exact_distinct",
    ):
        raw = get_query(name).fn
        t1, r1 = time_op(raw, spark, BASE)
        tf_, rf = time_op(raw, spark, big)
        alpha = math.log(tf_ / max(t1, 1e-9)) / math.log(factor)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {factor}x {tf_:.2f}s "
            f"({rf} rows) | alpha {alpha:.2f}"
        )
        results[name] = (
            sorted(map(tuple, raw(spark, BASE).collect())),
            sorted(map(tuple, raw(spark, big).collect())),
        )
    # exact invariants
    one, big_r = results["agg_bitmap_exact_distinct"]
    assert one == big_r, "bitmap distincts changed under duplication"
    one, big_r = results["vec_covariance_matrix"]
    assert len(one) == len(big_r)
    for a, b in zip(one, big_r):
        assert a[:2] == b[:2] and abs(a[2] - b[2]) <= 1e-8, (a, b)
    one, big_r = results["vec_power_iteration_top_pc"]
    assert len(one) == len(big_r) == 64
    for a, b in zip(one, big_r):
        assert a[0] == b[0] and abs(float(a[1]) - float(b[1])) <= 1e-8, (a, b)
    print(
        "invariant OK: bitmap distincts exact-equal; covariance and "
        "direction within 1e-8 under x%d duplication" % factor
    )
    return 0


def main() -> int:
    import argparse

    from avro_parquet_spark_example_spark.registry import all_queries
    from avro_parquet_spark_example_spark.session import get_session

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dedup",
        action="store_true",
        help="run the MinHash→LSH→verify→CC 10x stress instead of the curation ops",
    )
    ap.add_argument(
        "--facts",
        type=int,
        default=None,
        metavar="FACTOR",
        help="run the fact-table stress at the given scale factor (e.g. 100)",
    )
    ap.add_argument(
        "--degenerate-dedup",
        type=int,
        default=None,
        metavar="FACTOR",
        help="exact-first + MinHash composition on the ~(1-1/FACTOR) dup-rate corpus",
    )
    ap.add_argument(
        "--graph",
        type=int,
        default=None,
        metavar="FACTOR",
        help="co-occurrence graph stress (edges/triangles/pagerank) at the given factor",
    )
    ap.add_argument(
        "--retrieval",
        action="store_true",
        help="sparse-cosine/BM25 10x stress with the duplicate-copy invariant",
    )
    ap.add_argument(
        "--vectors",
        type=int,
        default=None,
        metavar="FACTOR",
        help="spectral/bitmap stress (covariance, power iteration, bitmap distinct) at the given factor",
    )
    args = ap.parse_args()

    spark = get_session(shuffle_partitions=32)
    if args.vectors:
        return vectors_scaleup(spark, args.vectors)
    if args.retrieval:
        from avro_parquet_spark_example_spark.session import configure

        configure(spark)
        return retrieval_scaleup(spark)
    if args.graph:
        from avro_parquet_spark_example_spark.session import configure

        configure(spark)
        return graph_scaleup(spark, args.graph)
    if args.facts or args.degenerate_dedup:
        from avro_parquet_spark_example_spark.session import configure

        configure(spark)
        if args.degenerate_dedup:
            return degenerate_dedup(spark, args.degenerate_dedup)
        return facts_scaleup(spark, args.facts)
    big = synthesize(spark)
    if args.dedup:
        return dedup_scaleup(spark, big)
    qs = all_queries()
    for name in OPS:
        t1, r1 = time_op(qs[name], spark, BASE)
        t10, r10 = time_op(qs[name], spark, big)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {FACTOR}x {t10:.2f}s "
            f"({r10} rows) | ratio {t10 / max(t1, 1e-9):.1f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
