"""×100 scale legs for the shuffle-heaviest trio (VERDICT r13 task #2):
dedup_minhash pipeline, er_multipass pipeline, stream_session — two
decades above sf0.1, the deepest in-sandbox probe of the 100 TB claim.

Growth directions, per operator:

* **dedup (leg A, corpus ×100 at constant dup-rate)**: documents ×100
  with per-copy TEXT MUTATION (a per-copy `translate` over two frequent
  letters) so cross-copy Jaccard stays far below 0.7 — "more docs, same
  distribution" growth, unlike the degenerate exact-copy ×10 stress of
  r9 — plus per-copy injected exact duplicates so the true-pair rate is
  constant. 1× = the same construction at factor 1 (apples-to-apples).
* **dedup (leg B, cluster size ×100)**: 1× corpus + 100 exact copies of
  each of the 50 lowest-id docs → 50 cliques of 101 members (inside the
  LSH_MAX_BUCKET=256 cap). Stresses per-bucket pair fan-out and answers
  the verdict's question directly: does CC convergence hold at ×100
  cluster sizes? (Cliques have diameter 1 — min-label propagation must
  fix in 2 rounds + 1 confirming round regardless of clique size; the
  new dedup.LAST_CC_INFO observer reports the measured count.)
* **ER (corpus ×100 at constant block size)**: the er_records_mf frame
  ×100 with a per-copy 3-digit tag appended to BOTH name and phone —
  the name tag lands inside the right(name,6) blocking key and the
  phone tag inside the phone key, so blocks are per-copy disjoint and
  per-copy identical: candidates scale exactly ×100 (the realistic
  "more customers, same collision structure" direction). Library-form
  leg: the registered fixture's variant-injection offsets bound its
  catalog at ER_OFF_SUB=800k ids, so the ×100 leg exercises
  multipass_candidates + the Levenshtein verify join directly.
* **stream_session (events ×100)**: disjoint isomorphic copies
  (user_id + i·n_users, event_id + i·n_ev) → 10M rows, sessions ×100.

Timings are warm (2nd run) on rebuilt plans; alpha =
ln(t_100/t_1)/ln(100), 1.0 = linear. Usage: python tools/scaleup_r14.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALEUP_BASE", "/root/testdata/sf0.1")
SCRATCH = "/tmp/avro_parquet_spark_example_spark_scaleup_r14"
FACTOR = 100
KEYSPACE = 10_000_000


def _mutation_chars(i: int) -> tuple[str, str]:
    """Distinct letter pair per copy (unique for i < 104): rewriting two
    frequent letters changes most tokens, so cross-copy shingle Jaccard
    collapses far below the 0.7 verify threshold."""
    return chr(97 + i % 26), chr(97 + (i // 26) % 26)


def synth_docs(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"docs_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    big = None
    for i in range(factor):
        c1, c2 = _mutation_chars(i)
        mutated = F.translate(F.col("text"), "ea", c1 + c2)
        d = docs.select(
            (F.col("doc_id") + F.lit(i * KEYSPACE)).alias("doc_id"),
            mutated.alias("text"),
        )
        # constant dup-rate: each copy injects exact duplicates of its
        # own 50 lowest-id docs (the with_injected_duplicates pattern,
        # per-copy keyspace so ids never collide)
        dup = docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + F.lit(i * KEYSPACE + 100_000)).alias(
                "doc_id"
            ),
            mutated.alias("text"),
        )
        part = d.unionByName(dup)
        big = part if big is None else big.unionByName(part)
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    open(marker, "w").close()
    return out


def synth_docs_megacluster(spark) -> str:
    """1× corpus + 100 exact copies of each doc_id < 50 → 50 cliques of
    101 members (cluster size ×100 vs the registered fixture's pairs)."""
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, "docs_megacluster")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    src = docs.filter(F.col("doc_id") < 50)
    big = docs
    for j in range(100):
        big = big.unionByName(
            src.select(
                (F.col("doc_id") + F.lit(1_000_000 + j * 1000)).alias(
                    "doc_id"
                ),
                "text",
            )
        )
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    open(marker, "w").close()
    return out


def synth_recs(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.entity import (
        er_records_mf,
    )

    out = os.path.join(SCRATCH, f"recs_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    recs = er_records_mf(
        spark.read.parquet(f"{BASE}/customer.parquet")
    ).localCheckpoint(eager=True)
    big = None
    for i in range(factor):
        tag = F.lit(f"{i:03d}")
        part = recs.select(
            (F.col("id") + F.lit(i * KEYSPACE)).alias("id"),
            F.concat(F.col("name"), tag).alias("name"),
            F.concat(F.col("phone"), tag).alias("phone"),
            "nk",
        )
        big = part if big is None else big.unionByName(part)
    big.write.mode("overwrite").parquet(f"{out}/recs.parquet")
    open(marker, "w").close()
    return out


def synth_events(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"events_x{factor}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.count()
    big = None
    for i in range(factor):
        e = ev.withColumn(
            "user_id", F.col("user_id") + F.lit(i * n_users)
        ).withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
        big = e if big is None else big.unionByName(e)
    big.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # stream_session's loader resolves sibling tables by path
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "documents",
        "embeddings",
    ):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def dedup_pipeline(spark, docs_path: str) -> dict:
    """The dedup_minhash_verified stage chain on an arbitrary corpus:
    signatures → capped band pairs → exact shingle-Jaccard verify → CC.
    drop-mode cap (the at-scale production mode); oversized buckets are
    counted by the observer, not silently lost."""
    from pyspark.sql import functions as F  # noqa: F401

    from avro_parquet_spark_example_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{docs_path}/documents.parquet")
    sig = dd.minhash_signatures_df(docs).localCheckpoint(eager=True)
    over = dd.lsh_oversized_buckets(sig).count()
    cands = dd.lsh_band_pairs(sig, on_oversized="drop")
    verified = dd.exact_verified_pairs(
        cands, docs, threshold=0.7, bounded=False
    )
    labels = dd.connected_components(verified, max_iter=25)
    n = labels.count()
    return {"labels": n, "oversized_buckets": over, **dd.LAST_CC_INFO}


def er_pipeline(spark, recs_path: str) -> dict:
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.capping import (
        oversized_groups,
    )
    from avro_parquet_spark_example_spark.operators.entity import (
        ER_MAX_BLOCK,
        ER_MAX_LEV,
        multipass_candidates,
    )

    recs = spark.read.parquet(f"{recs_path}/recs.parquet").localCheckpoint(
        eager=True
    )
    over = (
        oversized_groups(
            recs.select(F.expr("right(name, 6)").alias("k")), ["k"],
            ER_MAX_BLOCK,
        ).count()
        + oversized_groups(recs.select("phone"), ["phone"], ER_MAX_BLOCK)
        .count()
    )
    cands = multipass_candidates(recs, on_oversized="drop")
    ra = recs.select(F.col("id").alias("id_a"), F.col("name").alias("__na"))
    rb = recs.select(F.col("id").alias("id_b"), F.col("name").alias("__nb"))
    n = (
        cands.join(ra, "id_a")
        .join(rb, "id_b")
        .select(F.levenshtein(F.col("__na"), F.col("__nb")).alias("lev"))
        .filter(F.col("lev") <= ER_MAX_LEV)
        .count()
    )
    return {"verified_pairs": n, "oversized_blocks": over}


def timed(fn, *args) -> tuple[float, dict]:
    fn(*args)  # warm-up (page cache + JIT); plans rebuilt per call
    t0 = time.time()
    info = fn(*args)
    return time.time() - t0, info


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import (
        configure,
        get_session,
    )

    spark = get_session(app_name="scaleup_r14")
    configure(spark)

    print("== synthesizing ==", flush=True)
    d1 = synth_docs(spark, 1)
    d100 = synth_docs(spark, FACTOR)
    dmega = synth_docs_megacluster(spark)
    r1 = synth_recs(spark, 1)
    r100 = synth_recs(spark, FACTOR)
    e100 = synth_events(spark, FACTOR)

    print("== dedup leg A: corpus x100, constant dup-rate ==", flush=True)
    t1, i1 = timed(dedup_pipeline, spark, d1)
    tf, if_ = timed(dedup_pipeline, spark, d100)
    alpha = math.log(tf / max(t1, 1e-9)) / math.log(FACTOR)
    print(
        f"dedup_corpus: 1x {t1:.2f}s {i1} | {FACTOR}x {tf:.2f}s {if_} "
        f"| ratio {tf / max(t1, 1e-9):.1f} | alpha {alpha:.2f}",
        flush=True,
    )

    print("== dedup leg B: cluster size x100 (50 cliques of 101) ==", flush=True)
    tm, im = timed(dedup_pipeline, spark, dmega)
    print(f"dedup_megacluster: {tm:.2f}s {im}", flush=True)

    print("== ER: corpus x100, constant block size ==", flush=True)
    t1, i1 = timed(er_pipeline, spark, r1)
    tf, if_ = timed(er_pipeline, spark, r100)
    alpha = math.log(tf / max(t1, 1e-9)) / math.log(FACTOR)
    print(
        f"er_multipass: 1x {t1:.2f}s {i1} | {FACTOR}x {tf:.2f}s {if_} "
        f"| ratio {tf / max(t1, 1e-9):.1f} | alpha {alpha:.2f}",
        flush=True,
    )

    print("== stream_session: events x100 (10M rows) ==", flush=True)
    fn = get_query("stream_session").fn

    def run_sess(sf_dir):
        return {"sessions": len(fn(spark, sf_dir).collect())}

    t1, i1 = timed(run_sess, BASE)
    tf, if_ = timed(run_sess, e100)
    alpha = math.log(tf / max(t1, 1e-9)) / math.log(FACTOR)
    print(
        f"stream_session: 1x {t1:.2f}s {i1} | {FACTOR}x {tf:.2f}s {if_} "
        f"| ratio {tf / max(t1, 1e-9):.1f} | alpha {alpha:.2f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
