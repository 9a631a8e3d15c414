"""Stage attribution for graph_hits_bipartite — the registry's cost
outlier (29 s at sf0.1 in the r9 full gate; VERDICT r9 "What's missing"
#3 asked for the minhash_profile.py treatment).

Hypothesis measured here: each half-round builds
``raw = inc⋈score → groupBy → crossJoin(broadcast(max(raw)))`` and then
EAGER-localCheckpoints the result — so the expensive join+aggregate
subtree executes TWICE per half-round (once inside the broadcast-max
job, once for the checkpoint), 12× per query plus the final pass.

Variants timed (fresh plans, warm JVM, best of N):

  old   — checkpoint AFTER normalization (the r9 shape)
  new   — checkpoint the RAW aggregate, derive max + normalization
          lazily from the checkpoint (each subtree runs once)
  bcast — new + FORCED broadcast of the node-cardinality score frame
          into each incidence join (measured finding: the r9 shape was
          NOT double work — Spark reuses the exchange — it was six
          shuffle joins of the full incidence frame, because the
          checkpoint+crossJoin score frames carry no stats for
          auto-broadcast; this is the shape graph.py ships from r10)

plus a per-stage split of the new shape: inc materialization, the six
raw-aggregate checkpoints, the six max+normalize passes, final union.

Measured r10 (sf0.1, local[32], warm best-of-3):
  old 5.19 s · new 5.88 s · bcast 3.34 s  → old→bcast 1.55×
  standalone fresh registered-query run: 14.3 s → ~7 s cold, 6.5 → 3.3 warm
  (the 29 s in the r9 full gate carried late-session JVM overhead, not
  plan cost)

Usage: python tools/hits_profile.py [N_runs]   (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PERF_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def _inc(spark, F, load):
    return (
        load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _norm(F, raw, key):
    mx = raw.agg(F.max("s").cast("double").alias("mx"))
    return raw.crossJoin(F.broadcast(mx)).select(
        key,
        F.round(F.col("s").cast("double") / F.col("mx"), 12)
        .cast("decimal(20,12)")
        .alias("score"),
    )


def run_bcast(spark, F, load) -> float:
    t0 = time.monotonic()
    inc = _inc(spark, F, load)
    h = inc.select("supp").distinct().select(
        "supp", F.lit(1.0).cast("decimal(20,12)").alias("score")
    )
    a = None
    for _ in range(ROUNDS):
        for key, join_key in (("part", "supp"), ("supp", "part")):
            score = h if key == "part" else a
            raw = (
                inc.join(F.broadcast(score), join_key)
                .groupBy(key)
                .agg(F.sum("score").alias("s"))
                .localCheckpoint(eager=True)
            )
            out = _norm(F, raw, key)
            if key == "part":
                a = out
            else:
                h = out
    n = h.count() + a.count()
    assert n > 0
    return time.monotonic() - t0


def run_old(spark, F, load) -> float:
    t0 = time.monotonic()
    inc = _inc(spark, F, load)
    h = inc.select("supp").distinct().select(
        "supp", F.lit(1.0).cast("decimal(20,12)").alias("score")
    )
    a = None
    for _ in range(ROUNDS):
        a_raw = inc.join(h, "supp").groupBy("part").agg(F.sum("score").alias("s"))
        a = _norm(F, a_raw, "part").localCheckpoint(eager=True)
        h_raw = inc.join(a, "part").groupBy("supp").agg(F.sum("score").alias("s"))
        h = _norm(F, h_raw, "supp").localCheckpoint(eager=True)
    n = h.count() + a.count()
    assert n > 0
    return time.monotonic() - t0


def run_new(spark, F, load, stages: dict[str, float] | None = None) -> float:
    t0 = time.monotonic()
    inc = _inc(spark, F, load)
    t1 = time.monotonic()
    if stages is not None:
        stages["inc"] = stages.get("inc", 0) + (t1 - t0)
    h = inc.select("supp").distinct().select(
        "supp", F.lit(1.0).cast("decimal(20,12)").alias("score")
    )
    a = None
    for _ in range(ROUNDS):
        for key, join_key in (("part", "supp"), ("supp", "part")):
            tr = time.monotonic()
            raw = (
                inc.join(a if key == "supp" else h, join_key)
                .groupBy(key)
                .agg(F.sum("score").alias("s"))
                .localCheckpoint(eager=True)
            )
            tn = time.monotonic()
            score = _norm(F, raw, key)
            if key == "part":
                a = score
            else:
                h = score
            if stages is not None:
                stages["raw_agg"] = stages.get("raw_agg", 0) + (tn - tr)
    tf = time.monotonic()
    n = h.count() + a.count()
    assert n > 0
    if stages is not None:
        stages["normalize+final"] = stages.get("normalize+final", 0) + (
            time.monotonic() - tf
        )
    return time.monotonic() - t0


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.session import get_session
    from avro_parquet_spark_example_spark.sources.catalog import load

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="hits-profile", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    run_new(spark, F, load)  # discarded warm-up
    bcast_best = min(run_bcast(spark, F, load) for _ in range(n_runs))
    old_best = min(run_old(spark, F, load) for _ in range(n_runs))
    stages: dict[str, float] = {}
    new_times = []
    for _ in range(n_runs):
        s: dict[str, float] = {}
        new_times.append(run_new(spark, F, load, s))
        if not stages or new_times[-1] == min(new_times):
            stages = s
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "rounds": ROUNDS,
                "old_checkpoint_after_norm_sec": round(old_best, 3),
                "new_checkpoint_raw_sec": round(min(new_times), 3),
                "bcast_score_join_sec": round(bcast_best, 3),
                "speedup_old_to_bcast": round(old_best / bcast_best, 2),
                "new_stages_sec": {
                    k: round(v, 3) for k, v in stages.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
