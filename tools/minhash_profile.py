"""Per-stage wall-time breakdown of the dedup_minhash_verified pipeline.

BENCH_r04 recorded 4.40 s for the end-to-end query at sf0.1 against a
claimed 3.1-4.1 s round band; this harness splits that wall time into its
four stages so band drift can be attributed instead of guessed:

  1. signatures  — load + inject + shingle (NGram) + 64-hash MinHash agg,
                   materialized via localCheckpoint (same as the query)
  2. band_join   — band explode + equi self-join + est-Jaccard filter,
                   materialized via localCheckpoint (same as the query)
  3. verify      — universe filter + candidate-id semi-join + exact
                   3-shingle Jaccard on candidate pairs
  4. cc          — iterative min-label connected components + final
                   left join back to the doc universe

Each stage is timed warm (best of N after one discarded warm-up of the
whole pipeline); stages are cumulative-materialization boundaries, so the
sum approximates the end-to-end bench number.

Usage: python tools/minhash_profile.py [N_runs]  (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PERF_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.dedup import (
        connected_components,
        exact_verified_pairs,
        in_injected_universe,
        lsh_band_pairs,
        minhash_signatures_df,
        with_injected_duplicates,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    t: dict[str, float] = {}
    docs = with_injected_duplicates(
        load(spark, SF_DIR, "documents").select("doc_id", "text")
    )

    t0 = time.perf_counter()
    sig = minhash_signatures_df(docs).localCheckpoint(eager=True)
    t["signatures"] = time.perf_counter() - t0

    # slim band-bucket self-join — exactly what dedup_minhash_verified runs
    # (no est-Jaccard stage there: the exact gate subsumes it)
    t0 = time.perf_counter()
    cands_full = lsh_band_pairs(sig).localCheckpoint(eager=True)
    t["band_join"] = time.perf_counter() - t0

    cands = cands_full.filter(in_injected_universe("a") & in_injected_universe("b"))

    t0 = time.perf_counter()
    # the REAL verify stage (shared implementation — the profiler can never
    # measure a stale copy of the pipeline)
    verified = exact_verified_pairs(
        cands,
        docs,
        threshold=0.7,
        doc_filter=in_injected_universe("doc_id"),
    ).localCheckpoint(eager=True)
    t["verify"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    labeled = connected_components(verified, max_iter=25)
    nodes = docs.select("doc_id")
    nodes.join(
        F.broadcast(labeled), nodes["doc_id"] == labeled["id"], "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("component"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias(
            "is_canonical"
        ),
    ).collect()
    t["cc"] = time.perf_counter() - t0

    t["total"] = sum(t.values())
    return {k: round(v, 4) for k, v in t.items()}


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(app_name="minhash-profile")
    run_once(spark)  # warm-up: plan cache, parquet footer cache, JIT
    runs = [run_once(spark) for _ in range(n_runs)]
    best = min(runs, key=lambda r: r["total"])
    print(json.dumps({"sf_dir": SF_DIR, "best": best, "runs": runs}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
