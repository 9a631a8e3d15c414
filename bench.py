"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line. Query keys match BASELINE.md so the per-round BENCH_r{N}.json is
directly comparable (bar: within 2× of the frozen PySpark baseline, warm,
startup excluded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from avro_parquet_spark_example_spark.registry import all_queries
from avro_parquet_spark_example_spark.session import get_session

#: BASELINE.md key → registered query implementing that workload.
HEADLINE = {
    "q1_scan_agg": "agg_scan_group",
    "q3_join3": "join_shuffle_equi",
    "window_rank": "window_rank",
    "events_agg": "events_agg",
    "topk_docs": "text_stats",
    "knn_dot": "simsearch_bruteforce_topk",
}

N_RUNS = 3  # timing = best of runs 2..N (warm; run 1 discarded as warm-up)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session(app_name="bench")
    queries = all_queries()

    timings: dict[str, float] = {}
    for bench_key, query_name in HEADLINE.items():
        fn = queries[query_name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[bench_key] = round(min(runs[1:]), 4)

    print(
        json.dumps(
            {
                "metric": "warm_headline_queries",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
