"""Round-15 optimization profiler (guide §1: measure first).

For each named query, reports:
  * build_s — wall time of fn(spark, sf_dir): Catalyst construction plus any
    internal driver-side jobs (iterative training loops, collects).
  * exec_s  — wall time of a noop-sink write of the returned frame (guide
    §1.4: computes every column of every row, no sink cost, visible in the
    SQL tab as a real plan).
  * plan shape counters — Exchange count, join strategies, Python eval
    nodes, codegen spans — parsed from explain("formatted").

Optionally writes the formatted plan to plans/r15/<query>_<tag>.txt.

Usage:
    python tools/opt_profile.py [--tag before] [--plans] q1 q2 ...
    python tools/opt_profile.py --top    # the round-15 hot list
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_parquet_spark_example_spark.registry import get_query
from avro_parquet_spark_example_spark.session import configure, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r16"),
)

#: PERF_r15 fresh_top + bench headline queries — the round-15 target list.
TOP = [
    "vec_knn_graph_ivf",
    "simsearch_pq_topk",
    "cluster_kmeans",
    "vec_remove_top_component",
    "vec_top2_pcs",
    "simsearch_lsh_topk",
    "simsearch_ivf_kmeans_topk",
    "dedup_simhash",
    "vec_random_projection_jl",
    "stat_by_fdr",
    "eval_auc_bootstrap_ci",
    "stat_randomization_dow",
    "graph_pagerank",
    "stat_poisson_bootstrap_ci",
    "stat_bh_fdr",
    "stream_session_dynamic_gap",
    "graph_hits_bipartite",
    "vec_power_iteration_top_pc",
    "dedup_minhash_verified",
    "er_multipass_match",
    "agg_scan_group",
    "join_shuffle_equi",
    "window_rank",
    "events_agg",
    "text_stats",
    "simsearch_bruteforce_topk",
]


def plan_shape(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "NLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "Py": len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInArrow|MapInPandas", plan)),
        "Sort": len(re.findall(r"\bSort\b", plan)),
        "WSCG": len(re.findall(r"WholeStageCodegen", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        args = args[:i] + args[i + 2 :]
    write_plans = "--plans" in args
    args = [a for a in args if a != "--plans"]
    names = TOP if args == ["--top"] else args

    spark = get_session(app_name="opt_profile")
    configure(spark)
    if write_plans:
        os.makedirs(PLANS_DIR, exist_ok=True)

    # noise floor
    t0 = time.perf_counter()
    spark.range(100_000).count()
    print(f"# calib first job: {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    spark.range(100_000).count()
    print(f"# calib: {time.perf_counter() - t0:.3f}s  sf_dir={SF_DIR}")

    for name in names:
        q = get_query(name)
        spark.sparkContext.setJobDescription(f"opt_profile:{name}:build")
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        build_s = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        spark.sparkContext.setJobDescription(f"opt_profile:{name}:exec")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        exec_s = time.perf_counter() - t0
        # second fresh run (plan rebuilt) for a warm-cache number
        t0 = time.perf_counter()
        df2 = q.fn(spark, SF_DIR)
        build2_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        exec2_s = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: build={build_s:.2f}/{build2_s:.2f}s "
            f"exec={exec_s:.2f}/{exec2_s:.2f}s  [{plan_shape(plan)}]"
        )
        if write_plans:
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
