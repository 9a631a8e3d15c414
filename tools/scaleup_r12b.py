"""10× scale legs for the round-12b inference/eval family.

Reuses the scaleup_bench synthesizers: events ×10 as disjoint isomorphic
copies (graph dir — "longer log, more users" growth), documents ×10
(key-shifted unions), orders ×10 (facts dir) for the jackknife leg.
Prints warm (2nd-run) wall times at 1× and 10× plus the ratio; the
SCALING.md rule: at-or-below ~10× is linear (these ops are one or two
map-side-combined aggregates over the raw rows plus grid algebra, so the
expected exponent is ~1).

Usage: python tools/scaleup_r12b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaleup_bench import (  # noqa: E402
    BASE,
    synthesize,
    synthesize_facts,
    synthesize_graph,
)

EVENTS_OPS = [
    "eval_pass_at_k",
    "eval_fleiss_kappa",
    "stat_poisson_bootstrap_ci",
    "stat_randomization_dow",
    "stat_bh_fdr",
    "stat_fisher_exact",
    "stat_effect_sizes",
    "stat_power_mde",
    "eval_elo_bradley_terry",
    "ts_forecast_backtest",
]
DOCS_OPS = ["eval_bleu_corpus", "curation_length_buckets"]
FACTS_OPS = ["stat_jackknife_cluster"]


def warm_time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).collect()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(
        app_name="scaleup-r12b", master="local[32]", shuffle_partitions=32
    )
    ev10 = synthesize_graph(spark, 10)
    dc10 = synthesize(spark)
    fx10 = synthesize_facts(spark, 10)
    worst = 0.0
    for ops, big in (
        (EVENTS_OPS, ev10),
        (DOCS_OPS, dc10),
        (FACTS_OPS, fx10),
    ):
        for name in ops:
            fn = get_query(name).fn
            t1 = warm_time(fn, spark, BASE)
            t10 = warm_time(fn, spark, big)
            ratio = t10 / t1 if t1 > 0 else float("inf")
            worst = max(worst, ratio)
            print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={ratio:.1f}")
    print(f"worst ratio: {worst:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
