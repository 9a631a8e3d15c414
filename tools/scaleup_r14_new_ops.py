"""10× legs for the round-14 registrations (the backward-extension
rule: every new op gets a measured 10× leg before the round ends).

All nine new queries read events, so they all ride the disjoint
isomorphic events ×10 copies (scaleup_bench.synthesize_graph — user
ids shifted per copy, same ts distribution). Warm (2nd-run) times at
1× vs 10×; the SCALING.md rule: at-or-below ~10× is linear.

Usage: python tools/scaleup_r14_new_ops.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaleup_bench import (  # noqa: E402
    BASE,
    synthesize_facts,
    synthesize_graph,
)
from tools.scaleup_r13 import warm_time  # noqa: E402

NEW_OPS = [
    "stat_jonckheere_terpstra",
    "stat_gk_gamma_tau",
    "stat_mood_median",
    "stat_runs_test",
    "stat_cliff_delta",
    "eval_kappa_weighted",
    "stat_ks_two_sample",
    "agg_lorenz_curve",
    "stat_by_fdr",
    "stat_brunner_munzel",
    "surv_kaplan_meier",
    "surv_logrank_test",
]
FACTS_OPS = ["eval_auc_partial"]


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(
        app_name="scaleup-r14-new", master="local[32]", shuffle_partitions=32
    )
    ev10 = synthesize_graph(spark, 10)
    fx10 = synthesize_facts(spark, 10)
    worst = 0.0
    for name in NEW_OPS + FACTS_OPS:
        fn = get_query(name).fn
        big = fx10 if name in FACTS_OPS else ev10
        t1 = warm_time(fn, spark, BASE)
        t10 = warm_time(fn, spark, big)
        ratio = t10 / t1 if t1 > 0 else float("inf")
        worst = max(worst, ratio)
        print(
            f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={ratio:.1f}",
            flush=True,
        )
    print(f"worst ratio: {worst:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
