"""10× leg for the round-15 registration (the backward-extension rule:
every new op gets a measured 10× leg before the round ends).

``agg_lorenz_curve_bucketed`` reads events → rides the disjoint
isomorphic events ×10 copies; its window twin is re-measured alongside
for a same-session comparison (the bucketed form exists to remove the
per-type full-population sort, so the interesting number is the ratio
AND the absolute delta vs the window form at 10×).

Usage: python tools/scaleup_r15_new_ops.py
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
    "agg_lorenz_curve_bucketed",
    "agg_equidepth_histogram_bucketed",
    "agg_equidepth_histogram",
    "agg_lorenz_curve",
    "surv_nelson_aalen",
    "surv_rmst",
    "stat_cvm_two_sample",
    "stat_cochran_armitage",
]
FACTS_OPS = ["eval_hosmer_lemeshow"]


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(
        app_name="scaleup-r15-new", master="local[32]", shuffle_partitions=32
    )
    ev10 = synthesize_graph(spark, 10)
    fx10 = synthesize_facts(spark, 10)
    for name in NEW_OPS + FACTS_OPS:
        fn = get_query(name).fn
        big = fx10 if name in FACTS_OPS else ev10
        t1 = warm_time(fn, spark, BASE)
        t10 = warm_time(fn, spark, big)
        ratio = t10 / t1 if t1 > 0 else float("inf")
        print(
            f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={ratio:.1f}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
