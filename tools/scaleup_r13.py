"""10× scale legs for the curation/export and timeseries families
(VERDICT r12 "what's missing #2": the backward-extension rule had never
covered these two families).

Reuses the scaleup_bench synthesizers: documents ×10 (key-shifted
unions — "more docs, same distribution" growth) for curation/export;
events ×10 as disjoint isomorphic copies (user ids +10^6, ts +366d per
copy) for timeseries. Prints warm (2nd-run) wall times at 1× and 10×
plus the ratio; the SCALING.md rule: at-or-below ~10× is linear.
Interpretation caveats, recorded per-op in SCALING.md:

* the events copies shift ts by 366 d/copy, so the DAY GRID itself
  grows ×10 — day-grid-sized ops (Holt, Holt-Winters, decompose) are
  expected near-linear in the grid, not flat;
* export_global_rownum / curation_token_budget_select emit
  corpus-sized output (every row gets a number), so their 10× leg
  carries 10× output rows by construction.

Usage: python tools/scaleup_r13.py
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

DOCS_OPS = [
    "curation_token_budget_select",
    "pack_sequences",
    "curation_pipeline_e2e",
    "export_global_rownum",
    "export_dataset_card",
    "mixture_temperature_resample",
]
#: Batch 2 — the round's NEW registrations (the backward-extension rule:
#: every new op gets a measured 10x leg). Events ops ride the disjoint
#: isomorphic copies; lineitem ops (the AUC family) ride the facts dir.
NEW_EVENTS_OPS = [
    "stat_kendall_w",
    "stat_cuped_adjustment",
    "ts_mann_kendall",
    "stat_group_sequential_obf",
    "eval_mcnemar_paired",
    "eval_cochran_q",
    "stat_krippendorff_alpha",
    "eval_brier_decomposition",
    "stat_g_test",
]
NEW_FACTS_OPS = [
    "eval_auc_bootstrap_cell_ci",
    "eval_auc_delong_se",
    "eval_auc_bootstrap_ci",
]
NEW_DOCS_OPS = ["eval_rbo_rankings"]

EVENTS_OPS = [
    "ts_holt_linear",
    "ts_holt_winters",
    "ts_attribution_linear",
    "ts_sessionize_capped",
    "ts_seasonality_decompose",
    "ts_max_concurrency",
]


def warm_time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).collect()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(
        app_name="scaleup-r13", master="local[32]", shuffle_partitions=32
    )
    dc10 = synthesize(spark)
    ev10 = synthesize_graph(spark, 10)
    fx10 = synthesize_facts(spark, 10)
    batch2 = "--new-only" in sys.argv
    worst = 0.0
    groups = (
        ((NEW_EVENTS_OPS, ev10), (NEW_FACTS_OPS, fx10), (NEW_DOCS_OPS, dc10))
        if batch2
        else ((DOCS_OPS, dc10), (EVENTS_OPS, ev10))
    )
    for ops, big in groups:
        for name in ops:
            fn = get_query(name).fn
            t1 = warm_time(fn, spark, BASE)
            t10 = warm_time(fn, spark, big)
            ratio = t10 / t1 if t1 > 0 else float("inf")
            worst = max(worst, ratio)
            print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={ratio:.1f}",
                  flush=True)
    print(f"worst ratio: {worst:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
