"""Prove or refute the r8 claim that ``lsh_band_pairs(on_oversized=
"error")`` adds zero extra jobs over drop mode (VERDICT-r8 #4: BENCH r7→r8
moved dedup_minhash 2.50 → 2.75 s (+10%) on a +6% calib round, coincident
with dedup_minhash_verified switching to error mode — the claim was
asserted, not measured).

Two measurements, both at $PERF_SF_DIR (default sf0.1), on the exact
signature table dedup_minhash_verified builds:

1. **Plan structure** — number of Exchange / HashAggregate nodes in the
   optimized physical plan of the band-pair stage under each mode. If
   error mode's assert really rides the shared ``__bsz`` aggregate, the
   node counts are identical.
2. **Wall time** — interleaved A/B timing (drop, error, drop, error, ...)
   of materializing the band-pair stage N times per mode, so machine
   drift hits both modes equally. Reported: per-rep series, min, median.

Usage: python tools/minhash_error_cap_profile.py [N_reps]   (default 5)
Prints one JSON line; commit the verdict into the round notes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PERF_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from avro_parquet_spark_example_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures_df,
        with_injected_duplicates,
    )
    from avro_parquet_spark_example_spark.session import get_session
    from avro_parquet_spark_example_spark.sources.catalog import load

    spark = get_session(app_name="minhash-error-cap-profile")
    docs = with_injected_duplicates(
        load(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    sig = minhash_signatures_df(docs).localCheckpoint(eager=True)

    def plan_counts(mode: str) -> dict[str, int]:
        plan = (
            lsh_band_pairs(sig, on_oversized=mode)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return {
            "exchanges": plan.count("Exchange"),
            "hash_aggregates": plan.count("HashAggregate"),
            "joins": plan.count("Join"),
        }

    plans = {m: plan_counts(m) for m in ("drop", "error")}

    series: dict[str, list[float]] = {"drop": [], "error": []}
    # one discarded warm-up per mode, then interleaved reps
    for mode in ("drop", "error"):
        lsh_band_pairs(sig, on_oversized=mode).localCheckpoint(eager=True)
    for _ in range(n_reps):
        for mode in ("drop", "error"):
            t0 = time.perf_counter()
            lsh_band_pairs(sig, on_oversized=mode).localCheckpoint(eager=True)
            series[mode].append(round(time.perf_counter() - t0, 4))

    summary = {
        mode: {
            "min": min(s),
            "median": round(statistics.median(s), 4),
            "reps": s,
        }
        for mode, s in series.items()
    }
    same_plan = plans["drop"] == plans["error"]
    overhead_pct = round(
        (summary["error"]["min"] - summary["drop"]["min"])
        / summary["drop"]["min"]
        * 100,
        1,
    )
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "plan_counts": plans,
                "identical_plan_structure": same_plan,
                "band_stage": summary,
                "error_vs_drop_min_pct": overhead_pct,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
