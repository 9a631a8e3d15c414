"""Warm per-query timing sweep over the ENTIRE registry (PERF_r{N}.json).

bench.py tracks 7 headline keys; this harness times every registered query
at $PERF_SF_DIR (default sf0.1) — warm best-of-2 after one discarded
warm-up run, plan cache enabled (so this measures steady-state execution,
not Catalyst analysis; note that repeated collects of a cached DataFrame
also skip completed shuffle map stages — see registry.py — so shuffle
queries report post-shuffle cost here; full-re-execution timing lives in
bench.py's "fresh" protocol and the scale-up stresses) — and writes one
JSON object {query: seconds}.
Committed per round as PERF_r{N}.json, it turns "did anything regress?"
into a diff instead of a guess. Queries are run in sorted order; streaming
queries re-execute their sinks, so their numbers include sink setup.

Usage: python tools/perf_sweep.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PERF_SF_DIR", "/root/testdata/sf0.1")


def main(out_path: str | None) -> int:
    from avro_parquet_spark_example_spark.registry import all_queries
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(app_name="perf-sweep")
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            fn(spark, SF_DIR).collect()  # warm-up (build + first exec)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
            print(f"{name}: {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - record and continue
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"FAIL {name}: {failures[name]}", flush=True)
    doc = {
        "sf_dir": SF_DIR,
        "total_sec": round(sum(timings.values()), 2),
        "n_queries": len(timings),
        "failures": failures,
        "timings": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
    }
    out = out_path or "PERF_sweep.json"
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"\nwrote {out}: {len(timings)} queries, {doc['total_sec']}s total, "
          f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
