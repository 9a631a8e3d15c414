"""Full-registry pass/fail + wall probe at a synthetic sf1 (VERDICT r14
task #7, stretch): one decade above the sf0.1 gate — catches
overflow/timeout classes three decades below 100 TB instead of four.

Corpus: tools/scaleup_r9b.synthesize — key-shifted ×10 copies of every
scaling table of sf0.1 (events 10M rows, lineitem 6M, orders 1.5M,
documents 60k, embeddings 20k; dimension tables symlinked). NOTE the
documents ×10 are EXACT key-shifted copies (the r9 "degenerate
exact-copy" growth): every doc gains 9 exact duplicates, so dedup
pair/cluster outputs are structurally inflated — fine for a
pass/fail/wall probe, NOT a throughput benchmark for the dedup family
(the honest dedup growth legs are scaleup_r14.py's mutated-copy ×100).

Each registered query runs once (count()), recording wall seconds, row
count, and any error class. Rows-only check (no DuckDB at this scale);
the correctness gates live at sf0.01/sf0.1. Output: SF1_PROBE_r15.json
+ a per-family summary on stdout.

Usage: python tools/sf1_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SF1_PROBE_r15.json"
    from tools.scaleup_r9b import synthesize

    from avro_parquet_spark_example_spark.registry import all_queries, get_query
    from avro_parquet_spark_example_spark.session import configure, get_session

    spark = get_session(app_name="sf1_probe")
    configure(spark)
    sf1 = synthesize(spark)
    print(f"synthetic sf1 at {sf1}", flush=True)

    results: dict[str, dict] = {}
    t_all = time.time()
    for name in sorted(all_queries()):
        fn = get_query(name).fn
        t0 = time.time()
        try:
            rows = fn(spark, sf1).count()
            err = None
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            rows, err = None, f"{type(ex).__name__}: {str(ex)[:160]}"
        sec = time.time() - t0
        results[name] = {"sec": round(sec, 2), "rows": rows, "err": err}
        status = "FAIL" if err else "ok"
        print(f"{status} {name}: {sec:.1f}s rows={rows}", flush=True)

    total = time.time() - t_all
    fams: dict[str, dict] = {}
    for name, r in results.items():
        f = fams.setdefault(
            family(name), {"n": 0, "fails": 0, "sec": 0.0, "worst": ""}
        )
        f["n"] += 1
        f["sec"] = round(f["sec"] + r["sec"], 1)
        if r["err"]:
            f["fails"] += 1
        if not f["worst"] or r["sec"] > results[f["worst"]]["sec"]:
            f["worst"] = name

    record = {
        "sf_dir": sf1,
        "n_queries": len(results),
        "failures": sum(1 for r in results.values() if r["err"]),
        "total_sec": round(total, 1),
        "families": fams,
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"\n== per-family (n, fails, total sec, worst query) ==")
    for f in sorted(fams):
        i = fams[f]
        print(f"{f}: n={i['n']} fails={i['fails']} sec={i['sec']} worst={i['worst']} ({results[i['worst']]['sec']}s)")
    print(f"\nTOTAL {len(results)} queries, {record['failures']} failures, {total:.0f}s -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
