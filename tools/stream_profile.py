"""Round-16 streaming profiler (guide §1 measure-first, VERDICT r15 #1).

For each streaming query: total wall time of the registered fn (sink
drained) plus the micro-batch timeline from the engine's own
StreamingQueryProgress — batch count, per-batch durationMs breakdown
(addBatch = plan+execute, getBatch/latestOffset = source, walCommit/
commitOffsets = checkpoint log), and state-operator commit times — so the
per-query seconds can be attributed to state plumbing vs data work vs
fixed sink/checkpoint setup instead of guessed.

Usage:
    python tools/stream_profile.py [query ...]   # default: all stream_*
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_parquet_spark_example_spark.registry import all_queries, get_query
from avro_parquet_spark_example_spark.session import configure, get_session
from avro_parquet_spark_example_spark.streaming import stateful

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or sorted(
        k for k in all_queries() if k.startswith("stream_") or k == "events_stream_source"
    )
    spark = get_session(app_name="stream_profile")
    configure(spark)
    t0 = time.perf_counter()
    spark.range(100_000).count()
    print(f"# calib first job: {time.perf_counter() - t0:.3f}s sf_dir={SF_DIR}")

    for name in names:
        q = get_query(name)
        for rep in range(2):
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = df.count()
            count_s = time.perf_counter() - t0
            progress = list(stateful.LAST_STREAM_PROGRESS)
            batches = []
            for p in progress:
                dur = p.get("durationMs", {})
                ops = p.get("stateOperators", [])
                commit = sum(o.get("commitTimeMs", 0) for o in ops)
                nparts = max(
                    (o.get("customMetrics", {}).get("numStateStoreInstances", 0) for o in ops),
                    default=0,
                )
                batches.append(
                    f"b{p.get('batchId')}: rows={p.get('numInputRows')} "
                    f"trig={dur.get('triggerExecution')}ms "
                    f"addBatch={dur.get('addBatch')}ms "
                    f"getBatch={dur.get('getBatch', 0) + dur.get('latestOffset', 0)}ms "
                    f"wal={dur.get('walCommit', 0) + dur.get('commitOffsets', 0)}ms "
                    f"stateCommit={commit}ms stores={nparts}"
                )
            print(
                f"{name} rep{rep}: fn={build_s:.2f}s count={count_s:.2f}s "
                f"rows={n} nbatches={len(progress)}"
            )
            for b in batches:
                print(f"    {b}")
            sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
