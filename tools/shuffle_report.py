"""Measured shuffle volume per headline query (SCALING.md evidence).

For each query: rebuild the plan fresh, execute it, then walk the ADAPTIVE
executed plan (drilling through AdaptiveSparkPlanExec / QueryStage wrappers)
and sum every Exchange node's "shuffle bytes written" / "shuffle records
written" SQL metrics. This is the ground-truth answer to "does this operator
shuffle more than it must?" — the number a 100 TB capacity plan multiplies.

Usage: python tools/shuffle_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: representative queries across the shuffle-shape spectrum
QUERIES = [
    "agg_scan_group",          # 1 shuffle: partial->final agg (6 groups)
    "tpch_q6",                 # 0 shuffles beyond 1-row combine
    "join_shuffle_equi",       # fact-fact shuffle join
    "join_broadcast_equi",     # broadcast: shuffle only for the agg
    "window_rank",             # 1 key-partitioned window shuffle
    "topk",                    # TakeOrdered: no full sort shuffle
    "dedup_exact",             # hash-key shuffle (32-byte keys, not bodies)
    "dedup_minhash_verified",  # NOTE: reports 0 — its localCheckpoints cut
    # lineage, so upstream exchanges ran in separate jobs not visible from
    # the final plan; per-stage cost lives in tools/minhash_profile.py
    "curation_token_budget_select",  # bucketed prefix sum
    "simsearch_bruteforce_topk",     # broadcast query vector: ~no shuffle
    "tpch_q18",                # join + agg + semi-join chain
]


def walk_exchanges(node, acc):
    nm = node.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        walk_exchanges(node.executedPlan(), acc)
        return acc
    if node.nodeName().startswith("Exchange"):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key, val = kv._1(), kv._2().value()
            if key == "shuffleBytesWritten":
                acc["bytes"] += max(val, 0)
            elif key == "shuffleRecordsWritten":
                acc["records"] += max(val, 0)
        acc["exchanges"] += 1
    it = node.children().iterator()
    while it.hasNext():
        walk_exchanges(it.next(), acc)
    # AQE wraps materialized stages: the Exchange lives in stage.plan()
    if "QueryStageExec" in nm:
        walk_exchanges(node.plan(), acc)
    return acc


def main() -> int:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import configure, get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="shuffle-report", shuffle_partitions=32)
    configure(spark)
    for name in QUERIES:
        df = get_query(name).fn(spark, sf_dir)  # fresh plan: metrics are per-execution
        n_rows = len(df.collect())
        acc = {"bytes": 0, "records": 0, "exchanges": 0}
        walk_exchanges(df._jdf.queryExecution().executedPlan(), acc)
        print(
            f"{name}: {acc['exchanges']} exchange(s), "
            f"{acc['records']:,} records / {acc['bytes']:,} bytes shuffled, "
            f"{n_rows} result rows"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
