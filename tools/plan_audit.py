"""Physical-plan audit CLI — sweep every registered query's plan for 100 TB
red flags. The rules and allow-list live in
``avro_parquet_spark_example_spark/plans/audit.py`` (shared with the
``tests/test_plans.py`` full-registry sweep, which is the enforcement
point); this CLI is the interactive view.

Usage: python tools/plan_audit.py [names...] — prints one line per query
plus a FLAG line per finding; exits 1 if unexpected flags appear.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")


def main(names: list[str]) -> int:
    from avro_parquet_spark_example_spark.plans.audit import audit_plan
    from avro_parquet_spark_example_spark.plans.explain import (
        formatted_plan,
        physical_operators,
        read_schema_columns,
    )
    from avro_parquet_spark_example_spark.registry import all_queries
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(shuffle_partitions=8)
    unexpected_total = 0
    for name, fn in sorted(all_queries().items()):
        if names and name not in names:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = formatted_plan(df)
            ops = set(physical_operators(df))
        except Exception as exc:  # streaming run_to_table etc. still planable
            print(f"SKIP {name}: {type(exc).__name__}")
            continue
        expected, unexpected = audit_plan(name, plan)
        unexpected_total += len(unexpected)
        cols = read_schema_columns(df)
        shown = {'BroadcastHashJoin', 'SortMergeJoin', 'ShuffledHashJoin',
                 'HashAggregate', 'Window', 'TakeOrderedAndProject', 'Exchange'}
        print(f"{name}: ops={sorted(ops & shown)} read={len(cols)} cols")
        for f in expected + unexpected:
            print(f"  FLAG {f}")
    spark.stop()
    print(f"\n{unexpected_total} unexpected flags")
    return 1 if unexpected_total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
