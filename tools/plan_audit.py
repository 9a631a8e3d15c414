"""Physical-plan audit — sweep every registered query's plan for 100 TB
red flags, per the engine's design rules (README / SURVEY.md §4):

  * CartesianProduct / BroadcastNestedLoopJoin outside the known bounded
    cases (pure theta joins on dims, broadcast query vectors);
  * row-at-a-time Python eval (BatchEvalPython) outside the declared
    slow-path demos;
  * window functions with no PARTITION BY (single-task funnels);
  * full-width scans (ReadSchema not pruned) on wide tables.

Usage: python tools/plan_audit.py [names...] — prints one line per query
plus a FLAG line per finding; exits 1 if unexpected flags appear.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")

#: Queries allowed to carry each red-flag operator, with the reason.
EXPECTED = {
    "BroadcastNestedLoopJoin": {
        "join_theta": "pure non-equi theta on dims (bounded by design)",
        "join_cross": "cartesian demo on 5x5 dims",
        "simsearch_bruteforce_topk": "broadcast 1-row query vector",
        "simsearch_ivf_topk": "broadcast 1-row query vector",
        "simsearch_lsh_topk": "broadcast 1-row query vector",
        "neardup_embedding": "label-blocked pair join (non-equi id bound)",
        "fn_array_setops": "pair demo on 20 docs (id< theta join, bounded)",
        "neardup_levenshtein": "pair demo on 60 doc heads (id< theta join, bounded)",
        "tpch_q22": "broadcast 1-row scalar threshold (avg_bal) cross join",
        "text_unigram_logprob": "broadcast 1-row vocab-total cross join",
    },
    "CartesianProduct": {},
    "BatchEvalPython": {
        "udf_python_scalar": "declared slow-path demo (bounded to 100 docs)",
        "udtf_python": "Python UDTF — Python eval is the operator itself",
    },
}

WIDE_TABLES = {"lineitem": 16, "orders": 6, "events": 6}


def _tree_indent(line: str) -> int:
    """Depth marker of an operator-tree line: column of its '+-'/':-'
    connector (-1 for the root operator)."""
    import re

    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def _window_over_single_partition(plan: str) -> bool:
    """True iff some Window operator's subtree contains a SinglePartition
    Exchange. The tree rendering carries only operator names + ids; the
    partitioning argument lives in the per-operator detail block, so scope
    by subtree ids and join against the details."""
    import re

    blocks = plan.split("\n\n")
    tree = blocks[0].splitlines()
    # ids of Exchange operators whose own detail block says SinglePartition
    single_ids = set()
    for block in blocks[1:]:
        m = re.match(r"\((\d+)\) Exchange", block.strip())
        if m and "SinglePartition" in block:
            single_ids.add(m.group(1))
    if not single_ids:
        return False
    for i, line in enumerate(tree):
        if not re.search(r"\bWindow", line):
            continue
        depth = _tree_indent(line)
        for child in tree[i + 1 :]:
            if child.strip() and _tree_indent(child) <= depth:
                break
            m = re.search(r"\((\d+)\)\s*$", child)
            if m and m.group(1) in single_ids:
                return True
    return False


def main(names: list[str]) -> int:
    from avro_parquet_spark_example_spark.plans.explain import (
        formatted_plan,
        physical_operators,
        read_schema_columns,
    )
    from avro_parquet_spark_example_spark.registry import all_queries
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(shuffle_partitions=8)
    unexpected = 0
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
        flags = []
        for op, allowed in EXPECTED.items():
            if op in plan:
                if name in allowed:
                    flags.append(f"{op} (expected: {allowed[name]})")
                else:
                    flags.append(f"{op} UNEXPECTED")
                    unexpected += 1
        # A window with no PARTITION BY funnels all rows to one task: its
        # required distribution plans as `Exchange SinglePartition` feeding
        # the Window (must be in the Window's SUBTREE — an unrelated
        # single-partition exchange elsewhere, e.g. a global limit, is fine).
        if _window_over_single_partition(plan):
            flags.append("Window over Exchange SinglePartition UNEXPECTED")
            unexpected += 1
        cols = read_schema_columns(df)
        print(f"{name}: ops={sorted(ops & {'BroadcastHashJoin','SortMergeJoin','ShuffledHashJoin','HashAggregate','Window','TakeOrderedAndProject','Exchange'})} read={len(cols)} cols")
        for f in flags:
            print(f"  FLAG {f}")
    spark.stop()
    print(f"\n{unexpected} unexpected flags")
    return 1 if unexpected else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
