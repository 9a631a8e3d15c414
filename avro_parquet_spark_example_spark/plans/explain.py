"""Physical-plan inspection helpers (SURVEY.md §4).

The engine writes no planner code — it *asserts* that Catalyst produced the
plan a 100 TB deployment needs: pruned ReadSchema, pushed filters, broadcast
vs shuffle join choice, top-k instead of global sort. Tests use these
helpers; they are also handy interactively while tuning."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def formatted_plan(df: DataFrame) -> str:
    """The plan as ``explain("formatted")`` would print it."""
    return _explain(df, "formatted")


def read_schema_columns(df: DataFrame) -> set[str]:
    """Column names in the Parquet scan's ReadSchema (what is actually read
    from disk after column pruning)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            field = ""
            for ch in inner + ",":
                if ch == "," and depth == 0:
                    if ":" in field:
                        cols.add(field.split(":", 1)[0].strip())
                    field = ""
                    continue
                depth += ch in "<(" or -(ch in ">)")
                field += ch
    return cols


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause of the scan (empty string if none)."""
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            return line.split("PushedFilters:", 1)[1].strip()
    return ""


def physical_operators(df: DataFrame) -> list[str]:
    """Operator names appearing in the physical plan, e.g.
    BroadcastHashJoin, SortMergeJoin, TakeOrderedAndProject."""
    import re

    ops = []
    for line in formatted_plan(df).splitlines():
        m = re.match(r"^\(\d+\)\s+([A-Za-z0-9]+)", line.strip())
        if m:
            ops.append(m.group(1))
    return ops


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    # Under AQE the pre-execution simple/formatted plans carry no codegen
    # markers; "codegen" mode actually generates the stages.
    return "WholeStageCodegen" in _explain(df, "codegen")
