"""Physical-plan inspection helpers: make plan shape assertable in tests.

The scale contract is enforced here: filters must reach the parquet scan
(PushedFilters), dimension joins must broadcast, aggregations must have a
map-side partial phase, and the decode stage must be shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (distinct plan nodes, not string hits —
    the formatted explain prints each node in both the tree and the detail
    section)."""
    import re

    plan = physical_plan(df)
    nodes = set(re.findall(r"\((\d+)\) Exchange", plan))
    if nodes:
        return len(nodes)
    return simple_plan(df).count("Exchange")


def has_partial_aggregate(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "partial_" in plan or "HashAggregate" in plan


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema fragments of every file scan (column pruning check)."""
    return "\n".join(l for l in physical_plan(df).splitlines()
                     if "ReadSchema" in l)
