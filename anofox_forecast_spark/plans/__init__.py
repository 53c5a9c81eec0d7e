"""Plan inspection utilities — the 100 TB guard-rails.

The scale posture of every operator is a claim about its physical plan:
filters reach the scan, small sides broadcast, nothing goes cartesian, the
shuffle count stays constant as data grows. These helpers turn those claims
into assertions so tests (and users) can check them mechanically instead of
eyeballing ``explain`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def plan_report(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale."""
    plan = physical_plan(df)
    simple = df._jdf.queryExecution().simpleString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "cartesian_products": len(re.findall(r"CartesianProduct", plan)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "python_udf_nodes": len(re.findall(
            r"FlatMapGroupsInPandas|MapInPandas|ArrowEvalPython|BatchEvalPython",
            plan)),
        "whole_stage_codegen": "WholeStageCodegen" in simple or "*(" in plan,
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verify column pruning reached the file."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: ([^\n]*)", plan)


def assert_no_cartesian(df: DataFrame) -> None:
    r = plan_report(df)
    if r["cartesian_products"] or r["nested_loop_joins"]:
        raise AssertionError(
            f"plan contains cartesian/nested-loop joins: {r}")


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pushed = ";".join(pushed_filters(df))
    if column not in pushed:
        raise AssertionError(
            f"no pushed filter mentions {column!r}; PushedFilters={pushed!r}")


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    r = plan_report(df)
    if r["exchanges"] - r["broadcast_exchanges"] > n:
        raise AssertionError(
            f"{r['exchanges'] - r['broadcast_exchanges']} shuffle exchanges "
            f"(max {n}): plan too shuffle-heavy\n{physical_plan(df)[:2000]}")
