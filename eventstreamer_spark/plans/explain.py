"""Physical-plan assertions.

A query that returns the right rows with the wrong plan is only half
done at 100 TB — these helpers let tests pin the plan properties that
matter: filters reaching the parquet scan, column pruning, broadcast
vs shuffle joins, top-k via TakeOrderedAndProject, shuffle counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan carries pushed filters (predicate
    pushdown reached the source)."""
    plan = physical_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, f"no PushedFilters in plan:\n{plan[:2000]}"
    for frag in fragments:
        assert frag in m.group(1), f"filter {frag!r} not pushed; got: {m.group(1)}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, allowed: set[str]) -> None:
    """Assert column pruning: the scan of ``table_fragment`` reads no
    columns beyond ``allowed``."""
    plan = physical_plan(df)
    for scan in re.finditer(r"FileScan parquet \[([^\]]*)\][^\n]*Location: [^\n]*" + table_fragment, plan):
        cols = {c.split("#")[0].strip() for c in scan.group(1).split(",") if c.strip()}
        extra = cols - allowed
        assert not extra, f"scan of {table_fragment} reads unpruned columns {extra}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, found {n}:\n{plan[:2000]}"


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k must plan as TakeOrderedAndProject, never a global sort."""
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject:\n{plan[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected CartesianProduct:\n{plan[:2000]}"
