"""Plan-inspection helpers: assert the physical plans we designed for.

Used by tests/test_plans.py to pin the scale-critical plan properties:
* the fetch join broadcasts the frontier (pages never shuffled);
* the seen/rejected anti-joins broadcast the small side (state never
  shuffled);
* parquet scans prune columns (ReadSchema contains only what's selected);
* the hot relational queries stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_broadcast_join(df: DataFrame, count: int = 1) -> str:
    plan = physical_plan(df)
    found = plan.count("BroadcastHashJoin")
    assert found >= count, f"expected >={count} BroadcastHashJoin, got {found}:\n{plan}"
    return plan


def assert_no_sort_merge_join(df: DataFrame) -> str:
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"
    return plan


def assert_read_schema_only(df: DataFrame, allowed: set[str]) -> str:
    """Every parquet scan's ReadSchema must be a subset of ``allowed``."""
    plan = physical_plan(df)
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        extra = cols - allowed
        assert not extra, f"scan reads unpruned columns {extra}:\n{plan}"
    return plan
