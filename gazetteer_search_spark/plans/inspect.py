"""Physical-plan inspection helpers.

The scale contract is enforced here, not hoped for: tests assert that the
plans Catalyst produces for our operators have the shape a 1000-executor run
needs — filters pushed to the parquet scan, partition pruning on term_bucket,
broadcast for dimension joins, no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = explain_str(df)
    assert "PushedFilters" in plan, "no parquet scan with pushdown in plan"
    assert fragment in plan, f"expected pushed filter {fragment!r}; plan:\n{plan}"


def assert_partition_pruned(df: DataFrame, partition_col: str) -> None:
    plan = explain_str(df)
    assert "PartitionFilters" in plan, "no partition filters section in plan"
    # the partition column must appear inside a non-empty PartitionFilters list
    for line in plan.splitlines():
        if "PartitionFilters" in line and partition_col in line and "[]" not in line:
            return
    raise AssertionError(
        f"partition column {partition_col!r} not pruned; plan:\n{plan}"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
