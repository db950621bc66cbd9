"""Physical-plan inspection helpers.

The 100 TB design contract is enforced in tests with these: a query that
silently regresses from BroadcastHashJoin to SortMergeJoin, or loses its
parquet filter pushdown, fails CI — plan shape is part of correctness
here (SURVEY §4 / project north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, plan:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    """At least one parquet scan must carry a non-empty pushed-filter list."""
    import re

    plan = formatted_plan(df)
    assert re.search(r"PushedFilters: \[[^\]]+\]", plan), (
        f"no pushed filters in scan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"


def assert_no_nested_loop(df: DataFrame) -> None:
    """Stricter than :func:`assert_no_cartesian`: also rejects
    BroadcastNestedLoopJoin — an O(n·m) comparison loop that merely
    hides the cartesian behind a broadcast (the q34-class scale
    killer)."""
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        f"unexpected nested-loop join:\n{plan}"
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Count WholeStageCodegen spans in the FINAL plan. Under AQE the
    executed plan only shows codegen nodes after materialization, so this
    triggers execution."""
    import re

    df.collect()
    plan = physical_plan(df)
    # Spark renders codegen'd operators with a "*(<stage id>)" prefix.
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return max(len(ids), plan.count("WholeStageCodegen"))


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange nodes in the analyzed physical plan.
    BroadcastExchange is excluded (the \\bExchange\\b boundary cannot
    match inside it): broadcasts replicate a small side, they do not
    repartition the data. This is the per-query shuffle budget that
    PLANS.md reports and tests/test_plans.py pins for the most expensive
    queries — at 100 TB each extra exchange is a full rewrite of the
    stream through the cluster fabric."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))
