from adhesive_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_no_nested_loop,
    assert_pushed_filters,
    physical_plan,
)

__all__ = [
    "physical_plan",
    "assert_broadcast_join",
    "assert_pushed_filters",
    "assert_no_cartesian",
    "assert_no_nested_loop",
]
