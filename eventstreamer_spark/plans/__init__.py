"""Plan inspection: assert the physical plan is the one we designed."""

from eventstreamer_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_take_ordered,
    count_exchanges,
    physical_plan,
)

__all__ = [
    "physical_plan",
    "count_exchanges",
    "assert_broadcast_join",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "assert_take_ordered",
    "assert_no_cartesian",
]
