"""Plan-shape tests: the 100 TB posture, pinned.

Correct rows with a wrong plan (unpruned scan, shuffled dimension
join, global sort for a top-k) would pass the value gate and still be
unusable at scale — these tests fail the build instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamer_spark.operators.joins import q_star_join_revenue, q_broadcast_dim_join
from eventstreamer_spark.operators.relational import (
    q_pricing_summary,
    q_topk_customers,
)
from eventstreamer_spark.operators.windowed import q_tumbling_window_stats
from eventstreamer_spark.operators.dedup import q_minhash_lsh_neardup
from eventstreamer_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_take_ordered,
    count_exchanges,
    physical_plan,
)
from tests.conftest import SF_DIR


def test_pricing_summary_pushdown_and_pruning(spark):
    df = q_pricing_summary(spark, SF_DIR)
    assert_pushed_filters(df, "l_shipdate")
    assert_read_schema_only(
        df,
        "lineitem",
        {"l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"},
    )
    # one shuffle: the 2-key aggregation (partial agg happens map-side)
    assert count_exchanges(df) == 1
    assert "partial_" in physical_plan(df), "no map-side partial aggregation"


def test_topk_plans_take_ordered(spark):
    df = q_topk_customers(spark, SF_DIR)
    assert_take_ordered(df)


def test_star_join_broadcasts_dimensions(spark):
    df = q_star_join_revenue(spark, SF_DIR)
    assert_broadcast_join(df, min_count=3)  # customer, nation, region
    assert_no_cartesian(df)


def test_dim_join_no_fact_shuffle_before_agg(spark):
    df = q_broadcast_dim_join(spark, SF_DIR)
    assert_broadcast_join(df, min_count=1)
    # the only shuffle is the final groupBy, never the events fact side
    assert count_exchanges(df) == 1


def test_tumbling_window_single_shuffle(spark):
    df = q_tumbling_window_stats(spark, SF_DIR)
    assert count_exchanges(df) == 1


def test_events_scan_prunes_columns(spark):
    df = q_tumbling_window_stats(spark, SF_DIR)
    assert_read_schema_only(df, "events", {"ts", "user_id", "value", "event_type", "event_id"})


def test_minhash_no_cartesian(spark):
    """The LSH candidate join must be a band-key equi-join, never an
    all-pairs product."""
    df = q_minhash_lsh_neardup(spark, SF_DIR)
    assert_no_cartesian(df)


def test_whole_stage_codegen_on_flagship(spark):
    """AQE wraps plans in AdaptiveSparkPlan (codegen only visible in
    the final plan), so check with AQE off — same static plan shape."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = physical_plan(q_pricing_summary(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # codegen stages print as "*(n) Operator" in the plan text
    assert "*(1)" in plan, f"no codegen stage markers:\n{plan[:1500]}"
