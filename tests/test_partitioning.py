"""Partitioned-layout tests: the write side of the 100 TB story.

Event data at scale lives date-partitioned; a time-ranged query must
prune partitions at planning time (PartitionFilters), not filter rows
after reading everything.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreamer_spark.plans import physical_plan
from eventstreamer_spark.sources.tables import load_events
from tests.conftest import SF_DIR, SF_DIR_MID


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_date")
    ev = load_events(spark, SF_DIR).withColumn("dt", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("dt").parquet(out)
    return out


def test_date_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("dt") == "2024-01-05")
    plan = physical_plan(df)
    assert "PartitionFilters: [" in plan
    # the pruning filter must actually reference dt…
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), plan[:1500]
    # …and the result matches the unpartitioned computation
    exp = load_events(spark, SF_DIR).filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == exp > 0


def test_partitioned_write_roundtrip_complete(spark, partitioned_events):
    total = spark.read.parquet(partitioned_events).count()
    assert total == load_events(spark, SF_DIR).count()


def test_aqe_skew_join_mitigation_fires(spark):
    """AQE skew-join proof: on a deliberately skewed key (~90% of rows
    on one value) with thresholds scaled down to test-data size, the
    adaptive planner must actually SPLIT the skewed partition — the
    final executed plan carries the `skew=true` marker on the join.
    This is the runtime complement to salted_skew_join (explicit
    salting): moderate skew is AQE's job, and this pins that the
    mitigation fires rather than assuming the conf does something."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # repartition(16) first: AQE splits a skewed reducer partition
        # along MAPPER boundaries, so a single-file (single-mapper)
        # scan could never split — 16 map tasks give it cut points
        ev = load_events(spark, SF_DIR_MID).repartition(16).select(
            # ~90% of events land on hot key 0; the pad must be
            # per-row-unique — skew detection reads COMPRESSED map
            # output sizes, and a constant pad compresses away
            F.when(F.col("event_id") % 10 < 9, F.lit(0))
            .otherwise(F.col("event_id") % 100)
            .alias("k"),
            F.col("value"),
            F.md5(F.col("event_id").cast("string")).alias("pad"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), F.repeat(F.lit("y"), 64).alias("dpad")
        )
        joined = ev.join(dim, "k")
        # AQE finalizes a plan per execution: collect() runs THIS
        # frame's queryExecution (count() would plan a different one)
        n = len(joined.collect())
        assert n == load_events(spark, SF_DIR_MID).count()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan, final_plan[:500]
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
