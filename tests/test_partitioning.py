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
from tests.conftest import SF_DIR


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
