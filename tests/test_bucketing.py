"""Bucketed co-located join: the pre-shuffle strategy for repeated
fact-fact joins at scale — write both sides bucketed on the join key,
and the join plans with ZERO shuffle exchanges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreamer_spark.plans import count_exchanges, physical_plan
from eventstreamer_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and cannot be pointed at tmp after session start
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderstatus").agg(
            F.round(F.sum("l_extendedprice"), 4).alias("rev")
        )
        # join itself: co-located buckets → no Exchange below the join
        join_only = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        assert count_exchanges(join_only) == 0, physical_plan(join_only)[:1500]
        # and the result matches the unbucketed computation
        plain = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_extendedprice"), 4).alias("rev"))
        )
        got = {r.o_orderstatus: r.rev for r in j.collect()}
        exp = {r.o_orderstatus: r.rev for r in plain.collect()}
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_catalog_lists_bucketed_tables(spark, bucketed_tables):
    names = {t.name for t in spark.catalog.listTables()}
    assert {"orders_b", "lineitem_b"} <= names
