"""Tier B join surface: broadcast/shuffle equi-joins, semi/anti,
multi-way star joins, theta (range/band) joins, and an as-of join.

The reference has no joins (single dataset, SURVEY.md §2.1); this is
the driver-mandated relational tier. Strategy notes per operator:

- **Small dims are broadcast** (`F.broadcast`): at 100 TB the fact
  side never shuffles for a dimension lookup — region/nation/customer/
  supplier/part stay comfortably under executor memory.
- **Fact-fact joins** (orders×lineitem) use the shuffle path; AQE
  re-plans skew at runtime, and pre-bucketing on the join key is the
  documented production posture.
- **As-of join** is composed from a union + running last_value window
  (no native Spark asof): one shuffle on (user, time) — the same
  merge-sorted-stream shape a native asof executor would use, and it
  scales linearly instead of the quadratic theta-join naive form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.functions.casting import fmt_ts
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events, load_table

# ---------------------------------------------------------------------------
# Broadcast star join: events enriched by a dimension
# ---------------------------------------------------------------------------

_BCAST_ORACLE = f"""
SELECT c.c_mktsegment,
       e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       {N.SUMK_DUCK.format(v="e.value", s=10000)} AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
"""


@query("broadcast_dim_join", oracle=_BCAST_ORACLE)
def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact×dim equi-join with an explicit broadcast hint: zero shuffle
    of the event stream; the only exchange is the final 2-key agg."""
    ev = load_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

_STAR_ORACLE = f"""
SELECT n.n_name,
       {N.SUMK_DUCK.format(v="l.l_extendedprice * (1 - l.l_discount)", s=10000)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
GROUP BY n.n_name
"""


@query("star_join_revenue", oracle=_STAR_ORACLE)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star: the region filter prunes *before* the joins
    (Catalyst pushes it through), the three dims broadcast, and the
    only real shuffle is orders×lineitem on the order key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("AMERICA", "ASIA"))
        .groupBy("n_name")
        .agg(
            N.sumk_spark(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
)
"""


@query("semi_join_big_spenders", oracle=_SEMI_ORACLE)
def q_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS: emits each customer at most once, never
    widens the row — the planner's cheapest join shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


@query("anti_join_no_big_orders", oracle=_ANTI_ORACLE)
def q_anti_join_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS (customers with no large order — the
    predicate keeps the result non-empty at every sf, so the check is
    not vacuous)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Outer joins
# ---------------------------------------------------------------------------

_OUTER_ORACLE = """
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 4) AS total_spend
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
GROUP BY c.c_custkey
"""


@query("left_outer_join_orders", oracle=_OUTER_ORACLE)
def q_left_outer_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with a pushed join-side predicate: the status filter
    belongs in the ON clause (filtering after the join would drop the
    null-extended rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Theta join: band / range predicate
# ---------------------------------------------------------------------------

_BAND_ORACLE = """
WITH bands(band_name, lo, hi) AS (
  VALUES ('small', 0.0, 50.0), ('mid', 50.0, 150.0), ('large', 150.0, 100000.0)
)
SELECT b.band_name,
       CAST(count(*) AS BIGINT) AS n,
       floor(sum(CAST(round(e.value * 1000000, 0) AS BIGINT)) * 1.0 / count(*) + 0.5) / 1000000.0 AS avg_value
FROM events e
JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_name
"""


@query("band_range_join", oracle=_BAND_ORACLE)
def q_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-predicate) join against a tiny banding dim: Spark
    plans BroadcastNestedLoopJoin — correct and cheap because the
    build side is 3 rows. For large-×-large range joins, bucketize the
    range key to turn it into an equi-join (see asof below)."""
    ev = load_events(spark, sf_dir)
    bands = spark.createDataFrame(
        [("small", 0.0, 50.0), ("mid", 50.0, 150.0), ("large", 150.0, 100000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        ev.join(F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            N.mean6_spark(F.col("value")).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (events ↔ most recent prior order per user)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT o_custkey AS uid, o_orderdate AS ts, o_orderkey,
         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value, 0 AS is_event
  FROM orders
  UNION ALL
  SELECT user_id, ts, NULL, event_id, value, 1
  FROM events
), filled AS (
  SELECT uid, ts, event_id, value, is_event,
         last_value(CASE WHEN is_event = 0 THEN o_orderkey END IGNORE NULLS)
           OVER (PARTITION BY uid ORDER BY ts, is_event, coalesce(event_id, o_orderkey)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
  FROM tagged
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(uid AS BIGINT) AS user_id,
       round(value, 6) AS value,
       CAST(asof_orderkey AS BIGINT) AS asof_orderkey
FROM filled
WHERE is_event = 1
"""


@query("asof_join_events_orders", oracle=_ASOF_ORACLE)
def q_asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the most recent order (by date) of
    the same user at-or-before the event's timestamp.

    Composition: tag + union both streams, sort within user by (ts,
    kind, id), and carry the last seen order key forward with an
    IGNORE NULLS last_value window. One shuffle on user_id; state per
    row is O(1). This is the scalable form — a naive theta join
    (e.o.custkey = o_custkey AND o_orderdate <= ts, then argmax) is
    quadratic per key.

    Orders sort before events at identical timestamps (is_event
    tie-break), i.e. an order placed exactly at the event time is
    visible to the event — matching ASOF JOIN's <= semantics.
    """
    ev = load_events(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    tagged = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_event"),
    ).unionByName(
        ev.select(
            F.col("user_id").alias("uid"),
            "ts",
            F.lit(None).cast("long").alias("o_orderkey"),
            "event_id",
            "value",
            F.lit(1).alias("is_event"),
        )
    )
    tagged.createOrReplaceTempView("asof_tagged")
    return spark.sql(
        """
        WITH filled AS (
          SELECT uid, ts, event_id, value, is_event,
                 last_value(CASE WHEN is_event = 0 THEN o_orderkey END, true)
                   OVER (PARTITION BY uid ORDER BY ts, is_event, coalesce(event_id, o_orderkey)
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
          FROM asof_tagged
        )
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(uid AS BIGINT) AS user_id,
               round(value, 6) AS value,
               CAST(asof_orderkey AS BIGINT) AS asof_orderkey
        FROM filled
        WHERE is_event = 1
        """
    )


# ---------------------------------------------------------------------------
# Skew handling: salted join
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT CAST(e.user_id % 3 AS BIGINT) AS hot_key,
       r.r_name AS region_name,
       CAST(count(*) AS BIGINT) AS n,
       sum(CAST(round(e.value * 10000, 0) AS BIGINT)) / 10000.0 AS total_value
FROM events e
JOIN region r ON e.user_id % 3 = r.r_regionkey
GROUP BY e.user_id % 3, r.r_name
"""

_SALT_BUCKETS = 8


@query("salted_skew_join", oracle=_SALTED_ORACLE)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join via explicit salting.

    ``user_id % 3`` is a deliberately pathological key (3 values →
    every row lands on 3 shuffle partitions; one straggler task does
    1/3 of the work at any cluster size). The fact side appends a
    random-free deterministic salt (event_id % N); the dim side
    explodes into N replicas; the join key becomes (key, salt) — N×
    the parallelism, identical results. AQE's skew-join handles
    moderate skew automatically; explicit salting is the tool when a
    single key exceeds what AQE can split. The oracle is the unsalted
    join, proving result equivalence.
    """
    ev = load_events(spark, sf_dir).select(
        (F.col("user_id") % 3).alias("hot_key"),
        (F.col("event_id") % _SALT_BUCKETS).cast("int").alias("salt"),
        "value",
    )
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("hot_key"),
        F.col("r_name").alias("region_name"),
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1))).alias("salt"),
    )
    return (
        ev.join(r, ["hot_key", "salt"])
        .groupBy("hot_key", "region_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
    )
