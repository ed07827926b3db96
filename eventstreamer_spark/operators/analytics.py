"""Product/event analytics beyond the reference's windowed core:
cohort retention, activity heatmaps, outlier screens, order-priority
and trade-volume join pipelines, RFM segmentation, calendar gap fill.

The reference engine (DispatcherFunction.cs) stops at per-window
averages; these are the analyst-facing queries a team actually runs on
the same event/order lake, each expressed as a single declarative
Catalyst plan with the 100 TB shape pinned in tests/test_plans.py:
fact tables shuffle at most once per aggregation grain, every
dimension or one-row aggregate joins back as a broadcast, and top-k
terminates in TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events, load_table

# ---------------------------------------------------------------------------
# Cohort retention (first-seen day × activity-day offset)
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), fd AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
), cs AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size FROM fd GROUP BY cohort_day
), act AS (
  SELECT fd.cohort_day, date_diff('day', fd.cohort_day, ud.day) AS day_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM ud JOIN fd ON ud.user_id = fd.user_id
  GROUP BY fd.cohort_day, day_offset
)
SELECT strftime(act.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(act.day_offset AS BIGINT) AS day_offset,
       act.n_active,
       cs.cohort_size,
       round(act.n_active * 1.0 / cs.cohort_size, 6) AS retention
FROM act JOIN cs ON act.cohort_day = cs.cohort_day
"""


@query("user_retention_cohorts", oracle=_RETENTION_ORACLE)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D0/D1/Dn retention: users cohorted by first-seen day,
    re-activity counted per day offset, rate against cohort size.

    Plan shape: one (user, day) distinct shuffle, a user-keyed
    first-day aggregate that co-partitions with it for the join, and a
    final (cohort, offset) aggregate; the per-cohort sizes come back
    as a broadcast. No window functions, no driver collection — every
    stage is a hash aggregate that scales with distinct user-days."""
    ev = load_events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    fd = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cs = fd.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        ud.join(fd, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return act.join(F.broadcast(cs), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") * F.lit(1.0) / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


# ---------------------------------------------------------------------------
# Day-of-week × hour activity heatmap
# ---------------------------------------------------------------------------

_HEATMAP_ORACLE = f"""
SELECT CAST(isodow(ts) AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.MEAN6_DUCK.format(v="value")} AS avg_value
FROM events
GROUP BY 1, 2, 3
"""


@query("dow_hour_heatmap", oracle=_HEATMAP_ORACLE)
def q_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap grid (ISO day-of-week × hour × type): one
    hash-aggregate shuffle with map-side partials; output cardinality
    is fixed (7 × 24 × #types) regardless of input size."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy(
        # weekday(): 0=Monday — +1 matches DuckDB's isodow (1=Monday)
        (F.weekday("ts") + F.lit(1)).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        N.mean6_spark(F.col("value")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Z-score outlier screen (two-pass: broadcast stats back over the fact)
# ---------------------------------------------------------------------------

# mu/sigma from integer-scaled moments (milli-unit quantization):
# s1/s2 are exact int sums, so both engines derive bit-identical
# mu/sigma in the same fixed double-op order — a near-boundary |z|=3
# row cannot flip between engines. int64 bound: qv² ~ 1e10 per row →
# safe past 1e8 rows per type.
_OUTLIER_ORACLE = """
WITH q AS (
  SELECT event_type, value, CAST(round(value * 1000, 0) AS BIGINT) AS qv
  FROM events
), stats AS (
  SELECT event_type,
         CAST(sum(qv) AS DOUBLE) / count(*) / 1000.0 AS mu,
         sqrt(CAST(sum(qv * qv) AS DOUBLE) / count(*)
              - (CAST(sum(qv) AS DOUBLE) / count(*)) * (CAST(sum(qv) AS DOUBLE) / count(*)))
           / 1000.0 AS sigma,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY event_type
)
SELECT e.event_type,
       s.n AS n_events,
       CAST(count(*) FILTER (WHERE abs(round((e.value - s.mu) / s.sigma, 6)) > 3) AS BIGINT)
         AS n_outliers,
       round(min(e.value), 6) AS min_value,
       round(max(e.value), 6) AS max_value
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type, s.n
"""


@query("value_outliers_zscore", oracle=_OUTLIER_ORACLE)
def q_value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type |z| > 3 outlier screen, the canonical two-pass
    distributed shape: a tiny per-type stats aggregate broadcasts back
    over the unshuffled fact scan, so the big side is read twice but
    exchanged only for the final per-type rollup. (A windowed
    single-pass form would shuffle the entire fact by type instead.)"""
    ev = load_events(spark, sf_dir)
    # integer-scaled moments: see _OUTLIER_ORACLE comment
    qv = F.round(F.col("value") * 1000, 0).cast("long")
    s1d = F.col("s1").cast("double") / F.col("n")
    stats = (
        ev.groupBy(F.col("event_type").alias("s_type"))
        .agg(
            F.sum(qv).alias("s1"),
            F.sum(qv * qv).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "s_type",
            (s1d / 1000.0).alias("mu"),
            (
                F.sqrt(F.col("s2").cast("double") / F.col("n") - s1d * s1d)
                / 1000.0
            ).alias("sigma"),
            "n",
        )
    )
    z6 = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        ev.join(F.broadcast(stats), ev.event_type == F.col("s_type"))
        .groupBy("event_type", F.col("n").alias("n_events"))
        .agg(
            F.sum((F.abs(z6) > 3).cast("long")).alias("n_outliers"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Order-priority revenue top-k (TPC-H Q3 shape on the available columns)
# ---------------------------------------------------------------------------

_Q3_CUTOFF = "1998-06-30"

_SHIPPING_ORACLE = f"""
SELECT l.l_orderkey,
       {N.SUMK_DUCK.format(v="l.l_extendedprice * (1 - l.l_discount)", s=10000)} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@query("shipping_priority_topk", oracle=_SHIPPING_ORACLE)
def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 re-expressed on the available schema: unshipped
    revenue of BUILDING-segment orders placed before the cutoff, top
    10 orders. Both filters are pushed to the parquet scans, the
    filtered customer keys broadcast into orders, and the top-k is a
    TakeOrderedAndProject — no global sort at any scale."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _Q3_CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q3_CUTOFF
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # integer-scaled: revenue is in ORDER BY, so both engines
            # must agree bit-exactly or the top-k membership can flip
            N.sumk_spark(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Nation-to-nation trade volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_TRADE_ORACLE = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       {N.SUMK_DUCK.format(v="l.l_extendedprice * (1 - l.l_discount)", s=10000)} AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
GROUP BY 1, 2, 3
"""


@query("nation_trade_volume", oracle=_TRADE_ORACLE)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation → customer-nation shipping volume by year
    (TPC-H Q7's join tree, ungated): the one genuinely multi-way
    fact-to-fact pipeline in the suite. lineitem joins orders on the
    shared key (the single big shuffle pair); supplier, customer and
    both nation aliases are dimension-sized and broadcast, so the
    fact rows are exchanged once for the join and once for the final
    (nation, nation, year) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            N.sumk_spark(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000
            ).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation (median-split bands, no global window)
# ---------------------------------------------------------------------------

_RFM_ORACLE = f"""
WITH rfm AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), TIMESTAMP '2002-01-01 00:00:00') AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         {N.SUMK_DUCK.format(v="o_totalprice", s=100)} AS monetary
  FROM orders GROUP BY o_custkey
), cuts AS (
  SELECT quantile_cont(recency_days, 0.5) AS r_med,
         quantile_cont(frequency, 0.5) AS f_med,
         quantile_cont(monetary, 0.5) AS m_med
  FROM rfm
)
SELECT concat(CASE WHEN rfm.recency_days <= cuts.r_med THEN 'R1' ELSE 'R0' END,
              CASE WHEN rfm.frequency >= cuts.f_med THEN 'F1' ELSE 'F0' END,
              CASE WHEN rfm.monetary >= cuts.m_med THEN 'M1' ELSE 'M0' END) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       {N.MEANK_DUCK.format(v="rfm.monetary", s=10000)} AS avg_monetary,
       round(avg(rfm.frequency), 6) AS avg_frequency
FROM rfm CROSS JOIN cuts
GROUP BY 1
"""


@query("rfm_segmentation", oracle=_RFM_ORACLE)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary customer segments via median splits.

    The classic formulation uses a global ntile window — a
    single-partition sort that dies at scale. Here the three medians
    are one tiny exact-percentile aggregate crossJoined back as a
    broadcast (one row), so the per-customer table is never globally
    sorted and the plan is two hash aggregates + a broadcast."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.max("o_orderdate")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        # exact cents: identical median/compare inputs on both engines
        N.sumk_spark(F.col("o_totalprice"), 100).alias("monetary"),
    )
    cuts = rfm.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r_med"),
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("recency_days") <= F.col("r_med"), "R1").otherwise("R0"),
        F.when(F.col("frequency") >= F.col("f_med"), "F1").otherwise("F0"),
        F.when(F.col("monetary") >= F.col("m_med"), "M1").otherwise("M0"),
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            N.meank_spark(F.col("monetary"), 10000).alias("avg_monetary"),
            F.round(F.avg("frequency"), 6).alias("avg_frequency"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar gap fill (zero rows for silent days)
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(max(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type,
       strftime(s.day, '%Y-%m-%d') AS day,
       coalesce(d.n, 0) AS n_events
FROM spine s CROSS JOIN types t
LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
"""


@query("calendar_gap_fill", oracle=_GAPFILL_ORACLE)
def q_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-day per-type counts with explicit zeros for silent
    days — the gap-fill shape every dashboard needs. The date spine is
    generated from a one-row min/max aggregate (sequence + explode),
    cross-joined with the distinct type dimension — both broadcast-
    sized by construction — and the real daily counts left-join in.
    The fact table is touched twice (bounds, counts), shuffled once."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("d0"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(spine)
        .crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user behavioral entropy (event-type distribution)
# ---------------------------------------------------------------------------

# Each (user, type) contributes -p·log2(p) with p = c/T, both exact
# ints; the term quantizes to micro-bits BEFORE the per-user sum, so
# the ≤|types|-term summation is exact int64 addition on both engines.
_ENTROPY_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
), per_user AS (
  SELECT user_id, c,
         CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS t,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types
  FROM per_type
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(min(t) AS BIGINT) AS n_events,
       CAST(min(n_types) AS BIGINT) AS n_types,
       sum(CAST(round(-(c * 1.0 / t) * log2(c * 1.0 / t) * 1000000, 0) AS BIGINT))
         / 1000000.0 AS entropy_bits
FROM per_user
GROUP BY user_id
"""


@query("user_event_entropy", oracle=_ENTROPY_ORACLE)
def q_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral
    diversity score (bots pin near 0, uniform browsers near
    log2(|types|)); the same shape scores source/language diversity in
    a training-data mixture audit. Two aggregates ride ONE user_id
    partitioning: the (user, type) counts and the per-user window both
    hash on user_id, so the fact shuffles once."""
    ev = load_events(spark, sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("user_id")
    per_user = per_type.select(
        "user_id",
        "c",
        F.sum("c").over(w).alias("t"),
        F.count(F.lit(1)).over(w).alias("n_types"),
    )
    p = F.col("c") * F.lit(1.0) / F.col("t")
    term = F.round(-p * F.log2(p) * 1000000, 0).cast("long")
    return per_user.groupBy("user_id").agg(
        F.min("t").alias("n_events"),
        F.min("n_types").alias("n_types"),
        (F.sum(term) / 1000000.0).alias("entropy_bits"),
    )
