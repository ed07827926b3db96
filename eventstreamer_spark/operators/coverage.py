"""Remaining relational coverage: outer joins, bag set-ops, datetime /
string scalar libraries, conditional + statistical aggregates,
unpivot, and the SQL entry point.

Each query exists to pin one family from SURVEY.md §2.1 that the
earlier modules didn't cover; all are single-pass Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.functions.casting import fmt_ts
from eventstreamer_spark.operators.windowed import _DP_EAV_ORACLE, TS_OUT
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_table, register_views

# ---------------------------------------------------------------------------
# Full outer join
# ---------------------------------------------------------------------------

_FULL_OUTER_ORACLE = """
WITH cn AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY c_nationkey
), sn AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY s_nationkey
)
SELECT CAST(coalesce(cn.nk, sn.nk) AS INTEGER) AS nationkey,
       CAST(coalesce(cn.n_cust, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(sn.n_supp, 0) AS BIGINT) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
"""


@query("full_outer_join_nations", oracle=_FULL_OUTER_ORACLE)
def q_full_outer_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER: customer vs supplier presence per nation — only 10
    suppliers exist, so right-null rows are guaranteed non-vacuous."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.nk_c == sn.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").cast("int").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# Bag (ALL) set operations
# ---------------------------------------------------------------------------

_BAG_SETOPS_ORACLE = """
WITH h1 AS (SELECT event_type FROM events WHERE user_id % 2 = 0),
     h2 AS (SELECT event_type FROM events WHERE value > 50)
SELECT event_type, 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2)
GROUP BY event_type
UNION ALL
SELECT event_type, 'except_all', CAST(count(*) AS BIGINT)
FROM (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
GROUP BY event_type
"""


@query("bag_set_operations", oracle=_BAG_SETOPS_ORACLE)
def q_bag_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiplicity-preserving set ops
    (each duplicate occurrence counts), summarized per type."""
    ev = load_table(spark, sf_dir, "events")
    h1 = ev.filter(F.col("user_id") % 2 == 0).select("event_type")
    h2 = ev.filter(F.col("value") > 50).select("event_type")

    def agg(op: str, df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).select(
            "event_type", F.lit(op).alias("op"), "n"
        )

    return agg("intersect_all", h1.intersectAll(h2)).unionByName(
        agg("except_all", h1.exceptAll(h2))
    )


# ---------------------------------------------------------------------------
# Datetime scalar library
# ---------------------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST((dayofweek(o_orderdate) % 7) + 1 AS INTEGER) AS dow_spark,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S.%f') AS plus_30d,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_last_day,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_2024,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
FROM orders
WHERE o_orderkey % 17 = 0
"""


@query("datetime_functions", oracle=_DATETIME_ORACLE)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar coverage. Engine deltas handled explicitly:
    DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → oracle maps."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 17 == 0).select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_spark"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        fmt_ts(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_last_day"),
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("timestamp"))
        .cast("int")
        .alias("days_since_2024"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "week_start"
        ),
    )


# ---------------------------------------------------------------------------
# String scalar library
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
       rpad(c_mktsegment, 12, '.') AS padded_seg,
       replace(c_name, '#', '-') AS dashed_name,
       split_part(c_name, '#', 2) AS name_num,
       CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
       reverse(c_mktsegment) AS seg_rev,
       CAST(ascii(substr(c_mktsegment, 1, 1)) AS INTEGER) AS first_code,
       repeat(substr(c_mktsegment, 1, 2), 2) AS seg2x2,
       ltrim(rtrim(concat('  ', c_mktsegment, '  '))) AS trimmed,
       regexp_replace(c_name, '[0-9]+', 'N') AS name_digits_masked,
       CAST(length(c_name) AS INTEGER) AS name_len
FROM customer
WHERE c_custkey % 3 = 0
"""


@query("string_functions", oracle=_STRING_ORACLE)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar coverage (pad/replace/split/instr/reverse/ascii/
    repeat/trim/regexp) — RE2-safe pattern so both engines agree."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed_name"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.ascii(F.substring("c_mktsegment", 1, 1)).cast("int").alias("first_code"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("seg2x2"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  ")))).alias(
            "trimmed"
        ),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_digits_masked"),
        F.length("c_name").cast("int").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# Conditional + ordered aggregates
# ---------------------------------------------------------------------------

_CONDAGG_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       round(sum(DISTINCT l_quantity), 4) AS sum_distinct_qty,
       bool_or(l_discount > 0.09) AS any_high_disc,
       bool_and(l_quantity > 0) AS all_positive_qty,
       CAST(arg_min(l_orderkey, round(l_extendedprice, 2)) AS BIGINT) AS cheapest_order,
       CAST(arg_max(l_orderkey, round(l_extendedprice, 2)) AS BIGINT) AS priciest_order,
       min(l_linestatus) AS min_status,
       max(l_linestatus) AS max_status
FROM lineitem
GROUP BY l_returnflag
"""


@query("conditional_aggregates", oracle=_CONDAGG_ORACLE)
def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / distinct aggregates / bool_or-and / min_by-max_by /
    string min-max. arg extremes tie-break via rounded price +
    min/max of the unique order key is NOT guaranteed on ties, so the
    price is rounded to 2 decimals (its native grain) making extremes
    unique in this data.

    Scale note: two DISTINCT aggregates on *different* columns in one
    Aggregate force Catalyst's RewriteDistinctAggregates Expand (3x the
    input through two SortAggregates — measured 4-5s at sf0.1). Instead
    the query splits into three single-pass aggregations (the non-distinct
    block plus one per distinct column, each planned without Expand) and
    rejoins on the 4-row group key, which AQE broadcasts. Same answer,
    ~5x faster, and shuffle volume stays O(groups) instead of O(3*rows)
    at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p2 = F.round(F.col("l_extendedprice"), 2)
    base = li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.min_by("l_orderkey", p2).alias("cheapest_order"),
        F.max_by("l_orderkey", p2).alias("priciest_order"),
        F.min("l_linestatus").alias("min_status"),
        F.max("l_linestatus").alias("max_status"),
    )
    supp = li.groupBy("l_returnflag").agg(F.countDistinct("l_suppkey").alias("n_supp"))
    qty = li.groupBy("l_returnflag").agg(
        F.round(F.sum_distinct(F.col("l_quantity")), 4).alias("sum_distinct_qty")
    )
    return base.join(supp, "l_returnflag").join(qty, "l_returnflag").select(
        "l_returnflag",
        "n_big",
        "n_supp",
        "sum_distinct_qty",
        "any_high_disc",
        "all_positive_qty",
        "cheapest_order",
        "priciest_order",
        "min_status",
        "max_status",
    )


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------

_STATAGG_ORACLE = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(stddev_pop(l_discount), 6) AS sdp_disc,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
       round(covar_pop(l_quantity, l_tax), 6) AS covp_qty_tax
FROM lineitem
GROUP BY l_returnflag
"""


@query("statistical_aggregates", oracle=_STATAGG_ORACLE)
def q_statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / correlation family (single-pass numerically stable
    forms in both engines; rounded below the cross-engine noise
    floor)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
        F.round(F.covar_pop("l_quantity", "l_tax"), 6).alias("covp_qty_tax"),
    )


# ---------------------------------------------------------------------------
# Unpivot (wide → long)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH longf AS (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'tax', l_tax FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(count(*) AS BIGINT) AS n,
       floor(sum(CAST(round(val * 1000000, 0) AS BIGINT)) * 1.0 / count(*) + 0.5) / 1000000.0 AS avg_val,
       sum(CAST(round(val * 10000, 0) AS BIGINT)) / 10000.0 AS sum_val
FROM longf
GROUP BY l_returnflag, measure
"""


@query("unpivot_measures", oracle=_UNPIVOT_ORACLE)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) then per-measure aggregate — one
    Expand node, single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    long_df = li.unpivot(
        "l_returnflag",
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    ).withColumn("measure", F.regexp_replace(F.col("measure"), "^l_", ""))
    from eventstreamer_spark.functions import numeric as N

    return long_df.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        N.mean6_spark(F.col("val")).alias("avg_val"),
        N.sumk_spark(F.col("val"), 10000).alias("sum_val"),
    )


# ---------------------------------------------------------------------------
# SQL entry point
# ---------------------------------------------------------------------------

# dialect-shared SQL: runs verbatim on Spark AND DuckDB, so the
# revenue sum is integer-scaled in the shared text itself
_SQL_API_ORACLE = """
SELECT c.c_mktsegment,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0) AS BIGINT)) / 1e4 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c.c_mktsegment
"""


@query("sql_entrypoint", oracle=_SQL_API_ORACLE)
def q_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the engine's second entry point (SURVEY.md
    §2.1 — the reference has none) — temp views + spark.sql produce
    the same Catalyst plan as the DataFrame API."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_ORACLE)


# ---------------------------------------------------------------------------
# Reference output shape (O15+O16), rows-only
# ---------------------------------------------------------------------------


# Rebuild Spark's to_json output byte-for-byte: struct fields in
# declared order, map keys sorted (Spark side sorts via sort_array of
# entries), values as fixed %.6f strings. Interpolated strings
# (m_name keys, the deviceid/sessionid) render through DuckDB's
# to_json so quotes/backslashes escape exactly as Spark's to_json
# escapes them; numeric %.6f strings and timestamp text are
# escape-free by construction. ts/deviceid come from the window's
# FIRST event ((ts, event_id)-ordered row_number = 1), matching the
# reference record's first.Timestamp/first.DeviceId
# (DispatcherFunction.cs:154-156) and the Spark side's min-struct
# carry.
_EMIT_JSON_ORACLE = """
WITH eav AS ({eav}),
firsts AS (
  SELECT key, ws, ts, deviceid FROM (
    SELECT concat(CAST(user_id AS VARCHAR), ':',
                  json_extract_string(props, '$.k')) AS key,
           date_trunc('second', ts) AS ws,
           ts,
           concat('dev-', CAST(user_id % 10 AS VARCHAR)) AS deviceid,
           row_number() OVER (
             PARTITION BY concat(CAST(user_id AS VARCHAR), ':',
                                 json_extract_string(props, '$.k')),
                          date_trunc('second', ts)
             ORDER BY ts, event_id
           ) AS rn
    FROM events
  ) WHERE rn = 1
),
g AS (
  SELECT key, window_start,
         string_agg(to_json(m_name) || ':"' || printf('%.6f', avg_value) || '"',
                    ',' ORDER BY m_name) AS kv
  FROM eav GROUP BY key, window_start
)
SELECT g.key,
       '{{"ts":"' || strftime(f.ts, '{ts_out}')
       || '","deviceid":' || to_json(f.deviceid)
       || ',"sessionid":' || to_json(split_part(g.key, ':', 1))
       || ',"sessionstart":"","allvalues":{{' || kv || '}}}}' AS json
FROM g JOIN firsts f ON f.key = g.key
  AND strftime(f.ws, '{ts_out}') = g.window_start
""".format(eav=_DP_EAV_ORACLE, ts_out=TS_OUT)


@query("windowed_emit_json", oracle=_EMIT_JSON_ORACLE)
def q_windowed_emit_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact output record as JSON rows — all five
    fields {ts, deviceid, sessionid, sessionstart, allvalues} with
    ts/deviceid from the window's first event
    (DispatcherFunction.cs:152-161), emitted with deterministic field
    order / key order / number formatting so the concatenation oracle
    below reproduces the bytes."""
    from eventstreamer_spark.operators.windowed import windowed_emit_json
    from eventstreamer_spark.sources.tables import load_events

    return windowed_emit_json(load_events(spark, sf_dir))


_REGEX_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS last_upper,
       CAST(regexp_matches(p_name, 'o.o') AS BOOLEAN) AS has_o_o,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE regexp_matches(p_type, '^STANDARD|^SMALL')
"""


@query("regex_functions", oracle=_REGEX_ORACLE)
def q_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar coverage: extract-with-group, rlike predicate
    (including as a pushed-down filter), global replace — patterns
    restricted to the RE2 ∩ Java-regex common subset so both engines
    agree."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike("^STANDARD|^SMALL")).select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_type", "([A-Z]+)$", 1).alias("last_upper"),
        F.col("p_name").rlike("o.o").alias("has_o_o"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )
