"""CDC / slowly-changing-dimension (SCD2) primitives.

No Delta/Iceberg jars ship in this container, so MERGE INTO is
emulated the classic way (anti-join + union + window) — which is also
exactly what the lakehouse formats execute underneath. The operators
are pure joins/windows: a snapshot of any size merges with a change
set in two shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.functions.casting import fmt_ts
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events, load_table


def scd2_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply a change set to a type-2 dimension snapshot.

    Output: one CLOSED row per changed key (original attributes,
    ``valid_to`` = change time) plus one OPEN row per key (new
    attributes for changed keys, original for unchanged; ``valid_to``
    null). Exactly-one-open-row-per-key is the SCD2 invariant.
    """
    ch = changes.select(key, ts_col, *attr_cols)
    snap = snapshot.alias("s")
    c = ch.alias("c")
    joined = snap.join(c, key, "left")
    closed = joined.filter(F.col(f"c.{ts_col}").isNotNull()).select(
        F.col(key),
        *[F.col(f"s.{a}").alias(a) for a in attr_cols],
        F.lit(None).cast("timestamp").alias("valid_from"),
        F.col(f"c.{ts_col}").alias("valid_to"),
    )
    opened_changed = joined.filter(F.col(f"c.{ts_col}").isNotNull()).select(
        F.col(key),
        *[F.col(f"c.{a}").alias(a) for a in attr_cols],
        F.col(f"c.{ts_col}").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    unchanged = joined.filter(F.col(f"c.{ts_col}").isNull()).select(
        F.col(key),
        *[F.col(f"s.{a}").alias(a) for a in attr_cols],
        F.lit(None).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return closed.unionByName(opened_changed).unionByName(unchanged)


_SCD2_ORACLE = """
WITH latest AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
), j AS (
  SELECT c.c_custkey, c.c_acctbal, l.ts, l.value
  FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
)
SELECT c_custkey, round(c_acctbal, 4) AS acctbal, 'closed' AS row_kind,
       CAST(NULL AS VARCHAR) AS valid_from,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to
FROM j WHERE ts IS NOT NULL
UNION ALL
SELECT c_custkey, round(value, 4), 'open',
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), CAST(NULL AS VARCHAR)
FROM j WHERE ts IS NOT NULL
UNION ALL
SELECT c_custkey, round(c_acctbal, 4), 'open', NULL, NULL
FROM j WHERE ts IS NULL
"""


@query("scd2_merge_customers", oracle=_SCD2_ORACLE)
def q_scd2_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: the latest event per user updates the matching
    customer's balance attribute; history rows close at the change
    timestamp. MERGE-INTO semantics from joins + window only."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("c_custkey"), "ts", F.col("value").alias("c_acctbal"))
    )
    merged = scd2_apply(cust, latest, "c_custkey", ["c_acctbal"], "ts")
    return merged.select(
        "c_custkey",
        F.round("c_acctbal", 4).alias("acctbal"),
        F.when(F.col("valid_to").isNotNull(), "closed").otherwise("open").alias("row_kind"),
        fmt_ts(F.col("valid_from")).alias("valid_from"),
        fmt_ts(F.col("valid_to")).alias("valid_to"),
    )
