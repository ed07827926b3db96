"""Readers for the canonical parquet tables.

The reference's only source is an Event Hub trigger
(reference DispatcherFunction.cs:21-23, O1 in SURVEY.md §2); its batch
twin here is a parquet scan of the driver-generated ``events`` table.
All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; at 100 TB the same call reads a
date/key-partitioned parquet lake and partition pruning applies too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventstreamer_spark.memo import BoundedMemo
from eventstreamer_spark.session import TABLES

# Resolved-scan memo (r14 optimization, guide §6 "manifest metadata"):
# every spark.read.parquet pays a driver-side file listing + footer
# schema read — measured 148 ms/call on this host — and the bench
# surface issues thousands of load_table calls per window for the
# same ten immutable files. Memoizing the RESOLVED DataFrame handle
# per (applicationId, sf_dir, table) reuses the FileIndex + schema the
# way a catalog table's manifest would; it caches METADATA ONLY —
# every action on the handle still scans the parquet files (lazy
# relation, no .cache()), so each bench invocation computes from the
# inputs exactly as before. Values are plan handles (no executor
# resources), so no eviction hook; 64 slots cover many sf_dirs.
#
# STALENESS CONTRACT (VERDICT r14 item 4): the memoized handle pins
# the FileIndex, so an operator that WRITES to a canonical table path
# in-session would silently keep reading the stale file list. No
# current operator writes canonical paths (side products live under
# /tmp/es_* keyed by applicationId) — any future writer MUST call
# ``invalidate_scan(sf_dir, name)`` after the write, and the pin test
# test_scan_memo_invalidates_on_write holds it to that.
_SCAN_MEMO: dict[tuple[str, str, str], DataFrame] = BoundedMemo(maxsize=64)


def invalidate_scan(sf_dir: str, name: str | None = None) -> None:
    """Drop memoized resolved-scan handles for ``sf_dir`` (one table,
    or all of its tables when ``name`` is None) so the next load_table
    re-lists files and re-reads footers. REQUIRED after any in-session
    write to a canonical table path — see the staleness contract on
    _SCAN_MEMO."""
    stale = [
        k for k in _SCAN_MEMO if k[1] == sf_dir and (name is None or k[2] == name)
    ]
    for k in stale:
        _SCAN_MEMO.pop(k, None)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one canonical table. Vectorized parquet reader, lazy.
    The resolved handle is memoized per (app, sf_dir, name) — writers
    to a canonical path must call ``invalidate_scan`` (see _SCAN_MEMO).

    ``events.ts`` arrives either as parquet TIMESTAMP(NANOS) — which
    Spark's reader rejects, so we read nanos as epoch-long (runtime
    conf) and truncate to microseconds, same as DuckDB — or as
    TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark surfaces
    as TIMESTAMP_NTZ. Either way the column normalizes to a plain
    session-TZ TIMESTAMP (the session is pinned to UTC by
    session.configure), so every downstream instant function
    (unix_micros, window, watermarks) sees identical values to the
    DuckDB oracle.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _SCAN_MEMO.get(key)
    if hit is not None:
        return hit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # integer division: float division of epoch-nanos loses µs precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _SCAN_MEMO[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event stream's batch twin (plays the Event Hub role, O1)."""
    return load_table(spark, sf_dir, "events")


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan + spread across all cores.

    The test tables are single parquet files under
    ``maxPartitionBytes``, so Spark plans ONE scan task — fine for
    cheap projections, but expression-heavy pipelines (md5 shingling,
    signatures) then run single-threaded. A round-robin repartition
    costs one tiny shuffle and buys full parallelism. At 100 TB the
    input arrives in thousands of splits and this becomes a no-op
    choice — the operators themselves are partition-agnostic.
    """
    try:
        n = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect has no sparkContext handle
        n = 32
    return load_table(spark, sf_dir, name).repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every canonical table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
