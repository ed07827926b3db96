"""Streaming pipeline: the reference's event flow under readStream.

Reference flow (SURVEY.md §3): Event Hub trigger → parse → demux by
key → 1 s event-time windows → per-field AVG → JSON log sink
(DispatcherFunction.cs:21-161). Here the same DataFrame expressions
run under ``readStream`` — Spark's batch/streaming unification means
``operators/windowed.tumbling_stats`` IS the streaming query; this
module adds the unbounded-specific parts the reference lacked or got
wrong (SURVEY.md §2.1 "streaming extras"):

- **watermarks** — the reference silently lets late data corrupt old
  windows (an event older than `start` still averages in); we bound
  lateness explicitly.
- **session windows** — data-driven gap sessions (the closest Spark
  analog of the reference's "push time forward" idea, O9).
- **exactly-once** — checkpointed state + idempotent sinks replace the
  documented at-least-once-with-loss mode (DispatcherFunction.cs:123-127).
- **observability** — ``observe()`` + StreamingQueryListener replace
  Stopwatch/LogMetric (O17, DispatcherFunction.cs:27,37,47-49).

For deterministic tests the stream source is the same parquet data
split into chunk files consumed with ``maxFilesPerTrigger=1`` —
real deployments swap in the Kafka/EventHubs source string; nothing
else changes.
"""

from __future__ import annotations

import atexit as _atexit
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.functions.casting import fmt_ts, round6
from eventstreamer_spark.operators.windowed import tumbling_stats
from eventstreamer_spark.memo import BoundedMemo
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def stream_events(spark: SparkSession, dir_path: str, max_files: int | None = 1) -> DataFrame:
    """File-source stream of event chunk files (deterministic dev twin
    of the Event Hub source, O1)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(dir_path)


# Session-scoped memo of the inferred events schema per sf dir: every
# stream query pays a driver-side parquet footer read otherwise (~0.15 s,
# twice for the dual-branch stream-stream join). Keyed on the Spark app id
# so a new session (or test run) re-infers; the testdata within one
# application never changes, so the memo cannot go stale.
_EVENTS_SCHEMA_MEMO: dict[tuple[str, str], T.StructType] = {}


def stream_events_sf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream twin of ``sources.tables.load_events`` for a
    canonical sf dir: schema-adaptive to however the driver encoded
    ``events.ts`` (TIMESTAMP(NANOS) → long via nanosAsLong, or
    TIMESTAMP(MICROS) → TIMESTAMP_NTZ), normalizing to a plain UTC
    TIMESTAMP either way. File streams need an explicit schema, so the
    one-off batch footer read here is what infers it (memoized per
    session + sf dir)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    memo_key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    batch_schema = _EVENTS_SCHEMA_MEMO.get(memo_key)
    if batch_schema is None:
        batch_schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema
        _EVENTS_SCHEMA_MEMO[memo_key] = batch_schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a directory
        .parquet(sf_dir.rstrip("/"))
    )
    dt = batch_schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # integer division: float division of epoch-nanos loses µs precision
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_stream(events: DataFrame, window: str = "1 second", watermark: str = "10 seconds") -> DataFrame:
    """The flagship aggregation under a watermark: state for a window
    is dropped once the watermark passes its end — bounded state at
    any scale; late events beyond the bound are dropped instead of
    corrupting closed windows (intentional divergence from the
    reference, which has no lateness policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id").cast("string").alias("key"),
            F.window("ts", window).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.mean6_spark(F.col("value")).alias("avg_value"),
            N.sumk_spark(F.col("value"), 1000000).alias("sum_value"),
        )
        .select(
            "key",
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value",
            "sum_value",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, mode: str = "update", nodata_batches: bool = False
) -> list[dict]:
    """Drive a streaming frame to completion against a memory sink
    (synchronous: processAllAvailable then stop).

    Gate/test executions are short-lived and their keyed state is
    bounded by the test corpus, so state goes to the in-memory
    (HDFSBacked) provider with a modest partition count: opening and
    checkpointing 32+ RocksDB instances per stateful stage dominates a
    one-batch query (measured 12.7s → 2.4s on stream_dedup_counts at
    sf0.1). The checkpoint goes to a FRESH tmpfs dir (/dev/shm) per
    call, removed on exit — measured neutral on a warm page cache vs
    /tmp, kept for hygiene (no commit-log litter) and for hosts where
    /tmp is real disk. A fresh dir per call is load-bearing: reusing
    one would resume the previous run's offsets/state.
    Long-lived production streams keep the session defaults (RocksDB +
    durable checkpoint dir, session.py) — the only combination that
    survives state larger than memory or a driver crash. All confs are
    restored and the checkpoint dir removed on exit.

    Measured warm floor (round 4, sf0.1): ~1.0 s per one-batch gate
    query, of which the micro-batch itself (source listing + batch
    plan + state commit + sink) is ~0.4-0.6 s and the memory-sink
    read-back ~0.3-0.4 s. Knobs probed and found neutral at this
    scale: availableNow vs processAllAvailable, 4 vs 8 shuffle
    partitions. What did move the needle: the per-sf-dir schema memo
    (saves a driver footer read per query, two for the dual-branch
    join) and minBatchesToRetain=1 below. The residual cost is the
    streaming engine's per-query machinery, not plan shape — batch
    twins of the same aggregations run in 0.2-0.8 s.
    """
    return _run_gate_stream(
        df,
        lambda ws, ckpt: (
            ws.outputMode(mode)
            .format("memory")
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .start()
        ),
        nodata_batches=nodata_batches,
    )


def run_foreach_batch(df, fn, nodata_batches: bool = False) -> list[dict]:
    """run_to_memory's per-batch-emission twin: drive a streaming frame
    to completion through ``foreachBatch(fn)`` under the same gate conf
    discipline (in-memory state provider, fresh tmpfs checkpoint,
    minBatchesToRetain=1 — see run_to_memory). For serving-shaped
    streams whose unit of work is the REQUEST (a micro-batch), not a
    cross-batch key: ``fn(batch_df, batch_id)`` scores/ranks/emits each
    batch and the stream holds NO aggregation state between triggers —
    the artifact the scale harness measures is then the same per-batch
    contract production runs."""
    return _run_gate_stream(
        df,
        lambda ws, ckpt: (
            ws.foreachBatch(fn).option("checkpointLocation", ckpt).start()
        ),
        nodata_batches=nodata_batches,
    )


def _run_gate_stream(df: DataFrame, start, nodata_batches: bool = False) -> list[dict]:
    """Shared gate-run plumbing: conf save/set/restore + fresh
    checkpoint dir + synchronous processAllAvailable, with ``start``
    receiving (writeStream, checkpoint_dir) and returning the started
    query. See run_to_memory's docstring for the measured rationale of
    every conf choice."""
    import shutil
    import tempfile

    spark = df.sparkSession
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    part_key = "spark.sql.shuffle.partitions"
    retain_key = "spark.sql.streaming.minBatchesToRetain"
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_prov = spark.conf.get(prov_key, None)
    prev_part = spark.conf.get(part_key)
    prev_retain = spark.conf.get(retain_key, None)
    prev_nodata = spark.conf.get(nodata_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(part_key, os.environ.get("SPARK_GRAFT_GATE_PARTITIONS", "8"))
    # Gate runs are one-batch and never restarted from this checkpoint, so
    # retaining the default 100 committed batches only adds checkpoint I/O.
    spark.conf.set(retain_key, "1")
    # After the single data batch, the engine schedules an extra NO-DATA
    # micro-batch to advance the watermark and evict closed state. The
    # gate queries read COMPLETE/UPDATE-mode sinks (full state re-emitted
    # with the data batch) or an eagerly-emitting inner interval join, so
    # that extra batch changes nothing they return — measured -25% on the
    # 7-query stream slice (11.7 s → 8.8 s) with hash-identical results.
    # Production/append pipelines that rely on watermark-driven finalized
    # emission keep the default (session confs untouched outside here);
    # multi-batch append gates pass nodata_batches=True for the same
    # reason — the final no-data batch is what emits windows closed by
    # the last data batch's watermark advance.
    spark.conf.set(nodata_key, "true" if nodata_batches else "false")
    ckpt_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix="es_ckpt_", dir=ckpt_root)
    q = None
    progresses: list[dict] = []
    try:
        q = start(df.writeStream, ckpt)
        q.processAllAvailable()
        # Captured before stop: per-batch state metrics (rows dropped by
        # watermark, state row counts) for tests that pin eviction.
        progresses = [p for p in (q.recentProgress or []) if p is not None]
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        if prev_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_prov)
        if prev_retain is None:
            spark.conf.unset(retain_key)
        else:
            spark.conf.set(retain_key, prev_retain)
        if prev_nodata is None:
            spark.conf.unset(nodata_key)
        else:
            spark.conf.set(nodata_key, prev_nodata)
        spark.conf.set(part_key, prev_part)
    return progresses


_STREAM_TUMBLING_ORACLE = f"""
SELECT CAST(user_id AS VARCHAR) AS key,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.MEAN6_DUCK.format(v="value")} AS avg_value,
       {N.SUMK_DUCK.format(v="value", s=1000000)} AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("stream_tumbling_stats", oracle=_STREAM_TUMBLING_ORACLE)
def q_stream_tumbling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship windowed aggregation executed as a REAL streaming
    query (readStream → watermark → window agg → memory sink), then
    returned as the sink's table. Complete output mode makes the
    result equal the batch twin — Spark's unification guarantee,
    checked against the same SQL oracle.
    """
    from eventstreamer_spark.session import configure

    configure(spark)
    stream = stream_events_sf(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.col("user_id").cast("string").alias("key"),
            F.window("ts", "1 second").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.mean6_spark(F.col("value")).alias("avg_value"),
            N.sumk_spark(F.col("value"), 1000000).alias("sum_value"),
        )
        .select(
            "key",
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value",
            "sum_value",
        )
    )
    run_to_memory(agg, "stream_tumbling_stats_sink", mode="complete")
    return spark.table("stream_tumbling_stats_sink")


_SESSION_ORACLE = """
WITH d AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM d
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS total_value
FROM s
GROUP BY user_id, sess
"""


@query("session_windows", oracle=_SESSION_ORACLE)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven session windows (30 min inactivity gap) — the
    idiomatic generalization of the reference's first-event-anchored
    "push time forward" windows (O9): window boundaries derive from
    the data, not the epoch grid. ``session_window`` works identically
    in batch and streaming; the oracle is the classic lag/gap-cumsum
    sessionization."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("w.start")).alias("session_start"),
            fmt_ts(F.col("w.end")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_STREAM_SESSION_ORACLE = """
WITH d AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM d
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS total_value
FROM s
GROUP BY user_id, sess
"""


@query("stream_session_windows", oracle=_STREAM_SESSION_ORACLE)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven session windows executed as a REAL streaming query:
    readStream → watermark → session_window(gap 30 min) →
    complete-mode memory sink (session aggregation rejects update
    mode; with the whole input in one micro-batch, complete equals
    the final state). Session state merges windows as events arrive
    and evicts once the watermark passes a session's close — the
    stateful operator the reference's "push time forward" loop
    approximates. The result equals the batch sessionization oracle
    (the lag/gap-cumsum form)."""
    from eventstreamer_spark.session import configure

    configure(spark)
    stream = stream_events_sf(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
        .select(
            "user_id",
            fmt_ts(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    run_to_memory(agg, "stream_session_sink", mode="complete")
    return spark.table("stream_session_sink")


def observed_windowed_stream(events: DataFrame) -> DataFrame:
    """O17 parity: per-batch row counts / conversion metrics via
    ``observe`` — the declarative replacement for the reference's
    Stopwatch + LogMetric (DispatcherFunction.cs:27,37,47-49). Read
    back from ``query.lastProgress['observedMetrics']``."""
    return windowed_stream(
        events.observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null_values"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming deduplication (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS total_value
FROM events
GROUP BY event_type
"""


@query("stream_dedup_counts", oracle=_STREAM_DEDUP_ORACLE)
def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: a stream carrying injected
    duplicates (every third event re-sent — the at-least-once
    redelivery the reference's Functions+Redis path actually produces,
    README.md:79) is deduplicated on event_id with
    ``dropDuplicatesWithinWatermark`` and then aggregated. The result
    equals the duplicate-free batch aggregate — which is exactly the
    oracle.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the 10 s watermark passes the key's event time — bounded state at
    any scale, unlike plain streaming dropDuplicates whose state grows
    with the key universe forever. The dedup state shuffles on
    event_id; the aggregation re-shuffles on event_type: same two
    exchanges a batch dedup-then-agg pays.
    """
    from eventstreamer_spark.session import configure

    configure(spark)
    stream = stream_events_sf(spark, sf_dir)
    dup_stream = stream.union(stream.filter(F.col("event_id") % 3 == 0))
    deduped = (
        dup_stream.withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = (
        deduped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
    )
    run_to_memory(agg, "stream_dedup_sink", mode="complete")
    return spark.table("stream_dedup_sink")


# ---------------------------------------------------------------------------
# Stream-stream interval join (correlated events within the hour)
# ---------------------------------------------------------------------------

_STREAM_JOIN_ORACLE = """
SELECT CAST(a.user_id AS BIGINT) AS user_id,
       a.event_id AS a_event_id,
       b.event_id AS b_event_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS a_ts,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS b_ts
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


@query("stream_stream_join", oracle=_STREAM_JOIN_ORACLE)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time bound: every pair
    of same-user events at most one hour apart, executed as a REAL
    dual-stream join (two readStream branches, both watermarked, an
    interval condition) in append mode. With all input processed the
    emitted matches equal the batch join — the oracle.

    The time bound is what makes this scale: each side's state
    retains only rows younger than (watermark − bound), so state is
    O(events/hour × #users in flight), not O(stream length). An
    unbounded-condition stream join would be rejected by Spark for
    exactly that reason. Both sides shuffle on user_id once; the
    interval predicate is evaluated inside the joined partitions.
    """
    from eventstreamer_spark.session import configure

    configure(spark)

    def branch(prefix: str) -> DataFrame:
        return (
            stream_events_sf(spark, sf_dir)
            .select(
                F.col("event_id").alias(f"{prefix}_event_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_uid"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    a, b = branch("a"), branch("b")
    joined = a.join(
        b,
        (a.a_uid == b.b_uid)
        & (a.a_event_id < b.b_event_id)
        & (b.b_ts >= a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("a_uid").alias("user_id"),
        "a_event_id",
        "b_event_id",
        fmt_ts(F.col("a_ts")).alias("a_ts"),
        fmt_ts(F.col("b_ts")).alias("b_ts"),
    )
    run_to_memory(joined, "stream_join_sink", mode="append")
    return spark.table("stream_join_sink")


# ---------------------------------------------------------------------------
# Streaming sliding windows (the hopping aggregate under readStream)
# ---------------------------------------------------------------------------

_STREAM_TOPK_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS total_value
FROM events
GROUP BY event_type
ORDER BY n_events DESC, event_type
LIMIT 5
"""


@query("stream_topk_types", oracle=_STREAM_TOPK_ORACLE)
def q_stream_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k: the per-type aggregate ordered and limited
    INSIDE the streaming query — complete output mode is what makes
    sorting legal on an unbounded stream (the sort runs over the
    bounded aggregate state each trigger, never over raw events).
    With all input processed the result equals the batch top-5."""
    from eventstreamer_spark.session import configure

    configure(spark)
    stream = stream_events_sf(spark, sf_dir)
    agg = (
        stream.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.sumk_spark(F.col("value"), 10000).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "event_type")
        .limit(5)
    )
    run_to_memory(agg, "stream_topk_sink", mode="complete")
    return spark.table("stream_topk_sink")


_STREAM_SLIDING_ORACLE = f"""
WITH hops AS (
  SELECT e.event_type, e.value,
         date_trunc('second', e.ts) - k.k * INTERVAL 1 SECOND AS ws
  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT event_type,
       strftime(ws, '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.MEAN6_DUCK.format(v="value")} AS avg_value
FROM hops
GROUP BY event_type, ws
"""


@query("stream_sliding_stats", oracle=_STREAM_SLIDING_ORACLE)
def q_stream_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hopping-window aggregate (window '2 seconds' hop '1
    second') executed as a real streaming query — each event lands in
    two windows' state; with all input processed, complete mode equals
    the batch twin (sliding_window_stats) and the same SQL oracle.
    State per key is (types × windows-in-flight), watermark-bounded in
    the production path.
    """
    from eventstreamer_spark.session import configure

    configure(spark)
    stream = stream_events_sf(spark, sf_dir)
    agg = (
        stream.groupBy("event_type", F.window("ts", "2 seconds", "1 second").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.mean6_spark(F.col("value")).alias("avg_value"),
        )
        .select(
            "event_type",
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value",
        )
    )
    run_to_memory(agg, "stream_sliding_sink", mode="complete")
    return spark.table("stream_sliding_sink")


# ---------------------------------------------------------------------------
# Multi-batch late-data gate: watermark eviction proven live
# ---------------------------------------------------------------------------

# Deterministic replay of the engine's late-data policy across FOUR
# real micro-batches. Events are mapped onto a compressed 300-second
# timeline (ts_c derived from event_id alone, so both engines compute
# identical timestamps; the ms jitter is never 0, so no window
# boundary can tie with a watermark and the strict-vs-inclusive
# eviction comparison can never matter). Batches, in replay order:
#
#   b0 history    sec < 270, event_id % 7 != 3
#   b1 tick       270 <= sec < 280          (advances the watermark)
#   b2 stragglers sec < 270, event_id % 7 = 3, delivered AFTER the
#                 advance — rows at or before the LATE-EVENT watermark
#                 are DROPPED (numRowsDroppedByWatermark, pinned by
#                 test); stragglers in the last ~10 s of history
#                 survive and MERGE into windows still open in state
#   b3 tail       sec >= 280                (advances the watermark to
#                 wm_final = msfloor(max all) - 10 s; the trailing
#                 no-data batch then emits every window closed by it)
#
# Spark ≥3.4 runs TWO watermarks per stateful operator (calibrated
# empirically here on 4.1, boundary cases included): late-event
# filtering uses the PREVIOUS batch's watermark — for b2 that is
# wm_late = msfloor(max ts over b0) - 10 s, dropping rows whose 1 s
# WINDOW END is at or before wm_late — while state eviction uses the
# CURRENT batch's watermark. Kept stragglers (window end > wm_late)
# therefore always land in windows not yet emitted, so append output =
# windows with end <= wm_final aggregated over all rows except the
# dropped stragglers. The ms jitter term (1 + id % 996, never 0) keeps
# every watermark off the whole-second grid of window ends, so a tie —
# where strict-vs-inclusive comparison could differ between engines —
# is impossible. The oracle replays exactly this arithmetic, so the
# streamed result is value-hash-checked.
LATE_DELAY_S = 10
LATE_SPAN_S = 300     # compressed timeline length
LATE_TICK_S = 270     # history/tick boundary
LATE_TAIL_S = 280     # tick/tail boundary
LATE_RESIDUE = 3      # event_id % 7 = 3 → delivered late

_TS_C_SPARK = (
    "timestampadd(MILLISECOND, CAST(1 + event_id % 996 AS INT), "
    f"timestampadd(SECOND, CAST(event_id % {LATE_SPAN_S} AS INT), "
    "TIMESTAMP '2024-01-01 00:00:00'))"
)
_TS_C_DUCK = (
    f"TIMESTAMP '2024-01-01 00:00:00' + (event_id % {LATE_SPAN_S}) * INTERVAL 1 SECOND"
    " + (1 + event_id % 996) * INTERVAL 1 MILLISECOND"
)
_WM_FLOOR = "make_timestamp((epoch_us({t}) // 1000) * 1000)"

_STREAM_LATE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, value, {_TS_C_DUCK} AS ts_c,
         event_id % {LATE_SPAN_S} AS sec,
         (event_id % {LATE_SPAN_S} < {LATE_TICK_S}
          AND event_id % 7 = {LATE_RESIDUE}) AS straggler
  FROM events
), wm_late AS (
  SELECT {_WM_FLOOR.format(t="max(ts_c)")} - INTERVAL {LATE_DELAY_S} SECOND AS v
  FROM e WHERE sec < {LATE_TICK_S} AND NOT straggler
), wmf AS (
  SELECT {_WM_FLOOR.format(t="max(ts_c)")} - INTERVAL {LATE_DELAY_S} SECOND AS v
  FROM e
), kept AS (
  SELECT e.* FROM e, wm_late
  WHERE NOT e.straggler
     OR date_trunc('second', e.ts_c) + INTERVAL 1 SECOND > wm_late.v
)
SELECT CAST(user_id AS VARCHAR) AS key,
       strftime(date_trunc('second', ts_c), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       {N.MEAN6_DUCK.format(v="value")} AS avg_value
FROM kept, wmf
WHERE date_trunc('second', ts_c) + INTERVAL 1 SECOND <= wmf.v
GROUP BY 1, 2
"""


def late_policy_stream(stream: DataFrame) -> DataFrame:
    """Watermarked 1 s tumbling aggregate in APPEND mode — the form
    whose output existence depends on watermark advancement (a window
    emits exactly once, when the watermark passes its end)."""
    return (
        stream.withWatermark("ts", f"{LATE_DELAY_S} seconds")
        .groupBy(
            F.col("user_id").cast("string").alias("key"),
            F.window("ts", "1 second").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.mean6_spark(F.col("value")).alias("avg_value"),
        )
        .select(
            "key",
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def write_late_chunks(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Write the four deterministic micro-batch chunk files (mtime
    staggered so the file source replays them in order). One
    partitioned write job produces all four files (a per-chunk
    coalesce(1) loop costs four scans of the events table)."""
    import glob
    import shutil

    straggler = (F.col("event_id") % LATE_SPAN_S < LATE_TICK_S) & (
        F.col("event_id") % 7 == LATE_RESIDUE
    )
    sec = F.col("event_id") % LATE_SPAN_S
    batch = (
        F.when(straggler, F.lit(2))
        .when(sec < LATE_TICK_S, F.lit(0))
        .when(sec < LATE_TAIL_S, F.lit(1))
        .otherwise(F.lit(3))
    )
    events = load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "value",
        F.expr(_TS_C_SPARK).alias("ts"),
        batch.alias("b"),
    )
    staging = f"{out_dir}/_stage"
    events.repartition("b").write.mode("overwrite").partitionBy("b").parquet(staging)
    base = 1_600_000_000
    for i in range(4):
        parts = glob.glob(f"{staging}/b={i}/part-*.parquet")
        assert len(parts) == 1, parts
        dest = f"{out_dir}/chunk-{i:03d}.parquet"
        shutil.move(parts[0], dest)
        os.utime(dest, (base + i * 60, base + i * 60))
    shutil.rmtree(staging, ignore_errors=True)


def run_late_policy(spark: SparkSession, sf_dir: str, sink: str) -> list[dict]:
    """Chunk the events table, replay it as four micro-batches through
    the append-mode watermark aggregate, return the progress metrics.
    The result lands in the ``sink`` memory table."""
    import shutil
    import tempfile

    chunk_dir = tempfile.mkdtemp(prefix="es_late_chunks_")
    try:
        write_late_chunks(spark, sf_dir, chunk_dir)
        schema = spark.read.parquet(f"{chunk_dir}/chunk-000.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        return run_to_memory(
            late_policy_stream(stream), sink, mode="append", nodata_batches=True
        )
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


@query("stream_late_data_policy", oracle=_STREAM_LATE_ORACLE)
def q_stream_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark eviction proven across four real micro-batches (see
    the module comment above _STREAM_LATE_ORACLE): stragglers
    delivered after the watermark advanced are dropped, survivors
    merge into still-open state, and only watermark-finalized windows
    ever reach the append sink — value-hash-checked against a DuckDB
    replay of the watermark arithmetic. The eviction metric
    (numRowsDroppedByWatermark > 0) is pinned by
    tests/test_streaming.py::test_late_data_policy_drops_and_merges."""
    from eventstreamer_spark.session import configure

    configure(spark)
    run_late_policy(spark, sf_dir, "stream_late_sink")
    return spark.table("stream_late_sink")


# ---------------------------------------------------------------------------
# foreachBatch idempotent upsert sink (the exactly-once write pattern)
# ---------------------------------------------------------------------------

# Latest-row-wins ordering key: zero-padded (epoch_us, event_id) as a
# string, so lexicographic == numeric and both engines break ties the
# same way without overflowing int64 arithmetic.
_UPSERT_KEY_SPARK = (
    "concat(lpad(CAST(unix_micros(ts) AS STRING), 20, '0'), "
    "lpad(CAST(event_id AS STRING), 12, '0'))"
)
_UPSERT_KEY_DUCK = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 12, '0')"
)

def _reduce_latest(df: DataFrame) -> DataFrame:
    return df.groupBy("user_id").agg(
        F.max_by(F.col("last_event_id"), F.col("k")).alias("last_event_id"),
        F.max_by(F.col("last_ts_us"), F.col("k")).alias("last_ts_us"),
        F.max_by(F.col("last_value"), F.col("k")).alias("last_value"),
        F.max_by(F.col("last_type"), F.col("k")).alias("last_type"),
        F.max(F.col("k")).alias("k"),
        F.sum("n_events").alias("n_events"),
    )


def upsert_latest(cur: DataFrame | None, batch_df: DataFrame) -> DataFrame:
    """Merge one batch of raw events into the per-user latest table:
    latest row wins by the (ts, event_id) key, event counts accumulate.
    Idempotent on the LATEST columns (re-merging the same delta cannot
    change the argmax) — the n_events counter is the part that relies
    on the batch_id-keyed version swap for replay safety (a replayed
    batch re-reads v{batch_id-1}, never its own partially-merged
    output; tests/test_streaming.py pins both properties)."""
    delta = batch_df.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("value").alias("last_value"),
        F.col("event_type").alias("last_type"),
        F.expr(_UPSERT_KEY_SPARK).alias("k"),
        F.lit(1).cast("long").alias("n_events"),
    )
    merged = _reduce_latest(delta)
    if cur is not None:
        merged = _reduce_latest(cur.unionByName(merged))
    return merged


_UPSERT_ORACLE = f"""
SELECT user_id,
       CAST(arg_max(event_id, {_UPSERT_KEY_DUCK}) AS BIGINT) AS last_event_id,
       CAST(arg_max(epoch_us(ts), {_UPSERT_KEY_DUCK}) AS BIGINT) AS last_ts_us,
       arg_max(value, {_UPSERT_KEY_DUCK}) AS last_value,
       arg_max(event_type, {_UPSERT_KEY_DUCK}) AS last_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


def upsert_version_step(
    spark: SparkSession, target_root: str, batch_df: DataFrame, batch_id: int
) -> None:
    """One batch_id-keyed version-swap merge: read v{batch_id-1},
    merge the delta, write v{batch_id}, retire versions ≤ batch_id-2.

    Keying the version by ``batch_id`` (not a driver-local counter) is
    what makes a retried/replayed micro-batch idempotent for the
    accumulating n_events counter too: a replay re-reads the version
    that does NOT yet contain its delta and overwrites v{batch_id}
    with byte-identical content, and a batch whose version already
    committed (``_SUCCESS`` present) is skipped outright — Spark's
    documented foreachBatch exactly-once recipe. Only versions older
    than batch_id-1 are retired, so the replay's input version is
    always still on disk."""
    import shutil

    mine = f"{target_root}/v{batch_id}"
    if os.path.exists(f"{mine}/_SUCCESS"):
        return  # this batch already committed — replayed delivery, skip
    prev = f"{target_root}/v{batch_id - 1}"
    cur = spark.read.parquet(prev) if os.path.isdir(prev) else None
    upsert_latest(cur, batch_df).write.mode("overwrite").parquet(mine)
    for stale in os.listdir(target_root):
        if stale.startswith("v") and stale[1:].lstrip("-").isdigit():
            if int(stale[1:]) <= batch_id - 2:
                shutil.rmtree(f"{target_root}/{stale}", ignore_errors=True)


# Finished upsert targets: the final per-user table stays ON DISK and
# is returned as a plain parquet scan — no driver materialization.
# Deliberately NOT memoized: every invocation re-runs the stream
# (bench/scale timings must measure the merge, not a cache hit).
# Deleting a dir early would break a still-held DataFrame from an
# earlier invocation, so every created dir is tracked in _UPSERT_DIRS
# and reclaimed only at process exit — disk growth is bounded by the
# session, like formats._RT_CACHE.
_UPSERT_DIRS: list[str] = []


@_atexit.register
def _cleanup_upsert_dirs() -> None:
    import shutil

    for path in _UPSERT_DIRS:
        shutil.rmtree(path, ignore_errors=True)
    _UPSERT_DIRS.clear()


@query("stream_foreachbatch_upsert", oracle=_UPSERT_ORACLE)
def q_stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once SINK pattern executed for real: a three-batch
    stream drives ``foreachBatch``, and each batch MERGES its per-user
    latest rows (and running event counts) into a parquet target via
    the batch_id-keyed version-swap recipe — read v{batch_id-1},
    unionByName the batch delta, re-reduce, write v{batch_id}, retire
    versions older than batch_id-1 (see upsert_version_step). Keying by
    batch_id is what makes a replayed batch idempotent: the replay
    re-reads the pre-delta version and overwrites its own version with
    identical content instead of double-counting — Spark's documented
    route to exactly-once with non-transactional stores. The final
    table must equal a single batch argmax over ALL events (latest row
    per user by (ts, event_id), total event counts): if any merge
    dropped, duplicated, or mis-ordered rows across the three deltas,
    the hash check fails. Merge work per batch is keys-only (user_id
    grain), never the event history — the state a 100 TB deployment
    would keep in a keyed store."""
    import glob
    import shutil
    import tempfile

    from eventstreamer_spark.session import configure

    configure(spark)
    chunk_dir = tempfile.mkdtemp(prefix="es_upsert_chunks_")
    target_root = tempfile.mkdtemp(prefix="es_upsert_target_")
    try:
        events = load_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        staging = f"{chunk_dir}/_stage"
        events.withColumn("b", (F.col("event_id") % 3).cast("int")).repartition(
            "b"
        ).write.mode("overwrite").partitionBy("b").parquet(staging)
        base = 1_600_000_000
        for i in range(3):
            parts = glob.glob(f"{staging}/b={i}/part-*.parquet")
            assert len(parts) == 1, parts
            dest = f"{chunk_dir}/chunk-{i:03d}.parquet"
            shutil.move(parts[0], dest)
            os.utime(dest, (base + i * 60, base + i * 60))
        shutil.rmtree(staging, ignore_errors=True)

        def upsert(batch_df: DataFrame, batch_id: int) -> None:
            upsert_version_step(spark, target_root, batch_df, batch_id)

        schema = spark.read.parquet(f"{chunk_dir}/chunk-000.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        ckpt = tempfile.mkdtemp(prefix="es_upsert_ckpt_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
        last = max(
            int(v[1:]) for v in os.listdir(target_root) if v.startswith("v")
        )
        final_dir = tempfile.mkdtemp(prefix="es_upsert_final_")
        _UPSERT_DIRS.append(final_dir)
        spark.read.parquet(f"{target_root}/v{last}").drop("k").write.mode(
            "overwrite"
        ).parquet(final_dir)
        return spark.read.parquet(final_dir)
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)
        shutil.rmtree(target_root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-static join: live ingestion dedup against the corpus index
# ---------------------------------------------------------------------------

def _ss_ingest_oracle() -> str:
    # same decisions as the batch twin: per-doc, chunking-invariant
    from eventstreamer_spark.operators.dedup import _INCR_ORACLE

    return _INCR_ORACLE


@query("stream_static_ingest_dedup", oracle=_ss_ingest_oracle())
def q_stream_static_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup as a LIVE STREAM-STATIC JOIN — the
    Spark join mode no other query exercises: incoming documents
    arrive as three micro-batches (readStream over chunk files), each
    batch's MinHash band keys join against the STATIC corpus band
    index (a batch DataFrame inside the streaming query), and every
    incoming doc gets its ingest/drop decision live. Decisions are
    per-doc and each doc's rows live in one chunk, so micro-batch
    boundaries cannot change results — the oracle is the batch
    incremental-ingest query's oracle, verbatim; the signature chain
    and the scoring/decision aggregate are the batch twin's own
    helpers (with_minhash_sig / ingest_decisions), not copies.

    Join shape: unlike the batch twin (whose small side IS the batch,
    so it broadcasts), a stream-static join's broadcastable side is
    the STATIC one — and the corpus index is the big side, so no
    broadcast hint here: each micro-batch joins shuffled on the band
    key, with the tiny stream side moving and the corpus read through
    the checkpointed index. At 100 TB the static side is a
    band-key-bucketed index table, making that per-batch join
    co-located; the stream side stays one crawl batch wide."""
    import glob
    import shutil
    import tempfile

    from eventstreamer_spark.functions import hashing as H
    from eventstreamer_spark.operators.dedup import (
        _INGEST_BATCH_PRED,
        _INGEST_CORPUS_PRED,
        _minhash_docs,
        ingest_decisions,
        with_minhash_sig,
    )
    from eventstreamer_spark.session import configure

    configure(spark)
    bands_all = _minhash_docs(spark, sf_dir).select(
        "doc_id",
        "sig",
        F.explode_outer(H.band_keys_expr("sig")).alias("band_key"),
    ).filter(F.col("band_key").isNotNull())
    corpus = (
        bands_all.filter(F.expr(_INGEST_CORPUS_PRED))
        .select(
            F.col("doc_id").alias("corpus_doc"),
            F.col("sig").alias("sig_c"),
            "band_key",
        )
        .localCheckpoint(eager=True)  # the static, pre-built index side
    )

    chunk_dir = tempfile.mkdtemp(prefix="es_ssingest_")
    try:
        from eventstreamer_spark.sources.tables import load_table

        batch_docs = load_table(spark, sf_dir, "documents").filter(
            F.expr(_INGEST_BATCH_PRED)
        )
        staging = f"{chunk_dir}/_stage"
        batch_docs.withColumn("b", (F.col("doc_id") % 3).cast("int")).repartition(
            "b"
        ).write.mode("overwrite").partitionBy("b").parquet(staging)
        base = 1_600_000_000
        for i in range(3):
            parts = glob.glob(f"{staging}/b={i}/part-*.parquet")
            assert len(parts) == 1, parts
            dest = f"{chunk_dir}/chunk-{i:03d}.parquet"
            shutil.move(parts[0], dest)
            os.utime(dest, (base + i * 60, base + i * 60))
        shutil.rmtree(staging, ignore_errors=True)

        schema = spark.read.parquet(f"{chunk_dir}/chunk-000.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        # the batch twin's own signature chain on the stream side
        stream_bands = (
            with_minhash_sig(stream.select("doc_id", "text"))
            .select(
                F.col("doc_id").alias("new_doc"),
                F.col("sig").alias("sig_b"),
            )
            .select(
                "new_doc",
                "sig_b",
                F.explode_outer(H.band_keys_expr("sig_b")).alias("band_key"),
            )
            .filter(F.col("band_key").isNotNull())
        )
        # stream-static inner join + the shared decision aggregate
        cand = (
            stream_bands.join(corpus, "band_key")
            .select("new_doc", "corpus_doc", "sig_b", "sig_c")
            .dropDuplicates(["new_doc", "corpus_doc"])
        )
        decided = ingest_decisions(cand)
        run_to_memory(decided, "ss_ingest_sink", mode="update")
        # one emission per doc (a doc's rows never split across chunks);
        # if that invariant ever broke, keep the most-complete emission
        # under a fully deterministic order (no arbitrary ties)
        from pyspark.sql import Window as W

        t = spark.table("ss_ingest_sink")
        return (
            t.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("new_doc").orderBy(
                        F.col("n_matches").desc(),
                        F.col("best_jaccard").desc(),
                        F.coalesce(
                            F.col("first_match"), F.lit(2**62).cast("long")
                        ).asc(),
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-static Bloom membership probe: live ingest against the
# bounded-memory filter instead of the full corpus index
# ---------------------------------------------------------------------------

def _bloom_stream_oracle() -> str:
    # per-doc decisions, chunking-invariant: the shared batch chain
    from eventstreamer_spark.operators.dedup import _BLOOM_STREAM_ORACLE

    return _BLOOM_STREAM_ORACLE


@query("stream_bloom_probe", oracle=_bloom_stream_oracle())
def q_stream_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming twin of bloom_dedup_probe: incoming documents
    arrive as three micro-batches and probe the STATIC packed-word
    Bloom filter (built once, localCheckpointed — the bounded-memory
    artifact a 100 TB ingest keeps resident instead of joining every
    batch against the corpus digest table the way
    stream_static_ingest_dedup must). Every incoming doc gets a live
    keep/maybe-duplicate signal plus the exact-truth flag the audit
    tier adds; the oracle replays the identical filter recipe
    (shared _BLOOM_CHAIN WITH-parts) so decisions are per-doc and
    micro-batch-boundary-invariant.

    Join shape: the stream side explodes BLOOM_K positions per doc and
    equi-joins the static word table on word id — the static side is
    <= m/32 fixed-width rows regardless of batch count, and the
    per-batch state is the doc-grain bool_and aggregation only (no
    cross-batch state at all: the filter is immutable during serving;
    compaction-time refresh is the delta-index recipe)."""
    import glob
    import shutil
    import tempfile

    from eventstreamer_spark.operators.dedup import (
        BLOOM_BITS_PER_KEY,
        _bloom_positions,
    )
    from eventstreamer_spark.session import configure
    from eventstreamer_spark.sources.tables import load_table

    configure(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = BLOOM_BITS_PER_KEY * docs.count()  # sizes the static filter
    corpus = docs.select(F.md5(F.col("text").cast("binary")).alias("digest"))
    words = (
        corpus.select(
            F.explode(F.expr(_bloom_positions("spark", "digest", m))).alias("pos")
        )
        .distinct()
        .select(
            F.expr("pos DIV 32").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mb"),
        )
        .groupBy("w")
        .agg(F.sum("mb").alias("bits"))
        .localCheckpoint(eager=True)  # the resident filter artifact
    )
    cdig = (
        corpus.distinct()
        .withColumn("is_dup_", F.lit(True))
        .localCheckpoint(eager=True)  # audit-tier truth side only
    )

    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + 3000000).alias("batch_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 1).select(
                (F.col("doc_id") + 4000000).alias("batch_id"),
                F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"),
            )
        )
    )

    chunk_dir = tempfile.mkdtemp(prefix="es_bloomstream_")
    try:
        staging = f"{chunk_dir}/_stage"
        batch.withColumn("b", (F.col("batch_id") % 3).cast("int")).repartition(
            "b"
        ).write.mode("overwrite").partitionBy("b").parquet(staging)
        base = 1_600_000_000
        for i in range(3):
            parts = sorted(glob.glob(f"{staging}/b={i}/part-*.parquet"))
            for j, p in enumerate(parts):  # tolerate 0..n parts per residue
                dest = f"{chunk_dir}/chunk-{i:03d}-{j:02d}.parquet"
                shutil.move(p, dest)
                os.utime(dest, (base + i * 60, base + i * 60))
        shutil.rmtree(staging, ignore_errors=True)

        schema = spark.read.parquet(chunk_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        sdig = stream.select(
            "batch_id", F.md5(F.col("text").cast("binary")).alias("digest")
        )
        spos = (
            sdig.join(cdig, "digest", "left")
            .select(
                "batch_id",
                F.coalesce("is_dup_", F.lit(False)).alias("is_dup"),
                F.explode(
                    F.expr(_bloom_positions("spark", "digest", m))
                ).alias("pos"),
            )
        )
        probed = (
            spos.join(words, F.expr("pos DIV 32") == F.col("w"), "left")
            .groupBy("batch_id", "is_dup")
            .agg(
                F.expr(
                    "bool_and(bits IS NOT NULL AND "
                    "(bits & shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))) != 0)"
                ).alias("bloom_hit")
            )
        )
        run_to_memory(probed, "bloom_probe_sink", mode="update")
        t = spark.table("bloom_probe_sink")
        # a doc's position rows live in one chunk, so one final emission
        # per key; if a partial ever re-emitted, the bool_and can only
        # tighten — keep the conservative (false-first) row
        from pyspark.sql import Window as W

        return (
            t.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("batch_id", "is_dup").orderBy(
                        F.col("bloom_hit").asc()
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming drift monitor: per-micro-batch PSI against a static reference
# ---------------------------------------------------------------------------

def _stream_drift_oracle() -> str:
    from eventstreamer_spark.operators.audit import _PSI_BINS, _psi_bin
    from eventstreamer_spark.operators.audit import _TOKS_D as _T

    # chunk-exact replay: reference = even docs; odd docs arrive in
    # chunks keyed (doc_id // 2) % 3; per-chunk PSI over the shared
    # spine with per-chunk Laplace totals
    return f"""
WITH nt AS (
  SELECT doc_id, CAST({_psi_bin("duck", f"len({_T})")} AS BIGINT) AS bin
  FROM documents
),
ref AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_ref FROM nt WHERE doc_id % 2 = 0
  GROUP BY bin
),
tref AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref FROM ref),
cur AS (
  SELECT (doc_id // 2) % 3 AS chunk, bin, CAST(count(*) AS BIGINT) AS n_cur
  FROM nt WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
tcur AS (SELECT chunk, CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cur GROUP BY chunk),
spine AS (
  SELECT t.chunk, s.bin
  FROM (SELECT CAST(unnest(generate_series(0, {_PSI_BINS - 1})) AS BIGINT) AS bin) s,
       (SELECT DISTINCT chunk FROM cur) t
),
terms AS (
  SELECT sp.chunk,
         (COALESCE(r.n_ref, 0) + 1.0) / (tr.t_ref + {_PSI_BINS}.0) AS p_ref,
         (COALESCE(c.n_cur, 0) + 1.0) / (tc.t_cur + {_PSI_BINS}.0) AS p_cur
  FROM spine sp
  LEFT JOIN ref r ON sp.bin = r.bin
  LEFT JOIN cur c ON sp.chunk = c.chunk AND sp.bin = c.bin
  JOIN tcur tc ON tc.chunk = sp.chunk
  CROSS JOIN tref tr
)
SELECT CAST(t.chunk AS BIGINT) AS chunk, tc.t_cur AS n_docs,
       CAST(sum(CAST(round((t.p_cur - t.p_ref) * ln(t.p_cur / t.p_ref)
                           * 1000000000, 0) AS BIGINT)) AS BIGINT)
         / 1000000000.0 AS psi
FROM terms t JOIN tcur tc ON tc.chunk = t.chunk
GROUP BY t.chunk, tc.t_cur
"""


@query("stream_drift_monitor", oracle=_stream_drift_oracle())
def q_stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """population_drift_audit's live twin: the odd-doc_id half of the
    corpus arrives as three micro-batches (chunk = (doc_id // 2) % 3),
    each batch's token-length bin counts aggregate in-stream (keyed
    state = chunks x 10 bins, absolutely bounded), and the per-batch
    PSI against the STATIC even-half reference is assembled from the
    sink counts over the full bin spine — the monitor a production
    ingest keeps on every arriving batch, with the same
    integer-nano-unit term discipline as the batch audit (exact
    cross-engine equality, shared _psi_bin rule).

    State story: unlike the sessionization streams there is no
    watermark here because the aggregation key space is constant
    (chunk, bin) — state cannot grow with data, only with bins."""
    import glob
    import shutil
    import tempfile

    from eventstreamer_spark.operators.audit import _PSI_BINS, _psi_bin
    from eventstreamer_spark.operators.audit import _TOKS_S as _TS
    from eventstreamer_spark.session import configure
    from eventstreamer_spark.sources.tables import load_table

    configure(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    binned = docs.select(
        "doc_id",
        F.expr(f"CAST({_psi_bin('spark', f'size({_TS})')} AS BIGINT)").alias("bin"),
    )
    ref = (
        binned.filter(F.col("doc_id") % 2 == 0)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
        .localCheckpoint(eager=True)  # the static reference profile
    )
    cur_docs = binned.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "bin", (F.expr("doc_id DIV 2") % 3).cast("long").alias("chunk")
    )

    chunk_dir = tempfile.mkdtemp(prefix="es_drift_")
    try:
        staging = f"{chunk_dir}/_stage"
        cur_docs.withColumn("b", F.col("chunk").cast("int")).repartition(
            "b"
        ).write.mode("overwrite").partitionBy("b").parquet(staging)
        base = 1_600_000_000
        for i in range(3):
            parts = sorted(glob.glob(f"{staging}/b={i}/part-*.parquet"))
            for j, p in enumerate(parts):
                dest = f"{chunk_dir}/chunk-{i:03d}-{j:02d}.parquet"
                shutil.move(p, dest)
                os.utime(dest, (base + i * 60, base + i * 60))
        shutil.rmtree(staging, ignore_errors=True)

        schema = spark.read.parquet(chunk_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        counts = stream.groupBy("chunk", "bin").agg(
            F.count(F.lit(1)).cast("long").alias("n_cur")
        )
        run_to_memory(counts, "drift_sink", mode="update")
        t = spark.table("drift_sink")
        # one emission per (chunk, bin) — a chunk lives in one trigger;
        # keep the max defensively (counts only ever grow within a key)
        cur = t.groupBy("chunk", "bin").agg(F.max("n_cur").alias("n_cur"))

        tref = ref.agg(F.sum("n_ref").cast("long").alias("t_ref"))
        tcur = cur.groupBy("chunk").agg(F.sum("n_cur").cast("long").alias("t_cur"))
        # the chunk domain is static (3 residues) — building the spine
        # from ranges avoids a self-join back into the sink lineage
        # (which trips Spark's conflicting-attribute check); chunks
        # with no docs fall out at the inner tcur join
        spine = (
            spark.range(3)
            .select(F.col("id").cast("long").alias("chunk"))
            .crossJoin(
                F.broadcast(
                    spark.range(_PSI_BINS).select(
                        F.col("id").cast("long").alias("bin")
                    )
                )
            )
        )
        terms = (
            spine.join(F.broadcast(ref), "bin", "left")
            .join(cur, ["chunk", "bin"], "left")
            .join(F.broadcast(tcur), "chunk")
            .crossJoin(F.broadcast(tref))
            .select(
                "chunk",
                "t_cur",
                (
                    (F.coalesce("n_ref", F.lit(0)) + F.lit(1.0))
                    / (F.col("t_ref") + F.lit(float(_PSI_BINS)))
                ).alias("p_ref"),
                (
                    (F.coalesce("n_cur", F.lit(0)) + F.lit(1.0))
                    / (F.col("t_cur") + F.lit(float(_PSI_BINS)))
                ).alias("p_cur"),
            )
        )
        return terms.groupBy("chunk", "t_cur").agg(
            (
                F.sum(
                    F.round(
                        (F.col("p_cur") - F.col("p_ref"))
                        * F.log(F.col("p_cur") / F.col("p_ref"))
                        * 1000000000,
                        0,
                    ).cast("long")
                ).cast("long")
                / 1000000000.0
            ).alias("psi")
        ).select("chunk", F.col("t_cur").alias("n_docs"), "psi")
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)
