"""Tier A ingest parity: the JSON wire path (O2/O4/O13) end to end.

The reference consumes UTF-8 JSON event bodies and drops any message
that fails to deserialize (SafelyConvertToDataPoint,
DispatcherFunction.cs:172-191; null filter at :33). Here the same
path is exercised honestly: events are serialized to DataPoint wire
JSON (with a deterministic subset corrupted), parsed back with
PERMISSIVE ``from_json``, nulls filtered, and the numeric payload
re-cast with the 0-default rule — all built-ins, all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.datamodel import DATAPOINT_SCHEMA, events_as_datapoints, parse_json
from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.functions.casting import safe_double
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events

_INGEST_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       floor(sum(CAST(round(value * 1000000, 0) AS BIGINT)) * 1.0 / count(*) + 0.5) / 1000000.0 AS avg_value
FROM events
WHERE event_id % 97 != 0
GROUP BY event_type
UNION ALL
SELECT '_corrupt_dropped',
       CAST(count(*) AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM events
WHERE event_id % 97 = 0
"""


@query("json_ingest_corrupt_drop", oracle=_INGEST_ORACLE)
def q_json_ingest_corrupt_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-JSON round trip with poison messages.

    Every 97th event's body is truncated (undecodable); the pipeline
    must drop exactly those (O4) and aggregate the rest from the
    *parsed* payload (O2+O13: values come back as strings and re-cast
    with the 0-default rule). The oracle computes the expected result
    from the clean columns — if parsing mangled anything, counts or
    averages diverge.
    """
    ev = load_events(spark, sf_dir)
    dp = events_as_datapoints(ev, extra_cols=("event_id",))
    j = F.to_json(F.struct(*[c for c in dp.columns if c != "event_id"]))
    wire = dp.select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.substring(j, 1, 7)).otherwise(j).alias("raw"),
    )
    parsed = wire.select("event_id", parse_json(F.col("raw")).alias("p"))
    # PERMISSIVE mode yields a struct of nulls on corrupt input; a real
    # wire message always carries a timestamp, so null-timestamp == poison.
    # Single pass: routing ok/poison rows to buckets via the group key
    # (instead of two filter branches unioned) halves the scan + JSON
    # round-trip work — the poison rows' avg() input is all-null, so the
    # corrupt bucket's avg_value is NULL exactly as the two-branch form.
    is_ok = F.col("p.timestamp").isNotNull()
    return parsed.groupBy(
        F.when(is_ok, F.col("p.sensor_type"))
        .otherwise(F.lit("_corrupt_dropped"))
        .alias("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # groups are pure ok/corrupt, so count(*) == count(v) and the
        # all-null corrupt bucket propagates NULL through the mean
        N.mean6_spark(
            F.when(is_ok, safe_double(F.element_at(F.col("p.values"), 1)))
        ).alias("avg_value"),
    )


_ARRAYMAP_ORACLE = """
SELECT event_id,
       round(list_max([value, value * 2, value * 3]), 4) AS arr_max,
       CAST(list_position([value, value * 2, value * 3], value * 2) AS INTEGER) AS pos_of_double,
       round(list_sum([value, value * 2, value * 3]), 4) AS arr_sum,
       CAST(len(generate_series(1, 1 + event_id % 4)) AS INTEGER) AS seq_len,
       CAST(list_sum(generate_series(1, 1 + event_id % 4)) AS BIGINT) AS seq_sum,
       list_reverse(['a', 'b', event_type])[1] AS rev_head,
       array_to_string(list_sort(['b', event_type, 'a']), '|') AS sorted_tags,
       round(CAST(map_extract(map {'lo': value, 'hi': value * 2}, 'hi')[1] AS DOUBLE), 4) AS map_hi,
       array_to_string(map_keys(map {'lo': value, 'hi': value * 2}), ',') AS map_key_csv
FROM events
WHERE event_id % 13 = 0
"""


@query("array_map_functions", oracle=_ARRAYMAP_ORACLE)
def q_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar array/map library coverage (O15's map-building family):
    construction, position, fold, sequence, reverse, sort, map
    extract/keys — all row-wise codegen expressions, no shuffle at
    all (the plan is scan → project → filter)."""
    ev = load_events(spark, sf_dir)
    arr = F.array(F.col("value"), F.col("value") * 2, F.col("value") * 3)
    seq = F.sequence(F.lit(1), (F.lit(1) + F.col("event_id") % 4).cast("int"))
    m = F.create_map(F.lit("lo"), F.col("value"), F.lit("hi"), F.col("value") * 2)
    return ev.filter(F.col("event_id") % 13 == 0).select(
        "event_id",
        F.round(F.array_max(arr), 4).alias("arr_max"),
        F.array_position(arr, F.col("value") * 2).cast("int").alias("pos_of_double"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 4).alias("arr_sum"),
        F.size(seq).cast("int").alias("seq_len"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("seq_sum"),
        F.element_at(F.reverse(F.array(F.lit("a"), F.lit("b"), F.col("event_type"))), 1).alias(
            "rev_head"
        ),
        F.array_join(F.sort_array(F.array(F.lit("b"), F.col("event_type"), F.lit("a"))), "|").alias(
            "sorted_tags"
        ),
        F.round(F.element_at(m, F.lit("hi")), 4).alias("map_hi"),
        F.array_join(F.map_keys(m), ",").alias("map_key_csv"),
    )


# ---------------------------------------------------------------------------
# Corrupt-record AUDIT (the reference's log side of O4, as a table)
# ---------------------------------------------------------------------------

_AUDIT_ORACLE = """
SELECT event_id,
       md5('garbage#' || CAST(event_id AS VARCHAR)) AS payload_md5,
       CAST(length('garbage#' || CAST(event_id AS VARCHAR)) AS BIGINT) AS n_chars,
       'malformed' AS reason
FROM events
WHERE event_id % 97 = 0
"""


@query("json_ingest_corrupt_audit", oracle=_AUDIT_ORACLE)
def q_json_ingest_corrupt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dead-letter table the reference only logs: the catch block
    in SafelyConvertToDataPoint (DispatcherFunction.cs:184-190) writes
    the failed message body to the logger; here the same poison
    payloads are CAPTURED via ``columnNameOfCorruptRecord`` and
    surfaced as an auditable table (id, payload digest, size, reason)
    instead of vanishing into a log stream. PERMISSIVE parse with a
    corrupt-record column keeps the good rows flowing through the same
    single pass — the standard Spark dead-letter-queue recipe. The
    oracle recomputes the digests from the deterministic corruption
    rule, so capture fidelity is value-checked byte-for-byte."""
    from pyspark.sql import types as T

    ev = load_events(spark, sf_dir)
    dp = events_as_datapoints(ev, extra_cols=("event_id",))
    j = F.to_json(F.struct(*[c for c in dp.columns if c != "event_id"]))
    wire = dp.select(
        "event_id",
        F.when(
            F.col("event_id") % 97 == 0,
            F.concat(F.lit("garbage#"), F.col("event_id").cast("string")),
        )
        .otherwise(j)
        .alias("raw"),
    )
    audit_schema = T.StructType(
        list(DATAPOINT_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    parsed = wire.select(
        "event_id",
        F.from_json(
            "raw",
            audit_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("p"),
    )
    return parsed.filter(F.col("p._corrupt_record").isNotNull()).select(
        "event_id",
        F.md5(F.col("p._corrupt_record").cast("binary")).alias("payload_md5"),
        F.length("p._corrupt_record").cast("long").alias("n_chars"),
        F.lit("malformed").alias("reason"),
    )
