"""Reference-parity edge cases (SURVEY.md §5): the behaviors that make
this engine a faithful replacement, tested at the unit level.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamer_spark.datamodel import (
    DATAPOINT_SCHEMA,
    normalize_payload,
    parse_json,
    with_key,
)
from eventstreamer_spark.functions.casting import safe_double


def test_non_numeric_value_averages_as_zero(spark):
    """O13 (DispatcherFunction.cs:164-170): a non-numeric measurement
    contributes 0 to the average — NOT null (which SQL AVG would
    skip). avg('10', 'garbage') must be 5.0, not 10.0."""
    df = spark.createDataFrame([("10",), ("garbage",)], "v string")
    got = df.agg(F.avg(safe_double("v")).alias("a")).collect()[0].a
    assert got == 5.0


def test_key_synthesis_uses_second_array_element(spark):
    """O3 (DispatcherFunction.cs:179-181): Key = session:values[1]
    (0-based index 1 — the assumed player id)."""
    df = spark.createDataFrame(
        [("s1", ["100", "p7", "x"])], "session_id string, values array<string>"
    )
    got = with_key(df).select("key").collect()[0].key
    assert got == "s1:p7"


def test_key_synthesis_null_payload_keeps_separator(spark):
    """C# ``$"{SessionId}:{Values[1]}"`` renders null as empty — a
    one-element (or null) values array must yield ``"s1:"``, not
    ``"s1"`` (concat_ws would drop the separator) and not NULL (plain
    concat would)."""
    df = spark.createDataFrame(
        [("s1", ["100"]), ("s2", None), (None, ["100", "p7"])],
        "session_id string, values array<string>",
    )
    got = [r.key for r in with_key(df).orderBy("session_id").select("key").collect()]
    assert got == [":p7", "s1:", "s2:"]


def test_zero_norm_vector_quantizes_to_nulls_in_both_engines(spark):
    """Degenerate all-zero embeddings: 0/0 is NaN in Spark but a CAST
    error in DuckDB. The nullif(norm, 0) guard makes both engines
    produce NULL components instead."""
    import duckdb

    from eventstreamer_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = (
        H.with_quantized_unit(df, "embedding", "uq")
        .orderBy("vec_id")
        .select("uq")
        .collect()
    )
    assert list(got[0].uq) == [None] * 4
    assert list(got[1].uq) == [1000000, 0, 0, 0]
    duck = duckdb.sql(
        f"SELECT {H.quantized_unit_duck('CAST([0.0, 0.0] AS FLOAT[])')} AS uq"
    ).fetchone()[0]
    assert duck == [None, None]


def test_malformed_json_yields_null_not_error(spark):
    """O4 (DispatcherFunction.cs:184-190): poison messages produce a
    null record, never an exception."""
    df = spark.createDataFrame(
        [('{"device_id": "d1", "session_id": "s1"}',), ('{"broken',), ("not json at all",)],
        "raw string",
    )
    rows = df.select(parse_json(F.col("raw")).alias("p")).collect()
    assert rows[0].p.device_id == "d1"
    assert rows[1].p is None or rows[1].p.device_id is None
    assert rows[2].p is None or rows[2].p.device_id is None


def test_payload_normalization_to_map(spark):
    """SURVEY.md §1.2: parallel arrays → MAP at ingest (the fix for
    the reference's alignment-by-index fragility)."""
    df = spark.createDataFrame(
        [(["hr", "spd"], ["88", "12.5"])], "names array<string>, values array<string>"
    )
    got = normalize_payload(df).select("payload").collect()[0].payload
    assert got == {"hr": "88", "spd": "12.5"}


def test_first_event_fields_deterministic_under_shuffle(spark):
    """O14/O6: first-event metadata must not depend on partitioning —
    min_by(struct(ts,event_id)) is stable where the reference relied
    on a batch-local sort (DispatcherFunction.cs:35,141)."""
    rows = [(i, f"2024-01-01 00:00:00.{i:06d}", "t%d" % i) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts string, tag string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "tag"
    )
    for parts in (1, 7, 32):
        got = (
            df.repartition(parts)
            .agg(F.min_by("tag", F.struct("ts", "event_id")).alias("first_tag"))
            .collect()[0]
            .first_tag
        )
        assert got == "t0", f"nondeterministic first at {parts} partitions"


def test_datapoint_schema_matches_wire_format(spark):
    """README.md:11-23 canonical format: all envelope fields present
    with the wire names."""
    names = [f.name for f in DATAPOINT_SCHEMA.fields]
    assert names == ["timestamp", "device_id", "session_id", "sensor_type", "names", "values"]


def test_substring_rewrite_keeps_canonical_copy(spark, tmp_path):
    """Exact-substring remediation semantics on a crafted corpus: a
    span shared by docs 1 and 2 is cut from doc 2 only (doc 1 is the
    lowest-id canonical copy), unique text survives untouched, and a
    doc fully made of shared spans rewrites to the empty string."""
    from eventstreamer_spark.operators.indexing import q_substring_dedup_rewrite

    span = "a b c d e f g h"  # exactly SPAN_N=8 tokens
    docs = [
        (1, f"{span} unique one tail", "en", "s", 1),
        (2, f"lead text {span} and more words here", "en", "s", 1),
        (3, "completely different text with no overlap at all", "en", "s", 1),
        (4, span, "en", "s", 1),  # nothing but the shared span
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in q_substring_dedup_rewrite(spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4}  # doc 1 keeps the canonical copy, 3 untouched
    assert out[2].cleaned_text == "lead text and more words here"
    assert out[2].n_removed == 8 and out[2].n_spans_cut == 1
    assert out[4].cleaned_text == "" and out[4].n_removed == 8
