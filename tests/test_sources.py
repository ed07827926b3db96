"""Source/sink surface tests (the parts runnable without connector jars)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from eventstreamer_spark.datamodel import DATAPOINT_SCHEMA
from eventstreamer_spark.sources.connectors import (
    csv_table,
    eventhubs_source_options,
    foreach_batch_idempotent,
    json_table,
    write_parquet_sink,
)
from eventstreamer_spark.streaming.pipeline import stream_events


def test_json_source_reads_canonical_format(spark, tmp_path):
    rec = {
        "timestamp": "2024-01-01T00:00:00.000Z",
        "device_id": "d1",
        "session_id": "s9",
        "sensor_type": "gyro",
        "names": ["hr"],
        "values": ["77"],
    }
    p = tmp_path / "events.jsonl"
    p.write_text(json.dumps(rec) + "\n")
    df = json_table(spark, str(p))
    row = df.collect()[0]
    assert row.session_id == "s9"
    assert row.values == ["77"]


def test_csv_source_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = csv_table(spark, str(p), "a int, b string")
    assert df.schema.simpleString() == "struct<a:int,b:string>"
    assert df.count() == 2


def test_eventhubs_options_shape():
    opts = eventhubs_source_options("Endpoint=sb://x/;EntityPath=final-stream")
    assert "eventhubs.connectionString" in opts
    assert opts["eventhubs.consumerGroup"] == "$Default"


def test_parquet_sink_roundtrip_exactly_once(spark, tmp_path):
    """Checkpointed parquet sink: restart with the same checkpoint must
    not duplicate data (exactly-once file commits)."""
    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:01"]).astype(
                "datetime64[us]"
            ),
            "user_id": [1, 1],
            "event_type": ["click", "view"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    ).to_parquet(src / "a.parquet")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(2):  # second run replays from the same checkpoint
        q = write_parquet_sink(stream_events(spark, str(src)), out, ckpt).start()
        q.processAllAvailable()
        q.stop()
    assert spark.read.parquet(out).count() == 2  # no duplicates


def test_foreach_batch_receives_batch_id(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-01-01 00:00:00"]).astype("datetime64[us]"),
            "user_id": [1],
            "event_type": ["click"],
            "value": [1.0],
            "props": ["{}"],
        }
    ).to_parquet(src / "a.parquet")
    seen: list[tuple[int, int]] = []

    def fn(df, batch_id):
        seen.append((batch_id, df.count()))

    q = foreach_batch_idempotent(
        stream_events(spark, str(src)), str(tmp_path / "ck"), fn
    ).start()
    q.processAllAvailable()
    q.stop()
    assert seen == [(0, 1)]
