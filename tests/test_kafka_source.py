"""Kafka-class message-bus source (reference op A5 parity,
``script/TributeStreamingJob.py:101-103``).

The sandbox has no broker and no spark-sql-kafka connector jar, so the
e2e contract is exercised through the pluggable-source seam instead:
``parse_kafka_value`` (the schema-enforced value decode, identical for
batch topic dumps and streams) is verified on Kafka-shaped records, and
the tribute pipeline is run end-to-end with an injected source to prove
nothing downstream depends on the default file stream.
"""

from __future__ import annotations

import json
import os

import pytest

from hunger_games_glue_streaming_etl_spark.sources.streaming import (
    parse_kafka_value,
    read_json_stream,
    read_kafka_stream,
)
from hunger_games_glue_streaming_etl_spark.streaming.pipeline import (
    TRIBUTE_STREAM_SCHEMA,
)

_KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _kafka_record(payload: dict, offset: int):
    from datetime import datetime

    return (
        None,
        json.dumps(payload).encode(),
        "tribute-events",
        0,
        offset,
        datetime(2024, 1, 1, 12, 0, offset % 60),
        0,
    )


_EVENT = {
    "streamingeventid": "e1",
    "gameid": "74",
    "tributeid": "9",
    "heartrate": 80.0,
    "painlevel": 1.0,
    "hydrationlevel": 50.0,
    "hungerlevel": 40.0,
    "xcoordinate": 3.0,
    "ycoordinate": 4.0,
    "seq": 0,
}


def test_parse_kafka_value_decodes_schema_enforced(spark):
    raw = spark.createDataFrame(
        [_kafka_record(dict(_EVENT, seq=i, streamingeventid=f"e{i}"), i) for i in range(3)],
        _KAFKA_RECORD_SCHEMA,
    )
    out = parse_kafka_value(raw, TRIBUTE_STREAM_SCHEMA)
    assert out.columns == [f.name for f in TRIBUTE_STREAM_SCHEMA.fields]
    rows = {r["streamingeventid"]: r for r in out.collect()}
    assert rows["e1"]["tributeid"] == "9" and rows["e1"]["heartrate"] == 80.0


def test_parse_kafka_value_meta_and_malformed(spark):
    good = _kafka_record(_EVENT, 7)
    bad = (None, b"{not json", "tribute-events", 0, 8, good[5], 0)
    raw = spark.createDataFrame([good, bad], _KAFKA_RECORD_SCHEMA)
    out = parse_kafka_value(raw, TRIBUTE_STREAM_SCHEMA, include_meta=True).collect()
    by_offset = {r["offset"]: r for r in out}
    assert by_offset[7]["tributeid"] == "9"
    assert by_offset[7]["kafka_timestamp"] is not None
    # malformed value -> null columns, the record itself survives for audit
    assert by_offset[8]["tributeid"] is None


def test_read_kafka_stream_builder_contract(spark):
    """Without the connector jar the builder must fail with a clear package
    hint; with it, it must return an unbounded schema-parsed DataFrame."""
    try:
        df = read_kafka_stream(
            spark, "localhost:9092", "tribute-events", TRIBUTE_STREAM_SCHEMA,
            max_offsets_per_trigger=1000,
        )
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
    else:
        assert df.isStreaming
        assert df.columns == [f.name for f in TRIBUTE_STREAM_SCHEMA.fields]


def test_pipeline_accepts_injected_source(spark, tmp_path):
    """start_tribute_stream(source=...) must run the full dual-sink pipeline
    on any schema-compatible unbounded DataFrame (the Kafka seam)."""
    from hunger_games_glue_streaming_etl_spark.fixtures import (
        load_game_config,
        load_tribute_dim,
        reference_available,
    )
    from hunger_games_glue_streaming_etl_spark.streaming import start_tribute_stream

    if not reference_available():
        pytest.skip("reference corpus not present")

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    injected = read_json_stream(spark, events_dir, TRIBUTE_STREAM_SCHEMA)

    from hunger_games_glue_streaming_etl_spark.fixtures import REFERENCE_DIR

    with open(os.path.join(REFERENCE_DIR, "streamingData/preCornucopia.json")) as f:
        events = json.load(f)
    with open(os.path.join(events_dir, "000000_pre.json"), "w") as f:
        for i, e in enumerate(events):
            e["seq"] = i
            f.write(json.dumps(e) + "\n")

    query, latest = start_tribute_stream(
        spark,
        events_dir="IGNORED-WHEN-SOURCE-INJECTED",
        tribute_dim=load_tribute_dim(spark),
        game_dim=load_game_config(spark),
        latest_path=str(tmp_path / "latest"),
        archive_path=str(tmp_path / "archive"),
        checkpoint_path=str(tmp_path / "checkpoint"),
        source=injected,
    )
    try:
        query.processAllAvailable()
        st = {r["tributeId"]: r["status"] for r in latest.read().collect()}
        assert len(st) == 16 and set(st.values()) == {"ALIVE"}
    finally:
        query.stop()
