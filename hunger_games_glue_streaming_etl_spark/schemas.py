"""Explicit StructType registry — the role the Glue Data Catalog plays in the
reference (schema pinned externally, inference disabled).

Stream schema mirrors the catalog table ``cloudformation/template.yml:58-76``
(9 columns: 3 string keys + 6 numeric measures); the reference declares the
measures ``decimal`` (catalog default scale 0) but feeds fractional doubles
(e.g. ``49.04`` in ``streamingData/postCornucopia.json``), so the engine uses
``DoubleType`` and casts to string at the sink for fidelity
(``script/TributeStreamingJob.py:58,62-64``; see SURVEY.md §1.2).

Dimension schemas mirror ``staticData/s3/tributeData.csv:1`` (header) and
``staticData/dynamo/gameData.json:1-7``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Streaming fact: tribute telemetry events (cloudformation/template.yml:58-76).
TRIBUTE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("streamingeventid", T.StringType(), False),
        T.StructField("gameid", T.StringType(), True),
        T.StructField("tributeid", T.StringType(), True),
        T.StructField("heartrate", T.DoubleType(), True),
        T.StructField("painlevel", T.DoubleType(), True),
        T.StructField("hydrationlevel", T.DoubleType(), True),
        T.StructField("hungerlevel", T.DoubleType(), True),
        T.StructField("xcoordinate", T.DoubleType(), True),
        T.StructField("ycoordinate", T.DoubleType(), True),
    ]
)

# Static dimension: tribute master data (staticData/s3/tributeData.csv).
# The reference reads every CSV column as string (header-only inference,
# script/TributeStreamingJob.py:85-86) and relies on implicit string↔decimal
# coercion in the CASE predicates; we type the columns explicitly instead
# (SURVEY.md §1.2 "implicit coercion" row).
TRIBUTE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("tributeId", T.StringType(), False),
        T.StructField("district", T.IntegerType(), True),
        T.StructField("firstName", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("minHydrationThreshold", T.DoubleType(), True),
        T.StructField("maxHungerThreshold", T.DoubleType(), True),
        T.StructField("maxPainThreshold", T.DoubleType(), True),
    ]
)

# Static dimension: game boundary config (staticData/dynamo/gameData.json).
GAME_CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("gameid", T.StringType(), False),
        T.StructField("maxXCoordinate", T.DoubleType(), True),
        T.StructField("maxYCoordinate", T.DoubleType(), True),
        T.StructField("minXCoordinate", T.DoubleType(), True),
        T.StructField("minYCoordinate", T.DoubleType(), True),
    ]
)

# Driver synthetic tables (/root/testdata, FIXTURES.md §B) — declared so the
# streaming file source can read the parquet-derived JSON/CSV without
# inference as well.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# JSON payload schema inside events.props — the from_json surface replacing
# the reference's Kinesis JSON SerDe (cloudformation/template.yml:80-82).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (SURVEY.md extension
# categories; image/audio/video handled as binary columns at 100 TB scale).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
