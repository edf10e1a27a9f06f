"""Streaming readers (reference op A5: Kinesis JSON stream via Glue Catalog).

The reference opens its unbounded DataFrame with
``create_data_frame.from_catalog(..., startingPosition=TRIM_HORIZON,
inferSchema=false)`` (``script/TributeStreamingJob.py:101-103``); the catalog
supplies the JSON SerDe + 9-column schema
(``cloudformation/template.yml:58-82``).  The engine's equivalent is a
schema-mandatory ``readStream`` over a directory (file source — replayable,
so it doubles as the scenario-replay harness), with the same
"earliest"-position semantics.  Kafka/Kinesis would be the production source;
the source is deliberately pluggable because nothing downstream depends on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded DataFrame over JSON files (JSON-lines or one-object files).

    ``maxFilesPerTrigger`` bounds micro-batch size — the knob that keeps a
    backlogged 100 TB directory from becoming one giant first batch.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source for throughput tests (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
