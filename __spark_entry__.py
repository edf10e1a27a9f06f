"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``hunger_games_glue_streaming_etl_spark``; this module just
adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hunger_games_glue_streaming_etl_spark.plans import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference join+CASE pattern, aggregated) on sf0.001."""
    return QUERIES["flagship_user_status"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
