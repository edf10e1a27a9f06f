"""Event-time analytics (SURVEY.md §2C 'Streaming-only' + M3): the reference
has no event-time column at all (its only temporal notion is file replay
order); the engine ships tumbling/sliding/session windows over ``events.ts``.

These are the *batch* forms with DuckDB oracles — the driver's correctness
gate can check them.  The same logic under ``readStream`` + watermarks is
exercised in ``tests/test_streaming_depth.py`` (streaming semantics are not
SQL-oracle-expressible).

Scale notes: a tumbling window agg is an ordinary hash aggregate on
(bucket, keys) — partial aggregation applies, one shuffle.  The sliding form
expands each row into window_count = length/slide copies *before* the
shuffle (Spark does the same internally); keep length/slide small at 100 TB
or pre-aggregate into tumbling buckets first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time window (F.window ≡ date_trunc for
    slide == length)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS window_start, value
        FROM events
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY 1
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly 2
    windows (the oracle expands via two shifted tumbling buckets — valid
    because length/slide = 2)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS session_value,
           date_trunc('second', MIN(ts)) AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → gap flag →
    running sum → per-session aggregate.  Streaming twin: session_window
    (tests/test_streaming_depth.py).  Two window passes + one agg, all
    partitioned by user_id — one shuffle total."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer µs arithmetic — second-truncating casts would disagree
    # with the oracle on gaps within 1s of the threshold
    gap = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) > 1_800_000_000
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("new_session", F.when(gap, 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(running).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.date_trunc("second", F.min("ts")).alias("session_start"),
        )
    )


@register(
    "dedup_first_event",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'first event per (user, type)' — the batch form of
    streaming dropDuplicates (which keeps an *arbitrary* first; we pin order
    so the result is checkable)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )
