"""Temporal join queries: as-of and range joins on the events timeline
(operators/temporal.py).  Oracles use LATERAL / theta-join formulations —
different algorithm, same semantics — so they genuinely cross-check the
bucketized/window-carry implementations rather than mirroring them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_buckets
from ..sources.batch import load_table
from .registry import register


@register(
    "asof_latest_purchase_before_click",
    oracle="""
    SELECT a.event_id, a.user_id, a.value AS click_value,
           p.event_id AS purchase_event_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN LATERAL (
        SELECT event_id, value
        FROM events b
        WHERE b.event_type = 'purchase' AND b.user_id = a.user_id AND b.ts <= a.ts
        ORDER BY b.ts DESC, b.event_id DESC
        LIMIT 1
    ) p ON TRUE
    """,
)
def asof_latest_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's most recent purchase
    at-or-before it.  One shuffle on user_id (union + window carry-forward)
    vs the oracle's per-row LATERAL scan — same result, cluster-scalable
    plan."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("click_value"),
        F.col("event_id_asof").alias("purchase_event_id"),
        F.col("value_asof").alias("purchase_value"),
    )


@register(
    "range_join_value_bands",
    oracle="""
    WITH bands AS (
        SELECT band_id, band_id * 20.0 AS lo, (band_id + 1) * 20.0 AS hi
        FROM (SELECT unnest(range(17)) AS band_id)
    )
    SELECT e.event_id, b.band_id,
           CAST(b.lo AS DOUBLE) AS band_lo, CAST(b.hi AS DOUBLE) AS band_hi
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join: event values into 20-unit bands.
    Spark side bucketizes to an equi-join + residual predicate — the theta
    join never materializes the cross product; the oracle runs the plain
    theta join."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.range(17).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 20.0).alias("band_lo"),
        ((F.col("id") + 1) * 20.0).alias("band_hi"),
    )
    joined = range_join_buckets(
        events.select("event_id", "value"),
        F.broadcast(bands),
        point_col="value",
        start_col="band_lo",
        end_col="band_hi",
        bucket_width=20.0,
    )
    return joined.select("event_id", "band_id", "band_lo", "band_hi")
