"""The reference's one continuous query, as composable DataFrame transforms.

Parity targets (all in ``/root/reference/script/TributeStreamingJob.py``):

* two stream-static USING-style equi inner joins — lines 106-107
  (``join(dim, "tributeId").join(game, "gameid")``);
* five CASE-derived status columns — lines 111-135
  (hydration / hunger / pain / alive / location);
* the sink projection + rename + string casts — lines 52-65
  (12 output columns, snake→camel, decimals stringified).

Because the transforms are input-agnostic they run identically on a batch
DataFrame and on a Structured Streaming DataFrame (stream-static join); the
streaming wrapper lives in ``streaming/pipeline.py``.

Scale notes: both dims are broadcast explicitly (16 rows / 1 row in the
reference; any realistic dim ≪ fact) so the continuous query is shuffle-free
— the same zero-shuffle plan shape the reference gets implicitly from tiny
cached dims (SURVEY.md §4 "Partitioning/shuffle" row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_dimensions(events: DataFrame, tribute_dim: DataFrame, game_dim: DataFrame) -> DataFrame:
    """Reference lines 106-107: inner joins on tributeId / gameid.

    Inner semantics intentionally drop events for unknown tributes/games —
    the reference's only (implicit) filter (SURVEY.md §2C).  USING-form join
    dedups the key column, relying on Spark's default case-insensitive
    resolution exactly as the reference does (``tributeId`` vs ``tributeid``,
    SURVEY.md §1.3).
    """
    return events.join(F.broadcast(tribute_dim), "tributeId").join(
        F.broadcast(game_dim), "gameid"
    )


def derive_tribute_status(joined: DataFrame) -> DataFrame:
    """Reference lines 111-135: the five CASE columns, verbatim semantics.

    Casts are explicit (the reference leans on implicit string/decimal
    coercion of its all-string CSV columns, SURVEY.md §1.2).
    """
    hydration = F.col("hydrationlevel")
    min_hyd = F.col("minHydrationThreshold").cast("double")
    hunger = F.col("hungerlevel")
    max_hun = F.col("maxHungerThreshold").cast("double")
    pain = F.col("painlevel")
    max_pain = F.col("maxPainThreshold").cast("double")
    x, y = F.col("xcoordinate"), F.col("ycoordinate")
    max_x = F.col("maxXCoordinate").cast("double")
    max_y = F.col("maxYCoordinate").cast("double")
    min_x = F.col("minXCoordinate").cast("double")
    min_y = F.col("minYCoordinate").cast("double")

    return (
        joined.withColumn(
            "hydrationstatus",
            F.when(hydration < min_hyd, "DEHYDRATED")
            .when((hydration - min_hyd) < 0.5, "APPROACHING DEHYDRATION")
            .otherwise("OK"),
        )
        .withColumn(
            "hungerstatus",
            F.when(hunger > max_hun, "HUNGRY")
            .when((max_hun - hunger) < 0.5, "GETTING HUNGRY")
            .otherwise("OK"),
        )
        .withColumn(
            "painstatus",
            F.when(pain > max_pain, "INJURED").otherwise("OK"),
        )
        .withColumn(
            "status",
            F.when(F.col("heartrate") == 0, "DEAD").otherwise("ALIVE"),
        )
        .withColumn(
            "locationstatus",
            F.when(
                (x > max_x) | (x < min_x) | (y > max_y) | (y < min_y),
                "OUT OF BOUNDS",
            )
            .when(
                ((max_x - x) < 5) | ((max_y - y) < 5) | ((x - min_x) < 5) | ((y - min_y) < 5),
                "APPROACHING THE BOUNDARY",
            )
            .otherwise("IN BOUNDS"),
        )
    )


def tribute_status_output(derived: DataFrame, passthrough: list[str] | None = None) -> DataFrame:
    """Reference lines 52-65: the sink projection.

    12 columns, snake→camel renames (``firstName``→``name``), numeric
    measures cast to string (the reference's ``str(...)`` / DecimalEncoder).
    An explicit select here is also what lets Catalyst prune the scan — the
    reference's whole-row ``foreach`` sink defeats pruning (SURVEY.md §4).
    ``passthrough`` keeps extra columns (e.g. the streaming sequence id the
    keyed upsert orders by).
    """
    extra = [F.col(c) for c in (passthrough or [])]
    return derived.select(
        F.col("tributeid").alias("tributeId"),
        F.col("firstName").alias("name"),
        F.col("district"),
        F.col("age"),
        F.col("status"),
        F.col("heartrate").cast("string").alias("heartRate"),
        F.col("painstatus").alias("painStatus"),
        F.col("hydrationstatus").alias("hydrationStatus"),
        F.col("hungerstatus").alias("hungerStatus"),
        F.col("xcoordinate").cast("string").alias("xCoordinate"),
        F.col("ycoordinate").cast("string").alias("yCoordinate"),
        F.col("locationstatus").alias("locationStatus"),
        *extra,
    )


def tribute_pipeline(events: DataFrame, tribute_dim: DataFrame, game_dim: DataFrame) -> DataFrame:
    """events ⋈ dims → CASE derivations → sink projection (the full query)."""
    return tribute_status_output(derive_tribute_status(join_dimensions(events, tribute_dim, game_dim)))
