"""Reference-parity tests for the tribute-status query (batch form, M0).

Golden expectations come from the reference's documented scenario outcomes
(README.md:143-184, FIXTURES.md §A4): after postCornucopia tributes
10,11,13,14,16 are DEAD and 7 is INJURED; after katnissEdgeOfMap tribute 9
is OUT OF BOUNDS (y=100.8 > maxY=100); after theEnd only 8,9 remain ALIVE.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.fixtures import (
    load_game_config,
    load_scenario,
    load_tribute_dim,
    reference_available,
)
from hunger_games_glue_streaming_etl_spark.operators.tribute import tribute_pipeline

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference corpus not present"
)


def _status_map(spark, scenario):
    events = load_scenario(spark, scenario)
    out = tribute_pipeline(events, load_tribute_dim(spark), load_game_config(spark))
    rows = out.collect()
    return {r["tributeId"]: r.asDict() for r in rows}


def test_output_schema(spark):
    events = load_scenario(spark, "preCornucopia")
    out = tribute_pipeline(events, load_tribute_dim(spark), load_game_config(spark))
    assert out.columns == [
        "tributeId",
        "name",
        "district",
        "age",
        "status",
        "heartRate",
        "painStatus",
        "hydrationStatus",
        "hungerStatus",
        "xCoordinate",
        "yCoordinate",
        "locationStatus",
    ]


def test_pre_cornucopia_all_alive(spark):
    statuses = _status_map(spark, "preCornucopia")
    assert len(statuses) == 16
    assert all(v["status"] == "ALIVE" for v in statuses.values())
    assert all(v["locationStatus"] == "IN BOUNDS" for v in statuses.values())


def test_post_cornucopia_deaths_and_injury(spark):
    statuses = _status_map(spark, "postCornucopia")
    dead = {k for k, v in statuses.items() if v["status"] == "DEAD"}
    assert dead == {"10", "11", "13", "14", "16"}
    assert statuses["7"]["painStatus"] == "INJURED"  # Rue: pain 8 > threshold 5
    assert statuses["1"]["status"] == "ALIVE"


def test_katniss_out_of_bounds(spark):
    statuses = _status_map(spark, "katnissEdgeOfMap")
    assert statuses["9"]["locationStatus"] == "OUT OF BOUNDS"  # y=100.8 > 100


def test_the_end_survivors(spark):
    statuses = _status_map(spark, "theEnd")
    alive = {k for k, v in statuses.items() if v["status"] == "ALIVE"}
    assert alive == {"8", "9"}


def test_inner_join_drops_unknown_tribute(spark):
    """The reference's only filter is implicit inner-join drop (SURVEY.md
    §2C): events for tribute ids absent from the dim disappear."""
    events = load_scenario(spark, "preCornucopia").withColumn(
        "tributeid", F.concat(F.lit("x"), F.col("tributeid"))
    )
    out = tribute_pipeline(events, load_tribute_dim(spark), load_game_config(spark))
    assert out.count() == 0
