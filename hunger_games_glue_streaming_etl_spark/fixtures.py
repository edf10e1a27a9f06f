"""Loaders for the reference's own scenario-replay corpus (read-only at
``/root/reference``) — used by the parity tests and the streaming demo.

Corpus shape (SURVEY.md §5): 9 ordered JSON scenario files, 65 events total
(``streamingData/*.json``, each a JSON array), one 16-row CSV dim
(``staticData/s3/tributeData.csv``) and one 1-row config object
(``staticData/dynamo/gameData.json``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import GAME_CONFIG_SCHEMA, TRIBUTE_DIM_SCHEMA, TRIBUTE_EVENT_SCHEMA
from .sources.batch import read_csv, read_json

REFERENCE_DIR = "/root/reference"

# Replay order = logical time (README.md:138-184).
SCENARIO_ORDER = (
    "preCornucopia",
    "postCornucopia",
    "aFewDaysAfterCornucopia",
    "katnissEdgeOfMap",
    "katnissInjured",
    "afterSponsorHelpsKatniss",
    "afterRue",
    "almostTheEnd",
    "theEnd",
)


def reference_available(base: str = REFERENCE_DIR) -> bool:
    return os.path.isdir(os.path.join(base, "streamingData"))


def load_tribute_dim(spark: SparkSession, base: str = REFERENCE_DIR) -> DataFrame:
    return read_csv(
        spark, os.path.join(base, "staticData/s3/tributeData.csv"), schema=TRIBUTE_DIM_SCHEMA
    )


def load_game_config(spark: SparkSession, base: str = REFERENCE_DIR) -> DataFrame:
    return read_json(
        spark,
        os.path.join(base, "staticData/dynamo/gameData.json"),
        schema=GAME_CONFIG_SCHEMA,
        multiline=True,
    )


def load_scenario(spark: SparkSession, name: str, base: str = REFERENCE_DIR) -> DataFrame:
    return read_json(
        spark,
        os.path.join(base, f"streamingData/{name}.json"),
        schema=TRIBUTE_EVENT_SCHEMA,
        multiline=True,
    )
