"""The reference's own query, registered in the driver contract.

Runs the full tribute-status pipeline (2 broadcast dim joins + 5 CASE
derivations + sink projection — ``script/TributeStreamingJob.py:106-135,
52-65``) over the reference's complete 65-event scenario corpus and reduces
it with the set-oriented latest-per-key operator (the deterministic form of
the reference's DynamoDB last-writer-wins sink, A8).

Rows-only check: the corpus lives outside the driver's oracle tables.  Exact
golden-outcome parity (deaths, injuries, boundary states per scenario) is
asserted in ``tests/test_tribute_batch.py`` and the streaming replay e2e.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import (
    SCENARIO_ORDER,
    load_game_config,
    load_scenario,
    load_tribute_dim,
    reference_available,
)
from ..operators.relational import latest_per_key
from ..operators.tribute import derive_tribute_status, join_dimensions, tribute_status_output
from .registry import register


@register("tribute_status_reference_corpus")
def tribute_status_reference_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final tribute-status table after replaying all 9 scenarios in story
    order — the reference's end state (tributes 8 and 9 ALIVE, all others
    DEAD)."""
    if not reference_available():
        return spark.createDataFrame([], "tributeId string, status string")
    scenarios = [
        load_scenario(spark, name).withColumn("__scenario_seq", F.lit(i))
        for i, name in enumerate(SCENARIO_ORDER)
    ]
    events = scenarios[0]
    for s in scenarios[1:]:
        events = events.unionByName(s)
    derived = derive_tribute_status(
        join_dimensions(events, load_tribute_dim(spark), load_game_config(spark))
    )
    # intra-scenario order = the numeric event suffix ("...Event12" → 12);
    # the raw id is lexicographic (Event10 < Event2) and would misorder
    with_seq = derived.withColumn(
        "__event_seq",
        F.regexp_extract("streamingeventid", r"(\d+)$", 1).cast("int"),
    )
    latest = latest_per_key(with_seq, "tributeId", ["__scenario_seq", "__event_seq"])
    return tribute_status_output(latest)
