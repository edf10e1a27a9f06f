"""The reference's own query, registered in the driver contract.

Runs the full tribute-status pipeline (2 broadcast dim joins + 5 CASE
derivations + sink projection — ``script/TributeStreamingJob.py:106-135,
52-65``) over the reference's complete 65-event scenario corpus and reduces
it with the set-oriented latest-per-key operator (the deterministic form of
the reference's DynamoDB last-writer-wins sink, A8).

Hash-checked since round 2: the corpus lives outside the driver's oracle
VIEWS, but DuckDB reads the same reference files directly (read_json /
read_csv on absolute paths), so the oracle replays the identical pipeline —
scenario order, intra-scenario event sequence, joins, all five CASE rules,
last-writer-wins, and the stringified sink projection.  Exact golden-outcome
parity is additionally asserted in ``tests/test_tribute_batch.py`` and the
streaming replay e2e.
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


_EVENT_COLS = (
    "{'streamingeventid':'VARCHAR','gameid':'VARCHAR','tributeid':'VARCHAR',"
    "'heartrate':'DOUBLE','painlevel':'DOUBLE','hydrationlevel':'DOUBLE',"
    "'hungerlevel':'DOUBLE','xcoordinate':'DOUBLE','ycoordinate':'DOUBLE'}"
)

_REF = "/root/reference"

_EV_UNION = "\n        UNION ALL\n".join(
    f"""        SELECT *, {i} AS scen
        FROM read_json('{_REF}/streamingData/{name}.json',
                       format='array', columns={_EVENT_COLS})"""
    for i, name in enumerate(SCENARIO_ORDER)
)

_CORPUS_ORACLE = f"""
    WITH ev AS (
{_EV_UNION}
    ),
    ev2 AS (
        SELECT *, CAST(regexp_extract(streamingeventid, '(\\d+)$', 1) AS INT) AS eseq
        FROM ev
    ),
    trib AS (
        SELECT CAST(tributeId AS VARCHAR) AS tid, district, firstName, age,
               minHydrationThreshold, maxHungerThreshold, maxPainThreshold
        FROM read_csv('{_REF}/staticData/s3/tributeData.csv', header=true)
    ),
    game AS (SELECT * FROM read_json('{_REF}/staticData/dynamo/gameData.json')),
    d AS (
        SELECT e.tributeid, e.scen, e.eseq, e.heartrate,
               e.xcoordinate, e.ycoordinate,
               t.firstName, t.district, t.age,
               CASE WHEN e.hydrationlevel < t.minHydrationThreshold THEN 'DEHYDRATED'
                    WHEN (e.hydrationlevel - t.minHydrationThreshold) < 0.5 THEN 'APPROACHING DEHYDRATION'
                    ELSE 'OK' END AS hydrationstatus,
               CASE WHEN e.hungerlevel > t.maxHungerThreshold THEN 'HUNGRY'
                    WHEN (t.maxHungerThreshold - e.hungerlevel) < 0.5 THEN 'GETTING HUNGRY'
                    ELSE 'OK' END AS hungerstatus,
               CASE WHEN e.painlevel > t.maxPainThreshold THEN 'INJURED' ELSE 'OK' END AS painstatus,
               CASE WHEN e.heartrate = 0 THEN 'DEAD' ELSE 'ALIVE' END AS status,
               CASE WHEN e.xcoordinate > g.maxXCoordinate OR e.xcoordinate < g.minXCoordinate
                      OR e.ycoordinate > g.maxYCoordinate OR e.ycoordinate < g.minYCoordinate
                    THEN 'OUT OF BOUNDS'
                    WHEN (g.maxXCoordinate - e.xcoordinate) < 5 OR (g.maxYCoordinate - e.ycoordinate) < 5
                      OR (e.xcoordinate - g.minXCoordinate) < 5 OR (e.ycoordinate - g.minYCoordinate) < 5
                    THEN 'APPROACHING THE BOUNDARY'
                    ELSE 'IN BOUNDS' END AS locationstatus
        FROM ev2 e
        JOIN trib t ON e.tributeid = t.tid
        JOIN game g ON e.gameid = g.gameid
    ),
    latest AS (
        SELECT *, row_number() OVER (PARTITION BY tributeid ORDER BY scen DESC, eseq DESC) AS rn
        FROM d
    )
    SELECT tributeid AS tributeId, firstName AS name,
           CAST(district AS INT) AS district, CAST(age AS INT) AS age, status,
           CAST(heartrate AS VARCHAR) AS heartRate,
           painstatus AS painStatus, hydrationstatus AS hydrationStatus,
           hungerstatus AS hungerStatus,
           CAST(xcoordinate AS VARCHAR) AS xCoordinate,
           CAST(ycoordinate AS VARCHAR) AS yCoordinate,
           locationstatus AS locationStatus
    FROM latest WHERE rn = 1
"""


@register("tribute_status_reference_corpus", oracle=_CORPUS_ORACLE)
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
