"""M1 e2e: the reference's 9-scenario replay through the real Structured
Streaming pipeline (file source → stream-static joins → CASE derivations →
foreachBatch dual sink), asserting the keyed "latest" table after key
scenarios against the reference's documented golden outcomes
(README.md:143-184; machine-checkable replacement for its screenshots —
SURVEY.md §5).
"""

from __future__ import annotations

import json
import os

import pytest

from hunger_games_glue_streaming_etl_spark.fixtures import (
    REFERENCE_DIR,
    SCENARIO_ORDER,
    load_game_config,
    load_tribute_dim,
    reference_available,
)
from hunger_games_glue_streaming_etl_spark.streaming import start_tribute_stream

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference corpus not present"
)


def _stage_scenario(events_dir: str, name: str, seq_start: int) -> int:
    """Write one scenario file as JSON-lines with explicit seq (arrival
    order within the file = in-file order, reference README.md:138-141)."""
    with open(os.path.join(REFERENCE_DIR, f"streamingData/{name}.json")) as f:
        events = json.load(f)
    seq = seq_start
    out = os.path.join(events_dir, f"{seq_start:06d}_{name}.json")
    with open(out, "w") as f:
        for e in events:
            e["seq"] = seq
            f.write(json.dumps(e) + "\n")
            seq += 1
    return seq


def test_scenario_replay(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    latest_path = str(tmp_path / "latest")
    archive_path = str(tmp_path / "archive")
    checkpoint = str(tmp_path / "checkpoint")

    query, latest = start_tribute_stream(
        spark,
        events_dir,
        load_tribute_dim(spark),
        load_game_config(spark),
        latest_path,
        archive_path,
        checkpoint,
    )
    try:
        seq = 0

        def replay_through(*names):
            nonlocal seq
            for name in names:
                seq = _stage_scenario(events_dir, name, seq)
            query.processAllAvailable()
            rows = latest.read().collect()
            return {r["tributeId"]: r.asDict() for r in rows}

        st = replay_through("preCornucopia")
        assert len(st) == 16
        assert all(v["status"] == "ALIVE" for v in st.values())

        st = replay_through("postCornucopia")
        dead = {k for k, v in st.items() if v["status"] == "DEAD"}
        assert dead == {"10", "11", "13", "14", "16"}
        assert st["7"]["painStatus"] == "INJURED"

        st = replay_through("aFewDaysAfterCornucopia", "katnissEdgeOfMap")
        assert st["9"]["locationStatus"] == "OUT OF BOUNDS"
        # earlier deaths persist across scenarios (keyed latest-state table)
        assert st["10"]["status"] == "DEAD"

        st = replay_through("katnissInjured")
        assert st["9"]["painStatus"] == "INJURED"

        st = replay_through("afterSponsorHelpsKatniss")
        assert st["9"]["painStatus"] == "OK"  # recovery: INJURED → OK

        st = replay_through("afterRue", "almostTheEnd", "theEnd")
        alive = {k for k, v in st.items() if v["status"] == "ALIVE"}
        assert alive == {"8", "9"}
        assert len(st) == 16

        # archive holds every event exactly once (65 across the corpus)
        archive = spark.read.json(archive_path)
        assert archive.count() == 65
        assert archive.select("streamingeventid").distinct().count() == 65
    finally:
        query.stop()


def test_replay_order_equals_scenario_order():
    assert SCENARIO_ORDER[0] == "preCornucopia" and SCENARIO_ORDER[-1] == "theEnd"


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Stop mid-corpus, restart from the same checkpoint, continue: the
    archive must not re-ingest processed batches (exactly-once file-source
    accounting via the checkpoint WAL)."""
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    paths = [str(tmp_path / d) for d in ("latest", "archive", "checkpoint")]

    def start():
        return start_tribute_stream(
            spark, events_dir, load_tribute_dim(spark), load_game_config(spark), *paths
        )

    query, latest = start()
    seq = _stage_scenario(events_dir, "preCornucopia", 0)
    query.processAllAvailable()
    query.stop()

    query, latest = start()
    _stage_scenario(events_dir, "postCornucopia", seq)
    query.processAllAvailable()
    try:
        archive = spark.read.json(str(tmp_path / "archive"))
        assert archive.count() == 32  # 16 + 16, nothing duplicated by restart
        st = {r["tributeId"]: r["status"] for r in latest.read().collect()}
        assert sum(1 for v in st.values() if v == "DEAD") == 5
    finally:
        query.stop()
