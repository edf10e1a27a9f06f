#!/usr/bin/env python
"""End-to-end streaming throughput for the tribute-status pipeline.

Generates N synthetic tribute events (same 9-column shape as the reference's
Kinesis payload), streams them through the full continuous query — stream →
2 broadcast dim joins → 5 CASE derivations → foreachBatch dual sink (keyed
parquet upsert + JSON archive) — and reports events/sec.

Reference context (BASELINE.md): the original pipeline's end-to-end ceiling
is its provisioned DynamoDB sink — 5 writes/sec — with a 1,000 records/sec
Kinesis shard in front.  The set-oriented sink removes that bound entirely.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.fixtures import (
    load_game_config,
    load_tribute_dim,
    reference_available,
)
from hunger_games_glue_streaming_etl_spark.session import get_spark
from hunger_games_glue_streaming_etl_spark.streaming import start_tribute_stream


def generate_events(
    path: str, n_events: int, n_files: int, start_file: int = 0, start_seq: int = 0
) -> int:
    """Write events as JSONL files and return the count ACTUALLY written
    (n_files * (n_events // n_files) — integer division drops a remainder,
    so callers must not assume n_events; ADVICE r11 #3).  Each file is
    written to a dot-prefixed temp name and os.rename'd into place: a live
    file-source query polling this directory can otherwise list and read a
    partially-written file once and never re-read it, silently dropping
    events (dot-prefixed files are hidden to Spark's file source; rename
    within one dir is atomic)."""
    rng = random.Random(42 + start_seq)
    per_file = n_events // n_files
    seq = start_seq
    for f in range(start_file, start_file + n_files):
        final = os.path.join(path, f"gen_{f:04d}.json")
        tmp = os.path.join(path, f".gen_{f:04d}.json.tmp")
        with open(tmp, "w") as out:
            for _ in range(per_file):
                e = {
                    "streamingeventid": f"gen{seq}",
                    "gameid": "gameId1",
                    "tributeid": str(rng.randint(1, 16)),
                    "heartrate": float(rng.choice([0] + [60 + i for i in range(120)])),
                    "painlevel": round(rng.uniform(0, 10), 2),
                    "hydrationlevel": round(rng.uniform(0, 10), 2),
                    "hungerlevel": round(rng.uniform(0, 10), 2),
                    "xcoordinate": round(rng.uniform(-5, 105), 2),
                    "ycoordinate": round(rng.uniform(-5, 105), 2),
                    "seq": seq,
                }
                out.write(json.dumps(e) + "\n")
                seq += 1
        os.rename(tmp, final)
    return n_files * per_file


def generate_funnel_events(path: str, n_events: int, n_files: int, n_users: int) -> None:
    """Synthetic funnel feed: per-user event sequences over the four step
    types, time-ordered within each file (the state machine's contract)."""
    rng = random.Random(7)
    per_file = n_events // n_files
    types = ["signup", "view", "click", "purchase", "scroll", "hover"]
    base_us = 1_700_000_000_000_000
    seq = 0
    for f in range(n_files):
        with open(os.path.join(path, f"ev_{f:04d}.json"), "w") as out:
            for _ in range(per_file):
                ts_us = base_us + seq * 1_000_000
                e = {
                    "event_id": seq,
                    "ts": time.strftime(
                        "%Y-%m-%dT%H:%M:%S", time.gmtime(ts_us // 1_000_000)
                    )
                    + ".000000Z",
                    "user_id": rng.randrange(n_users),
                    "event_type": rng.choice(types),
                    "value": round(rng.uniform(0, 100), 3),
                    "props": "{}",
                }
                out.write(json.dumps(e) + "\n")
                seq += 1


def run_funnel_state_throughput(spark, base: str) -> dict:
    """Drive the applyInPandasWithState per-user funnel machine end to end
    (VERDICT r4 #7): events/sec through the stateful tier, alongside the
    stateless tribute number — state-store commit cost included."""
    from hunger_games_glue_streaming_etl_spark.schemas import EVENTS_SCHEMA
    from hunger_games_glue_streaming_etl_spark.streaming.ops import funnel_user_state

    n_events = int(os.environ.get("N_FUNNEL_EVENTS", "100000"))
    n_files = int(os.environ.get("N_FUNNEL_FILES", "10"))
    n_users = int(os.environ.get("N_FUNNEL_USERS", "5000"))
    events_dir = os.path.join(base, "funnel_events")
    os.makedirs(events_dir)
    generate_funnel_events(events_dir, n_events, n_files, n_users)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(events_dir)
    )
    counts = {"rows": 0}

    def sink(df, _epoch):
        counts["rows"] += df.count()

    query = (
        funnel_user_state(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "funnel_ckpt"))
        .start()
    )
    start = time.perf_counter()
    query.processAllAvailable()
    elapsed = time.perf_counter() - start
    query.stop()
    return {
        "metric": "funnel_state_events_per_sec",
        "value": round(n_events / elapsed, 1),
        "unit": "events/sec",
        "events": n_events,
        "micro_batches": n_files,
        "state_users": n_users,
        "elapsed_sec": round(elapsed, 2),
        "emitted_rows": counts["rows"],
    }


def run_soak_with_deletes(spark, base: str) -> dict:
    """Streaming soak with the compliance path active (VERDICT r10 next #7):
    the reference's A8 last-writer-wins keyed sink composed with targeted
    GDPR-style ``delete_keys`` epochs, interleaved into the LIVE tribute
    pipeline.  Events arrive in waves against one running query/checkpoint;
    between waves (query live, micro-batches drained) a delete epoch
    removes a rotating pair of tributeIds and the store is immediately
    re-read to assert the keys are gone.  Reports events/sec over the
    wave-processing time (deletes excluded — they're the separately-timed
    metric) plus per-delete latency.

    Deletes run between micro-batch groups, not concurrently with one:
    upsert and delete on one keyed store are serialized by contract (the
    store's exactly-once epoch gate assumes a single writer at a time) —
    the soak exercises interleaving at epoch granularity, which is the
    real deployment shape (a compliance job running beside a live stream
    targets batch boundaries, never mid-write)."""
    from pyspark.sql import functions as F

    n_events = int(os.environ.get("N_SOAK_EVENTS", "100000"))
    n_waves = int(os.environ.get("N_SOAK_WAVES", "4"))
    files_per_wave = int(os.environ.get("N_SOAK_FILES_PER_WAVE", "3"))
    per_wave = n_events // n_waves

    events_dir = os.path.join(base, "soak_events")
    os.makedirs(events_dir)
    total_written = generate_events(events_dir, per_wave, files_per_wave)

    query, latest = start_tribute_stream(
        spark,
        events_dir,
        load_tribute_dim(spark),
        load_game_config(spark),
        os.path.join(base, "soak_latest"),
        os.path.join(base, "soak_archive"),
        os.path.join(base, "soak_checkpoint"),
        max_files_per_trigger=1,
    )
    stream_elapsed = 0.0
    delete_lat = []
    deleted_each_wave_gone = True
    doomed_present_before_each_epoch = True
    for wave in range(n_waves):
        if wave > 0:
            total_written += generate_events(
                events_dir,
                per_wave,
                files_per_wave,
                start_file=wave * files_per_wave,
                start_seq=wave * per_wave,
            )
        t0 = time.perf_counter()
        query.processAllAvailable()
        stream_elapsed += time.perf_counter() - t0

        # compliance epoch: erase a rotating pair of tribute keys from the
        # keyed store while the query stays live
        doomed = [str(1 + (2 * wave) % 16), str(2 + (2 * wave) % 16)]
        keys_df = spark.createDataFrame(
            [(k,) for k in doomed], "tributeId string"
        )
        # presence-before-delete (ADVICE r11 #4): the absence assertion is
        # vacuous if the doomed keys were never upserted — near-certain
        # present with 25k events over 16 ids per wave, so a 0 here is a
        # real soak defect, not noise.
        if latest.read().filter(F.col("tributeId").isin(doomed)).count() == 0:
            doomed_present_before_each_epoch = False
        t0 = time.perf_counter()
        latest.delete_keys(keys_df)
        delete_lat.append(time.perf_counter() - t0)
        still_there = (
            latest.read().filter(F.col("tributeId").isin(doomed)).count()
        )
        if still_there:
            deleted_each_wave_gone = False
    query.stop()

    total = total_written
    keyed = latest.read().count()
    delete_lat.sort()
    return {
        "metric": "tribute_soak_with_deletes_events_per_sec",
        "value": round(total / stream_elapsed, 1),
        "unit": "events/sec",
        "events": total,
        "waves": n_waves,
        "delete_epochs": n_waves,
        "delete_latency_median_sec": round(delete_lat[len(delete_lat) // 2], 3),
        "delete_latency_max_sec": round(delete_lat[-1], 3),
        "doomed_keys_present_before_each_epoch": doomed_present_before_each_epoch,
        "deleted_keys_absent_after_each_epoch": deleted_each_wave_gone,
        "final_keyed_rows": keyed,
    }


def main() -> None:
    n_events = int(os.environ.get("N_EVENTS", "100000"))
    n_files = int(os.environ.get("N_FILES", "10"))
    if not reference_available():
        print(json.dumps({"error": "reference dims unavailable"}))
        return
    spark = get_spark(app_name="hg-stream-throughput")
    base = tempfile.mkdtemp()
    events_dir = os.path.join(base, "events")
    os.makedirs(events_dir)
    generate_events(events_dir, n_events, n_files)

    query, latest = start_tribute_stream(
        spark,
        events_dir,
        load_tribute_dim(spark),
        load_game_config(spark),
        os.path.join(base, "latest"),
        os.path.join(base, "archive"),
        os.path.join(base, "checkpoint"),
        max_files_per_trigger=1,  # n_files micro-batches
    )
    start = time.perf_counter()
    query.processAllAvailable()
    elapsed = time.perf_counter() - start
    query.stop()

    archived = spark.read.json(os.path.join(base, "archive")).count()
    keyed = latest.read().count()
    print(
        json.dumps(
            {
                "metric": "tribute_pipeline_events_per_sec",
                "value": round(archived / elapsed, 1),
                "unit": "events/sec",
                "events": archived,
                "micro_batches": n_files,
                "elapsed_sec": round(elapsed, 2),
                "keyed_rows": keyed,
                "reference_ceiling_events_per_sec": 5,
            }
        )
    )
    print(json.dumps(run_funnel_state_throughput(spark, base)))
    print(json.dumps(run_soak_with_deletes(spark, base)))
    spark.stop()
    shutil.rmtree(base)


if __name__ == "__main__":
    main()
