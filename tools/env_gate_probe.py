#!/usr/bin/env python
"""Round-start environment-gate probe (VERDICT r10 next #8).

Three registry surfaces are env-gated because their dependency is absent
in this image: Avro round-trip (external spark-avro jar), the protobuf
message-bus + ``transformWithStateInPandas`` entries (google.protobuf in
the Python workers), and Delta ``MERGE`` (delta-spark).  This probe
prints the live gate states as ONE JSON line and appends it to
PROGRESS.jsonl so a quietly appearing dependency flips the full entries
on the same round instead of rotting behind a stale gate.

Session-free and cheap (<1 s): the gates are filesystem / import probes
by design (the r9 lesson — ``import pyspark.sql.avro.functions`` succeeds
even when the jar is absent, so only the jar glob is a valid Avro gate).

Usage: python tools/env_gate_probe.py [--no-progress]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe() -> dict:
    from hunger_games_glue_streaming_etl_spark.plans.sources_sql import (
        _avro_runtime_available,
    )
    from hunger_games_glue_streaming_etl_spark.sinks.delta import delta_available

    try:
        import google.protobuf.descriptor  # noqa: F401

        protobuf = True
    except Exception:
        protobuf = False

    return {
        "ts": time.time(),
        "probe": "env_gates",
        "avro_jar": bool(_avro_runtime_available()),
        "protobuf": protobuf,
        "delta_spark": bool(delta_available()),
    }


def main() -> None:
    rec = probe()
    line = json.dumps(rec)
    print(line)
    if "--no-progress" not in sys.argv:
        with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
            f.write(line + "\n")
    gated_off = [k for k in ("avro_jar", "protobuf", "delta_spark") if not rec[k]]
    if gated_off:
        print(
            f"# gated OFF (entries degrade per their documented seams): "
            f"{', '.join(gated_off)}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
