#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its full physical plan into the no-op sink (plan runs
distributed, nothing funnels to the driver — ``collect`` would measure
driver serialization, not the engine).  A warmup pass absorbs JVM/codegen
startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hunger_games_glue_streaming_etl_spark.plans import QUERIES
from hunger_games_glue_streaming_etl_spark.session import get_spark


def execute_fully(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="hg-spark-bench")

    # warmup: JVM, codegen, parquet footer caches — plus the two lazily
    # initialized paths that otherwise bill their startup to whichever
    # query hits them first: higher-order-function codegen and the
    # Python-worker/Arrow pool (fork + Arrow init costs seconds once)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr(
        "aggregate(sequence(1, 16), 0L, (acc, x) -> acc + x) AS s"
    ).collect()
    spark.range(1_000).selectExpr("id", "cast(id AS double) AS v").mapInPandas(
        lambda it: it, schema="id long, v double"
    ).write.mode("overwrite").format("noop").save()
    # JSON-path codegen JIT: the first query touching get_json_object /
    # from_json / parse_json pays ~2-7 s of Jackson + codegen warmup once
    # per JVM; without this, whichever JSON entry sorts first in the suite
    # bills it (scalar_json_extract read 6× in the r5 driver bench purely
    # from suite position — VERDICT r5 "What's wrong #2")
    spark.range(10_000).selectExpr(
        "id", "concat('{\"a\":', id, ',\"b\":{\"c\":[', id, ']}}') AS js"
    ).selectExpr(
        "sum(cast(get_json_object(js, '$.a') AS bigint)) AS g",
        "sum(from_json(js, 'a bigint, b struct<c: array<bigint>>').a) AS f",
        "sum(cast(variant_get(parse_json(js), '$.b.c[0]', 'bigint') AS bigint)) AS v",
        "sum(length(to_json(named_struct('a', id)))) AS t",
    ).collect()
    execute_fully(QUERIES["flagship_user_status"](spark, sf_dir))

    # BENCH_REPEATS>1 runs the whole suite that many times (suite-level
    # interleaving — every query alternates with every other, so a JIT/GC
    # hiccup can't bill one query twice) and reports per-query MEDIANS.
    # The box drifts ±20-30% run-to-run; medians make round-over-round
    # deltas attributable (BASELINE.md records a repeats=3 reference).
    # Default is 3 (VERDICT r8 #3): a single-sample driver artifact
    # manufactured seventeen phantom >2x movers in round 8 that had to be
    # adjudicated by hand; set BENCH_REPEATS=1 explicitly for a quick pass.
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(repeats):
        for name in sorted(QUERIES):
            start = time.perf_counter()
            execute_fully(QUERIES[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - start)

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    timings = {name: round(median(xs), 3) for name, xs in samples.items()}
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    # Full per-query map goes to a FILE (BENCH_SELF.json): at 200+ entries
    # the one-line JSON exceeds the driver's stdout tail capture, so the
    # driver-recorded artifact truncated mid-JSON and parsed as null
    # (VERDICT r6 "What's wrong #1").  The LAST stdout line is a compact
    # summary (n, sf, total, slowest-10) that always fits and always parses.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": len(timings),
                "repeats": repeats,
                "queries": slowest,
                "full_map": "BENCH_SELF.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
