#!/usr/bin/env python
"""Full-registry execution sweep at a scaled fixture (VERDICT r12 next #5
— the r11 20× 240/240-clean artifact, one notch up): run EVERY registry
entry once against the scaled dir into the noop sink, recording wall and
any error class (ANSI overflow / codegen / AQE / OOM all surface here,
per the r6 lesson that sf0.01-green bounds nothing above bench scale).

Skips (printed, never silent — the no-silent-caps rule):
  * the documented exact O(n²) baselines (at 50× = 10B candidate pairs);
  * the by-design output-bound derived-cap screen family (recovered
    replica families are k² mutual pairs by construction — measured and
    adjudicated at 20×, BASELINE.md round-12).

Usage: python tools/full_registry_sweep.py /tmp/hg_scale_sf50 [--skip name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.plans import QUERIES
from hunger_games_glue_streaming_etl_spark.session import get_spark

DEFAULT_SKIPS = {
    # exact O(n²) pair baselines: quadratic by definition, measured through
    # 20× (570 s / 354 s); 100k vectors = 10B candidate pairs at 50×
    "dedup_embedding_cosine_pairs",
    "sim_embedding_pairs_blas",
    # output-bound by design: recovered replica families are k² mutual
    # pairs (20× = 296 s for 1.05M pairs); the output-budgeted sibling
    # dedup_family_canonical_pairs runs INSTEAD and is NOT skipped — its
    # point is surviving exactly this notch
    "dedup_ngram_jaccard_derived_cap",
    # output-quadratic AT THE REPLICA FIXTURE by construction (round-13
    # numpy census): the scale fixture's dim-0 shifts (i·0.173, up to
    # +8.65 at 50×) inflate vector norms ~8×, so 95.4% of ALL pairs pass
    # the unnormalized dot ≥ 0.35 threshold — ~4.8B TRUE pairs at 100k
    # vectors (0.2% / 4.1k pairs on base sf0.1).  No screen can beat its
    # own output; LSH bucket candidates measured 2.8B (max bucket 30.5k),
    # and neither more planes (20 planes → 1.9B) nor mean-centering
    # (1.0B) changes the quadratic truth.  Same calibrated-fixture class
    # as the ANN recall notes in tools/scale_bench.py.
    "dedup_embedding_lsh_pairs",
    # the centered-bucket sibling cuts CANDIDATES ~3× (census: 2.8B →
    # 1.0B) but the fixture's TRUE output is quadratic either way —
    # measured 148 s at 20× (5 s at sf0.1), the output-bound class
    "dedup_embedding_lsh_pairs_centered",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scaled_dir")
    ap.add_argument("--skip", action="append", default=[])
    ap.add_argument("--only", action="append", default=[])
    args = ap.parse_args()
    skips = DEFAULT_SKIPS | set(args.skip)

    spark = get_spark(app_name="hg-full-registry-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    names = [n for n in QUERIES if not args.only or n in args.only]
    results, errors = {}, {}
    for name in names:
        if name in skips:
            print(json.dumps({"entry": name, "skipped": True}), flush=True)
            continue
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, args.scaled_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = round(time.perf_counter() - t0, 2)
            results[name] = wall
            print(json.dumps({"entry": name, "wall_s": wall}), flush=True)
        except Exception as e:  # noqa: BLE001 — the sweep's whole job is to record these
            wall = round(time.perf_counter() - t0, 2)
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(
                json.dumps({"entry": name, "wall_s": wall, "ERROR": errors[name]}),
                flush=True,
            )
            traceback.print_exc(limit=3)
    print(
        json.dumps(
            {
                "metric": "full_registry_sweep",
                "scaled_dir": args.scaled_dir,
                "ran": len(results),
                "clean": len(results),
                "errors": errors,
                "skipped": sorted(skips & set(names)),
                "total_s": round(sum(results.values()), 1),
                "slowest": dict(
                    sorted(results.items(), key=lambda kv: -kv[1])[:12]
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
