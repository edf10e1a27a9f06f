"""Isolated-warm A/B timer for named registry entries (optimization
rounds, guide §1): same session/warmup/noop-sink methodology as bench.py,
but only the named entries, interleaved round-robin for ``--reps``
rounds (A/B/A/B — a JIT or GC hiccup can't bill one entry twice), and
per-entry MEDIANS printed as one JSON line.

Usage::

    python tools/ab_bench.py entry1 entry2 [--reps 5] [--sf DIR]

Rank alternatives with this; accept/revert on the full-suite medians
(CLAUDE.md round-3 rule).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunger_games_glue_streaming_etl_spark.plans import QUERIES  # noqa: E402
from hunger_games_glue_streaming_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="hg-ab-bench")
    # the same lazily-initialized-path warmups bench.py runs
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr(
        "aggregate(sequence(1, 16), 0L, (acc, x) -> acc + x) AS s"
    ).collect()
    spark.range(1_000).selectExpr("id", "cast(id AS double) AS v").mapInPandas(
        lambda it: it, schema="id long, v double"
    ).write.mode("overwrite").format("noop").save()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.reps):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)

    def med(xs: list[float]) -> float:
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

    print(
        json.dumps(
            {
                "sf": args.sf,
                "reps": args.reps,
                "medians": {n: round(med(v), 3) for n, v in samples.items()},
                "all": {n: [round(x, 3) for x in v] for n, v in samples.items()},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
