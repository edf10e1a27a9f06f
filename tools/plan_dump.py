"""Dump ``explain("formatted")`` for registry entries into a directory.

Optimization-round evidence tool (guide §1.1/§7.2): captures the physical
plan of every BUILDABLE entry (the static set ``plan_audit`` explains —
entries whose construction executes real work are skipped and noted, their
plan claims live in tests/docstrings) so before/after plan diffs can be
committed under ``plans/r{N}/``.

Usage::

    python tools/plan_dump.py OUTDIR [entry ...] [--suffix _before]

With no entry names, dumps every statically-buildable entry.  Each file is
``OUTDIR/<entry><suffix>.txt``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import SKIP_EXECUTING, SKIP_PREFIXES  # noqa: E402


def formatted_plan(spark, df) -> str:
    qe = df._jdf.queryExecution()
    return spark._jvm.PythonSQLUtils.explainString(qe, "formatted")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    outdir, names = args[0], args[1:]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    import hunger_games_glue_streaming_etl_spark.plans as plans
    from hunger_games_glue_streaming_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    targets = names or sorted(plans.QUERIES)
    dumped, skipped = [], []
    for name in targets:
        if not names and (
            name.startswith(SKIP_PREFIXES) or name in SKIP_EXECUTING
        ):
            skipped.append(name)
            continue
        df = plans.QUERIES[name](spark, sf_dir)
        txt = formatted_plan(spark, df)
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(txt)
        dumped.append(name)
    print(f"dumped: {len(dumped)}  skipped (construction executes): {len(skipped)}")
    for s in skipped:
        print("SKIP:", s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
