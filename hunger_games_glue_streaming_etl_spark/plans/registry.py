"""Query registry consumed by ``__spark_entry__``.

Every implemented operator category from SURVEY.md §2 registers here: a
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the driver runs through DuckDB as the correctness oracle.

Conventions that keep the oracle comparison exact:

* every computed column is aliased identically in the Spark plan and the SQL;
* double aggregates are rounded (``ROUND(x, 2)``) on both sides so summation
  order can't flip the value-hash;
* DuckDB's HUGEINT ``SUM(int)`` is cast back to BIGINT to match Spark's long;
* raw nanosecond timestamps are never returned directly (Spark truncates to
  microseconds) — queries return ``date_trunc``'d or epoch values instead.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..caching import release_pins

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        # each query releases the PREVIOUS query's pinned intermediates
        # (the caller has materialized that result by now), so cached
        # blocks never accumulate across a 90+-query contract run
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_pins()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
