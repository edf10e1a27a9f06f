"""Plan-regression guards: the physical plans the engine promises (broadcast
dim joins, parquet filter pushdown, column pruning, partial aggregation,
top-k without a global sort) must actually appear in the executed plans.
A correct-but-shuffling plan is a performance bug at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.operators.relational import salted_join
from hunger_games_glue_streaming_etl_spark.plans import QUERIES

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_broadcasts_both_dims(spark):
    plan = _plan(QUERIES["flagship_user_status"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(QUERIES["filter_project"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThan" in plan
    # column pruning: only the needed columns in ReadSchema
    assert "l_comment" not in plan


def test_scan_prunes_columns(spark):
    plan = _plan(QUERIES["flagship_user_status"](spark, SF_DIR))
    # events has 6 columns; the flagship needs only user_id + value
    read = [l for l in plan.splitlines() if "events.parquet" in l]
    assert read and "user_id" in read[0] and "props" not in read[0]


def test_aggregate_is_partial_then_final(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_topk_avoids_global_sort(spark):
    plan = _plan(QUERIES["sort_limit_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_salted_join_correct_and_spreads_keys(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(2, i) for i in range(10)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "name"])
    out = salted_join(fact, dim, "k", "k", salt_buckets=8)
    rows = out.groupBy("name").count().collect()
    counts = {r["name"]: r["count"] for r in rows}
    assert counts == {"hot": 1000, "cold": 10}  # join result identical to plain join
