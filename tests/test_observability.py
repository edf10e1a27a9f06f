"""In-flight metric observation — the engine's observability surface
(the role debug printSchema/prints play in the reference, done the
production way): ``df.observe`` attaches aggregate metrics to a plan
that are collected DURING the action (no second scan), for batch via
``pyspark.sql.Observation`` and for streaming via each progress event's
``observedMetrics``.  At 100 TB a separate metrics pass doubles scan
cost; observed metrics ride the existing exchange for free."""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

from conftest import SF_DIR


def test_batch_observe_rides_the_action(spark):
    orders = load_table(spark, SF_DIR, "orders")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("n_nonpositive"),
        F.max("o_orderkey").alias("max_key"),
    )
    out = observed.filter(F.col("o_orderstatus") == "O").count()
    got = obs.get
    # metrics describe the observed POINT in the plan (pre-filter):
    # full row count, invariant violation count, max key
    assert got["n_rows"] == orders.count()
    assert got["n_nonpositive"] == 0
    assert got["max_key"] == orders.agg(F.max("o_orderkey")).collect()[0][0]
    assert 0 < out < got["n_rows"]


def test_streaming_observe_in_progress_events(spark, tmp_path):
    src = str(tmp_path / "in")
    orders = load_table(spark, SF_DIR, "orders").limit(200)
    orders.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(orders.schema)
        .parquet(src)
        .observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("n_bad"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # observedMetrics appear on the progress of the batch that read rows
        deadline = time.time() + 30
        seen = None
        while time.time() < deadline and seen is None:
            for p in q.recentProgress:
                # StreamingQueryProgress.observedMetrics: dict[name, Row]
                m = p.observedMetrics.get("ingest")
                if m is not None and m["n_rows"] > 0:
                    seen = m
                    break
            if seen is None:
                time.sleep(0.5)
        assert seen is not None, "no observed metrics in any progress event"
        assert seen["n_rows"] == 200
        assert seen["n_bad"] == 0
        assert spark.table("obs_sink").count() == 200
    finally:
        q.stop()
