"""End-to-end CDC consumer: the exactly-once changelog emitted by
ParquetLatestSink (track_changes=True) drives an incremental SCD2 dimension
— the standard "latest view + full history" pair a warehouse keeps for one
keyed stream (reference A8 materializes only the latest; A9 keeps raw
events; SCD2 is the queryable middle).  Checks that per-epoch incremental
application of the changelog reproduces exactly the dimension you'd get
from applying all updates at once, and that `touch` ops (crash replays /
duplicate delivery) are idempotent no-ops for the consumer."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.operators.scd import scd2_apply
from hunger_games_glue_streaming_etl_spark.sinks.upsert import ParquetLatestSink

SCHEMA = "k string, seq long, v string"
DIM_SCHEMA = (
    "k string, v string, valid_from long, valid_to long, is_current boolean"
)


def _empty_dim(spark):
    return spark.createDataFrame([], DIM_SCHEMA)


def _apply_epoch(spark, dim, changes_epoch):
    """One CDC consumer step: insert/update ops become SCD2 updates with
    effective_ts = seq; touch ops are idempotent replays — skipped."""
    updates = changes_epoch.filter(F.col("__change_op") != "touch").select(
        "k", "v", F.col("seq").alias("effective_ts")
    )
    if not updates.head(1):
        return dim
    return scd2_apply(dim, updates, keys="k", tracked_cols=["v"])


def test_cdc_changelog_drives_incremental_scd2(spark, tmp_path):
    sink = ParquetLatestSink(
        spark, str(tmp_path / "view"), keys="k", seq_cols="seq", track_changes=True
    )
    epochs = [
        [("a", 1, "a1"), ("b", 1, "b1")],          # inserts
        [("a", 5, "a5"), ("c", 7, "c1")],          # update a, insert c
        [("a", 9, "a1"), ("b", 0, "stale")],       # revert a to a1; stale b
    ]
    for i, rows in enumerate(epochs):
        sink(spark.createDataFrame(rows, SCHEMA), i)
    # crash replay of the last epoch — consumer must see only touch ops
    import os
    os.remove(os.path.join(str(tmp_path / "view"), "_last_epoch"))
    sink(spark.createDataFrame(epochs[-1], SCHEMA), 2)

    changes = sink.read_changes().persist()
    # the crash replay must NOT have rewritten epoch 2's committed diff:
    # the original ops survive (a's revert is an update; stale b excluded)
    ch2 = {(r["k"], r["__change_op"]) for r in changes.filter("epoch = 2").collect()}
    assert ch2 == {("a", "update")}

    # incremental consumer: apply epochs in order
    dim = _empty_dim(spark)
    for e in sorted(r["epoch"] for r in changes.select("epoch").distinct().collect()):
        dim = _apply_epoch(spark, dim, changes.filter(F.col("epoch") == e))
    dim = dim.persist()

    # the latest view and the SCD2 current rows must agree exactly
    view = {r["k"]: r["v"] for r in sink.read().collect()}
    cur = {r["k"]: r["v"] for r in dim.filter("is_current").collect()}
    assert view == {"a": "a1", "b": "b1", "c": "c1"}
    assert cur == view
    # and key a carries its full three-version history
    assert dim.filter("k = 'a'").count() == 3
    changes.unpersist()
    dim.unpersist()


def test_cdc_consumer_converges_with_reference_dimension(spark, tmp_path):
    """Without crash replays, incremental per-epoch SCD2 application must
    equal applying the same winning updates at once (same version chains,
    same open rows)."""
    sink = ParquetLatestSink(
        spark, str(tmp_path / "view"), keys="k", seq_cols="seq", track_changes=True
    )
    epochs = [
        [("a", 1, "a1"), ("b", 1, "b1")],
        [("a", 5, "a5"), ("c", 7, "c1")],
        [("a", 9, "a1")],
    ]
    for i, rows in enumerate(epochs):
        sink(spark.createDataFrame(rows, SCHEMA), i)

    changes = sink.read_changes().persist()
    dim = _empty_dim(spark)
    for e in range(3):
        dim = _apply_epoch(spark, dim, changes.filter(F.col("epoch") == e))

    # reference: all winning updates applied at once (epoch batches already
    # deduped by the sink, so the union of insert/update rows IS the
    # winning-update stream)
    all_updates = changes.filter(F.col("__change_op") != "touch").select(
        "k", "v", F.col("seq").alias("effective_ts")
    )
    ref = scd2_apply(_empty_dim(spark), all_updates, keys="k", tracked_cols=["v"])

    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    }
    want = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in ref.collect()
    }
    assert got == want
    # version chain sanity for the revert key
    a_chain = sorted(
        (r["valid_from"], r["valid_to"], r["v"])
        for r in dim.filter("k = 'a'").collect()
    )
    assert [c[2] for c in a_chain] == ["a1", "a5", "a1"]
    assert sum(1 for r in dim.filter("k = 'a'").collect() if r["is_current"]) == 1
    changes.unpersist()
