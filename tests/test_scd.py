"""SCD2 / MERGE emulation unit tests (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

from hunger_games_glue_streaming_etl_spark.operators.scd import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_close_and_version(spark):
    current = spark.createDataFrame(
        [
            (1, "addr_old", _ts("2024-01-01"), None, True),
            (1, "addr_ancient", _ts("2023-01-01"), _ts("2024-01-01"), False),
            (2, "addr_keep", _ts("2024-01-01"), None, True),
        ],
        "k int, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "addr_new", _ts("2024-06-01")),   # real change -> new version
            (2, "addr_keep", _ts("2024-06-01")),  # same value -> no-op
        ],
        "k int, addr string, effective_ts timestamp",
    )
    out = scd2_apply(current, updates, "k", ["addr"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)

    k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert len(k1) == 3  # ancient + closed old + new current
    assert [r["is_current"] for r in k1] == [False, False, True]
    assert k1[1]["valid_to"] == _ts("2024-06-01")  # closed at effective time
    assert k1[2]["addr"] == "addr_new" and k1[2]["valid_to"] is None

    assert len(by_key[2]) == 1  # no version churn for a no-op update
    assert by_key[2][0]["is_current"] and by_key[2][0]["addr"] == "addr_keep"
