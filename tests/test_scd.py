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


def test_scd2_multiple_updates_one_key_chain(spark):
    """Two updates for one key in a single batch chain by effective_ts:
    non-overlapping validity, exactly one is_current row per key."""
    current = spark.createDataFrame(
        [(1, "v0", _ts("2024-01-01"), None, True)],
        "k int, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "v1", _ts("2024-03-01")),
            (1, "v2", _ts("2024-06-01")),
        ],
        "k int, addr string, effective_ts timestamp",
    )
    out = sorted(
        scd2_apply(current, updates, "k", ["addr"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["addr"], r["valid_to"], r["is_current"]) for r in out] == [
        ("v0", _ts("2024-03-01"), False),
        ("v1", _ts("2024-06-01"), False),
        ("v2", None, True),
    ]
    # intervals tile with no overlap
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]


def test_scd2_intra_batch_revert_to_open_value_is_kept(spark):
    """open=X, batch=[Y@t1, X@t2]: the revert to X is a REAL change after Y
    and must survive — only the chain's first element compares against the
    open version (an up-front anti-join would silently drop it)."""
    current = spark.createDataFrame(
        [(1, "X", _ts("2024-01-01"), None, True)],
        "k int, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "Y", _ts("2024-02-01")), (1, "X", _ts("2024-03-01"))],
        "k int, addr string, effective_ts timestamp",
    )
    out = sorted(
        scd2_apply(current, updates, "k", ["addr"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["addr"], r["valid_to"], r["is_current"]) for r in out] == [
        ("X", _ts("2024-02-01"), False),
        ("Y", _ts("2024-03-01"), False),
        ("X", None, True),  # the revert IS the current version
    ]


def test_scd2_consecutive_duplicate_updates_collapse(spark):
    """Updates with identical tracked values back-to-back collapse to one
    version instead of emitting a zero-width churn version."""
    current = spark.createDataFrame(
        [(1, "v0", _ts("2024-01-01"), None, True)],
        "k int, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "v1", _ts("2024-03-01")),
            (1, "v1", _ts("2024-04-01")),  # duplicate of the previous update
            (1, "v2", _ts("2024-06-01")),
        ],
        "k int, addr string, effective_ts timestamp",
    )
    out = sorted(
        scd2_apply(current, updates, "k", ["addr"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["addr"] for r in out] == ["v0", "v1", "v2"]
    assert sum(r["is_current"] for r in out) == 1


def test_asof_snapshot_reconstructs_both_instants(spark):
    """Hand-checkable time travel: before the June wave every key shows
    its original balance; after it, exactly the keys divisible by 3 show
    +100 and everyone else is unchanged — both snapshots cover the full
    key set exactly once."""
    from hunger_games_glue_streaming_etl_spark.plans.scd_ops import (
        SNAPSHOT_AFTER,
        SNAPSHOT_BEFORE,
        scd2_asof_snapshot,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    orig = {
        r["c_custkey"]: r["c_acctbal"]
        for r in load_table(spark, sf, "customer").collect()
    }
    rows = scd2_asof_snapshot(spark, sf).collect()
    before = {r["k"]: r["bal"] for r in rows if str(r["snapshot_ts"]).startswith(SNAPSHOT_BEFORE)}
    after = {r["k"]: r["bal"] for r in rows if str(r["snapshot_ts"]).startswith(SNAPSHOT_AFTER)}
    assert set(before) == set(orig) and set(after) == set(orig)
    assert before == orig
    for k, bal in after.items():
        assert bal == orig[k] + (100 if k % 3 == 0 else 0)
