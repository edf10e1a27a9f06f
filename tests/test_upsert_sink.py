"""ParquetLatestSink unit tests: keyed last-writer-wins semantics plus the
incremental-merge guarantee (a batch only rewrites the hash buckets its
keys land in — reference A8 is O(batch), the sink must not be O(table))."""

from __future__ import annotations

import os
import zlib

from hunger_games_glue_streaming_etl_spark.sinks.upsert import ParquetLatestSink


def _bucket(key: str, n_buckets: int = 16) -> int:
    return zlib.crc32(str(key).encode()) % n_buckets


def _bucket_state(path: str) -> dict[str, dict[str, float]]:
    """{bucket_dir: {file: mtime}} snapshot of the on-disk layout."""
    out = {}
    for d in os.listdir(path):
        if d.startswith("__bucket="):
            full = os.path.join(path, d)
            out[d] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_upsert_last_writer_wins_and_persistence(spark, tmp_path):
    sink = ParquetLatestSink(spark, str(tmp_path / "latest"), keys="k", seq_cols="seq")
    sink.upsert(spark.createDataFrame([("a", 1, "v1"), ("a", 2, "v2"), ("b", 1, "w1")],
                                      "k string, seq long, v string"))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "v2", "b": "w1"}  # seq 2 wins within the batch

    sink.upsert(spark.createDataFrame([("b", 5, "w5"), ("c", 1, "x1")],
                                      "k string, seq long, v string"))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "v2", "b": "w5", "c": "x1"}  # a persists untouched


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """Files in buckets not hit by a batch's keys must remain byte-for-byte
    in place (same names, same mtimes) after an upsert."""
    path = str(tmp_path / "latest")
    sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq")

    # two keys guaranteed to land in different buckets
    keys = [f"key{i}" for i in range(40)]
    k_a = keys[0]
    k_b = next(k for k in keys if _bucket(k) != _bucket(k_a))

    sink.upsert(spark.createDataFrame([(k_a, 1, "a1"), (k_b, 1, "b1")],
                                      "k string, seq long, v string"))
    before = _bucket_state(path)
    bucket_a, bucket_b = f"__bucket={_bucket(k_a)}", f"__bucket={_bucket(k_b)}"
    assert bucket_a in before and bucket_b in before

    sink.upsert(spark.createDataFrame([(k_b, 2, "b2")], "k string, seq long, v string"))
    after = _bucket_state(path)
    # untouched bucket: identical files, identical mtimes
    assert after[bucket_a] == before[bucket_a]
    # touched bucket: rewritten
    assert after[bucket_b] != before[bucket_b]
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {k_a: "a1", k_b: "b2"}


def test_delta_sink_gated_or_parity(spark, tmp_path):
    """Without delta-spark the transactional sink must fail at construction
    with a typed error naming the dependency; with it, semantics must match
    ParquetLatestSink.  The MERGE predicates are pure builders, checked
    either way."""
    import pytest

    from hunger_games_glue_streaming_etl_spark.sinks.delta import (
        DeltaLatestSink,
        TableFormatUnavailable,
        delta_available,
        merge_key_condition,
        newer_than_condition,
    )

    assert merge_key_condition(["k1", "k2"]) == "t.k1 <=> s.k1 AND t.k2 <=> s.k2"
    assert newer_than_condition(["seq"]) == "struct(s.seq) > struct(t.seq)"
    assert (
        newer_than_condition(["batch", "seq"])
        == "struct(s.batch, s.seq) > struct(t.batch, t.seq)"
    )

    if not delta_available():
        with pytest.raises(TableFormatUnavailable, match="delta-spark"):
            DeltaLatestSink(spark, str(tmp_path / "d"), keys="k", seq_cols="seq")
        return

    sink = DeltaLatestSink(spark, str(tmp_path / "d"), keys="k", seq_cols="seq")
    sink.upsert(spark.createDataFrame([("a", 1, "v1")], "k string, seq long, v string"))
    sink.upsert(spark.createDataFrame(
        [("a", 0, "stale"), ("a", 2, "v2"), ("b", 1, "w1")], "k string, seq long, v string"
    ))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "v2", "b": "w1"}


def test_merge_predicates_execute_against_spark_sql(spark, tmp_path):
    """delta-spark cannot be installed in this environment (no network /
    no pip — VERDICT r03 #6), so the closest executable check: the exact
    ON / WHEN-MATCHED condition STRINGS DeltaLatestSink hands to MERGE
    are run through Spark SQL as a full-outer-join MERGE emulation, and
    must reproduce ParquetLatestSink's last-writer-wins result on the
    same two batches — update-if-newer, keep-if-stale, insert-if-new,
    null-safe key match (`<=>`)."""
    from hunger_games_glue_streaming_etl_spark.sinks.delta import (
        merge_key_condition,
        newer_than_condition,
    )
    from hunger_games_glue_streaming_etl_spark.sinks.upsert import ParquetLatestSink

    target = spark.createDataFrame(
        [("a", 1, "a1"), ("b", 2, "b2"), (None, 1, "n1")],
        "k string, seq long, v string",
    )
    source = spark.createDataFrame(
        [("a", 2, "a2"), ("b", 1, "stale"), (None, 3, "n3"), ("c", 1, "c1")],
        "k string, seq long, v string",
    )
    target.createOrReplaceTempView("t")
    source.createOrReplaceTempView("s")
    on = merge_key_condition(["k"])
    newer = newer_than_condition(["seq"])
    merged = spark.sql(
        f"""
        SELECT CASE WHEN t.seq IS NULL THEN s.k
                    WHEN s.seq IS NULL THEN t.k
                    WHEN {newer} THEN s.k ELSE t.k END AS k,
               CASE WHEN t.seq IS NULL THEN s.seq
                    WHEN s.seq IS NULL THEN t.seq
                    WHEN {newer} THEN s.seq ELSE t.seq END AS seq,
               CASE WHEN t.seq IS NULL THEN s.v
                    WHEN s.seq IS NULL THEN t.v
                    WHEN {newer} THEN s.v ELSE t.v END AS v
        FROM t FULL OUTER JOIN s ON {on}
        """
    )
    via_merge = {r["k"]: (r["seq"], r["v"]) for r in merged.collect()}

    sink = ParquetLatestSink(spark, str(tmp_path / "latest"), keys="k", seq_cols="seq")
    sink.upsert(target, epoch_id=0)
    sink.upsert(source, epoch_id=1)
    via_parquet = {r["k"]: (r["seq"], r["v"]) for r in sink.read().collect()}

    assert via_merge == via_parquet == {
        "a": (2, "a2"),
        "b": (2, "b2"),
        None: (3, "n3"),
        "c": (1, "c1"),
    }


def test_upsert_migrates_legacy_unbucketed_layout(spark, tmp_path):
    """A pre-existing view written as plain root-level parquet (the old
    full-rewrite layout, no _n_buckets marker) must be merged into the
    bucketed layout on first upsert — not orphaned next to bucket dirs."""
    path = str(tmp_path / "latest")
    spark.createDataFrame(
        [("old1", 1, "o1"), ("old2", 1, "o2")], "k string, seq long, v string"
    ).write.parquet(path)

    sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq")
    sink.upsert(spark.createDataFrame(
        [("old2", 5, "o2new"), ("new1", 1, "n1")], "k string, seq long, v string"
    ))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"old1": "o1", "old2": "o2new", "new1": "n1"}
    # migrated: marker present, no stray root-level data files
    assert os.path.exists(os.path.join(path, "_n_buckets"))
    root_parquet = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert not root_parquet
    # and a different bucket count on the same path also migrates cleanly
    sink8 = ParquetLatestSink(spark, path, keys="k", seq_cols="seq", n_buckets=8)
    sink8.upsert(spark.createDataFrame(
        [("new2", 1, "n2")], "k string, seq long, v string"
    ))
    st = {r["k"]: r["v"] for r in sink8.read().collect()}
    assert st == {"old1": "o1", "old2": "o2new", "new1": "n1", "new2": "n2"}


def test_upsert_multi_column_keys(spark, tmp_path):
    sink = ParquetLatestSink(
        spark, str(tmp_path / "latest"), keys=["k1", "k2"], seq_cols="seq"
    )
    sink.upsert(spark.createDataFrame(
        [("a", 1, 1, "x"), ("a", 2, 1, "y")], "k1 string, k2 int, seq long, v string"
    ))
    sink.upsert(spark.createDataFrame(
        [("a", 1, 2, "x2")], "k1 string, k2 int, seq long, v string"
    ))
    st = {(r["k1"], r["k2"]): r["v"] for r in sink.read().collect()}
    assert st == {("a", 1): "x2", ("a", 2): "y"}


def test_upsert_recovers_interrupted_migration(spark, tmp_path):
    """The legacy-layout migration swaps via rename(path->old) then
    rename(tmp->path); a crash between them leaves NO live dir at path.
    The next upsert must complete (or roll back) the interrupted swap
    before merging — never treat the state as 'absent' and silently drop
    the old view (ADVICE r2)."""
    import shutil

    schema = "k string, seq long, v string"

    def fresh(path):
        sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq")
        sink.upsert(spark.createDataFrame([("a", 1, "a1"), ("b", 1, "b1")], schema))
        return sink

    # 1. crash BETWEEN the renames, tmp complete: path gone, tmp has the
    #    merged view (with marker), old holds the pre-migration data
    p1 = str(tmp_path / "between")
    sink = fresh(p1)
    shutil.copytree(p1, p1 + ".tmp")   # stands in for the merged rewrite
    os.rename(p1, p1 + ".old")
    sink.upsert(spark.createDataFrame([("c", 1, "c1")], schema))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "a1", "b": "b1", "c": "c1"}
    assert not os.path.exists(p1 + ".tmp") and not os.path.exists(p1 + ".old")

    # 2. crash DURING the tmp write (no marker): tmp is garbage, old has
    #    the view -> roll back to old
    p2 = str(tmp_path / "partial")
    sink = fresh(p2)
    os.rename(p2, p2 + ".old")
    os.makedirs(p2 + ".tmp")           # partial write: no _n_buckets marker
    sink.upsert(spark.createDataFrame([("c", 1, "c1")], schema))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "a1", "b": "b1", "c": "c1"}

    # 3. crash AFTER the swap, before cleanup: live dir plus stale old/tmp
    p3 = str(tmp_path / "stale")
    sink = fresh(p3)
    shutil.copytree(p3, p3 + ".old")
    os.makedirs(p3 + ".tmp")
    sink.upsert(spark.createDataFrame([("c", 1, "c1")], schema))
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "a1", "b": "b1", "c": "c1"}
    assert not os.path.exists(p3 + ".tmp") and not os.path.exists(p3 + ".old")


def test_cdc_changelog_and_epoch_exactly_once(spark, tmp_path):
    """track_changes=True: each epoch appends insert/update/touch CDC rows
    under changes_path/epoch=N, and the commit marker makes a foreachBatch
    redelivery of a committed epoch a no-op (exactly-once)."""
    schema = "k string, seq long, v string"
    path = str(tmp_path / "view")
    sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq", track_changes=True)

    # epoch 0: fresh view -> all inserts
    sink(spark.createDataFrame([("a", 1, "a1"), ("b", 1, "b1")], schema), 0)
    ch0 = {(r["k"], r["__change_op"]) for r in sink.read_changes().filter("epoch = 0").collect()}
    assert ch0 == {("a", "insert"), ("b", "insert")}

    # epoch 1: update a (higher seq), insert c, duplicate-delivery b (same
    # row redelivered, same seq -> touch)
    sink(spark.createDataFrame([("a", 5, "a5"), ("c", 1, "c1"), ("b", 1, "b1")], schema), 1)
    ch1 = {(r["k"], r["__change_op"], r["v"]) for r in sink.read_changes().filter("epoch = 1").collect()}
    assert ch1 == {("a", "update", "a5"), ("c", "insert", "c1"), ("b", "touch", "b1")}
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "a5", "b": "b1", "c": "c1"}

    # epoch 2: strictly-stale row (seq below stored) -> excluded from the
    # changelog, view untouched
    sink(spark.createDataFrame([("a", 0, "ancient")], schema), 2)
    assert sink.read_changes().filter("epoch = 2").count() == 0
    assert {r["k"]: r["v"] for r in sink.read().collect()} == st

    # redeliver epoch 1 with DIFFERENT (corrupt) content: committed marker
    # must skip it entirely - no view change, no changelog change
    sink(spark.createDataFrame([("a", 9, "corrupt")], schema), 1)
    st2 = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st2 == st
    assert {(r["k"], r["__change_op"], r["v"]) for r in sink.read_changes().filter("epoch = 1").collect()} == ch1


def test_cdc_crash_replay_before_commit_is_idempotent(spark, tmp_path):
    """A crash AFTER the merge+changelog writes but BEFORE the epoch marker
    (simulated by deleting the marker) must make the replay land on
    idempotent writes: same view, changelog epoch dir overwritten once."""
    schema = "k string, seq long, v string"
    path = str(tmp_path / "view")
    sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq", track_changes=True)
    sink(spark.createDataFrame([("a", 1, "a1")], schema), 0)
    batch = spark.createDataFrame([("a", 2, "a2"), ("b", 1, "b1")], schema)
    sink(batch, 1)
    os.remove(os.path.join(path, "_last_epoch"))  # crash before commit point
    sink(batch, 1)  # replay
    st = {r["k"]: r["v"] for r in sink.read().collect()}
    assert st == {"a": "a2", "b": "b1"}
    # the epoch dir committed (_SUCCESS) before the crash, so the replay
    # must PRESERVE the original pre-merge diff - recomputing it against
    # the already-merged view would reclassify the real ops as touch and
    # lose the epoch for any consumer reading after the crash
    ch1 = [
        (r["k"], r["__change_op"])
        for r in sink.read_changes().filter("epoch = 1").collect()
    ]
    assert sorted(ch1) == [("a", "update"), ("b", "insert")]
    assert sink._committed_epoch() == 1


def test_changes_disabled_by_default_and_epoch_optional(spark, tmp_path):
    """upsert() without an epoch (batch usage) never writes markers or
    changelogs - the pre-CDC contract is unchanged."""
    schema = "k string, seq long, v string"
    path = str(tmp_path / "view")
    sink = ParquetLatestSink(spark, path, keys="k", seq_cols="seq")
    sink.upsert(spark.createDataFrame([("a", 1, "a1")], schema))
    sink.upsert(spark.createDataFrame([("a", 2, "a2")], schema))
    assert {r["k"]: r["v"] for r in sink.read().collect()} == {"a": "a2"}
    assert not os.path.exists(os.path.join(path, "_last_epoch"))
    assert not os.path.exists(path + "_changes")


def test_epoch_gate_is_scoped_to_checkpoint_lineage(spark, tmp_path):
    """A fresh checkpoint restarts foreachBatch epoch ids at 0; the
    exactly-once gate must reset with it instead of silently skipping
    every batch until the new query passes the old counter.  Same-lineage
    redelivery still skips."""
    path = str(tmp_path / "latest")
    df = lambda rows: spark.createDataFrame(rows, "k string, seq long, v string")

    a = ParquetLatestSink(spark, path, keys="k", seq_cols="seq", lineage_id="cp1")
    a.upsert(df([("a", 1, "v1")]), epoch_id=0)
    a.upsert(df([("a", 2, "v2")]), epoch_id=1)
    # same lineage, committed epoch -> no-op (exactly-once)
    a.upsert(df([("a", 9, "SHOULD_NOT_APPLY")]), epoch_id=1)
    assert {r["v"] for r in a.read().collect()} == {"v2"}

    # new lineage (fresh checkpoint), epoch counter restarts at 0:
    # the batch MUST apply
    b = ParquetLatestSink(spark, path, keys="k", seq_cols="seq", lineage_id="cp2")
    b.upsert(df([("a", 3, "v3")]), epoch_id=0)
    assert {r["v"] for r in b.read().collect()} == {"v3"}
    # and the gate now tracks the new lineage
    b.upsert(df([("a", 9, "SHOULD_NOT_APPLY")]), epoch_id=0)
    assert {r["v"] for r in b.read().collect()} == {"v3"}


def test_changelog_vacuum_bounds_replay_depth(spark, tmp_path):
    """vacuum_changes drops all but the newest N epoch dirs (returning
    the dropped ids), leaves the keyed state intact, and the surviving
    changelog still reads cleanly with partition pruning."""
    from hunger_games_glue_streaming_etl_spark.sinks.upsert import ParquetLatestSink

    sink = ParquetLatestSink(
        spark, str(tmp_path / "latest"), keys=["k"], seq_cols=["seq"],
        track_changes=True,
    )
    for epoch in range(4):
        batch = spark.createDataFrame(
            [(1, epoch, f"v{epoch}"), (epoch + 10, epoch, "new")],
            "k long, seq long, val string",
        )
        sink.upsert(batch, epoch_id=epoch)
    assert sink.read_changes().select("epoch").distinct().count() == 4

    dropped = sink.vacuum_changes(keep_epochs=2)
    assert dropped == [0, 1]
    left = {r["epoch"] for r in sink.read_changes().select("epoch").distinct().collect()}
    assert left == {2, 3}
    # keyed state survives vacuum untouched: key 1 at its newest seq + all inserts
    state = {r["k"]: r["val"] for r in sink.read().collect()}
    assert state[1] == "v3" and state[10] == "new" and state[13] == "new"
    # idempotent + keep-all / keep-zero edges
    assert sink.vacuum_changes(keep_epochs=2) == []
    assert sink.vacuum_changes(keep_epochs=0) == [2, 3]
    assert sink.vacuum_changes(keep_epochs=5) == []


def test_delete_keys_touched_buckets_only(spark, tmp_path):
    """delete_keys removes exactly the doomed keys, rewrites ONLY their
    buckets (untouched bucket files keep their mtimes), removes a bucket
    whose every row died (dynamic overwrite alone cannot), emits
    __change_op='delete' CDC rows, and gates redelivered epochs."""
    path = str(tmp_path / "latest")
    sink = ParquetLatestSink(
        spark, path, keys="k", seq_cols="seq", track_changes=True,
        lineage_id="del-test",
    )
    rows = [(f"k{i}", 1, f"v{i}") for i in range(12)]
    sink.upsert(
        spark.createDataFrame(rows, "k string, seq long, v string"), epoch_id=0
    )
    before = _bucket_state(path)

    # doom two keys from one bucket... pick keys sharing a bucket plus one
    # key alone in its bucket (so that bucket empties entirely)
    by_bucket = {}
    for i in range(12):
        by_bucket.setdefault(_bucket(f"k{i}"), []).append(f"k{i}")
    lone = next(ks[0] for ks in by_bucket.values() if len(ks) == 1)
    shared = next(ks for ks in by_bucket.values() if len(ks) >= 2)
    doomed = [lone, shared[0]]

    n = sink.delete_keys(
        spark.createDataFrame([(k,) for k in doomed], "k string"), epoch_id=1
    )
    assert n == 2
    st = {r["k"] for r in sink.read().collect()}
    assert st == {f"k{i}" for i in range(12)} - set(doomed)

    after = _bucket_state(path)
    lone_dir = f"__bucket={_bucket(lone)}"
    shared_dir = f"__bucket={_bucket(shared[0])}"
    assert lone_dir not in after  # fully-emptied bucket removed
    assert after[shared_dir] != before[shared_dir]  # rewritten
    for d, files in before.items():
        if d not in (lone_dir, shared_dir):
            assert after[d] == files  # untouched buckets byte-stable

    # CDC delete rows, pre-delete values
    changes = {
        (r["k"], r["__change_op"])
        for r in sink.read_changes().filter("epoch = 1").collect()
    }
    assert changes == {(k, "delete") for k in doomed}

    # epoch gate: a redelivered delete epoch is a no-op even for a key
    # that is still present
    survivor = next(k for k in st)
    assert sink.delete_keys(
        spark.createDataFrame([(survivor,)], "k string"), epoch_id=1
    ) == 0
    assert survivor in {r["k"] for r in sink.read().collect()}


def _spread_store(spark, path, n=24):
    """Build a bucketed store with keys spread over many buckets and
    return (sink, {bucket: [keys]})."""
    sink = ParquetLatestSink(
        spark, path, keys="k", seq_cols="seq", lineage_id="crash-test"
    )
    rows = [(f"k{i}", 1, f"v{i}") for i in range(n)]
    sink.upsert(
        spark.createDataFrame(rows, "k string, seq long, v string"), epoch_id=0
    )
    by_bucket: dict[int, list[str]] = {}
    for i in range(n):
        by_bucket.setdefault(_bucket(f"k{i}"), []).append(f"k{i}")
    return sink, by_bucket


def test_delete_keys_crash_during_staging_leaves_pre_state(
    spark, tmp_path, monkeypatch
):
    """A crash BEFORE the intent journal lands (mid-staging-write) must
    leave the store fully PRE-delete after recovery: the live bucket dirs
    were never touched, and recovery rolls the orphan staging dir back."""
    import pytest

    path = str(tmp_path / "latest")
    sink, by_bucket = _spread_store(spark, path)
    doomed = [ks[0] for ks in by_bucket.values()][:3]
    pre = {r["k"] for r in sink.read().collect()}

    real_wb = ParquetLatestSink._write_bucketed

    def dying_wb(self, df, target):
        if target == self._delete_staging_path():
            os.makedirs(target, exist_ok=True)
            with open(os.path.join(target, "partial.parquet"), "w") as f:
                f.write("junk")  # half-written staging, no completeness marker
            raise RuntimeError("injected crash during staging write")
        return real_wb(self, df, target)

    monkeypatch.setattr(ParquetLatestSink, "_write_bucketed", dying_wb)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink.delete_keys(
            spark.createDataFrame([(k,) for k in doomed], "k string"), epoch_id=1
        )
    monkeypatch.undo()

    # no intent was journaled -> rollback: store must be exactly pre-delete
    fresh = ParquetLatestSink(
        spark, path, keys="k", seq_cols="seq", lineage_id="crash-test"
    )
    assert {r["k"] for r in fresh.read().collect()} == pre
    assert not os.path.isdir(fresh._delete_staging_path())
    assert not os.path.isfile(fresh._delete_intent_path())


def test_delete_keys_crash_between_bucket_swaps_recovers_post_state(
    spark, tmp_path, monkeypatch
):
    """The VERDICT r11 #3 contract: kill the delete BETWEEN bucket-dir
    swaps (after the intent journal committed) and prove recovery rolls
    FORWARD to the fully post-delete state — including removing a bucket
    the delete emptied — with staging and intent cleaned up."""
    import pytest

    import hunger_games_glue_streaming_etl_spark.sinks.upsert as upsert_mod

    path = str(tmp_path / "latest")
    sink, by_bucket = _spread_store(spark, path)
    shared = [ks for ks in by_bucket.values() if len(ks) >= 2]
    lones = [ks[0] for ks in by_bucket.values() if len(ks) == 1]
    assert len(shared) >= 2 and lones, "fixture must span shared+lone buckets"
    # two buckets that SURVIVE with fewer rows (two swap renames) plus one
    # bucket that empties entirely (journaled removal)
    doomed = [shared[0][0], shared[1][0], lones[0]]
    expect = {f"k{i}" for i in range(24)} - set(doomed)

    real_rename = os.rename
    swap_renames = {"n": 0}

    def dying_rename(src, dst):
        if os.path.basename(str(dst)).startswith("__bucket="):
            swap_renames["n"] += 1
            if swap_renames["n"] == 2:
                raise RuntimeError("injected crash between bucket swaps")
        return real_rename(src, dst)

    monkeypatch.setattr(upsert_mod.os, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink.delete_keys(
            spark.createDataFrame([(k,) for k in doomed], "k string"), epoch_id=1
        )
    monkeypatch.undo()

    # mid-crash: intent journal is on disk (commit point passed), exactly
    # one of the two surviving buckets was swapped -> mixed state
    assert os.path.isfile(sink._delete_intent_path())

    # recovery (any entry point: read/upsert/delete) must complete the swap
    fresh = ParquetLatestSink(
        spark, path, keys="k", seq_cols="seq", lineage_id="crash-test"
    )
    assert {r["k"] for r in fresh.read().collect()} == expect
    assert f"__bucket={_bucket(lones[0])}" not in os.listdir(path)
    assert not os.path.isdir(fresh._delete_staging_path())
    assert not os.path.isfile(fresh._delete_intent_path())

    # the crashed epoch never committed -> redelivery is safe (idempotent:
    # the keys are already gone, so it gates forward with n_deleted=0)
    assert fresh.delete_keys(
        spark.createDataFrame([(k,) for k in doomed], "k string"), epoch_id=1
    ) == 0
    assert {r["k"] for r in fresh.read().collect()} == expect


def test_delete_keys_crash_at_every_mutation_point(spark, tmp_path, monkeypatch):
    """Systematic crash sweep: inject a failure at the N-th filesystem
    mutation (rename/replace/rmtree) inside the bucketed delete's commit
    region, for every N until a run completes — after each injected
    crash, recovery must land the store at EXACTLY the pre-delete or the
    post-delete key set (and at post whenever the intent journal was on
    disk at crash time).  Covers every crash point the two targeted
    tests hand-pick, plus the cleanup tail."""
    import shutil as _shutil

    import pytest

    import hunger_games_glue_streaming_etl_spark.sinks.upsert as upsert_mod

    real_rename, real_replace, real_rmtree = os.rename, os.replace, _shutil.rmtree

    def build(n_path):
        sink = ParquetLatestSink(
            spark, n_path, keys="k", seq_cols="seq", lineage_id="sweep"
        )
        rows = [(f"k{i}", 1, f"v{i}") for i in range(24)]
        sink.upsert(
            spark.createDataFrame(rows, "k string, seq long, v string"),
            epoch_id=0,
        )
        return sink

    by_bucket: dict[int, list[str]] = {}
    for i in range(24):
        by_bucket.setdefault(_bucket(f"k{i}"), []).append(f"k{i}")
    shared = [ks for ks in by_bucket.values() if len(ks) >= 2]
    lones = [ks[0] for ks in by_bucket.values() if len(ks) == 1]
    doomed = [shared[0][0], shared[1][0], lones[0]]
    pre = {f"k{i}" for i in range(24)}
    post = pre - set(doomed)

    n = 0
    completed_without_crash = False
    while not completed_without_crash and n < 40:
        n += 1
        path = str(tmp_path / f"latest_{n}")
        sink = build(path)
        calls = {"n": 0}

        def counting(fn):
            def wrapper(*a, **kw):
                # count only mutations under THIS store's tree (Spark's
                # own temp-file renames during the staging write are the
                # committer's business, not swap-protocol mutations)
                target = str(a[0])
                if path in target:
                    calls["n"] += 1
                    if calls["n"] == n:
                        raise RuntimeError(f"injected crash at mutation {n}")
                return fn(*a, **kw)

            return wrapper

        monkeypatch.setattr(upsert_mod.os, "rename", counting(real_rename))
        monkeypatch.setattr(upsert_mod.os, "replace", counting(real_replace))
        monkeypatch.setattr(upsert_mod.shutil, "rmtree", counting(real_rmtree))
        keys_df = spark.createDataFrame([(k,) for k in doomed], "k string")
        try:
            sink.delete_keys(keys_df, epoch_id=1)
            completed_without_crash = True
        except RuntimeError as e:
            assert "injected crash" in str(e)
        intent_at_crash = os.path.isfile(sink._delete_intent_path())
        monkeypatch.undo()

        fresh = ParquetLatestSink(
            spark, path, keys="k", seq_cols="seq", lineage_id="sweep"
        )
        state = {r["k"] for r in fresh.read().collect()}
        assert state in (pre, post), (
            f"mutation {n}: mixed state {sorted(pre ^ state)[:6]}..."
        )
        if intent_at_crash or completed_without_crash:
            assert state == post, f"mutation {n}: intent present but pre-state"
        assert not os.path.isfile(fresh._delete_intent_path())
        assert not os.path.isdir(fresh._delete_staging_path())
    assert completed_without_crash, "sweep never reached a clean run"
    assert n >= 4, "expected several mutation points in the commit region"
