"""Keyed-upsert sink: the set-oriented replacement for the reference's
per-row DynamoDB ``put_item`` (op A8, ``script/TributeStreamingJob.py:49-66``).

The reference opens a boto3 client and issues one HTTPS write *per row*
inside a Python ``foreach`` sink — its hottest anti-pattern (SURVEY.md §3
step 5).  Here each micro-batch is collapsed to one row per key with a window
rank (deterministic last-writer-wins via an explicit sequence column —
SURVEY.md §7 hard part (a)), then merged into the materialized "latest" view
as a whole partition-parallel DataFrame operation.

**Incremental merge shape**: the view is hash-partitioned into
``n_buckets`` key buckets (``__bucket=<i>/`` subdirs, standard Spark
partition layout).  A micro-batch only reads and rewrites the buckets its
keys hash into — dynamic partition overwrite leaves every other bucket's
files untouched, so per-batch cost is O(touched buckets), not O(total
keys) (the reference's ``put_item`` is O(batch); the previous full-rewrite
form here was O(table)).  On a real deployment the same ``upsert`` body is
a Delta/Iceberg ``MERGE INTO``; partition replacement uses Spark's staged
commit protocol, so readers never see a half-written bucket.

Scale note: the merge shuffles on the key columns only; raise
``n_buckets`` with key cardinality so one bucket's rows fit an executor
(buckets also bound AQE's coalesce floor for the post-merge output).

**Exactly-once + CDC**: ``foreachBatch`` delivers at-least-once; the sink
upgrades that to exactly-once with a per-epoch commit marker (skip fully
committed epochs; replays of uncommitted epochs land on idempotent writes
— last-writer-wins merge, epoch-dir-overwrite changelog).  With
``track_changes=True`` each epoch also appends a CDC changelog
(``__change_op`` insert/update/touch + new row values) under
``changes_path``/epoch=N — the diff is computed against the touched
buckets only, so changelog cost is O(batch) like the merge itself.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import latest_per_key

_BUCKET_COL = "__bucket"


class ParquetLatestSink:
    """``foreachBatch``-compatible keyed upsert into a parquet "latest" view.

    ``seq_cols`` define the deterministic event-order (the reference relies
    on nondeterministic arrival order; we require an explicit sequence).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: str | Sequence[str],
        seq_cols: str | Sequence[str],
        n_buckets: int = 16,
        track_changes: bool = False,
        lineage_id: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.seq_cols = [seq_cols] if isinstance(seq_cols, str) else list(seq_cols)
        self.n_buckets = n_buckets
        self.track_changes = track_changes
        # foreachBatch epoch ids are scoped to ONE query lineage (its
        # checkpoint): a fresh/cleared checkpoint restarts them at 0, and
        # an unscoped `epoch <= committed` gate would then silently skip
        # every batch until the new query catches up to the old counter.
        # Callers pass the checkpoint location (streaming.pipeline does);
        # a lineage change resets the committed-epoch tracking.
        self.lineage_id = lineage_id or "default"
        # the marker stores a fixed-width md5 of the lineage, not the raw
        # string: lineage_id is any caller-supplied value (typically a
        # checkpoint path) and a newline in it would desynchronize the
        # two-line marker format (ADVICE r03)
        self._lineage_token = hashlib.md5(self.lineage_id.encode()).hexdigest()

    @property
    def changes_path(self) -> str:
        """CDC changelog root (``epoch=N`` subdirs, exactly-once)."""
        return self.path + "_changes"

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.upsert(batch_df, epoch_id=epoch_id)

    def _bucket_expr(self):
        key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in self.keys])
        return F.pmod(F.crc32(key), F.lit(self.n_buckets)).cast("int")

    def _marker_path(self) -> str:
        return os.path.join(self.path, "_n_buckets")

    def _layout(self) -> str:
        """'absent' | 'bucketed' (this sink's layout, same n_buckets) |
        'legacy' (an unbucketed view, or a different bucket count) —
        legacy views are migrated with ONE full merge-rewrite rather than
        silently orphaned next to new bucket dirs."""
        if not os.path.isdir(self.path):
            return "absent"
        try:
            with open(self._marker_path()) as f:
                if int(f.read().strip()) == self.n_buckets:
                    return "bucketed"
        except (OSError, ValueError):
            pass
        return "legacy"

    def _write_bucketed(self, df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET_COL)
            .parquet(path)
        )
        with open(os.path.join(path, "_n_buckets"), "w") as f:
            f.write(str(self.n_buckets))

    def _recover_interrupted_migration(self) -> None:
        """Complete or roll back a legacy-layout migration that crashed
        mid-swap.  The swap is two renames (path→old, tmp→path); a crash
        between them leaves no live dir at ``path``, which ``_layout``
        would read as 'absent' — the next upsert would then write only its
        own batch, silently dropping the old view.  ``tmp`` is complete
        iff its ``_n_buckets`` marker exists (written last)."""
        tmp, old = self.path + ".tmp", self.path + ".old"
        if not os.path.isdir(self.path):
            if os.path.isfile(os.path.join(tmp, "_n_buckets")):
                os.rename(tmp, self.path)  # swap half done: complete it
            elif os.path.isdir(old):
                os.rename(old, self.path)  # tmp unusable: roll back
        # any remaining tmp/old next to a live dir is stale (crash before
        # the first rename, or after the second) — a fresh migration
        # rebuilds tmp from scratch anyway
        for leftover in (tmp, old):
            if os.path.isdir(self.path) and os.path.isdir(leftover):
                shutil.rmtree(leftover)

    def _delete_staging_path(self) -> str:
        return self.path + ".delstage"

    def _delete_intent_path(self) -> str:
        return os.path.join(self.path, "_delete_intent")

    def _recover_interrupted_delete(self) -> None:
        """Complete or roll back a bucketed ``delete_keys`` that crashed
        mid-swap (VERDICT r11 next #3 — the bucketed path now has the
        legacy branch's crash-atomic tmp-dir + swap shape).

        Protocol: survivors of the touched buckets are first written to a
        SIBLING staging dir (``path.delstage`` — the live view is never
        read-over-written, so no lineage checkpoint is needed), whose
        ``_n_buckets`` marker is written last and marks it complete.  An
        intent journal (``path/_delete_intent``, written via tmp +
        ``os.replace``) listing the touched buckets is the COMMIT POINT:

        - intent present → roll FORWARD: re-run the per-bucket swap from
          the journal.  The swap is idempotent — a ``staged`` bucket still
          in staging gets (re)installed, one already consumed was fully
          swapped; an ``emptied`` bucket's live dir is removed (rmtree is
          idempotent).  The journal records staged vs emptied EXPLICITLY —
          inferring "emptied" from staging absence would be ambiguous with
          "already consumed" and a replay could destroy an installed
          bucket.
        - staging present without intent → roll BACK: the live dirs were
          never touched (swaps start only after the intent lands), so
          removing the staging dir restores the exact pre-delete state.

        Either way the store is fully pre- or fully post-delete after
        recovery; mixed states cannot survive a crash."""
        intent = self._delete_intent_path()
        if os.path.isfile(intent):
            with open(intent) as f:
                j = json.load(f)
            self._swap_touched_buckets(j["staged"], j["emptied"])
            return
        stage = self._delete_staging_path()
        if os.path.isdir(stage):
            shutil.rmtree(stage)

    def _swap_touched_buckets(self, staged: list[int], emptied: list[int]) -> None:
        """Install staged survivor buckets over the live touched buckets
        (one rename each) and remove emptied buckets' live dirs,
        idempotently — re-runnable after a crash at any point — then
        commit by dropping the intent journal and clearing staging."""
        stage = self._delete_staging_path()
        for b in staged:
            src = os.path.join(stage, f"{_BUCKET_COL}={b}")
            dst = os.path.join(self.path, f"{_BUCKET_COL}={b}")
            if os.path.isdir(src):
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
            # else: already consumed by a pre-crash pass — dst is post-state
        for b in emptied:
            shutil.rmtree(
                os.path.join(self.path, f"{_BUCKET_COL}={b}"), ignore_errors=True
            )
        # commit: intent gone ⇒ the delete is complete; a crash between
        # these two leaves an intent-less staging dir holding only Spark
        # marker files, which the rollback branch clears harmlessly
        if os.path.isfile(self._delete_intent_path()):
            os.remove(self._delete_intent_path())
        if os.path.isdir(stage):
            shutil.rmtree(stage)

    def _epoch_marker_path(self) -> str:
        return os.path.join(self.path, "_last_epoch")

    def _committed_epoch(self) -> int | None:
        """Committed epoch FOR THIS LINEAGE — a marker written by a query
        with a different checkpoint lineage doesn't gate this one (its
        epoch counter is unrelated; the idempotent merge keeps replays
        safe either way).  The marker stores md5(lineage_id) — fixed
        width, newline-proof.  Legacy single-line markers predate lineage
        scoping and are read as lineage 'default'; two-line markers from
        the verbatim-lineage format hash-mismatch and reset the gate,
        which the idempotent merge absorbs."""
        try:
            with open(self._epoch_marker_path()) as f:
                lines = f.read().strip().splitlines()
        except OSError:
            return None
        try:
            if len(lines) == 1:
                marker_token = hashlib.md5(b"default").hexdigest()
                epoch_s = lines[0]
            else:
                marker_token, epoch_s = lines[0], lines[1]
            if marker_token != self._lineage_token:
                return None
            return int(epoch_s)
        except (ValueError, IndexError):
            return None

    def _commit_epoch(self, epoch_id: int) -> None:
        # write-then-rename: the marker is the COMMIT POINT — it appears
        # only after the merge and changelog writes both finished, and
        # never half-written
        tmp = self._epoch_marker_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{self._lineage_token}\n{epoch_id}")
        os.replace(tmp, self._epoch_marker_path())

    def _emit_changes(
        self, latest: DataFrame, current: DataFrame | None, epoch_id: int
    ) -> None:
        """Append this epoch's CDC rows (``__change_op`` ∈ insert/update/
        touch + the new row values) to ``changes_path``/epoch=N.

        Exactly-once under crash replay: the diff must reflect the
        PRE-merge state, so if this epoch's dir already committed (Spark's
        ``_SUCCESS`` marker — the changelog is written BEFORE the merge),
        the original rows are kept rather than recomputed against the
        already-merged view (which would reclassify every real op as
        ``touch`` and lose the epoch for late consumers).  A crash mid-
        changelog-write leaves no ``_SUCCESS`` → the replay overwrites the
        partial dir, still against pre-merge state.  (On an object store,
        swap the ``os.path`` probe for the Hadoop FileSystem API.)

        ``touch`` (new seq == stored seq) marks duplicate delivery;
        consumers treat every op as an idempotent upsert and may skip
        ``touch``.  Strictly-stale rows (new seq < stored) change nothing
        and are excluded."""
        epoch_dir = f"{self.changes_path}/epoch={epoch_id}"
        if os.path.isfile(os.path.join(epoch_dir, "_SUCCESS")):
            return
        if current is None:
            changed = latest.withColumn("__change_op", F.lit("insert"))
        else:
            prior = current.select(
                *[F.col(k) for k in self.keys],
                *[
                    F.col(s).alias(f"__prior_{s}")
                    for s in self.seq_cols
                ],
            )
            joined = latest.join(prior, self.keys, "left")
            new_seq = F.struct(*[F.col(s) for s in self.seq_cols])
            prior_seq = F.struct(
                *[F.col(f"__prior_{s}") for s in self.seq_cols]
            )
            changed = (
                joined.withColumn(
                    "__change_op",
                    F.when(
                        F.col(f"__prior_{self.seq_cols[0]}").isNull(), "insert"
                    )
                    .when(new_seq > prior_seq, "update")
                    .when(new_seq == prior_seq, "touch"),
                )
                .filter(F.col("__change_op").isNotNull())
                .drop(*[f"__prior_{s}" for s in self.seq_cols])
            )
        changed.drop(_BUCKET_COL).write.mode("overwrite").parquet(epoch_dir)

    def read_changes(self) -> DataFrame:
        """The full CDC changelog (all epochs; ``epoch`` is a partition
        column, so consumers resume from a watermark with partition
        pruning)."""
        return self.spark.read.option("basePath", self.changes_path).parquet(
            self.changes_path
        )

    def vacuum_changes(self, keep_epochs: int) -> list[int]:
        """Retention for the CDC changelog — the VACUUM every log-shaped
        sink needs or the epoch dirs grow forever: drop all but the
        newest ``keep_epochs`` committed epoch directories and return the
        dropped epoch ids (ascending).  The keyed latest-state table is
        untouched — vacuum bounds REPLAY depth, not state.

        Safety order mirrors the write path: a consumer resuming from a
        vacuumed epoch sees a clean missing-partition error, never a
        half-deleted one, because each dir is removed atomically from the
        newest file down (`_SUCCESS` deleted FIRST, so a concurrent
        reader's commit probe fails fast).  On an object store, swap the
        os walk for the FileSystem API like the other markers."""
        if keep_epochs < 0:
            raise ValueError("keep_epochs must be >= 0")
        if not os.path.isdir(self.changes_path):
            return []
        # only COMMITTED epochs (dirs with a _SUCCESS marker) count toward
        # the keep window: a crashed half-written newest epoch must not
        # push a fully committed older epoch out one slot early (round-5
        # advice).  Marker-less dirs are left alone — the writer's
        # redelivery overwrites its epoch dir idempotently.
        epochs = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.changes_path)
            if d.startswith("epoch=")
            and os.path.isfile(os.path.join(self.changes_path, d, "_SUCCESS"))
        )
        doomed = epochs[: max(0, len(epochs) - keep_epochs)]
        for e in doomed:
            d = os.path.join(self.changes_path, f"epoch={e}")
            marker = os.path.join(d, "_SUCCESS")
            if os.path.isfile(marker):
                os.remove(marker)  # readers' commit probe fails fast now
            shutil.rmtree(d, ignore_errors=True)
        return doomed

    def upsert(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        self._recover_interrupted_migration()
        self._recover_interrupted_delete()
        # exactly-once epoch gate: foreachBatch redelivers a failed epoch;
        # if the commit marker says this epoch already fully applied
        # (merge + changelog), skip the whole batch.  A crash BEFORE the
        # marker write replays into idempotent writes (merge is
        # last-writer-wins, changelog overwrites its epoch dir)
        if epoch_id is not None:
            committed = self._committed_epoch()
            if committed is not None and epoch_id <= committed:
                return
        # persist: the batch's latest view feeds both the touched-bucket
        # collect and the merge write — one window pass, not two
        latest = latest_per_key(batch_df, self.keys, self.seq_cols).withColumn(
            _BUCKET_COL, self._bucket_expr()
        ).persist()
        try:
            layout = self._layout()
            if layout == "bucketed":
                # merge ONLY the buckets this batch touches: the isin
                # filter partition-prunes the read, dynamic overwrite
                # replaces just the written partitions — untouched
                # buckets' files stay put
                touched = [
                    r[0] for r in latest.select(_BUCKET_COL).distinct().collect()
                ]
                current = self.spark.read.parquet(self.path).filter(
                    F.col(_BUCKET_COL).isin(touched)
                )
                if self.track_changes and epoch_id is not None:
                    # pin: the pre-merge state feeds both the changelog
                    # diff and the merge union; without it the bucket read
                    # races the dynamic overwrite below
                    current = current.persist()
                    self._emit_changes(latest, current, epoch_id)
                merged = latest_per_key(
                    current.unionByName(latest), self.keys, self.seq_cols
                )
                self._write_bucketed(merged, self.path)
                if self.track_changes and epoch_id is not None:
                    current.unpersist()
            elif layout == "legacy":
                # one-time migration: merge the ENTIRE old view into the
                # bucketed layout and swap it in atomically (rename-aside)
                current = (
                    self.spark.read.parquet(self.path)
                    .drop(_BUCKET_COL)
                    .withColumn(_BUCKET_COL, self._bucket_expr())
                )
                if self.track_changes and epoch_id is not None:
                    current = current.persist()
                    self._emit_changes(latest, current, epoch_id)
                merged = latest_per_key(
                    current.unionByName(latest), self.keys, self.seq_cols
                )
                tmp, old = self.path + ".tmp", self.path + ".old"
                self._write_bucketed(merged, tmp)
                if os.path.isdir(old):
                    shutil.rmtree(old)
                os.rename(self.path, old)
                os.rename(tmp, self.path)
                shutil.rmtree(old)
                if self.track_changes and epoch_id is not None:
                    current.unpersist()
            else:
                if self.track_changes and epoch_id is not None:
                    self._emit_changes(latest, None, epoch_id)
                self._write_bucketed(latest, self.path)
            if epoch_id is not None:
                self._commit_epoch(epoch_id)
        finally:
            latest.unpersist()

    def delete_keys(self, keys_df: DataFrame, epoch_id: int | None = None) -> int:
        """Targeted key deletion — the compliance path (GDPR erasure /
        right-to-be-forgotten) every keyed store needs: remove all stored
        rows whose key appears in ``keys_df``, rewriting ONLY the hash
        buckets those keys land in (O(touched buckets), never O(table) —
        the same incremental contract as ``upsert``).  A bucket whose
        every row is deleted is removed explicitly (recorded in the
        intent journal — dynamic partition overwrite could never empty
        it), and the whole bucketed rewrite is CRASH-ATOMIC: survivors
        are staged in a sibling dir, an intent journal marks the commit
        point, and the per-bucket swap is idempotent + replayed on
        recovery, so a crash at any instant leaves the store fully pre-
        or fully post-delete (see ``_recover_interrupted_delete``).

        With ``track_changes`` and an ``epoch_id``, the doomed rows are
        appended to the CDC changelog as ``__change_op = 'delete'``
        BEFORE the rewrite (pre-delete values, same idempotent epoch-dir
        protocol as ``_emit_changes``), so downstream consumers can
        propagate the erasure.  The same lineage-scoped epoch gate as
        ``upsert`` makes redelivered delete batches no-ops.

        Returns the number of stored rows removed.  A legacy (unbucketed)
        view is migrated to the bucketed layout by the full rewrite this
        delete already pays for."""
        self._recover_interrupted_migration()
        self._recover_interrupted_delete()
        if epoch_id is not None:
            committed = self._committed_epoch()
            if committed is not None and epoch_id <= committed:
                return 0
        layout = self._layout()
        if layout == "absent":
            return 0
        doomed = (
            keys_df.select(*[F.col(k) for k in self.keys])
            .distinct()
            .withColumn(_BUCKET_COL, self._bucket_expr())
            .persist()
        )
        try:
            if layout == "legacy":
                current = (
                    self.spark.read.parquet(self.path)
                    .drop(_BUCKET_COL)
                    .withColumn(_BUCKET_COL, self._bucket_expr())
                    .persist()
                )
            else:
                touched = [
                    r[0] for r in doomed.select(_BUCKET_COL).distinct().collect()
                ]
                if not touched:
                    # Commit the epoch even on the empty-keys path so a
                    # redelivered delete batch is gated instead of re-running
                    # the layout probe + collect (mirrors n_deleted == 0).
                    if epoch_id is not None:
                        self._commit_epoch(epoch_id)
                    return 0
                current = self.spark.read.parquet(self.path).filter(
                    F.col(_BUCKET_COL).isin(touched)
                ).persist()
            victims_keys = doomed.drop(_BUCKET_COL)
            n_deleted = current.join(victims_keys, self.keys, "left_semi").count()
            if n_deleted == 0:
                if epoch_id is not None:
                    self._commit_epoch(epoch_id)
                return 0
            if self.track_changes and epoch_id is not None:
                epoch_dir = f"{self.changes_path}/epoch={epoch_id}"
                if not os.path.isfile(os.path.join(epoch_dir, "_SUCCESS")):
                    (
                        current.join(victims_keys, self.keys, "left_semi")
                        .withColumn("__change_op", F.lit("delete"))
                        .drop(_BUCKET_COL)
                        .write.mode("overwrite")
                        .parquet(epoch_dir)
                    )
            remaining = current.join(victims_keys, self.keys, "left_anti")
            if layout == "legacy":
                tmp, old = self.path + ".tmp", self.path + ".old"
                self._write_bucketed(remaining, tmp)
                if os.path.isdir(old):
                    shutil.rmtree(old)
                os.rename(self.path, old)
                os.rename(tmp, self.path)
                shutil.rmtree(old)
            else:
                # Crash-atomic bucketed rewrite (VERDICT r11 next #3):
                # survivors are staged in a SIBLING dir — the live bucket
                # files are never read-over-written, so no lineage
                # checkpoint is needed and an executor loss mid-stage just
                # recomputes from the untouched originals.  The intent
                # journal (written atomically AFTER staging completes) is
                # the commit point; the per-bucket swap after it is
                # idempotent and replayed by _recover_interrupted_delete,
                # so a crash at any instant leaves the store recoverable
                # to fully-pre (no intent yet) or fully-post (intent
                # present) state — never a mix of rewritten and stale
                # bucket dirs.
                stage = self._delete_staging_path()
                if os.path.isdir(stage):
                    shutil.rmtree(stage)
                self._write_bucketed(remaining, stage)
                staged = sorted(
                    int(d.split("=", 1)[1])
                    for d in os.listdir(stage)
                    if d.startswith(f"{_BUCKET_COL}=")
                )
                emptied = sorted(set(touched) - set(staged))
                intent_tmp = self._delete_intent_path() + ".tmp"
                with open(intent_tmp, "w") as f:
                    json.dump({"staged": staged, "emptied": emptied}, f)
                os.replace(intent_tmp, self._delete_intent_path())
                self._swap_touched_buckets(staged, emptied)
            if epoch_id is not None:
                self._commit_epoch(epoch_id)
            return n_deleted
        finally:
            doomed.unpersist()
            try:
                current.unpersist()
            except NameError:
                pass

    def read(self) -> DataFrame:
        # Readers complete a crashed delete AND a crashed layout migration
        # (symmetry with the upsert/delete_keys entry points — ADVICE r12;
        # two stat probes each when clean): a post-crash read must never
        # see a half-swapped store.  Because recovery MUTATES the store
        # (replays bucket swaps / finishes the migration rename), read()
        # is covered by the same single-writer epoch-granularity contract
        # as the mutating entry points — one process owns the store; a
        # reader in ANOTHER process racing a live delete_keys could
        # double-run the same rmtree/rename.  Readers needing concurrent
        # access snapshot the directory instead.
        self._recover_interrupted_migration()
        self._recover_interrupted_delete()
        return self.spark.read.parquet(self.path).drop(_BUCKET_COL)
