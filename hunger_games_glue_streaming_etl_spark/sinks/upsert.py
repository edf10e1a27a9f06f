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
"""

from __future__ import annotations

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
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.seq_cols = [seq_cols] if isinstance(seq_cols, str) else list(seq_cols)
        self.n_buckets = n_buckets

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.upsert(batch_df)

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

    def upsert(self, batch_df: DataFrame) -> None:
        self._recover_interrupted_migration()
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
                merged = latest_per_key(
                    current.unionByName(latest), self.keys, self.seq_cols
                )
                self._write_bucketed(merged, self.path)
            elif layout == "legacy":
                # one-time migration: merge the ENTIRE old view into the
                # bucketed layout and swap it in atomically (rename-aside)
                current = (
                    self.spark.read.parquet(self.path)
                    .drop(_BUCKET_COL)
                    .withColumn(_BUCKET_COL, self._bucket_expr())
                )
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
            else:
                self._write_bucketed(latest, self.path)
        finally:
            latest.unpersist()

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop(_BUCKET_COL)
