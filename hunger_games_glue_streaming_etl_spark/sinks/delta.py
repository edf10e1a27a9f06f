"""Transactional keyed-upsert sink: the Delta Lake form of
``ParquetLatestSink`` (reference op A8 — DynamoDB ``put_item`` ≡ keyed
last-writer-wins storage, ``script/TributeStreamingJob.py:49-66``).

With a table format on the classpath the hash-bucket merge emulation in
``upsert.py`` collapses to one ``MERGE INTO``: ACID, concurrent-reader
safe, no manual partition swap.  The container this engine is developed in
ships no ``delta-spark``, so the sink degrades to a typed
``TableFormatUnavailable`` at construction — the merge body itself is the
real production code path, and its key/ordering predicates are pure
builders unit-tested without the dependency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import latest_per_key


class TableFormatUnavailable(ImportError):
    """Raised when the requested transactional table format (delta-spark)
    is not importable in this environment."""


def delta_available() -> bool:
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def merge_key_condition(keys: Sequence[str]) -> str:
    """Null-safe key equality for MERGE ON (t = target, s = source)."""
    return " AND ".join(f"t.{k} <=> s.{k}" for k in keys)


def newer_than_condition(seq_cols: Sequence[str]) -> str:
    """Last-writer-wins guard: update only when the source row's sequence
    tuple is strictly newer (lexicographic struct comparison)."""
    s = ", ".join(f"s.{c}" for c in seq_cols)
    t = ", ".join(f"t.{c}" for c in seq_cols)
    return f"struct({s}) > struct({t})"


class DeltaLatestSink:
    """``foreachBatch``-compatible keyed upsert into a Delta table — same
    interface and semantics as ``ParquetLatestSink``, executed as a single
    transactional ``MERGE INTO``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: str | Sequence[str],
        seq_cols: str | Sequence[str],
    ) -> None:
        if not delta_available():
            raise TableFormatUnavailable(
                "DeltaLatestSink requires delta-spark "
                "(pip install delta-spark, plus the Delta catalog/extension "
                "session configs); use ParquetLatestSink in plain-parquet "
                "environments"
            )
        self.spark = spark
        self.path = path
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.seq_cols = [seq_cols] if isinstance(seq_cols, str) else list(seq_cols)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.upsert(batch_df)

    def upsert(self, batch_df: DataFrame) -> None:
        from delta.tables import DeltaTable

        latest = latest_per_key(batch_df, self.keys, self.seq_cols)
        if not DeltaTable.isDeltaTable(self.spark, self.path):
            latest.write.format("delta").mode("overwrite").save(self.path)
            return
        (
            DeltaTable.forPath(self.spark, self.path)
            .alias("t")
            .merge(latest.alias("s"), merge_key_condition(self.keys))
            .whenMatchedUpdateAll(condition=newer_than_condition(self.seq_cols))
            .whenNotMatchedInsertAll()
            .execute()
        )

    def read(self) -> DataFrame:
        return self.spark.read.format("delta").load(self.path)
