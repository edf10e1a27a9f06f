"""General relational helpers the reference implies but implements sink-side.

The reference materializes "latest status per tribute" by letting every event
overwrite a DynamoDB item (``script/TributeStreamingJob.py:49-66``) — i.e.
last-writer-wins keyed upsert with *nondeterministic* intra-batch order.  The
set-oriented, deterministic Spark expression is a window rank (SURVEY.md §2C
"Window functions"), which is also what the ``foreachBatch`` sink uses to
collapse each micro-batch before upserting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
) -> DataFrame:
    """Keep the single latest row per key, deterministically.

    ``order_by`` columns are ranked descending; pass a trailing unique id
    (e.g. an event id) as tiebreaker to pin intra-timestamp order — the
    determinism the reference's per-row ``foreach`` upsert lacks
    (SURVEY.md §7 "Hard parts" (a)).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per group via window rank — one shuffle on the group keys;
    partial aggregation is not applicable, but AQE handles group skew."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    ordering = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
