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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact's key into ``salt_buckets``
    sub-keys and replicate each dim row across all buckets, so one hot key's
    rows spread over ``salt_buckets`` tasks instead of one straggler.

    This is the manual form of AQE's skew-join splitting — needed when (a)
    AQE can't see the skew (first shuffle of a stage, no runtime stats yet)
    or (b) the join is stream-static, where AQE is disabled.  Cost: the dim
    side is replicated ×``salt_buckets``, so use it for genuinely small-ish
    dims with a genuinely hot fact key.

    Only ``inner`` and ``left`` joins are legal: the dim replication would
    emit every unmatched dim row ``salt_buckets`` times under right/full
    outer semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated dim side would duplicate unmatched rows "
            "under right/full outer semantics"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return out.drop("__salt")


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
