"""Temporal join operators Spark lacks natively: as-of join and range join.

Neither appears in the reference (its only joins are equi stream-static,
``script/TributeStreamingJob.py:106-107``), but both are core time-series
capabilities for the engine's domain ("state as of event time").

**As-of join** (for each left row, the latest right row at-or-before its
timestamp, per key) is built with the union + window-carry-forward trick:

    tag both inputs, union, sort per key by (time, side), and carry the last
    right-side values forward with ``last(ignorenulls=True)``.

That is a *single* shuffle on the key — the same cost as one sort-merge
join — and never expands pairs (a naive range-predicate join explodes to
|left| × |right-per-key| before picking the max).  ``pd.merge_asof`` via
``applyInPandas`` is the fallback for semantics this form can't express
(nearest rather than backward, tolerance windows).

**Range join** (point-in-interval) bucketizes the point and interval to a
common grid, equi-joins on (key?, bucket), and re-applies the exact
predicate — turning an O(n·m) theta join into an equi shuffle plus a small
per-bucket verify, the standard Spark strategy for interval joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right_ts <= left_ts``, matched on key ``on``.

    ``tiebreak`` (a right-side column, e.g. a unique id) pins which right
    row wins when several share one timestamp — max tiebreak, matching
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``.  Left rows with no earlier
    right row keep nulls — left-outer as-of semantics.

    All right-side value columns are carried as ONE struct through a single
    ``last(ignorenulls=True)``, so the output always reflects exactly one
    right row — a null in the winning row stays null rather than being
    back-filled from an earlier row (which per-column carries would do).
    """
    if tiebreak is not None and tiebreak not in value_cols:
        value_cols = [*value_cols, tiebreak]
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    lt_cols = [F.col(c) for c in left.columns]
    unioned = lt.select(
        *lt_cols,
        "__t",
        "__side",
        F.lit(None).cast(rt.schema["__r"].dataType).alias("__r"),
    ).unionByName(
        rt.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != on
                else F.col(on)
                for c in left.columns
            ],
            "__t",
            "__side",
            "__r",
        )
    )
    # right rows (side 0) sort before left rows (side 1) at equal time →
    # a right row AT the left timestamp is visible to it ("at-or-before");
    # among right rows sharing a timestamp the max-tiebreak row sorts last
    # and wins the carry-forward (the struct is null on left rows, so the
    # tiebreak field only orders right rows, which all carry it non-null)
    order_cols = [F.col("__t"), F.col("__side")] + (
        [F.col("__r").getField(tiebreak)] if tiebreak else []
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__rc"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__rc").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join via grid bucketing.

    Each interval is exploded to the buckets it overlaps; points equi-join
    on their bucket; the exact ``start <= point < end`` predicate filters
    the small per-bucket candidate set.  ``bucket_width`` should be ~the
    typical interval length: wider wastes verify work, narrower explodes
    interval copies.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor(F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bucket")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("__bucket")
    )
