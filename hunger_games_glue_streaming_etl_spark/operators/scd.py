"""Slowly-changing-dimension maintenance without a table format.

The reference materializes "current state" by physical overwrite (DynamoDB
``put_item``, A8) and keeps history as raw events (A9).  The warehouse-grade
forms of those two ideas are MERGE upsert and SCD Type 2, which Spark lacks
without Delta/Iceberg; both are emulated here with pure DataFrame ops
(anti-join + union + window — the standard recipe when no transactional
format is on the classpath; with Delta the same call sites become
``MERGE INTO``).

Scale notes: both operators shuffle once on the business key; the SCD2
rewrite touches only keys present in the updates (everything else passes
through untouched via the anti-join split), so incremental cost tracks the
update batch, not dimension size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """MERGE semantics: source rows replace matching target rows, new keys
    insert, unmatched target rows persist (matched-update + not-matched-
    insert).  Columns must align by name."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    untouched = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return untouched.unionByName(source)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: str | Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD Type 2: close the current version of each changed key and append
    the new version.

    ``current`` carries (keys, tracked_cols, valid_from, valid_to,
    is_current); ``updates`` carries (keys, tracked_cols, effective_ts).
    Unchanged keys pass through; updates whose tracked values equal the
    open version are no-ops (no spurious version churn).

    Multiple updates for one key in a single batch are *chained* in
    ``effective_ts`` order: each intermediate version closes at the next
    update's effective time (``valid_to = lead(effective_ts)``) and only
    the final one stays open — so validity intervals never overlap and at
    most one ``is_current`` row exists per key.  Consecutive updates with
    identical tracked values collapse to one version.  Ties on
    ``effective_ts`` are broken deterministically by the tracked values.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    open_cur = current.filter(F.col(is_current))
    closed_cur = current.filter(~F.col(is_current))

    # chain-aware no-op collapse: each update compares against its
    # EFFECTIVE predecessor — the previous update in the batch's chain, or
    # the open version for the chain's first element.  (An up-front
    # anti-join against the open version would be wrong: it drops ANY
    # update equal to the open values, silently losing a revert like
    # open=X, batch=[Y@t1, X@t2] — X@t2 is a real change after Y.)
    tracked_struct = F.struct(*[F.col(c) for c in tracked_cols])
    open_vals = open_cur.select(
        *keys,
        F.struct(*[F.col(c) for c in tracked_cols]).alias("__open_vals"),
    )
    w_key = Window.partitionBy(*keys).orderBy(F.col(effective_col), tracked_struct)
    changes = (
        updates.join(open_vals, keys, "left")
        .withColumn(
            "__prev",
            F.coalesce(F.lag(tracked_struct).over(w_key), F.col("__open_vals")),
        )
        .filter(F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(tracked_struct))
        .drop("__prev", "__open_vals")
    )
    # close each surviving version at the next survivor's effective time
    w_key2 = Window.partitionBy(*keys).orderBy(F.col(effective_col), tracked_struct)
    changes = changes.withColumn("__next_eff", F.lead(effective_col).over(w_key2))

    change_keys = changes.select(*keys).distinct()
    # close open versions for changed keys at the update's effective time
    closing = (
        open_cur.join(change_keys, keys)
        .join(
            changes.groupBy(*keys).agg(F.min(effective_col).alias("__eff")), keys
        )
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(is_current, F.lit(False))
        .drop("__eff")
    )
    unchanged_open = open_cur.join(change_keys, keys, "left_anti")

    new_versions = changes.select(
        *keys,
        *tracked_cols,
        F.col(effective_col).alias(valid_from),
        F.col("__next_eff").cast(current.schema[valid_to].dataType).alias(valid_to),
        F.col("__next_eff").isNull().alias(is_current),
    )
    return (
        closed_cur.unionByName(unchanged_open)
        .unionByName(closing)
        .unionByName(new_versions)
    )
