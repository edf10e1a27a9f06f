"""Z-order layout queries over ``lineitem``: file assignment by Morton
code of (l_partkey, l_suppkey), per-file min/max pruning statistics, and
the scan-pruning ratio a two-dimensional predicate achieves on the
z-ordered layout vs the natural orderkey-ordered layout.

This is the data-layout leg of the 100 TB story: at scale, which FILES a
predicate has to open dominates scan cost, and engines prune files by
per-file min/max stats (parquet row-group stats, Delta/Iceberg file
stats).  A single-key sort clusters only that key; interleaving bits of
two keys (``OPTIMIZE ZORDER BY``) bounds BOTH key ranges per file.  The
entries here compute the layout and measure the benefit — everything is
deterministic bit arithmetic, so the whole demonstration is hash-checked
against DuckDB.

File sizing is corpus-derived like the shuffle/semantic dials: the z
range splits into ``N_FILES`` equal z-spans (cap = zmax/N + 1 computed by
BOTH engines from the data, 1-row broadcast — map-side assignment, no
global sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import zvalue, zvalue_sql
from ..sources.batch import load_table
from .registry import register

N_FILES = 64

# the demonstration predicate: a tight 2-D box on (partkey, suppkey).
# Key domains scale 10× per sf (part ≤ 200/2k/20k; supp ≤ 10/100/1k), so
# the box sits at the low end to match rows at EVERY sf (non-vacuity
# rule; verified 2707 / 267 / 26 matching rows at sf0.001/0.01/0.1).
PART_LO, PART_HI = 1, 99
SUPP_LO, SUPP_HI = 1, 9

_Z = zvalue_sql("l_partkey", "l_suppkey")

_LAYOUT_SQL = f"""
    z AS (
        SELECT l_partkey, l_suppkey, l_orderkey, {_Z} AS zval
        FROM lineitem
    ),
    cap AS (
        SELECT (MAX(zval) // {N_FILES}) + 1 AS zcap,
               (MAX(l_orderkey) // {N_FILES}) + 1 AS ocap
        FROM z
    ),
    assigned AS (
        SELECT l_partkey, l_suppkey, l_orderkey,
               CAST(zval // zcap AS BIGINT) AS z_file,
               CAST(l_orderkey // ocap AS BIGINT) AS linear_file
        FROM z CROSS JOIN cap
    )
"""


@register(
    "layout_zorder_file_stats",
    oracle=f"""
    WITH {_LAYOUT_SQL}
    SELECT z_file,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM assigned
    GROUP BY z_file
    """,
)
def layout_zorder_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-ordered layout's file manifest: per-file row count and
    min/max of both clustering keys — exactly the statistics a scan
    planner prunes with.  Assignment is map-side (Morton code + a 1-row
    broadcast z-range cap); the only shuffle is the per-file rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey", "l_suppkey", "l_orderkey",
        zvalue("l_partkey", "l_suppkey").alias("zval"),
    )
    cap = z.agg(
        ((F.max("zval") / N_FILES).cast("long") + 1).alias("zcap"),
        ((F.max("l_orderkey") / N_FILES).cast("long") + 1).alias("ocap"),
    )
    assigned = z.crossJoin(F.broadcast(cap)).select(
        "l_partkey",
        "l_suppkey",
        F.expr("zval div zcap").alias("z_file"),
    )
    return assigned.groupBy("z_file").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").cast("long").alias("min_part"),
        F.max("l_partkey").cast("long").alias("max_part"),
        F.min("l_suppkey").cast("long").alias("min_supp"),
        F.max("l_suppkey").cast("long").alias("max_supp"),
    )


@register(
    "layout_zorder_pruning_ratio",
    oracle=f"""
    WITH {_LAYOUT_SQL},
    zstats AS (
        SELECT z_file, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
               MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
        FROM assigned GROUP BY z_file
    ),
    lstats AS (
        SELECT linear_file, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
               MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
        FROM assigned GROUP BY linear_file
    )
    SELECT
        CAST((SELECT COUNT(*) FROM zstats) AS BIGINT) AS n_files_z,
        CAST((SELECT COUNT(*) FROM zstats
              WHERE pmax >= {PART_LO} AND pmin <= {PART_HI}
                AND smax >= {SUPP_LO} AND smin <= {SUPP_HI}) AS BIGINT)
            AS z_files_scanned,
        CAST((SELECT COUNT(*) FROM lstats) AS BIGINT) AS n_files_linear,
        CAST((SELECT COUNT(*) FROM lstats
              WHERE pmax >= {PART_LO} AND pmin <= {PART_HI}
                AND smax >= {SUPP_LO} AND smin <= {SUPP_HI}) AS BIGINT)
            AS linear_files_scanned,
        CAST((SELECT COUNT(*) FROM assigned
              WHERE l_partkey BETWEEN {PART_LO} AND {PART_HI}
                AND l_suppkey BETWEEN {SUPP_LO} AND {SUPP_HI}) AS BIGINT)
            AS n_matching_rows
    """,
)
def layout_zorder_pruning_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff measurement, one hash-checked row: for a tight 2-D box
    predicate, how many files each layout's min/max stats force a scanner
    to open.  The z-ordered layout bounds both keys per file, so it opens
    a small fraction; the orderkey-ordered (ingestion-order) layout has
    every file spanning the full part/supp range, so it opens ~all of
    them.  ``n_matching_rows`` pins that the predicate itself is
    non-vacuous at every sf."""
    from ..caching import pin

    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey", "l_suppkey", "l_orderkey",
        zvalue("l_partkey", "l_suppkey").alias("zval"),
    )
    cap = z.agg(
        ((F.max("zval") / N_FILES).cast("long") + 1).alias("zcap"),
        ((F.max("l_orderkey") / N_FILES).cast("long") + 1).alias("ocap"),
    )
    assigned = pin(
        z.crossJoin(F.broadcast(cap)).select(
            "l_partkey",
            "l_suppkey",
            F.expr("zval div zcap").alias("z_file"),
            F.expr("l_orderkey div ocap").alias("linear_file"),
        )
    )

    def file_counts(file_col: str, total_alias: str, scanned_alias: str) -> DataFrame:
        stats = assigned.groupBy(file_col).agg(
            F.min("l_partkey").alias("pmin"),
            F.max("l_partkey").alias("pmax"),
            F.min("l_suppkey").alias("smin"),
            F.max("l_suppkey").alias("smax"),
        )
        overlap = (
            (F.col("pmax") >= PART_LO)
            & (F.col("pmin") <= PART_HI)
            & (F.col("smax") >= SUPP_LO)
            & (F.col("smin") <= SUPP_HI)
        )
        return stats.agg(
            F.count("*").alias(total_alias),
            F.sum(overlap.cast("long")).alias(scanned_alias),
        )

    zc = file_counts("z_file", "n_files_z", "z_files_scanned")
    lc = file_counts("linear_file", "n_files_linear", "linear_files_scanned")
    rows = assigned.filter(
        F.col("l_partkey").between(PART_LO, PART_HI)
        & F.col("l_suppkey").between(SUPP_LO, SUPP_HI)
    ).agg(F.count("*").alias("n_matching_rows"))
    return (
        zc.crossJoin(F.broadcast(lc))
        .crossJoin(F.broadcast(rows))
        .select(
            "n_files_z", "z_files_scanned",
            "n_files_linear", "linear_files_scanned",
            "n_matching_rows",
        )
    )
