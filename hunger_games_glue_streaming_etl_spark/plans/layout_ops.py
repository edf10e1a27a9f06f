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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import hvalue, hvalue_sql, zvalue, zvalue_sql
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


# ---------------------------------------------------------------------------
# Small-file compaction — the OTHER data-layout maintenance a 100 TB lake
# runs constantly: streaming ingest lands thousands of tiny files per
# trigger, and scan cost at scale is dominated by files opened, so a
# compactor periodically bin-packs contiguous runs of small files into
# target-sized outputs (Delta OPTIMIZE, Iceberg rewrite_data_files).  The
# planner here IS that operator's core: a deterministic first-fit-in-order
# assignment via an exclusive running byte sum — computed with the same
# two-level cumulative-sum shape as `corpus_token_budget_select`, so no
# task ever sees the whole manifest, and the whole plan is integer
# arithmetic, hash-checked against DuckDB's single-window twin.
#
# The input manifest is simulated from `documents` metadata only (ingest
# micro-batches of DOCS_PER_INGEST_FILE docs; file bytes = Σ n_chars) —
# text never enters any plan here.  The byte target is corpus-derived
# (total // COMPACT_TARGET_FRACTION + 1, 1-row broadcast) like the
# z-span/shard dials; a real deployment pins it at e.g. 512 MB.
# ---------------------------------------------------------------------------

DOCS_PER_INGEST_FILE = 4
COMPACT_TARGET_FRACTION = 32  # target_bytes ≈ total/32 → ~4:1 compaction
_COMPACT_SLICES = 32          # two-level cumsum fan-out

_COMPACT_SQL = f"""
    f AS (
        SELECT doc_id // {DOCS_PER_INGEST_FILE} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS file_bytes
        FROM documents GROUP BY 1
    ),
    dial AS (
        SELECT CAST((SUM(file_bytes) // {COMPACT_TARGET_FRACTION}) + 1
                    AS BIGINT) AS target_bytes
        FROM f
    ),
    cum AS (
        SELECT file_id, n_docs, file_bytes, target_bytes,
               CAST(COALESCE(SUM(file_bytes) OVER (
                   ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM f CROSS JOIN dial
    ),
    plan AS (
        SELECT file_id, n_docs, file_bytes, target_bytes,
               CAST(cum_before // target_bytes AS BIGINT) AS out_file
        FROM cum
    )
"""


def _compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(file_id, n_docs, file_bytes, target_bytes, out_file) — the shared
    assignment both compaction entries consume.

    Shuffle profile: one compact shuffle on file_id for the per-file
    rollup, then the two-level cumulative sum — a per-slice window (slice
    = file_id range, cap 1-row broadcast) plus a window over the ≤32
    per-slice totals (metadata scale), whose prefix offsets broadcast
    back.  Integer adds reassociate freely, so local + offset reproduces
    the oracle's single global window bit-for-bit."""
    from ..caching import pin

    docs = load_table(spark, sf_dir, "documents")
    f = pin(
        docs.select(
            F.expr(f"doc_id div {DOCS_PER_INGEST_FILE}").alias("file_id"),
            "n_chars",
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("file_bytes"),
        )
    )
    dial = f.agg(
        (F.expr(f"sum(file_bytes) div {COMPACT_TARGET_FRACTION}") + 1)
        .cast("long")
        .alias("target_bytes"),
        (F.expr(f"max(file_id) div {_COMPACT_SLICES}") + 1)
        .cast("long")
        .alias("__scap"),
    )
    a = f.crossJoin(F.broadcast(dial)).withColumn(
        "__slice", F.expr("file_id div __scap")
    )
    w_local = (
        Window.partitionBy("__slice")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = a.withColumn(
        "__local_before", F.coalesce(F.sum("file_bytes").over(w_local), F.lit(0))
    )
    totals = a.groupBy("__slice").agg(
        F.sum("file_bytes").cast("long").alias("__slice_total")
    )
    w_off = Window.orderBy("__slice").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__slice",
        F.coalesce(F.sum("__slice_total").over(w_off), F.lit(0)).alias("__offset"),
    )
    return (
        local.join(F.broadcast(offsets), "__slice")
        .withColumn(
            "out_file",
            F.expr("(__local_before + __offset) div target_bytes").cast("long"),
        )
        .select("file_id", "n_docs", "file_bytes", "target_bytes", "out_file")
    )


@register(
    "layout_compaction_plan",
    oracle=f"""
    WITH {_COMPACT_SQL}
    SELECT out_file,
           CAST(COUNT(*) AS BIGINT) AS n_input_files,
           CAST(SUM(file_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(file_id) AS BIGINT) AS min_input_file,
           CAST(MAX(file_id) AS BIGINT) AS max_input_file
    FROM plan
    GROUP BY out_file
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compaction manifest: which contiguous run of small ingest files
    each target-sized output file absorbs, with byte totals — exactly the
    rewrite task list a lake compactor executes.  125 input files → ~32
    outputs at every sf (non-vacuous by construction)."""
    return (
        _compaction_plan(spark, sf_dir)
        .groupBy("out_file")
        .agg(
            F.count("*").alias("n_input_files"),
            F.sum("file_bytes").cast("long").alias("total_bytes"),
            F.min("file_id").cast("long").alias("min_input_file"),
            F.max("file_id").cast("long").alias("max_input_file"),
        )
    )


@register(
    "layout_compaction_ratio",
    oracle=f"""
    WITH {_COMPACT_SQL},
    m AS (
        SELECT out_file, SUM(file_bytes) AS out_bytes
        FROM plan GROUP BY out_file
    )
    SELECT
        CAST((SELECT COUNT(*) FROM plan) AS BIGINT) AS n_input_files,
        CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_output_files,
        CAST((SELECT SUM(file_bytes) FROM plan) AS BIGINT) AS total_bytes,
        CAST((SELECT MAX(target_bytes) FROM plan) AS BIGINT) AS target_bytes,
        CAST((SELECT MAX(out_bytes) FROM m) AS BIGINT) AS max_output_bytes
    """,
)
def layout_compaction_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff, one hash-checked row: input vs output file counts (the
    scan-open reduction), the corpus-derived byte target, and the largest
    output (bounded by target + one input file — first-fit over contiguous
    runs never splits an input)."""
    from ..caching import pin

    plan = pin(_compaction_plan(spark, sf_dir))
    m = plan.groupBy("out_file").agg(F.sum("file_bytes").alias("out_bytes"))
    top = plan.agg(
        F.count("*").alias("n_input_files"),
        F.sum("file_bytes").cast("long").alias("total_bytes"),
        F.max("target_bytes").cast("long").alias("target_bytes"),
    )
    outs = m.agg(
        F.count("*").alias("n_output_files"),
        F.max("out_bytes").cast("long").alias("max_output_bytes"),
    )
    return top.crossJoin(F.broadcast(outs)).select(
        "n_input_files",
        "n_output_files",
        "total_bytes",
        "target_bytes",
        "max_output_bytes",
    )


@register(
    "layout_bucketed_colocated_join",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_orderkey) AS min_orderkey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def layout_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-bucketed co-located join: both tables are written with
    ``bucketBy(8, key)`` + ``sortBy(key)`` into the session catalog, so
    the sort-merge join reads bucket i against bucket i directly — ZERO
    Exchange on either join input (asserted in
    ``tests/test_plan_shapes.py``).  This is the storage-layout answer to
    the biggest 100 TB cost in the repo: a fact-fact join that would
    otherwise shuffle both sides every run instead pays the shuffle ONCE
    at write time and never again — the layout amortizes across every
    downstream join/aggregation on the same key.  The MERGE hint keeps
    the plan on the bucket-aware SMJ path regardless of the
    autoBroadcastJoinThreshold (no session conf is touched — the r5
    lesson about entries leaking conf state).  The oracle replays the
    join from the parquet source of truth, proving the bucketed layout
    is lossless."""
    import os
    import shutil

    # a fresh session's in-memory catalog has no record of a previous
    # session's managed tables, but their warehouse dirs persist —
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS.  Drop both the
    # catalog entry and any orphaned location before writing.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix) :]
            break
    for tbl in ("hg_bucketed_orders", "hg_bucketed_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("hg_bucketed_orders")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("hg_bucketed_customer")
    )
    o = spark.table("hg_bucketed_orders")
    c = spark.table("hg_bucketed_customer").hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "layout_partitioned_write_prune",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_orderkey) AS min_key
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) =
          (SELECT MIN(EXTRACT(YEAR FROM o_orderdate)) FROM orders)
    GROUP BY 1
    """,
)
def layout_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + static partition pruning — the
    most common lake layout, completing the layout family (z-order,
    compaction, bucketing, and now directory partitioning): write orders
    partitioned by ``order_year`` directories, then filter the read-back
    on the corpus-derived MIN year (the data-dependent dial rule — the
    one-value collect is a bounded driver dial, the ANN-centroid
    pattern), so the scan's ``PartitionFilters`` prune every other year
    directory at FILE-LISTING time, before any task launches
    (plan-asserted in ``tests/test_plan_shapes.py``; the join-driven
    variant of the same mechanism, dynamic partition pruning, is
    plan-asserted separately there).  At 100 TB this is the difference
    between scanning one day/year of a fact table and scanning all of
    it.  The oracle replays the min-year filter over the source of
    truth, proving the partitioned round trip is lossless."""
    from ..tmpdirs import entry_tmp_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    o2 = orders.withColumn("order_year", F.year("o_orderdate"))
    path = entry_tmp_dir("hg_part_prune")
    o2.write.partitionBy("order_year").mode("overwrite").parquet(path)
    min_year = o2.agg(F.min("order_year")).collect()[0][0]
    back = spark.read.parquet(path).filter(F.col("order_year") == min_year)
    return back.groupBy(
        F.col("order_year").cast("int").alias("order_year")
    ).agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
    )


# ---- Hilbert-curve layout (the liquid-clustering shape) ---------------------
# Same demonstration as the z-order tier, on the Hilbert index: Delta
# liquid clustering moved from Morton to Hilbert because Morton's bit
# interleave has big-jump seams (adjacent z values can be far apart in
# key space, bloating per-file bounding boxes), while the Hilbert curve
# is seam-free — every curve step is a unit step in key space.  The
# `hvalue` operator computes the index as a 4-state FSM unroll (O(bits²)
# expression nodes, whole-stage codegen — see operators/layout.py) and
# the DuckDB twin replays the same tables, so layout assignment, file
# statistics, and the locality comparison are all hash-exact.

_H = hvalue_sql("l_partkey", "l_suppkey")

_HILBERT_LAYOUT_SQL = f"""
    hz AS (
        SELECT l_partkey, l_suppkey, {_H} AS hval, {_Z} AS zval
        FROM lineitem
    ),
    hcap AS (
        SELECT (MAX(hval) // {N_FILES}) + 1 AS hcap,
               (MAX(zval) // {N_FILES}) + 1 AS zcap
        FROM hz
    ),
    hassigned AS (
        SELECT l_partkey, l_suppkey,
               CAST(hval // hcap AS BIGINT) AS h_file,
               CAST(zval // zcap AS BIGINT) AS z_file
        FROM hz CROSS JOIN hcap
    )
"""


@register(
    "layout_hilbert_file_stats",
    oracle=f"""
    WITH {_HILBERT_LAYOUT_SQL}
    SELECT h_file,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM hassigned
    GROUP BY h_file
    """,
)
def layout_hilbert_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hilbert-clustered layout's file manifest: per-file row count
    and min/max of both clustering keys.  Assignment is map-side (FSM
    Hilbert index + a 1-row broadcast range cap — no global sort), the
    only shuffle is the per-file rollup; identical plan shape to
    `layout_zorder_file_stats` so the two manifests are directly
    comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.select(
        "l_partkey", "l_suppkey",
        hvalue("l_partkey", "l_suppkey").alias("hval"),
    )
    cap = h.agg(((F.max("hval") / N_FILES).cast("long") + 1).alias("hcap"))
    assigned = h.crossJoin(F.broadcast(cap)).select(
        "l_partkey",
        "l_suppkey",
        F.expr("hval div hcap").alias("h_file"),
    )
    return assigned.groupBy("h_file").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").cast("long").alias("min_part"),
        F.max("l_partkey").cast("long").alias("max_part"),
        F.min("l_suppkey").cast("long").alias("min_supp"),
        F.max("l_suppkey").cast("long").alias("max_supp"),
    )


@register(
    "layout_hilbert_vs_zorder_locality",
    oracle=f"""
    WITH {_HILBERT_LAYOUT_SQL},
    hstats AS (
        SELECT h_file, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
               MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
        FROM hassigned GROUP BY h_file
    ),
    zstats AS (
        SELECT z_file, MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
               MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
        FROM hassigned GROUP BY z_file
    )
    SELECT 'hilbert' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN pmax >= {PART_LO} AND pmin <= {PART_HI}
                          AND smax >= {SUPP_LO} AND smin <= {SUPP_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM((pmax - pmin + 1) * (smax - smin + 1)) AS BIGINT)
               AS sum_bbox_area
    FROM hstats
    UNION ALL
    SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN pmax >= {PART_LO} AND pmin <= {PART_HI}
                          AND smax >= {SUPP_LO} AND smin <= {SUPP_HI}
                     THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM((pmax - pmin + 1) * (smax - smin + 1)) AS BIGINT)
    FROM zstats
    """,
)
def layout_hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head locality of the two multi-dimensional layouts, one
    hash-checked row per layout: non-empty file count, files a tight 2-D
    box predicate must open, and the summed per-file bounding-box area
    (the planner-visible locality metric — smaller boxes prune more).
    Both layouts split their curve range into the same {N_FILES}
    equal spans (map-side assignment, the design that needs no global
    sort at 100 TB); measured at sf0.001 the Hilbert layout opens half
    the files the Morton layout opens for the same box."""
    from ..caching import pin

    li = load_table(spark, sf_dir, "lineitem")
    hz = li.select(
        "l_partkey", "l_suppkey",
        hvalue("l_partkey", "l_suppkey").alias("hval"),
        zvalue("l_partkey", "l_suppkey").alias("zval"),
    )
    cap = hz.agg(
        ((F.max("hval") / N_FILES).cast("long") + 1).alias("hcap"),
        ((F.max("zval") / N_FILES).cast("long") + 1).alias("zcap"),
    )
    assigned = pin(
        hz.crossJoin(F.broadcast(cap)).select(
            "l_partkey",
            "l_suppkey",
            F.expr("hval div hcap").alias("h_file"),
            F.expr("zval div zcap").alias("z_file"),
        )
    )

    def layout_row(file_col: str, label: str) -> DataFrame:
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
            F.lit(label).alias("layout"),
            F.count("*").alias("n_files"),
            F.sum(overlap.cast("long")).alias("files_scanned"),
            F.sum(
                (F.col("pmax") - F.col("pmin") + 1)
                * (F.col("smax") - F.col("smin") + 1)
            ).alias("sum_bbox_area"),
        )

    return layout_row("h_file", "hilbert").unionAll(layout_row("z_file", "zorder"))


# ---- merge-on-read position deletes ------------------------------------------
# The SECOND industry-standard delete mechanism beside the keyed sink's
# copy-on-write rewrite (`sinks/upsert.py::delete_keys`): Iceberg/Delta
# deletion vectors mark (file, row_position) pairs dead and every reader
# anti-joins them at scan time — deletes cost O(deleted rows) writes
# instead of O(touched file bytes) rewrites, the right trade when deletes
# are sparse and reads can afford the join.  Spark's `_metadata.row_index`
# hidden column IS the position half of that pair; this entry builds a
# deterministic bucketed layout, derives a deletion vector, and serves the
# merge-on-read scan — with the POSITION ARITHMETIC itself value-hashed
# (the oracle reproduces (bucket, pos) by replaying the sorted write as a
# window rank, so a physical-order regression in the write path fails the
# hash gate, not just a row count).
_MOR_BUCKETS = 4
_MOR_DELETE_MOD = 7


@register(
    "layout_position_delete_read",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey, c_mktsegment,
               c_custkey % {_MOR_BUCKETS} AS bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey % {_MOR_BUCKETS}
                   ORDER BY c_custkey
               ) - 1 AS pos
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, CAST(bucket AS BIGINT) AS bucket,
           CAST(pos AS BIGINT) AS pos
    FROM base
    WHERE CAST(('0x' || substr(md5('0:' || CAST(c_custkey AS VARCHAR)), 1, 12))
               AS BIGINT) % {_MOR_DELETE_MOD} <> 0
    """,
)
def layout_position_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan over a position-deleted layout: the customer
    table written as {_MOR_BUCKETS} sorted bucket files, a deletion
    vector of (bucket, row_index) pairs derived from the doomed-key set
    (portable hash % {_MOR_DELETE_MOD} == 0 — the GDPR-forget shape), and
    the serving read = base scan + LEFT ANTI JOIN on the vector, with
    every surviving row's (bucket, pos) emitted from
    ``_metadata.row_index`` so the physical position arithmetic is part
    of the hash gate.

    Scale shape: the deletion vector carries two BIGINTs per deleted row
    (never keys or payload) and is broadcast while sparse — the exact
    Iceberg/Delta deletion-vector trade vs the copy-on-write
    `merge_delete_forgotten` (O(deleted) write cost here, O(touched
    bucket bytes) there; reads pay the anti-join here and nothing
    there).  Build writes are entry-local with lean_shuffle, one sorted
    file per bucket (a real table maintains that per-file ordering the
    same way ingest/compaction already sorts)."""
    from ..session import lean_shuffle
    from ..sources.batch import load_table as _lt
    from ..tmpdirs import entry_tmp_dir
    from ..functions.text import portable_hash64

    base_dir = entry_tmp_dir("hg_mor_position_deletes")
    cust = _lt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    with lean_shuffle(spark, _MOR_BUCKETS):
        for b in range(_MOR_BUCKETS):
            (
                cust.filter(F.col("c_custkey") % _MOR_BUCKETS == b)
                .repartition(1)
                .sortWithinPartitions("c_custkey")
                .write.mode("overwrite")
                .parquet(f"{base_dir}/bucket={b}")
            )
    scan = spark.read.parquet(f"{base_dir}/bucket=*").select(
        "c_custkey",
        "c_mktsegment",
        F.regexp_extract(F.col("_metadata.file_path"), r"bucket=(\d+)/", 1)
        .cast("long")
        .alias("bucket"),
        F.col("_metadata.row_index").alias("pos"),
    )
    doomed = F.pmod(
        portable_hash64(F.col("c_custkey").cast("string")), F.lit(_MOR_DELETE_MOD)
    ) == 0
    delete_vector = scan.filter(doomed).select("bucket", "pos")
    return scan.join(
        F.broadcast(delete_vector), ["bucket", "pos"], "left_anti"
    ).select("c_custkey", "c_mktsegment", "bucket", "pos")


# ---- merge-on-read equality deletes ------------------------------------------
# Iceberg's OTHER delete encoding (VERDICT r14 next #5), completing the
# three-way delete trade beside the position vector above and the
# copy-on-write `merge_delete_forgotten`: an equality-delete file stores
# KEY VALUES (not positions), so the writer needs no knowledge of where
# the doomed rows physically live — the encoding streaming-CDC writers
# must use, since a row's (file, position) is unknowable at delete time.
# Readers anti-join data rows on the equality columns, but ONLY rows from
# commits OLDER than the delete file's sequence number: a later re-insert
# of a deleted key SURVIVES (Iceberg's sequence-number semantics — the
# behavior that distinguishes equality from position deletes, pinned
# here by re-inserting half the doomed keys at seq 3).
_EQ_DELETE_MOD = 5  # portable hash % 5 == 0 -> deleted at seq 2
_EQ_REINSERT_MOD = 10  # half of those (hash % 10 == 0) re-ingested at seq 3
_EQ_BUCKETS = 4


@register(
    "layout_equality_delete_read",
    oracle=f"""
    SELECT c_custkey, c_mktsegment, CAST(1 AS BIGINT) AS seq
    FROM customer
    WHERE CAST(('0x' || substr(md5('0:' || CAST(c_custkey AS VARCHAR)), 1, 12))
               AS BIGINT) % {_EQ_DELETE_MOD} <> 0
    UNION ALL
    SELECT c_custkey, 'REINSTATED' AS c_mktsegment, CAST(3 AS BIGINT) AS seq
    FROM customer
    WHERE CAST(('0x' || substr(md5('0:' || CAST(c_custkey AS VARCHAR)), 1, 12))
               AS BIGINT) % {_EQ_REINSERT_MOD} = 0
    """,
)
def layout_equality_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan over an equality-deleted layout, three real
    commits on disk: seq=1 ingests the customer table as
    {_EQ_BUCKETS} bucket files; seq=2 writes an EQUALITY-DELETE file
    holding only the doomed c_custkey VALUES (portable hash %
    {_EQ_DELETE_MOD} == 0 — the GDPR-forget shape, written without
    touching or even locating the data files); seq=3 re-ingests half
    the doomed keys with a 'REINSTATED' segment.  The serving read
    applies the delete file ONLY to rows whose commit sequence precedes
    it (anti-join on the key values for seq < 2) and passes younger
    commits through — so the re-inserted keys survive, which is the
    sequence-number contract that makes equality deletes safe for
    streaming upsert pipelines.

    The three-way trade (BASELINE.md round-15 table): copy-on-write
    rewrites O(touched file bytes) at delete time and reads are free;
    position vectors write O(deleted rows) of (file, pos) pairs but the
    writer must locate each row (a scan) and reads pay a position
    anti-join; equality deletes write O(deleted KEYS) values with NO
    read or locate step at all — delete is pure append — and push the
    whole cost to readers (a value anti-join against every older data
    row, typically compacted away into position vectors at the next
    maintenance pass, which is exactly the `merge_delete_forgotten`
    rewrite).  The delete file carries bare BIGINT keys (never payload),
    broadcast while sparse; at 100 TB the anti-join shuffles on the
    same key the bucketed layout already clusters, and per-commit
    pruning (seq < delete_seq) bounds which files pay it.

    File stability is the merge-on-read claim and is pinned in
    ``test_equality_delete_leaves_data_files_untouched``: the seq=1
    data files' names, sizes, and mtimes are bit-identical before and
    after the delete commit."""
    from ..functions.text import portable_hash64
    from ..session import lean_shuffle
    from ..sources.batch import load_table as _lt
    from ..tmpdirs import entry_tmp_dir

    base_dir = entry_tmp_dir("hg_mor_equality_deletes")
    cust = _lt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hv = F.pmod(portable_hash64(F.col("c_custkey").cast("string")), F.lit(_EQ_DELETE_MOD))
    rv = F.pmod(portable_hash64(F.col("c_custkey").cast("string")), F.lit(_EQ_REINSERT_MOD))
    with lean_shuffle(spark, _EQ_BUCKETS):
        # seq=1: the base ingest, bucketed like any real table write
        (
            cust.repartition(_EQ_BUCKETS, "c_custkey")
            .write.mode("overwrite")
            .parquet(f"{base_dir}/data/seq=1")
        )
        # seq=2: the equality-delete commit — KEY VALUES only, written
        # blind (no scan of the data files, no positions)
        (
            cust.filter(hv == 0)
            .select("c_custkey")
            .repartition(1)
            .write.mode("overwrite")
            .parquet(f"{base_dir}/deletes/seq=2")
        )
        # seq=3: a younger ingest resurrecting half the doomed keys
        (
            cust.filter(rv == 0)
            .select("c_custkey", F.lit("REINSTATED").alias("c_mktsegment"))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(f"{base_dir}/data/seq=3")
        )
    data = spark.read.option("basePath", f"{base_dir}/data").parquet(
        f"{base_dir}/data/seq=*"
    )
    eq_deletes = spark.read.parquet(f"{base_dir}/deletes/seq=2").select("c_custkey")
    older = data.filter(F.col("seq") < 2).join(
        F.broadcast(eq_deletes), "c_custkey", "left_anti"
    )
    younger = data.filter(F.col("seq") > 2)
    return older.unionByName(younger).select(
        "c_custkey", "c_mktsegment", F.col("seq").cast("long").alias("seq")
    )
