"""Aggregation surface (SURVEY.md §2C 'Aggregations' — empty in the
reference, which fakes 'latest per key' sink-side; the engine ships the full
groupBy/agg/rollup/cube/pivot category).

Scale notes: every aggregate here is a hash aggregate with map-side partial
aggregation (one shuffle on the group keys, partial_* functions visible in
the plan); rollup/cube expand grouping sets before the same single shuffle.
Double sums are rounded in both engines so summation order can't flip the
value-hash (registry conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import pin
from ..sources.batch import load_table
from .registry import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 8-function hash aggregate (the canonical
    partial-agg + single-shuffle plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_minmax_distinct",
    oracle="""
    SELECT o_orderpriority,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_minmax_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count-distinct — distinct agg adds the expand+two-phase plan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's shuffle is the bottleneck.  No oracle (estimator-specific
    values differ across engines); driver records the rows-only check, and
    the unit test bounds the relative error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("median_price_approx"),
    )


@register(
    "agg_approx_percentile_error",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
           TRUE AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion for the KLL percentile sketch, same pattern
    as ``agg_approx_distinct_error``: the exact median is emitted next to
    a boolean asserting ``percentile_approx`` landed within ±2% of it —
    the oracle pins the boolean, so sketch drift fails the value hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "exact_median"
            ),
            F.expr("percentile_approx(l_extendedprice, 0.5)").alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                F.abs(F.col("__approx") - F.col("exact_median"))
                <= F.col("exact_median") * 0.02
            ).alias("within_tolerance"),
        )
    )


@register(
    "agg_approx_distinct_error",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to ``agg_approx_distinct``: emits the exact
    distinct count next to a boolean asserting HyperLogLog++ landed within
    ±5% of it.  The oracle pins the boolean to TRUE, so an estimator drift
    beyond the band fails the value-hash gate — the strongest check an
    engine-specific sketch admits (the raw estimate itself can never be
    oracle-identical across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= F.col("exact_parts") * 0.05
            ).alias("within_tolerance"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (nation, nation+segment, grand total)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation (the explicit value list keeps the
    plan a single pass — no distinct-values pre-query)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "agg_statistics",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance) —
    single-pass moment computation, partial-aggregated like any hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


@register(
    "agg_percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — verified value-identical).  Exact percentile sorts
    per group; at 100 TB prefer ``percentile_approx`` (KLL sketch, in
    ``agg_approx_distinct``) unless exactness is contractual.

    One ARRAY-form ``percentile`` call, not three scalar ones (r15):
    each scalar call keeps its own copy of every group value and sorts
    it independently — the array form buffers and sorts ONCE for all
    three ranks (same interpolation, value-identical; the r4 one-
    quantile-call-per-group lesson applied to the JVM aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.50D, 0.90D))"
        ).alias("__p")
    ).select(
        "l_returnflag",
        F.round(F.element_at("__p", 1), 4).alias("p25"),
        F.round(F.element_at("__p", 2), 4).alias("p50"),
        F.round(F.element_at("__p", 3), 4).alias("p90"),
    )


@register(
    "agg_boolean_filter_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           CAST(MIN(o_orderkey) FILTER (WHERE o_orderstatus = 'O')
                AS BIGINT) AS first_open_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_boolean_filter_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and FILTER-clause aggregates: conditional counts without a
    pre-filter subquery (``count_if`` ≡ ``COUNT(*) FILTER``), universal/
    existential reductions (``every``/``any`` ≡ ``bool_and``/``bool_or``),
    and a filtered MIN — the SQL:2003 aggregate-FILTER surface.  All
    integer/boolean outputs, trivially hash-exact; deterministic because
    none of them depend on accumulation order."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.min(
            F.when(F.col("o_orderstatus") == "O", F.col("o_orderkey"))
        ).cast("long").alias("first_open_key"),
    )


@register(
    "relational_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, ROUND(amount, 2) AS amount
    FROM (
        SELECT l_orderkey, l_linenumber,
               'extendedprice' AS metric, l_extendedprice AS amount
        FROM lineitem WHERE l_orderkey % 50 = 3
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 50 = 3
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey % 50 = 3
    )
    """,
)
def relational_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping through the first-class ``DataFrame.unpivot``
    API (≡ SQL UNPIVOT / pandas melt) — three measure columns become
    (metric, amount) rows keyed by the line identity.  The oracle states
    the same reshape as a UNION ALL, the form UNPIVOT desugars to.
    Map-side only: unpivot is a per-row expand (rows × #measures), no
    shuffle — at 100 TB the multiplier is the thing to budget, hence the
    keyed slice."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 3
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("substr(metric, 3)").alias("metric"),
        F.round("amount", 2).alias("amount"),
    )


@register(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_list
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY ALL
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4's ``listagg(...) WITHIN GROUP
    (ORDER BY ...)`` (ANSI 2016) next to DuckDB's ``string_agg(... ORDER
    BY)``, with ``GROUP BY ALL`` on both sides (two Spark-4 SQL surfaces
    in one pinned entry).  Deterministic because the ORDER BY key
    (s_name) is unique per group — the registry's window-tiebreak rule
    applied to ordered-set aggregates; an unordered listagg would be
    partitioning-dependent and could never hash-check.  Scale: one hash
    aggregate with map-side partials; per-group payload is bounded by
    group cardinality (25 nations), not table size."""
    for t in ("supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_laview")
    return spark.sql(
        """
        SELECT n_name,
               COUNT(*) AS n_suppliers,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS supplier_list
        FROM supplier_laview JOIN nation_laview ON s_nationkey = n_nationkey
        GROUP BY ALL
        """
    )


@register(
    "affinity_copurchase_pairs",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM d),
    co AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_co
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    pc AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
        FROM d GROUP BY 1
    )
    SELECT co.part_a, co.part_b, co.n_co,
           pa.n_part AS n_a, pb.n_part AS n_b,
           (CAST(co.n_co AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             / (CAST(pa.n_part AS DOUBLE) * CAST(pb.n_part AS DOUBLE)) AS lift
    FROM co
    JOIN pc pa ON pa.l_partkey = co.part_a
    JOIN pc pb ON pb.l_partkey = co.part_b
    CROSS JOIN n
    ORDER BY n_co DESC, part_a, part_b
    LIMIT 20
    """,
)
def affinity_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity — the association-rule / co-occurrence
    mining shape (top co-purchased part pairs with support and lift) that
    recommendation and assortment pipelines run over order lines.

    Scale analysis, the reason this composes safely at 100 TB: the pair
    blow-up is bounded per ORDER, not per corpus — the self-join keys on
    ``l_orderkey`` (one shuffle, then an order's pairs form locally:
    ≤ C(items_per_order, 2), a small constant for basket-shaped data),
    and the pair aggregate partial-combines map-side before its shuffle.
    The total-order count rides a 1-row broadcast (corpus-derived dial
    rule); lift is BIGINT counts pushed through a correctly-rounded IEEE
    float tree identical in both engines, so the double value-hashes
    bit-exactly — no rounding dial needed.  Ties in support break on the
    unique (part_a, part_b) pair."""
    d = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = d.select("l_orderkey").distinct().agg(F.count("*").alias("n_orders"))
    a = d.alias("a")
    b = d.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_co"))
    )
    pc = d.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    pa = pc.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    pb = pc.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    lift = (F.col("n_co").cast("double") * F.col("n_orders").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        co.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", "n_co", "n_a", "n_b", lift.alias("lift"))
        .orderBy(F.col("n_co").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "agg_mode_median",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_quantity AS q, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (
        SELECT l_returnflag, q AS mode_qty
        FROM (SELECT l_returnflag, q,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                        ORDER BY n DESC, q) AS rn
              FROM c) r
        WHERE rn = 1
    )
    SELECT l.l_returnflag, m.mode_qty,
           MEDIAN(l.l_quantity) AS median_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY 1, 2
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 3.4+ ordered-set aggregates ``mode(col, deterministic=True)``
    and ``median(col)`` — the two most-requested ANALYZE/monitoring
    statistics the older releases made users hand-roll with windows.

    Determinism across engines: Spark's deterministic mode returns the
    LOWEST value among tied max frequencies (verified on a planted tie),
    which the oracle replays as ``ROW_NUMBER() OVER (ORDER BY n DESC,
    q)`` — the registry's unique-tiebreak rule applied to an aggregate.
    Median's midpoint interpolation is hash-safe HERE because
    ``l_quantity`` is integer-valued double (midpoints are exact halves,
    so both engines' interpolation trees agree bit-for-bit); a generic
    double column would need the fixed-point discipline instead.  Scale:
    mode/median are sort-based aggregations — per-group value lists, not
    map-side-mergeable partials — so at 100 TB the approx KLL twin
    (`agg_approx_percentile_error`) is the default and this is the exact
    audit pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_quantity", True).alias("mode_qty"),
        F.median("l_quantity").alias("median_qty"),
        F.count("*").alias("n_rows"),
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY 1
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (the materialized-view / streaming
    state-merge shape): the fact splits into a BASE shard (~75%) and a
    DELTA batch (~25%) on a deterministic key predicate; each side
    aggregates to per-group PARTIALS (count, BIGINT quantity sum, max),
    and the partials MERGE associatively — count+count, sum+sum,
    max-of-max — into totals the oracle pins against a direct full-table
    recompute.  The hash match IS the merge law: partials from disjoint
    shards combine into exactly the one-pass answer, which is (a) what
    map-side combine exploits inside every shuffle, and (b) what lets a
    100 TB nightly delta fold into stored rollup state without
    rescanning base — the incremental-MV contract.  COUNT DISTINCT is
    deliberately absent: it is NOT mergeable this way (that gap is the
    portable-sketch tier's job, `plans/sketch_ops.py`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count("*").alias("p_count"),
            F.sum(F.col("l_quantity").cast("long")).alias("p_qty"),
            F.max("l_extendedprice").alias("p_max"),
        )
    base = partials(li.filter(F.col("l_orderkey") % 4 != 3))
    delta = partials(li.filter(F.col("l_orderkey") % 4 == 3))
    return (
        base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("p_count").alias("n_lines"),
            F.sum("p_qty").alias("qty_sum"),
            F.max("p_max").alias("max_price"),
        )
    )



@register(
    "relational_transpose",
    oracle="""
    WITH a AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        FROM documents GROUP BY 1
    )
    SELECT 'chars_sum' AS key,
           (SELECT chars_sum FROM a WHERE lang = 'de') AS de,
           (SELECT chars_sum FROM a WHERE lang = 'en') AS en,
           (SELECT chars_sum FROM a WHERE lang = 'es') AS es,
           (SELECT chars_sum FROM a WHERE lang = 'fr') AS fr,
           (SELECT chars_sum FROM a WHERE lang = 'zh') AS zh
    UNION ALL
    SELECT 'n_docs',
           (SELECT n_docs FROM a WHERE lang = 'de'),
           (SELECT n_docs FROM a WHERE lang = 'en'),
           (SELECT n_docs FROM a WHERE lang = 'es'),
           (SELECT n_docs FROM a WHERE lang = 'fr'),
           (SELECT n_docs FROM a WHERE lang = 'zh')
    """,
)
def relational_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4) — rows↔columns over an AGGREGATED
    frame: per-language metrics become one column per language with the
    metric name in ``key``, the report/BI layout flip (`relational_unpivot`
    is the inverse direction).  Transpose collects the index column to
    name the output columns, so it belongs strictly AFTER aggregation —
    transposing a fact table would be the anti-pattern (column count =
    row count); on a 5-language rollup the collected index is 5 values
    regardless of corpus size.  The oracle reconstructs the same matrix
    with scalar subqueries; the language set is closed (de/en/es/fr/zh at
    every sf) so both engines emit identical column sets."""
    docs = load_table(spark, sf_dir, "documents")
    rollup = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
    )
    return rollup.transpose()


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
    WITH per AS (
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers
        FROM orders GROUP BY 1
    ),
    g AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS merged_buyers
        FROM orders
    )
    SELECT o_orderpriority, n_buyers, merged_buyers
    FROM per CROSS JOIN g
    """,
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through Spark 4's bitmap aggregates
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``) —
    the mergeable alternative to COUNT(DISTINCT)'s Expand and to HLL's
    approximation.  Keys land in 32768-bit buckets; each (group, bucket)
    cell aggregates to one fixed-size bitmap, so the distinct count is
    SUM over buckets of popcount — two ordinary partial-aggregate
    shuffles, never an Expand and never a re-shuffle of raw keys.  The
    ``merged_buyers`` lane is the mergeability proof the 100 TB posture
    rests on: per-priority bitmaps are OR-merged per bucket
    (``bitmap_or_agg``) and must reproduce the direct whole-table
    distinct count the oracle computes — bitwise-exact, unlike sketch
    merges.  At 100 TB the bitmap state is bounded by the KEY DOMAIN
    (4 KiB per cell), not the row count, and every stage is map-side
    combinable."""
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.groupBy(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"))
    )
    cells = pin(cells)  # tracked persist: release_pins drops it next query (ADVICE r6)
    per = cells.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_buyers")
    )
    merged = (
        cells.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("merged_buyers"))
    )
    return per.crossJoin(merged)


_REGR_EXACT = """
    SELECT f,
           n, n_pairs,
           ROUND(cxy / vx, 6) AS slope_x,
           ROUND(my - (cxy / vx) * mx, 6) AS icpt_x,
           ROUND((cxy * cxy) / (vx * vy), 6) AS r2_x,
           ABS(rs - cxy / vx) <= 1e-9 AS slope_ok,
           ABS(ri - (my - (cxy / vx) * mx)) <= 1e-9 AS icpt_ok,
           ABS(rr - (cxy * cxy) / (vx * vy)) <= 1e-9 AS r2_ok
    FROM (
        SELECT f, n, n_pairs, rs, ri, rr,
               CAST(sx AS DOUBLE) / n AS mx,
               CAST(sy AS DOUBLE) / n AS my,
               CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS vx,
               CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS vy,
               CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cxy
        FROM moments
    ) m
"""


@register(
    "agg_regression_funcs",
    oracle="""
    WITH t AS (
        SELECT l_returnflag AS f,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice / 1000) AS BIGINT) AS y
        FROM lineitem
    ),
    moments AS (
        SELECT f,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(regr_count(y, x) AS BIGINT) AS n_pairs,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               regr_slope(y, x) AS rs,
               regr_intercept(y, x) AS ri,
               regr_r2(y, x) AS rr
        FROM t GROUP BY f
    )
    """
    + _REGR_EXACT,
)
def agg_regression_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates — ``regr_slope`` / ``regr_intercept``
    / ``regr_r2`` / ``regr_count`` (ANSI bivariate family, Spark 3.4+).
    The engine-internal covariance accumulation (Welford-style) is NOT
    reproducible bit-for-bit across engines, so the hash-exact lanes are
    the slope/intercept/r² REBUILT from exact integer moments (Σx, Σy,
    Σx², Σxy, Σy² as BIGINTs, identical double expression trees both
    sides — the z-score rule from round 4), and each engine's regr_*
    output is pinned to its own exact rebuild by a 1e-9 tolerance
    boolean (measured deviation ~1e-15; the estimator-band pattern).
    y is integer kilodollars so Σy² stays ≪ 2^63 at ~10^12 rows — the
    moments themselves are the scale hazard (round-6 overflow rule),
    and x·y products never ride a raw-double sum across a shuffle.
    regr_count is exact and hashes directly."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("f"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") / 1000).cast("long").alias("y"),
    )
    t.createOrReplaceTempView("regr_src")
    return spark.sql(
        """
        WITH moments AS (
            SELECT f,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(regr_count(y, x) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   regr_slope(y, x) AS rs,
                   regr_intercept(y, x) AS ri,
                   regr_r2(y, x) AS rr
            FROM regr_src GROUP BY f
        )
        """
        + _REGR_EXACT
    )
