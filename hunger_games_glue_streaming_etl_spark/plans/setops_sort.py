"""Sorts / limits / set operations (SURVEY.md §2C — both categories empty in
the reference; stock Spark).

Scale notes: global ``orderBy`` is a range-partitioned sort (sampling pass +
shuffle); ``limit`` after it becomes TakeOrderedAndProject — no full sort is
materialized for top-k.  ``intersect``/``except`` compile to semi/anti hash
joins with a distinct; ``unionByName`` is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit → TakeOrderedAndProject (per-partition
    heaps + driver merge, no global sort materialization).  Unique tiebreak
    column keeps the k-th row deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(25)
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations having both customers and
    suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct anti semantics) — nations with customers but no
    high-balance suppliers (the supplier filter keeps the result non-empty
    at every scale factor; the unfiltered form is vacuous)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.filter(F.col("s_acctbal") > 5000).select(
            F.col("s_nationkey").alias("nationkey")
        )
    )


@register(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "set_ops_bag_semantics",
    oracle="""
    WITH a AS (
        SELECT l_suppkey % 100 AS v FROM lineitem WHERE l_returnflag = 'R'
    ),
    b AS (
        SELECT l_suppkey % 100 AS v FROM lineitem WHERE l_returnflag = 'A'
    ),
    ea AS (SELECT v FROM a EXCEPT ALL SELECT v FROM b),
    ia AS (SELECT v FROM a INTERSECT ALL SELECT v FROM b)
    SELECT 'except_all' AS op, v, CAST(COUNT(*) AS BIGINT) AS n FROM ea GROUP BY v
    UNION ALL
    SELECT 'intersect_all' AS op, v, CAST(COUNT(*) AS BIGINT) AS n FROM ia GROUP BY v
    """,
)
def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set operations — ``exceptAll`` / ``intersectAll``
    (SQL ``EXCEPT ALL`` / ``INTERSECT ALL``, ANSI multiplicity semantics:
    per-value count difference clamped at 0, and per-value minimum) next
    to the distinct-semantics entries above, on inputs where duplicates
    genuinely carry the information (per-supplier-bucket line counts by
    return flag — hundreds of duplicates per value, so ALL vs DISTINCT
    differ wildly and a wrong implementation can't sneak through).

    Spark plans these not as row-at-a-time bag subtraction but as count
    arithmetic: tag each side ±1, sum per value, re-generate surviving
    multiplicities — one aggregate + one generate, which is exactly how
    it stays linear at 100 TB.  The result rolls multiplicities back up
    per (op, v), making the output order-free for the hash gate."""
    li = load_table(spark, sf_dir, "lineitem")
    v = (F.col("l_suppkey") % 100).alias("v")
    a = li.filter(F.col("l_returnflag") == "R").select(v)
    b = li.filter(F.col("l_returnflag") == "A").select(v)
    ea = a.exceptAll(b).groupBy("v").agg(F.count("*").alias("n"))
    ia = a.intersectAll(b).groupBy("v").agg(F.count("*").alias("n"))
    return ea.select(F.lit("except_all").alias("op"), "v", "n").unionByName(
        ia.select(F.lit("intersect_all").alias("op"), "v", "n")
    )


@register(
    "set_union_by_name_evolution",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS chars_sum
    FROM (
        SELECT lang, CAST(NULL AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 1
    ) GROUP BY 1
    """,
)
def set_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union — ``unionByName(allowMissingColumns=True)``:
    a legacy batch (pre-evolution schema, no ``n_chars``) unions with an
    evolved batch; the missing column NULL-backfills by NAME, not by
    position (positional ``union`` would silently misalign columns — the
    classic ingest bug this API exists to kill).  The COUNT(col) vs
    COUNT(*) split in the rollup proves the backfilled NULLs land only on
    legacy rows.  This is the reader-side `scan_schema_evolution`
    contract applied at the set-operation level: at 100 TB, batch
    unions across schema versions are the norm, not the exception."""
    docs = load_table(spark, sf_dir, "documents")
    legacy = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    evolved = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    )
    u = legacy.unionByName(evolved, allowMissingColumns=True)
    return u.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count("n_chars").alias("n_with_chars"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("chars_sum"),
    )


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination — ``DataFrame.offset`` + ``limit`` (rows 41-60 of a
    total order).  Spark plans OFFSET+LIMIT as a single
    CollectLimit/GlobalLimit with the offset folded in: per-partition
    top-(offset+limit) heaps feed one driver-side merge that discards
    the first 40 rows, so a deep page over 100 TB still moves only
    offset+limit rows per partition — never a global sort spill.  (Deep
    pagination with offset ~ millions is still an anti-pattern; keyset
    pagination via the previous page's last (price, key) is the scale
    answer, and the unique tiebreak this ordering carries is exactly
    what makes that keyset resumable.)  Unique tiebreak keeps rows
    41-60 deterministic under ties."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )
