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
