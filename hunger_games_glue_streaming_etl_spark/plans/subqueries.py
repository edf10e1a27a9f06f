"""Subquery surface through the SQL front end: correlated scalar
subqueries, NOT EXISTS anti-semantics, and IN-subqueries with aggregated
HAVING bodies.  The reference's single query has none of these shapes;
they complete the relational inventory a SQL user expects (TPC-H Q17/Q22
are the canonical forms), and Catalyst's subquery decorrelation is part of
what's being pinned — the plans must rewrite to joins, not per-row
re-executions.

All three run through ``spark.sql`` over temp views (like
``sql_api_shipping_priority``) so the SQL parser/analyzer path is what is
exercised; the DuckDB oracle runs textually near-identical SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.batch import load_table
from .registry import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, str]:
    """Deterministic per-table view names so repeated invocations REPLACE
    instead of accumulating — a uuid suffix here leaked 2-3 orphaned
    temp views (each holding a logical plan) per call across a
    BENCH_REPEATS contract run."""
    out = {}
    for t in tables:
        v = f"{t}_subq"
        load_table(spark, sf_dir, t).createOrReplaceTempView(v)
        out[t] = v
    return out


@register(
    "subquery_correlated_avg",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): a correlated scalar
    subquery per part.  Catalyst decorrelates this into one aggregate over
    lineitem grouped by partkey joined back to the probe side — i.e. the
    same two-scan plan a hand-written DataFrame version would build, NOT a
    per-row re-execution; at 100 TB the correlated side is a single
    map-side-partial aggregation on the join key."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM {v['lineitem']} JOIN {v['part']} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity) FROM {v['lineitem']} l2
              WHERE l2.l_partkey = p_partkey
          )
        """
    )


@register(
    "subquery_not_exists_agg",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    GROUP BY c_nationkey
    """,
)
def subquery_not_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers (above the average positive
    balance — an uncorrelated scalar subquery) with no finished orders
    (NOT EXISTS → anti-join), rolled up per nation.  The uncorrelated
    scalar becomes a 1-row broadcast; NOT EXISTS becomes a broadcast/
    shuffled anti-join on custkey — no nested-loop anywhere."""
    v = _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        f"""
        SELECT c_nationkey,
               COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM {v['customer']} c
        WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM {v['customer']} WHERE c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM {v['orders']} o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
        GROUP BY c_nationkey
        """
    )


@register(
    "subquery_in_having",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p_retailprice), 2) AS total_price
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(*) >= 8
    )
    GROUP BY p_brand
    """,
)
def subquery_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery whose body is an aggregate with HAVING (hot parts by
    lineitem frequency), rolled up per brand.  Rewrites to a semi-join
    against the aggregated subquery — the aggregation shrinks the build
    side to distinct hot keys before any join happens."""
    v = _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        f"""
        SELECT p_brand, COUNT(*) AS n_parts,
               ROUND(SUM(p_retailprice), 2) AS total_price
        FROM {v['part']}
        WHERE p_partkey IN (
            SELECT l_partkey FROM {v['lineitem']}
            GROUP BY l_partkey HAVING COUNT(*) >= 8
        )
        GROUP BY p_brand
        """
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-row top-k join shape
    (each customer's two biggest orders) SQL users reach for before
    discovering window functions; Catalyst must decorrelate the LIMIT'd
    ordered subquery rather than re-executing it per outer row.
    Runs through the SQL parser like the other subquery entries; the
    oracle is textually identical DuckDB SQL."""
    vs = _views(spark, sf_dir, "customer", "orders")
    return spark.sql(f"""
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM {vs["customer"]} c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM {vs["orders"]}
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
    """)
