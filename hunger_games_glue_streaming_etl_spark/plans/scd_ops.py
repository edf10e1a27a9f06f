"""SCD Type 2 in the driver contract: a constructed change scenario over the
customer table, so the oracle can assert the full versioned output.

Scenario: every customer starts with one open version (valid_from
2024-01-01); an update batch effective 2024-06-01 raises the balance by 100
for customers with ``c_custkey % 3 = 0``.  Expected output: changed keys
carry a closed old version + a new open one; unchanged keys keep their
single open version.  The oracle states that expectation directly (UNION of
the two cases) — it checks the *semantics*, not the implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import scd2_apply
from ..sources.batch import load_table
from .registry import register


@register(
    "scd2_customer_balance",
    oracle="""
    SELECT c_custkey AS k, c_acctbal AS bal,
           TIMESTAMP '2024-01-01' AS valid_from,
           CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '2024-06-01' END AS valid_to,
           c_custkey % 3 <> 0 AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, c_acctbal + 100, TIMESTAMP '2024-06-01', NULL, TRUE
    FROM customer WHERE c_custkey % 3 = 0
    """,
)
def scd2_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    current = customer.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + 100).alias("bal"),
        F.lit("2024-06-01").cast("timestamp").alias("effective_ts"),
    )
    return scd2_apply(current, updates, "k", ["bal"])


@register(
    "merge_upsert_customer",
    oracle="""
    WITH src AS (
        SELECT c_custkey, ROUND(c_acctbal + 100, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 1000000, ROUND(c_acctbal, 2)
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT t.c_custkey, ROUND(t.c_acctbal, 2) AS c_acctbal
    FROM customer t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM src)
    UNION ALL
    SELECT c_custkey, c_acctbal FROM src
    """,
)
def merge_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics as a checked contract query: a source batch updates
    every 10th customer's balance and inserts synthetic new keys; matched
    target rows are replaced, unmatched persist, new keys insert
    (operators/scd.merge_upsert — anti-join + union, one shuffle on the
    key; with Delta on the classpath the same call site is MERGE INTO)."""
    from ..operators.scd import merge_upsert

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal")
    )
    inserts = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"), "c_acctbal"
    )
    return merge_upsert(cust, updates.unionByName(inserts), "c_custkey")
