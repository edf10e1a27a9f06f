"""Data-quality gates — the referential-integrity audit every warehouse
ingestion runs (dbt ``relationships`` tests / Great-Expectations suites):
for each foreign-key edge of the star schema, count child rows whose key
has no parent.

The fixtures are referentially clean (a zero-count audit would be a
vacuous gate — round-1 rule), so the entry PLANTS deterministic orphans
inline, derived from the DATA (``max(parent key) + offsets``, the same
pattern as the PII planted corpus): both engines generate the identical
bad rows, and the audit must find exactly those.

100 TB posture: each relationship is one anti-join on the key — parent
side distinct'd (and broadcast when dim-sized); the child side never
ships more than (key) columns.  The planted union is metadata-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register

# (relationship, child table, child key, parent table, parent key, n planted)
_EDGES = [
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey", 5),
    ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey", 4),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey", 3),
]

_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{rel}' AS relationship,
           CAST((SELECT COUNT(*) FROM {child}) + {n_bad} AS BIGINT)
               AS n_child_rows,
           CAST((
               SELECT COUNT(*) FROM (
                   SELECT {ckey} AS k FROM {child}
                   UNION ALL
                   SELECT (SELECT MAX({pkey}) FROM {parent}) + 1 + i * 7
                   FROM range(0, {n_bad}) t(i)
               ) c
               WHERE NOT EXISTS (
                   SELECT 1 FROM {parent} p WHERE p.{pkey} = c.k
               )
           ) AS BIGINT) AS n_orphans
    """
    for rel, child, ckey, parent, pkey, n_bad in _EDGES
)


@register("dq_referential_orphans", oracle=_ORACLE)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's three FK edges,
    with data-derived planted orphans (``max(parent)+1+7i``) so the gate
    proves the audit FINDS violations, not merely that clean data is
    clean: every relationship must report exactly its planted count."""
    parts = []
    for rel, child, ckey, parent, pkey, n_bad in _EDGES:
        child_keys = load_table(spark, sf_dir, child).select(
            F.col(ckey).alias("k")
        )
        parent_df = load_table(spark, sf_dir, parent)
        mx = parent_df.agg(F.max(pkey).alias("__mx"))
        planted = (
            spark.range(n_bad)
            .crossJoin(F.broadcast(mx))
            .select((F.col("__mx") + 1 + F.col("id") * 7).alias("k"))
        )
        all_children = child_keys.unionByName(planted)
        orphans = all_children.join(
            parent_df.select(F.col(pkey).alias("k")).distinct(), "k", "left_anti"
        )
        parts.append(
            orphans.agg(F.count("*").alias("n_orphans"))
            .crossJoin(
                F.broadcast(
                    all_children.agg(F.count("*").alias("n_child_rows"))
                )
            )
            .select(
                F.lit(rel).alias("relationship"),
                F.col("n_child_rows").cast("long"),
                F.col("n_orphans").cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
