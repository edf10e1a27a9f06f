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
from .registry import ORACLE, register


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


# the registered SCD2 oracle is a complete SELECT; nesting it keeps the
# snapshot's version history definitionally identical to the history entry
# (same pattern as graph_ops reusing the pairs SQL)
_SCD2_HISTORY_SQL = ORACLE["scd2_customer_balance"]

SNAPSHOT_BEFORE = "2024-03-01"
SNAPSHOT_AFTER = "2024-09-01"


@register(
    "scd2_asof_snapshot",
    oracle=f"""
    WITH hist AS (
        {_SCD2_HISTORY_SQL}
    )
    SELECT TIMESTAMP '{SNAPSHOT_BEFORE}' AS snapshot_ts, k, bal
    FROM hist
    WHERE valid_from <= TIMESTAMP '{SNAPSHOT_BEFORE}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{SNAPSHOT_BEFORE}')
    UNION ALL
    SELECT TIMESTAMP '{SNAPSHOT_AFTER}', k, bal
    FROM hist
    WHERE valid_from <= TIMESTAMP '{SNAPSHOT_AFTER}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{SNAPSHOT_AFTER}')
    """,
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history: reconstruct the full keyed table
    AS OF two instants — one before the June update wave (every key shows
    its original balance) and one after (every third key shows the
    updated row) — with the standard half-open validity predicate
    ``valid_from <= t < valid_to``.  This is the query a versioned lake
    answers with `VERSION AS OF`; on plain parquet the SCD2 columns ARE
    the time-travel index.

    At scale: the history scan filters map-side on the validity range
    (min/max file stats prune closed versions) — no shuffle at all beyond
    what history construction itself needs; the two snapshots are
    independent filters unioned."""
    from ..caching import pin

    hist = pin(scd2_customer_balance(spark, sf_dir))
    parts = []
    for snap in (SNAPSHOT_BEFORE, SNAPSHOT_AFTER):
        ts = F.lit(snap).cast("timestamp")
        parts.append(
            hist.filter(
                (F.col("valid_from") <= ts)
                & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
            ).select(ts.alias("snapshot_ts"), "k", "bal")
        )
    return parts[0].unionByName(parts[1])


@register(
    "merge_delete_forgotten",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer WHERE c_custkey % 7 <> 0
    """,
)
def merge_delete_forgotten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted DELETE on the keyed store — the compliance/right-to-be-
    forgotten contract (the reference's DynamoDB table would take
    ``delete_item`` calls; the engine's bucketed parquet view takes a
    set-oriented ``delete_keys``).  Builds the latest-state table through
    the real sink at build time (plan_audit executed-sweep class), erases
    every 7th customer, and returns the read-back view; the oracle states
    the complement directly.  O(touched buckets), never O(table): only
    hash buckets containing doomed keys are rewritten, an emptied bucket
    is removed explicitly (dynamic partition overwrite cannot), and the
    file-level stability of untouched buckets is pinned in
    tests/test_upsert_sink.py."""
    import os as _os

    from ..sinks import ParquetLatestSink
    from ..tmpdirs import entry_tmp_dir

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    root = entry_tmp_dir("merge_delete_forgotten")
    sink = ParquetLatestSink(
        spark,
        _os.path.join(root, "latest"),
        keys="c_custkey",
        seq_cols="c_custkey",
    )
    # lean shuffle width for the build-time writes: every shuffle
    # partition fans out into every touched bucket dir, so partitions x
    # buckets small files dominate wall at fixture scale.  lean_shuffle
    # pins shuffle.partitions AND AQE initialPartitionNum together — the
    # latter overrides the former as the starting width, which is how the
    # r13 session-factory change regressed this entry 4.9x (VERDICT r13 #1).
    from ..session import lean_shuffle

    with lean_shuffle(spark, 8):
        sink.upsert(cust)
        sink.delete_keys(
            cust.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
        )
    return sink.read()
