"""Statistical sampling API surfaces (closes VERDICT r6 "What's missing"
#4): ``TABLESAMPLE`` through ``spark.sql``, ``df.stat.sampleBy``
stratified sampling, ``df.stat.freqItems`` and ``df.stat.crosstab`` —
the everyday sampling APIs a Spark user reaches for before building the
deterministic-hash machinery this engine uses elsewhere
(``mix_weighted_sample``'s portable-hash filter).

Oracle strategy per surface:

- Native samplers (TABLESAMPLE, sampleBy) use engine-internal RNG — a
  seeded run is DETERMINISTIC within Spark but cannot be replayed by
  DuckDB.  Each entry therefore pairs the native sampler with the
  portable-hash filter TWIN (same target rate, hash-exact in both
  engines) and value-hashes the twin's exact counts plus a BOOLEAN
  "native rate inside the tolerance band" per group.  The boolean is
  itself deterministic (fixed seed -> fixed sample -> fixed boolean),
  so the whole row set hash-checks; the band is +-5 sigma of the
  binomial at the smallest fixture stratum (~300 rows), asserted
  passing at sf0.001 AND sf0.01.
- ``freqItems`` is a Misra-Gries-style sketch whose EXTRA items are
  partition-order-dependent, but its containment guarantee is not:
  every value with frequency > support MUST appear.  The entry emits
  one row per exact heavy hitter with a membership boolean — the
  deterministic core of the contract.
- ``crosstab`` is exact contingency counting — fully deterministic,
  hash-checked against conditional aggregation.

Reference scope: the reference job has no sampling; this is §2C engine
surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash64
from ..sources.batch import load_table
from .registry import register

# one shared rate for the native/hash sample pairs, and a +-band on the
# observed native rate (5 sigma of Binomial(300, 0.25) / 300 ~= 0.125;
# 0.15 clears it with margin at every fixture scale)
SAMPLE_RATE = 0.25
SAMPLE_BAND = 0.15
SAMPLE_SEED = 42

def _hash_sample_filter(key_col) -> F.Column:
    """Portable Bernoulli(SAMPLE_RATE) by 48-bit hash percentile — the
    engine-replayable twin of the native sampler."""
    return F.pmod(
        portable_hash64(F.concat(F.lit("smp:"), key_col.cast("string"))),
        F.lit(100),
    ) < int(SAMPLE_RATE * 100)


def _hash_sample_sql(key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('0:' || 'smp:' || {key_expr}), 1, 12)) AS BIGINT)"
        f" % 100 < {int(SAMPLE_RATE * 100)}"
    )


@register(
    "sample_tablesample_percent",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN {_hash_sample_sql("CAST(o_orderkey AS VARCHAR)")}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hash_sample,
           TRUE AS native_in_band
    FROM orders
    """,
)
def sample_tablesample_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TABLESAMPLE (25 PERCENT) REPEATABLE(42)`` through ``spark.sql``
    beside the portable-hash twin at the same rate.  The twin's count is
    hash-exact across engines; the native sampler contributes the
    deterministic in-band boolean (seeded Bernoulli sample -> fixed
    count; band = +-{SAMPLE_BAND} absolute, ~5 sigma at the smallest
    fixture).  At scale both samplers are one map-side filter — no
    shuffle, no driver involvement."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_sample_src")
    native_n = spark.sql(
        f"SELECT COUNT(*) AS n FROM orders_sample_src "
        f"TABLESAMPLE ({int(SAMPLE_RATE * 100)} PERCENT) REPEATABLE({SAMPLE_SEED})"
    )
    totals = orders.agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(_hash_sample_filter(F.col("o_orderkey")), 1).otherwise(0)
        ).alias("n_hash_sample"),
    )
    return totals.crossJoin(F.broadcast(native_n)).select(
        "n_total",
        "n_hash_sample",
        (
            F.abs(F.col("n") / F.col("n_total") - F.lit(SAMPLE_RATE))
            <= F.lit(SAMPLE_BAND)
        ).alias("native_in_band"),
    )


@register(
    "sample_stratified_by_key",
    oracle=f"""
    SELECT o_orderpriority AS stratum,
           CAST(COUNT(*) AS BIGINT) AS n_stratum,
           CAST(SUM(CASE WHEN {_hash_sample_sql("CAST(o_orderkey AS VARCHAR)")}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hash_sample,
           TRUE AS native_in_band
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sample_stratified_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling via ``df.stat.sampleBy`` (per-stratum
    fractions, seeded) beside the portable-hash twin, one row per
    stratum.  Exactly the API shape used to rebalance a skewed training
    mix; the hash twin is what this engine's mixture sampler
    (``mix_weighted_sample``) builds on.  At scale ``sampleBy`` is a
    map-side filter keyed by the stratum column — no shuffle until the
    audit aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    fractions = {
        p: SAMPLE_RATE
        for p in (
            "1-URGENT",
            "2-HIGH",
            "3-MEDIUM",
            "4-NOT SPECIFIED",
            "5-LOW",
        )
    }
    native = (
        orders.stat.sampleBy("o_orderpriority", fractions, seed=SAMPLE_SEED)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_native"))
    )
    audit = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_stratum"),
        F.sum(
            F.when(_hash_sample_filter(F.col("o_orderkey")), 1).otherwise(0)
        ).alias("n_hash_sample"),
    )
    # LEFT join + coalesce(n_native, 0): a stratum where the seeded
    # sampler returned zero rows must still appear (reading false), not
    # vanish from the audit (ADVICE r7 low #3 / VERDICT r8 #6).
    return audit.join(F.broadcast(native), "o_orderpriority", "left").select(
        F.col("o_orderpriority").alias("stratum"),
        "n_stratum",
        "n_hash_sample",
        (
            F.abs(
                F.coalesce(F.col("n_native"), F.lit(0))
                / F.col("n_stratum")
                - F.lit(SAMPLE_RATE)
            )
            <= F.lit(SAMPLE_BAND)
        ).alias("native_in_band"),
    )


@register(
    "sample_freqitems_contract",
    oracle="""
    WITH hh AS (
        SELECT o_orderpriority AS item
        FROM orders
        GROUP BY o_orderpriority
        HAVING COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) > 0.1
    )
    SELECT item, TRUE AS found FROM hh
    """,
)
def sample_freqitems_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.freqItems`` containment contract: the sketch may emit
    false positives (partition-order-dependent) but must contain every
    item with frequency > support — that guarantee is the deterministic
    core, so the entry emits one row per EXACT heavy hitter with its
    membership boolean.  All five priorities sit near 20% >> 10%
    support, so the row set is stable at every fixture scale.  At 100 TB
    freqItems is one pass + driver-side merge of bounded sketches."""
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.stat.freqItems(["o_orderpriority"], support=0.1)
    hh = (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(orders.agg(F.count("*").alias("nt"))))
        .filter(F.col("n") / F.col("nt") > 0.1)
        .select(F.col("o_orderpriority").alias("item"))
    )
    return hh.crossJoin(F.broadcast(freq)).select(
        "item",
        F.array_contains(F.col("o_orderpriority_freqItems"), F.col("item")).alias(
            "found"
        ),
    )


@register(
    "sample_crosstab_exact",
    oracle="""
    SELECT CAST(o_orderstatus AS VARCHAR) AS o_orderstatus_o_orderpriority,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sample_crosstab_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.stat.crosstab`` — exact contingency table of order status x
    priority, hash-checked cell-for-cell against conditional aggregation
    (crosstab is deterministic, unlike the samplers).  Crosstab pivots a
    bounded value domain (status x priority = 15 cells); at 100 TB it is
    one partial-aggregable groupBy, never a wide shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    cols = [c for c in ct.columns if c != "o_orderstatus_o_orderpriority"]
    return ct.select(
        "o_orderstatus_o_orderpriority",
        *[F.col(f"`{c}`").cast("long").alias(c) for c in sorted(cols)],
    )
