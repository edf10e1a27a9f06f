"""Window-function surface (SURVEY.md §2C 'Window functions' — empty in the
reference; ``row_number`` latest-per-key is the set-oriented form of its
keyed-upsert sink and lives in ``core.latest_event_per_user``).

Scale notes: a window = one shuffle on partitionBy keys + per-partition sort.
Skewed partition keys are the hazard; AQE skew handling doesn't apply inside
window exec, so high-cardinality partition keys (user_id, orderkey) are
chosen here — the 100 TB guidance is "never window over a constant key".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import top_k_per_group
from ..sources.batch import load_table
from .registry import register


@register(
    "window_rank_dense",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS prio_rank
    FROM orders
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank with deterministic tiebreak columns."""
    orders = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w_price).cast("long").alias("price_rank"),
        F.dense_rank().over(w_prio).cast("long").alias("prio_rank"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time — per-user change detection (the streaming
    domain's 'status changed since last event')."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(prev, F.lit(0))).alias("delta"),
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
    FROM events
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: running total, 3-row moving average, running
    count. ROWS (not RANGE) frames keep results deterministic under ties."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-2, Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(running), 2).alias("running_total"),
        F.round(F.avg("value").over(moving), 4).alias("moving_avg_3"),
        F.count("*").over(running).cast("long").alias("n_so_far"),
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation (top_k_per_group operator)."""
    customer = load_table(spark, sf_dir, "customer")
    return top_k_per_group(
        customer, "c_nationkey", ["c_acctbal", "c_custkey"], k=3
    ).select("c_nationkey", "c_custkey", "c_acctbal")


@register(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window functions: ntile, percent_rank,
    cume_dist, first/last/nth value (full-partition frames for the
    navigation trio — the default running frame would make last/nth
    order-dependent)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wf).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_ok"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(vfp) OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS rolling_1h_value_fp,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS rolling_1h_events
    FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
                 CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vfp
          FROM events)
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME range frame — the rolling window ROWS frames can't
    express: per user, the sum/count of everything in the trailing HOUR
    of event time (RANGE over integer µs, not a row count), the
    time-decayed-metrics shape of ops analytics.

    RANGE frames include all ORDER-BY peers, so the frame is a SET and
    needs no tiebreak — but that also means the in-frame accumulation
    ORDER is engine-private, so the summed metric must be associative:
    value goes through the fixed-point ``FLOOR(v·1000 + 0.5)`` BIGINT
    (multiply/add are correctly-rounded IEEE, identical both engines;
    integer addition is order-free).  Summing raw doubles here would be
    a latent last-ULP hash bug.

    At scale: one shuffle on user_id + per-partition sort — same cost
    shape as any window; the range frame is a two-pointer pass."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("vfp"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.sum("vfp").over(w).cast("long").alias("rolling_1h_value_fp"),
        F.count("*").over(w).cast("long").alias("rolling_1h_events"),
    )
