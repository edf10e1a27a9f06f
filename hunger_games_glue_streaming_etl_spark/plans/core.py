"""Core relational queries: the reference's own pattern (stream ⋈ dim ⋈ dim +
CASE projections) re-hosted on the driver's synthetic tables, plus the
scan/filter/project/join surface of SURVEY.md §2 (ops A3-A6, B1-B12).

Scale notes: dims (`customer`, `nation`, `region`) are broadcast so the fact
scan never shuffles for these plans; filters/projections are expressed
declaratively so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import latest_per_key
from ..sources.batch import load_table
from .registry import ORACLE, register


def _events_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's join shape (script/TributeStreamingJob.py:106-107):
    fact ⋈ small dim ⋈ smaller dim, both broadcast."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)


@register(
    "flagship_user_status",
    oracle="""
    SELECT n_name,
           CASE WHEN value > 150 THEN 'HIGH'
                WHEN value < 10  THEN 'LOW'
                ELSE 'MID' END AS value_status,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
)
def flagship_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's continuous query pattern — fact stream ⋈
    two broadcast dims + CASE-derived status (script/TributeStreamingJob.py:
    106-135) — aggregated per nation/status.
    """
    joined = _events_customer_nation(spark, sf_dir)
    status = (
        F.when(F.col("value") > 150, "HIGH")
        .when(F.col("value") < 10, "LOW")
        .otherwise("MID")
    )
    return (
        joined.withColumn("value_status", status)
        .groupBy("n_name", "value_status")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "case_derived_status",
    oracle="""
    SELECT event_id,
           c_name,
           n_name,
           CASE WHEN value < 20 THEN 'CRITICAL'
                WHEN value - 20 < 0.5 THEN 'APPROACHING CRITICAL'
                ELSE 'OK' END AS level_status,
           CASE WHEN value > 180 THEN 'OVERLOAD'
                WHEN 180 - value < 5 THEN 'NEAR OVERLOAD'
                ELSE 'NORMAL' END AS load_status,
           CASE WHEN c_acctbal < 0 THEN 'DEBT' ELSE 'CREDIT' END AS balance_status
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    """,
)
def case_derived_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row CASE derivations (reference B3-B7: threshold bands with the
    same near-threshold arithmetic, script/TributeStreamingJob.py:111-135)."""
    joined = _events_customer_nation(spark, sf_dir)
    return joined.select(
        "event_id",
        "c_name",
        "n_name",
        F.when(F.col("value") < 20, "CRITICAL")
        .when(F.col("value") - 20 < 0.5, "APPROACHING CRITICAL")
        .otherwise("OK")
        .alias("level_status"),
        F.when(F.col("value") > 180, "OVERLOAD")
        .when(F.lit(180) - F.col("value") < 5, "NEAR OVERLOAD")
        .otherwise("NORMAL")
        .alias("load_status"),
        F.when(F.col("c_acctbal") < 0, "DEBT").otherwise("CREDIT").alias("balance_status"),
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 45
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection pushed into the parquet scan (SURVEY.md §2C
    'Projections/filters' — the reference only filters via inner-join drop;
    the engine ships the standalone operator)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a non-key predicate in the join condition (nulls for
    non-matching right side)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000),
        "left",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS (SURVEY.md §2C 'Joins' — beyond the
    reference's inner-only surface)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = orders.filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS (predicate keeps the result non-empty —
    every customer has some order, so the unfiltered anti is vacuous)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_broadcast_chain",
    oracle="""
    SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain broadcast joins (reference A6/B1-B2: cached tiny dims →
    zero-shuffle join plan; explicit broadcast pins BHJ deterministically)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-oriented 'latest state per key' — the deterministic replacement
    for the reference's last-writer-wins DynamoDB upsert (A8,
    script/TributeStreamingJob.py:49-66; SURVEY.md §7 hard part (a)).
    event_id tiebreak pins intra-timestamp order."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(events, "user_id", ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join (two big facts + four dims) with the
    same-nation customer/supplier correlation.  Plan shape at scale: the
    region filter prunes through broadcast nation/region; customer/supplier
    broadcast; the only large shuffle is orders ⋈ lineitem on orderkey.

    The region literal is 'EUROPE' (the fixtures use TPC-H region names) —
    the earlier 'REGION_0' literal matched nothing, making the gate vacuous
    (VERDICT r03 #2); non-empty at sf0.001 (75 base rows) and sf0.01 (334)
    is asserted in tests/test_core_queries.py."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey)
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .join(
            F.broadcast(t["supplier"]),
            (t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
            & (t["customer"].c_nationkey == t["supplier"].s_nationkey),
        )
        .join(F.broadcast(t["nation"]), t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "salted_join_result_parity",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_result_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join inside the correctness gate: the salted plan (fact
    key salted into 8 sub-keys, dim replicated ×8) must aggregate to exactly
    the plain join's result — the oracle is the unsalted SQL."""
    from ..operators.relational import salted_join

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    joined = salted_join(events, customer, "user_id", "c_custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "join_full_outer",
    oracle="""
    WITH big AS (
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 300000
    ),
    planted AS (
        SELECT (SELECT MAX(c_custkey) FROM customer) + 1 + CAST(i AS BIGINT) * 7
                   AS o_custkey,
               -(CAST(i AS BIGINT) + 1) AS o_orderkey,
               (CAST(i AS BIGINT) + 1) * 1000.0 AS o_totalprice
        FROM range(5) t(i)
    ),
    allo AS (SELECT * FROM big UNION ALL SELECT * FROM planted)
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer FULL OUTER JOIN allo ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with all three row classes non-vacuous: matched,
    left-only (customers whose orders all fall under the price filter —
    real data), and right-only (orphan orders planted data-derived at
    ``max(c_custkey)+1+7i``, the ``dq_referential_orphans`` mechanism, so
    both engines fabricate identical unmatched rows).  Scale: one shuffle
    on the join key — full outer can't broadcast either side (both sides'
    non-matches survive), which is exactly why it earns its own entry
    next to the broadcastable inner/left forms."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    ).select("o_custkey", "o_orderkey", "o_totalprice")
    mx = customer.agg(F.max("c_custkey").alias("__mx"))
    planted = (
        spark.range(5)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("__mx") + 1 + F.col("id") * 7).alias("o_custkey"),
            (-(F.col("id") + 1)).alias("o_orderkey"),
            ((F.col("id") + 1) * F.lit(1000.0)).alias("o_totalprice"),
        )
    )
    allo = big.unionByName(planted)
    return customer.join(
        allo, customer.c_custkey == allo.o_custkey, "full"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer GROUP BY 1
    )
    SELECT a.seg, a.n_customers, b.total_bal
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` ≡ ``IS NOT DISTINCT FROM``): the
    NULL-keyed group (segment 'BUILDING' nulled out via NULLIF) must
    survive the join — a plain equality drops it silently (NULL = NULL is
    NULL), the classic wrong-count bug in key-normalizing pipelines.
    Non-vacuity is structural: the NULL row exists on both sides and the
    result has exactly one more row than the plain-equality form would.
    Plan: two aggregates over one scan (ReuseExchange dedupes), then a
    5-row join — null-safe equality still hash-partitions cleanly because
    ``<=>`` hashes NULL to a regular bucket instead of failing the match."""
    customer = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    a = customer.groupBy(seg).agg(F.count("*").alias("n_customers"))
    b = customer.groupBy(seg).agg(F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    return a.join(b, a["seg"].eqNullSafe(b["seg"])).select(
        a["seg"], "n_customers", "total_bal"
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY 1
    ),
    dial AS (
        SELECT FLOOR(2.0 * SUM(sum_qty) / COUNT(*)) AS thr FROM per_order
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM per_order CROSS JOIN dial
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE sum_qty > thr
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate the fact to
    per-order totals, threshold, then rejoin order/customer detail.  The
    threshold is CORPUS-DERIVED (2× the mean per-order quantity via a
    1-row broadcast dial — the round-4 data-dependent-dial pattern), so
    the selectivity survives any scale-up where a fixed '300' would go
    vacuous or degenerate.  Plan at scale: one fact shuffle for the
    per-order aggregate; the detail rejoin keys on orderkey (the
    aggregate's own partitioning — no second fact shuffle of lineitem);
    customer broadcasts.  ``sum_qty`` is a sum of integer-valued doubles
    (exact in any order, hash-safe); ``o_totalprice`` passes through with
    no arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty"))
    dial = per_order.agg(
        F.floor(F.lit(2.0) * F.sum("sum_qty") / F.count("*")).alias("thr")
    )
    big = per_order.crossJoin(F.broadcast(dial)).filter(
        F.col("sum_qty") > F.col("thr")
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@register(
    "q12_late_lines_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_60,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_365
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-delay audit; the fixtures carry no
    shipmode/commit/receipt columns, so lateness is ship-lag vs the order
    date): per order priority, line counts in two lateness bands via
    CASE-inside-SUM.  Interval arithmetic runs on the NTZ timestamps
    directly (comparison only — no epoch extraction, so no NTZ bridge
    needed; both engines compare identical µs wall-times).  Pure integer
    counts, hash-exact.  Plan at scale: one orderkey shuffle join, then a
    5-group aggregate with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = lambda days: F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {days} DAYS"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(late(60), 1).otherwise(0)).alias("n_late_60"),
            F.sum(F.when(late(365), 1).otherwise(0)).alias("n_late_365"),
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey AS okey, l.l_suppkey AS skey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
        GROUP BY 1, 2
    ),
    allsupp AS (
        SELECT l_orderkey AS okey, l_suppkey AS skey FROM lineitem GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late
    JOIN supplier ON s_suppkey = late.skey
    WHERE EXISTS (SELECT 1 FROM allsupp a
                  WHERE a.okey = late.okey AND a.skey <> late.skey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.okey = late.okey AND l2.skey <> late.skey)
    GROUP BY 1, 2
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): a supplier is
    counted for each multi-supplier order where it was the SOLE late
    supplier — the dual-correlation EXISTS (another supplier shipped) +
    NOT EXISTS (no other supplier was late) pattern, expressed as a
    left-semi then left-anti join on (orderkey-equi, suppkey-not-equal)
    conditions.  Lateness = ship-lag > 365 days (the fixtures' wide
    synthetic lag band makes this selective: ~15% of late pairs survive
    the sole-late filter).  Plan at scale: the late/allsupp sets are
    keys-only DISTINCTs; both semi and anti joins shuffle on orderkey
    alone with the supplier inequality evaluated post-match; supplier
    name resolves via broadcast.  Integer counts, hash-exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
        )
        .selectExpr("l_orderkey AS okey", "l_suppkey AS skey")
        .distinct()
    )
    allsupp = (
        li.selectExpr("l_orderkey AS okey2", "l_suppkey AS skey2").distinct()
    )
    with_other = late.join(
        allsupp,
        (F.col("okey") == F.col("okey2")) & (F.col("skey") != F.col("skey2")),
        "left_semi",
    )
    late_other = late.selectExpr("okey AS okey3", "skey AS skey3")
    sole = with_other.join(
        late_other,
        (F.col("okey") == F.col("okey3")) & (F.col("skey") != F.col("skey3")),
        "left_anti",
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("skey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("skey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


@register(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHUFFLE_HASH join-strategy hint — the large⋈large strategy
    Catalyst almost never picks on its own (it defaults to sort-merge
    for non-broadcastable sides): hash-partition both sides on the key,
    build a hash map from the smaller side PER PARTITION, and skip both
    sorts.  The right call when one side's per-partition slice fits in
    executor memory — at 100 TB, orders⋈lineitem with AQE partition
    sizing is exactly that shape, and skipping two O(n log n) sorts on
    600M+ rows per partition-pair is a real win.  Completes the engine's
    join-strategy hint family (broadcast: ``join_broadcast_chain``;
    merge: ``layout_bucketed_colocated_join``); results are
    strategy-invariant, which is what the oracle pins, and the
    ShuffledHashJoin node is plan-asserted in tests/test_plan_shapes.py."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = orders.hint("shuffle_hash").join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
    )


@register(
    "join_runtime_bloom_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER join reduction (``InjectRuntimeFilter``) — the
    Spark-4 answer to the classic large⋈filtered-large semi-join problem
    and a core 100 TB shuffle-reduction surface: the optimizer plants
    ``bloom_filter_agg(xxhash64(o_orderkey))`` over the SELECTIVE side
    (priority-filtered orders) as a scalar subquery and pushes
    ``might_contain(..., xxhash64(l_orderkey))`` into the LINEITEM scan
    filter, so rows that cannot join are dropped BEFORE the join shuffle
    writes them (at 100 TB: ~4/5 of a 600M-row shuffle never leaves the
    mappers).  Injection is stats-gated: it fires only when the creation
    side carries a selective predicate and is NOT broadcastable (Spark
    assumes a broadcast join needs no reduction — measured: with a
    broadcastable dim the rule correctly declines), so the entry pins
    ``autoBroadcastJoinThreshold=-1`` + a floor scan threshold for the
    build and eagerly materializes the 3-row aggregate under those confs
    (plan_audit executed class; the confs are restored before returning).
    Bloom false positives only pass extra rows to the real equi-join, so
    results are filter-invariant — exactly what the oracle pins — and the
    ``might_contain`` scan filter is plan-asserted in
    tests/test_plan_shapes.py."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # default 10 GiB — the benefit gate is sized for clusters; at
        # fixture scale floor it so the rule exercises (1 byte)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        # injection declines when the creation side could broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        agg = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            )
        )
        # optimization happens at action time: materialize the bounded
        # (≤3-row) aggregate while the injection confs are live, so the
        # returned frame really executed the bloom-reduced plan
        return agg.localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top-10): segment-filtered
    customers drive a selective orders scan, unshipped-revenue aggregate
    per order, top-10 by revenue.  Plan at scale: the segment filter
    broadcasts customer; both DATE predicates push to the scans (orders
    AND lineitem each drop most of their rows before the orderkey
    shuffle); the top-10 is a TakeOrderedAndProject heap merge, not a
    global sort.  Rank key is the ROUNDED aggregate (bit-identical
    cross-engine per the round-aggregates rule) with the unique orderkey
    tiebreak, so the LIMIT boundary agrees.  Cutoff sits mid-fixture-span
    (non-vacuous at sf0.001: 136 qualifying orders; sf0.01: 1,236)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut_o = F.lit("1998-03-15 00:00:00").cast(dict(orders.dtypes)["o_orderdate"])
    cut_l = F.lit("1998-03-15 00:00:00").cast(dict(li.dtypes)["l_shipdate"])
    return (
        F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(orders.filter(F.col("o_orderdate") < cut_o),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cut_l),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): lost revenue from
    returned lines in one order-date quarter, top-20 customers.  Plan at
    scale: the quarter predicate prunes orders at the scan; the
    returnflag filter prunes lineitem before the orderkey shuffle (the
    only big exchange); nation broadcasts; top-20 is a heap merge ranked
    on the rounded aggregate + unique custkey.  Non-vacuous at both
    oracle scales (57 / 640 customer groups)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    lo = F.lit("1997-01-01 00:00:00").cast(dict(orders.dtypes)["o_orderdate"])
    hi = F.lit("1997-07-01 00:00:00").cast(dict(orders.dtypes)["o_orderdate"])
    return (
        cust.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q7_trade_volume_flows",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS yr,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, supp_nation, cust_nation, yr
    LIMIT 20
    """,
)
def q7_trade_volume_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping), literal-free: revenue between
    every cross-nation (supplier → customer) pair per ship year, top-20
    flows.  The canonical query pins two nation literals — the fixtures'
    synthetic nation names would make that the q5 vacuous-literal trap,
    so the pair selection is data-driven (rank by revenue, unique
    (names, year) tiebreak).  Plan at scale: both nation joins broadcast
    (n1/n2 are the same 25-row dim aliased twice), supplier/customer
    broadcast at fixture scale, the orderkey shuffle is the only big
    exchange, year grouping is map-side partial, top-20 heap-merges."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "supp_nation", "cust_nation", "yr")
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one ship-month's
    revenue from PROMO-type parts — conditional aggregate over a ratio,
    the classic single-row KPI.  The month predicate pushes to the
    lineitem scan; part broadcasts; one ratio of two rounded-safe sums
    (the quotient of ulp-stable aggregates, rounded at 4 decimals — the
    round-aggregates rule).  Non-vacuous at both oracle scales (69 / 751
    in-month lines)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1997-03-01 00:00:00").cast(dict(li.dtypes)["l_shipdate"])
    hi = F.lit("1997-04-01 00:00:00").cast(dict(li.dtypes)["l_shipdate"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one half-year
    window having at least one line shipped >30 days after the order —
    the canonical correlated EXISTS, which Catalyst must decorrelate to
    a LEFT SEMI join on orderkey (the correlated l_shipdate >
    o_orderdate predicate rides the join condition).  The date window
    pushes to the orders scan; lineitem needs only two columns.  Pure
    integer counts, hash-exact.  Written as ONE SQL text both engines
    parse (the Q17/Q22 subquery-tier pattern); non-vacuous at both
    oracle scales (5 priority groups, 96 / 1,056 qualifying orders)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(ORACLE["q4_order_priority_exists"])


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'PROMO'    AND p_size BETWEEN 1  AND 15
           AND l_quantity >= 20)
       OR (p_type = 'ECONOMY'  AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10)
       OR (p_type = 'STANDARD' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 5)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three
    conjunctive clauses unioned by OR across BOTH join sides — the
    optimizer workout is clause splitting: Catalyst derives the
    single-side implications (l_quantity ≥ 5 pushes to the lineitem
    scan; the p_type/p_size union pushes to part) while the full
    disjunction evaluates post-join.  Clause literals adapted to the
    fixtures' type/size domains (canonical brand/container columns
    don't exist here); non-vacuous at both scales (1,112 / 11,050
    qualifying lines)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    clause = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 20)
    ) | (
        (F.col("p_type") == "ECONOMY")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 5)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@register(
    "q6_forecast_revenue_delta",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-aggregate — every predicate (year window, discount band,
    quantity cap) pushes to the parquet scan, no join, no shuffle beyond
    the single-row final aggregate.  The whole-stage-codegen ideal case;
    at 100 TB this is the query whose cost is the scan and nothing else.
    Discount literals compare against the same stored doubles in both
    engines (identical parses), so the filter is bit-equal; non-vacuous
    at both oracle scales (124 / 1,175 lines)."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast(dict(li.dtypes)["l_shipdate"])
    hi = F.lit("1998-01-01 00:00:00").cast(dict(li.dtypes)["l_shipdate"])
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue_delta"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with the exclusion predicate in the ON clause (an order-less
    customer must still appear with count 0 — moving the filter to
    WHERE would silently drop them, the classic outer-join bug), then
    the double aggregation: count per customer, histogram over those
    counts.  Plan at scale: one custkey shuffle for the outer join +
    first aggregate; the second aggregate's domain is order counts
    (tiny).  Pure integers, hash-exact; 16 / 20 distinct counts at the
    oracle scales."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("n_customers")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH tgt AS (
        SELECT MIN(n_name) AS t
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(CASE WHEN n1.n_name = (SELECT t FROM tgt)
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
    GROUP BY YEAR(o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share), closing the partsupp-free
    TPC-H set (16/16): the target nation's share of PROMO-part revenue
    sold into EUROPE per order year — an 8-relation join with a
    conditional-aggregate ratio.  The target nation is DATA-DERIVED
    (MIN nation name in the region, a scalar-subquery dial both engines
    fold) — a nation literal would be the q5 vacuous-literal trap on the
    synthetic nation names.  One SQL text both engines parse (the
    Q4/Q17/Q22 pattern).  Plan at scale: part/supplier/customer/nation/
    region all broadcast; the orderkey shuffle is the only big exchange;
    the year grouping aggregates map-side.  Non-vacuous at both oracle
    scales (7 year rows each; shares 0.006–0.19)."""
    for t in ("lineitem", "part", "supplier", "orders", "customer",
              "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLE["q8_market_share"])
