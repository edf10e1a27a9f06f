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


@register(
    "dq_expectations_summary",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
        FROM lineitem
    ),
    bad AS (
        SELECT l_orderkey, l_linenumber,
               -3.0 AS l_quantity, 0.5 AS l_discount,
               CAST(NULL AS TIMESTAMP) AS l_shipdate
        FROM base WHERE l_orderkey % 199 = 7
    ),
    audited AS (SELECT * FROM base UNION ALL SELECT * FROM bad),
    scalar AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty_viol,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc_viol,
               CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT) AS null_viol
        FROM audited
    ),
    dup AS (
        SELECT CAST(SUM(c - 1) AS BIGINT) AS dup_viol
        FROM (SELECT COUNT(*) AS c FROM audited
              GROUP BY l_orderkey, l_linenumber)
    )
    SELECT 'quantity_in_[1,50]' AS rule, qty_viol AS n_violations, n AS n_checked FROM scalar
    UNION ALL
    SELECT 'discount_in_[0,0.1]', disc_viol, n FROM scalar
    UNION ALL
    SELECT 'shipdate_not_null', null_viol, n FROM scalar
    UNION ALL
    SELECT 'orderkey_linenumber_unique', dup_viol, n FROM scalar, dup
    """,
)
def dq_expectations_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-suite audit (the Great-Expectations / dbt-tests shape
    beyond referential integrity): range checks, not-null, and key
    uniqueness over ``lineitem`` in ONE pass, long-form one row per rule.
    The fixture data is clean, so a deterministic slice
    (``l_orderkey % 199 = 7``) is re-appended with all four corruptions —
    both engines plant identical bad rows and the audit must count
    exactly those (the planted-violation non-vacuity pattern of
    ``dq_referential_orphans``).

    Plan shape: the scalar rules share one aggregate over one scan; the
    uniqueness rule is a SEPARATE keys-only aggregate (per the round-5
    Expand rule: never drag other aggregates through a distinct-shaped
    plan), 1×1-joined back.  At 100 TB that is two scans of pruned
    columns — or one, if the audited frame is already materialized by the
    ingestion step this audit would piggyback on."""
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate"
    )
    bad = base.filter(F.col("l_orderkey") % 199 == 7).select(
        "l_orderkey",
        "l_linenumber",
        F.lit(-3.0).alias("l_quantity"),
        F.lit(0.5).alias("l_discount"),
        F.lit(None).cast("timestamp").alias("l_shipdate"),
    )
    audited = base.unionByName(bad)
    scalar = audited.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).cast("long").alias("qty_viol"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).cast("long").alias("disc_viol"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).cast("long").alias("null_viol"),
    )
    dup = (
        audited.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") - 1).cast("long").alias("dup_viol"))
    )
    wide = scalar.crossJoin(F.broadcast(dup))
    return wide.selectExpr(
        "stack(4, "
        "'quantity_in_[1,50]', qty_viol, "
        "'discount_in_[0,0.1]', disc_viol, "
        "'shipdate_not_null', null_viol, "
        "'orderkey_linenumber_unique', dup_viol) AS (rule, n_violations)",
        "n AS n_checked",
    )


@register(
    "dq_table_diff_summary",
    oracle="""
    WITH a AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    mx AS (SELECT MAX(c_custkey) AS m FROM customer),
    b AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 20 = 5 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 97 <> 3
        UNION ALL
        SELECT mx.m + 1 + CAST(i AS BIGINT) * 7,
               'NEW_ROW_' || CAST(i AS VARCHAR), 0.0
        FROM range(5) t(i) CROSS JOIN mx
    )
    SELECT CASE WHEN a.c_custkey IS NULL THEN 'added'
                WHEN b.c_custkey IS NULL THEN 'removed'
                WHEN a.c_acctbal <> b.c_acctbal OR a.c_name <> b.c_name
                    THEN 'changed'
                ELSE 'unchanged' END AS diff_class,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
    GROUP BY 1
    """,
)
def dq_table_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the data-diff / anti-entropy audit): given
    two versions of a table, classify every key as added / removed /
    changed / unchanged and roll up per-class counts — the check a
    migration, backfill, or replication pipeline runs before cutover.
    The second snapshot is derived from the first IN BOTH ENGINES with
    planted edits (1-in-20 balance bump, 1-in-97 delete, 5 appended keys
    at ``max+1+7i`` — the `dq_referential_orphans` planting rule), so the
    gate proves every class is FOUND, not that identical tables are
    identical — all four classes are non-vacuous at sf0.001 and sf0.01.

    Change detection compares typed COLUMNS (`<>` on the double after the
    identical `+100.0` tree), never a stringified row hash — rendering
    doubles to text is engine-specific, typed comparison is not.  Scale:
    one full-outer shuffle on the key (neither side broadcastable — both
    sides' non-matches survive) carrying only the compared columns, then
    a 4-group rollup; at 100 TB you'd page this by key range and the
    per-class partials merge by addition."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select("c_custkey", "c_name", "c_acctbal")
    mx = cust.agg(F.max("c_custkey").alias("m"))
    planted = (
        spark.range(5)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("m") + 1 + F.col("id") * 7).alias("c_custkey"),
            F.concat(F.lit("NEW_ROW_"), F.col("id").cast("string")).alias(
                "c_name"
            ),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    b = (
        a.filter(F.col("c_custkey") % 97 != 3)
        .select(
            "c_custkey",
            "c_name",
            F.when(
                F.col("c_custkey") % 20 == 5, F.col("c_acctbal") + F.lit(100.0)
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(planted)
    )
    aa = a.alias("a")
    bb = b.alias("b")
    diff_class = (
        F.when(F.col("a.c_custkey").isNull(), F.lit("added"))
        .when(F.col("b.c_custkey").isNull(), F.lit("removed"))
        .when(
            (F.col("a.c_acctbal") != F.col("b.c_acctbal"))
            | (F.col("a.c_name") != F.col("b.c_name")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        aa.join(bb, F.col("a.c_custkey") == F.col("b.c_custkey"), "full")
        .groupBy(diff_class.alias("diff_class"))
        .agg(F.count("*").alias("n_rows"))
    )


#: modulus for the summed fingerprint lane.  SUM of raw 48-bit hashes
#: overflows BIGINT past ~2^16 rows·2^47 avg (caught live: ANSI
#: ARITHMETIC_OVERFLOW on the sf0.1 orders table), so the sum lane
#: accumulates RESIDUES h mod P instead: bounded by P·n_rows, safe to
#: ~9·10^12 rows, and still order-independent/mergeable.  Full-width
#: strength stays in the BIT_XOR lane (overflow-free by nature); the
#: residue-sum lane is what catches XOR's duplicate-pair cancellation.
_FP_PRIME = 1048573  # largest prime < 2^20


def _fp_sql(table: str, concat_expr: str) -> str:
    # the portable 48-bit hash including its seed prefix ("0:"), mirroring
    # functions.text.portable_hash64(col, seed=0)
    h = "CAST(('0x' || substr(md5('0:' || fp_src), 1, 12)) AS BIGINT)"
    return f"""
        SELECT '{table}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM({h} % {_FP_PRIME}) AS BIGINT) AS fp_sum,
               CAST(BIT_XOR({h}) AS BIGINT) AS fp_xor
        FROM (SELECT {concat_expr} AS fp_src FROM {table})
    """


@register(
    "dq_table_fingerprint",
    oracle=f"""
    {_fp_sql("orders",
             "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, "
             "o_orderpriority, epoch_us(o_orderdate))")}
    UNION ALL
    {_fp_sql("customer",
             "concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment)")}
    """,
)
def dq_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the cross-engine/replica
    equality check this whole repo's oracle gate is built on, exposed as
    an operator: per table, SUM and BIT_XOR of the portable 48-bit hash
    of a canonical row rendering (integer/string/epoch-µs columns only —
    float columns never enter a fingerprint, the rendering rule that
    keeps both engines byte-identical).  Two replicas agree iff
    (n_rows, fp_sum, fp_xor) agree, regardless of row order, file
    layout, or partitioning — SUM and XOR are commutative/associative,
    so at 100 TB the fingerprint is a pure map-side partial aggregate
    (one row per partition crosses the wire) and fingerprints of
    disjoint shards MERGE by adding/xoring, the sketch-tier mergeability
    argument applied to integrity checking."""
    from ..functions.text import portable_hash64

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def fp(df: DataFrame, name: str, cols) -> DataFrame:
        src = F.concat_ws("|", *cols)
        h = portable_hash64(src)
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("n_rows"),
            # residue lane: SUM of raw 48-bit hashes overflows BIGINT past
            # ~10^5 rows (ANSI overflow, caught at sf0.1) — see _FP_PRIME
            F.sum(F.col("h") % _FP_PRIME).alias("fp_sum"),
            F.expr("bit_xor(h)").alias("fp_xor"),
        )
    o = fp(
        orders,
        "orders",
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            # o_orderdate arrives TIMESTAMP_NTZ; the tz-independent NTZ
            # bridge (same as sources/batch.load_table) makes unix_micros
            # equal DuckDB's epoch_us of the naive value
            F.unix_micros(F.to_utc_timestamp(F.col("o_orderdate"), "UTC")),
        ],
    )
    c = fp(
        customer,
        "customer",
        [
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
        ],
    )
    return o.unionAll(c)


# ---- robust outlier detection (median/MAD) ----------------------------------
# The robust sibling of z-score anomaly checks: median ± k·MAD is immune
# to the outliers it hunts (a z-score's mean/stddev are dragged by the
# tail — and engine-internal stddev is not cross-engine reproducible
# anyway, the r4 Welford rule).  Both medians are the exact lower median
# by discrete rank over integer cents (smallest value whose running count
# reaches ceil(N/2)) — pure integer arithmetic, hash-exact, and the flag
# comparison |v - med| > 3·MAD never divides.  The rank windows run over
# per-type value HISTOGRAMS, bounded by the value domain (~50k cents),
# not the corpus.
_MAD_K = 3


@register(
    "dq_outlier_mad_flags",
    oracle=f"""
    WITH e AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events
    ),
    hist AS (
        SELECT event_type, v, COUNT(*) AS c FROM e GROUP BY event_type, v
    ),
    run AS (
        SELECT event_type, v,
               SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS rc,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM hist
    ),
    med AS (
        SELECT event_type, MIN(v) AS m
        FROM run WHERE rc >= (n + 1) // 2 GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.v, abs(e.v - med.m) AS d
        FROM e JOIN med USING (event_type)
    ),
    dhist AS (
        SELECT event_type, d, COUNT(*) AS c FROM dev GROUP BY event_type, d
    ),
    drun AS (
        SELECT event_type, d,
               SUM(c) OVER (PARTITION BY event_type ORDER BY d) AS rc,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM dhist
    ),
    mad AS (
        SELECT event_type, MIN(d) AS mad
        FROM drun WHERE rc >= (n + 1) // 2 GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type, dev.v AS value_cents,
           dev.d AS deviation_cents
    FROM dev JOIN mad USING (event_type)
    WHERE dev.d > {_MAD_K} * mad.mad
    """,
)
def dq_outlier_mad_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags per event_type: every event whose value sits
    more than 3 MADs from its series' median (the Hampel filter / robust
    z-score with the division cross-multiplied away).  Exact integer
    medians by discrete rank — see the section comment.

    Scale shape: two aggregations build per-type value/deviation
    histograms whose size is bounded by the VALUE DOMAIN (≤ ~50k distinct
    cents), not the corpus; the rank windows run over those bounded
    frames; the median/MAD tables are 5 rows → broadcast back, so the
    flagging pass is map-side.  At 100 TB the only corpus-sized shuffles
    are the two histogram aggregations (map-side partial combine makes
    them domain-bounded too)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )

    def _rank_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        hist = frame.groupBy("event_type", col).agg(F.count("*").alias("c"))
        w_run = Window.partitionBy("event_type").orderBy(col)
        w_all = Window.partitionBy("event_type")
        run = hist.select(
            "event_type",
            col,
            F.sum("c").over(w_run).alias("rc"),
            F.sum("c").over(w_all).alias("n"),
        )
        return (
            run.filter(F.col("rc") >= F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(col).alias(out))
        )

    med = _rank_median(e, "v", "m")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "v",
        F.abs(F.col("v") - F.col("m")).alias("d"),
    )
    mad = _rank_median(dev, "d", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("d") > _MAD_K * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.col("v").alias("value_cents"),
            F.col("d").alias("deviation_cents"),
        )
    )
