"""Scalar-function surface (SURVEY.md §2C 'Scalar functions': the reference
uses only comparisons/subtraction/boolean OR and delegates JSON parsing to
the Kinesis SerDe; the engine ships the string/date/math/JSON categories,
with ``from_json`` playing the SerDe's role).

Cross-engine determinism notes (vs the DuckDB oracle): transcendental
functions are rounded (libm last-ULP differences); double→int conversions use
explicit FLOOR/CEIL (DuckDB's bare CAST rounds, Spark's truncates); JSON
extraction is cast to a concrete type on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS_SCHEMA
from ..sources.batch import load_table
from .registry import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           SUBSTR(p_type, 1, 8) AS type_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trim,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 8).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS order_day,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS order_dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-01') AS BIGINT) AS days_to_cutoff
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction and arithmetic on the order timeline.  DOW:
    Spark's dayofweek is 1=Sunday; DuckDB's EXTRACT(DOW) is 0=Sunday —
    normalized to the 0-based form."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT c_custkey,
           ABS(c_acctbal) AS abs_bal,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
           CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
           ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
           ROUND(LN(ABS(c_acctbal) + 1), 6) AS ln_bal,
           ROUND(POWER(c_acctbal / 1000, 2), 6) AS pow_bal,
           CAST(c_custkey % 7 AS BIGINT) AS bucket7,
           CASE WHEN c_acctbal < 0 THEN -1 WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS sign_bal
    FROM customer
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = F.col("c_acctbal")
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.floor(bal).cast("long").alias("floor_bal"),
        F.ceil(bal).cast("long").alias("ceil_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("ln_bal"),
        F.round(F.pow(bal / 1000, 2), 6).alias("pow_bal"),
        (F.col("c_custkey") % 7).cast("long").alias("bucket7"),
        F.signum(bal).cast("int").alias("sign_bal"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema — the engine's stand-in for the
    reference's catalog-bound JSON SerDe (cloudformation/template.yml:80-82;
    SURVEY.md §1.3)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("props_struct", F.from_json("props", EVENT_PROPS_SCHEMA))
    return parsed.select(
        "event_id",
        F.col("props_struct.k").alias("k"),
        F.when(F.col("props_struct.k") > 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "scalar_conditional_null",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_totalprice IS NULL THEN 0.0 ELSE o_totalprice END AS price_nn,
           IFNULL(NULL, o_orderpriority) AS prio,
           GREATEST(o_totalprice, 100000.0) AS price_floor100k,
           LEAST(o_totalprice, 400000.0) AS price_cap400k
    FROM orders
    """,
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling + comparison scalar surface: coalesce/nullif/greatest/
    least (reference B8's comparison semantics, generalized)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_totalprice").isNull(), 0.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price_nn"),
        F.coalesce(F.lit(None), F.col("o_orderpriority")).alias("prio"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap400k"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS INT) AS n_tokens,
           array_to_string(list_sort(list_distinct(
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[1:5]
           )), ',') AS first5_sorted,
           CASE WHEN list_contains(
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '), 'spark')
           THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: slice, distinct, sort, join-to-string,
    contains — over the tokenized documents (SURVEY.md §1.2: arrays absent
    from the reference, first-class here)."""
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(
            F.array_sort(F.array_distinct(F.slice(toks, 1, 5))), ","
        ).alias("first5_sorted"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("mentions_spark"),
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, '([0-9]+)$', 1) AS source_num,
           CASE WHEN regexp_matches(text, 'join .* stream') THEN 1 ELSE 0 END AS has_join_stream,
           regexp_replace(source, '[0-9]+', '#', 'g') AS source_masked,
           CAST(len(regexp_extract_all(text, 'spark')) AS INT) AS n_spark
    FROM documents
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar surface: extract (group), match test, global replace,
    match count.  Patterns stay in the RE2 ∩ Java-regex common subset so
    both engines agree."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)$", 1).alias("source_num"),
        F.when(F.col("text").rlike("join .* stream"), 1).otherwise(0).alias("has_join_stream"),
        F.regexp_replace("source", r"[0-9]+", "#").alias("source_masked"),
        F.size(F.expr("regexp_extract_all(text, 'spark', 0)")).alias("n_spark"),
    )


@register(
    "scalar_variant_shred",
    oracle="""
    WITH j AS (
        SELECT o_orderkey,
               CONCAT('{"cust": ', o_custkey,
                      ', "tier": "', o_orderpriority, '"',
                      ', "items": [', o_orderkey % 7, ', ', o_orderkey % 11,
                      '], "meta": {"status": "', o_orderstatus, '"}}') AS payload
        FROM orders
    )
    SELECT o_orderkey,
           CAST(json_extract(payload, '$.cust') AS BIGINT) AS cust,
           json_extract_string(payload, '$.tier') AS tier,
           CAST(json_extract(payload, '$.items[1]') AS BIGINT) AS second_item,
           json_extract_string(payload, '$.meta.status') AS status,
           (json_extract_string(payload, '$.meta.status') = 'O') AS is_open
    FROM j
    """,
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type:
    ``parse_json`` → binary variant → typed ``variant_get`` path
    extraction (nested object + array index), the engine's answer to
    open-schema JSON columns where ``from_json``'s fixed StructType can't
    be declared up front.

    The fixtures' only JSON column is the flat ``events.props``, so the
    entry CONSTRUCTS a nested payload from orders columns — with the
    identical CONCAT in the oracle (the planted-corpus pattern:
    both engines build the same strings, then shred them with their own
    JSON machinery, and the typed results must value-hash equal).

    At scale VARIANT is the right default for ingest: parse once into the
    shredded binary encoding, extract columnar paths without re-parsing
    text per access — `variant_get` is JVM-side and codegen'd."""
    orders = load_table(spark, sf_dir, "orders")
    payload = F.concat(
        F.lit('{"cust": '), F.col("o_custkey").cast("string"),
        F.lit(', "tier": "'), F.col("o_orderpriority"), F.lit('"'),
        F.lit(', "items": ['), (F.col("o_orderkey") % 7).cast("string"),
        F.lit(", "), (F.col("o_orderkey") % 11).cast("string"),
        F.lit('], "meta": {"status": "'), F.col("o_orderstatus"),
        F.lit('"}}'),
    )
    v = F.parse_json(payload)
    return orders.select(
        "o_orderkey",
        F.variant_get(v, "$.cust", "bigint").alias("cust"),
        F.variant_get(v, "$.tier", "string").alias("tier"),
        F.variant_get(v, "$.items[1]", "bigint").alias("second_item"),
        F.variant_get(v, "$.meta.status", "string").alias("status"),
        (F.variant_get(v, "$.meta.status", "string") == "O").alias("is_open"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT lang, source,
           CAST(2 * COUNT(*) AS BIGINT) AS doubled,
           CAST((SELECT COUNT(DISTINCT d2.source)
                 FROM documents d2 WHERE d2.lang = d.lang) AS INT) AS n_keys
    FROM documents d
    GROUP BY lang, source
    HAVING 2 * COUNT(*) >= 4
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed higher-order functions — the per-entity key→value rollup
    shape (feature maps, per-source counters, config bags): per language,
    source→count pairs fold into ONE MapType value
    (``map_from_entries`` over a ``sort_array``-ordered entry list — the
    sort pins entry order so the map is construction-deterministic),
    then ``transform_values`` doubles each counter, ``map_filter`` drops
    sparse sources, ``size`` reads key cardinality, and ``explode``
    returns the surviving entries to rows.  The oracle replays the
    arithmetic relationally (GROUP BY + HAVING + a correlated distinct
    count) — maps are a LAYOUT choice, not a semantics change, which is
    exactly why the per-entity map pattern is safe at 100 TB: the map
    lives inside one row, never across a shuffle boundary wider than its
    row, and cardinality is bounded by the per-entity key domain (20
    sources here)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    maps = counts.groupBy("lang").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("source", "cnt")))
        ).alias("m")
    )
    doubled = maps.select(
        "lang",
        F.size("m").alias("n_keys"),
        F.map_filter(
            F.transform_values("m", lambda k, v: v * F.lit(2)),
            lambda k, v: v >= F.lit(4),
        ).alias("kept"),
    )
    return doubled.select(
        "lang",
        F.explode("kept").alias("source", "doubled"),
        "n_keys",
    ).select("lang", "source", F.col("doubled").cast("long"), "n_keys")


@register(
    "scalar_try_arithmetic",
    oracle="""
    WITH t AS (
        SELECT o_orderpriority,
               (o_orderkey % 1000) * 3100000 AS x,
               o_orderkey % 10 AS d,
               o_totalprice,
               CASE WHEN o_orderkey % 2 = 0
                    THEN substring(o_orderpriority, 1, 1)
                    ELSE o_orderstatus END AS maybe_num
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN x > 3037000499 THEN NULL
                         ELSE (x * x) % 999983 END)
                AS BIGINT) AS sq_residue_sum,
           CAST(COUNT(CASE WHEN x > 3037000499 THEN NULL ELSE 1 END)
                AS BIGINT) AS n_sq_ok,
           CAST(SUM(CASE WHEN d = 0 THEN NULL
                         ELSE CAST(FLOOR(o_totalprice / d) AS BIGINT) END)
                AS BIGINT) AS div_sum,
           CAST(COUNT(TRY_CAST(maybe_num AS BIGINT)) AS BIGINT)
               AS n_numeric
    FROM t GROUP BY 1
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic — ``try_multiply``/``try_divide``/``try_cast``:
    under ANSI mode (this engine's default, and Spark 4's) overflow,
    division by zero, and bad casts are RUNTIME CRASHES that kill the
    whole job — this round caught a live one (the fingerprint hash sum at
    sf0.1, CLAUDE.md).  The ``try_`` family converts each hazard to NULL
    so one poison row degrades one value instead of 1000 executors' work.
    Every lane's hazard is real in the fixtures AND rare by design:
    scaled key residues overflow BIGINT on squaring only when
    o_orderkey % 1000 >= 980 — exactly 2% of rows at EVERY scale factor
    (genuine NULLs from ``try_multiply``; the oracle replays the √(2^63)
    guard as CASE).  Density is pinned deliberately: each ``try_``
    rescue of an overflow is a caught JVM exception, so a column where
    MOST rows poison would pay exception-throw cost per row (measured
    3 s vs 0.5 s on this very lane at 99.8% vs 2% density at sf0.1) —
    the surface is for rare hazards, not expected control flow.  The
    residue modulus 999983 is coprime to the 3100000 scale factor so
    surviving residues are nonzero (a modulus dividing the factor makes
    the lane vacuously all-zero).  The divisor is zero on ~10% of rows
    (double try_divide returns NULL without an exception path), and the
    cast target is numeric only on even keys (priority digit), never on
    odd keys (status letter).  Quotients are FLOORed before the BIGINT
    sum — Spark CAST truncates where DuckDB rounds, the recorded
    cast-rule class; floor + integer sums keep every surviving value
    hash-exact, and residues (< 10^6) keep the accumulator ≪ 2^63 at
    any corpus scale (the round-6 fingerprint-overflow rule)."""
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderpriority",
        ((F.col("o_orderkey") % 1000) * 3100000).alias("x"),
        (F.col("o_orderkey") % 10).alias("d"),
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.substring("o_orderpriority", 1, 1),
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("maybe_num"),
    )
    # the SUM of surviving squares (each near 2^63) would itself overflow
    # the accumulator — the residue-sum rule from the fingerprint fix
    sq = F.expr("try_multiply(x, x)")
    return t.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.sum(sq % F.lit(999983)).alias("sq_residue_sum"),
        F.count(sq).alias("n_sq_ok"),
        F.sum(F.floor(F.expr("try_divide(o_totalprice, d)"))).alias("div_sum"),
        F.count(F.expr("try_cast(maybe_num AS BIGINT)")).alias("n_numeric"),
    )


@register(
    "scalar_collation_casefold",
    oracle="""
    WITH t AS (
        SELECT CASE p_partkey % 3 WHEN 0 THEN upper(p_brand)
                                  WHEN 1 THEN lower(p_brand)
                                  ELSE p_brand END AS b,
               p_retailprice
        FROM part
    )
    SELECT lower(b) AS brand_ci,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p_retailprice), 2) AS price_sum,
           CAST(SUM(CASE WHEN lower(b) = 'brand#22' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eq_lit
    FROM t GROUP BY 1
    """,
)
def scalar_collation_casefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface — ``COLLATE UTF8_LCASE`` strings group,
    compare, and hash case-insensitively AT THE TYPE LEVEL, so one
    declaration replaces the lower()-wrapping every case-insensitive
    pipeline otherwise scatters across queries (and forgets once).  The
    fixtures are single-case, so the entry plants real case skew first
    (p_partkey mod 3 picks upper/lower/original brand spellings), then
    (a) groups by the collated column — hash aggregation on the
    collation key, one shuffle, same plan shape as any groupBy — and
    (b) compares against a lowercase literal, which coerces to the
    collated type and matches all three spellings.  The group
    REPRESENTATIVE under a collation is whichever spelling a partition
    sees first (nondeterministic at scale), so the output key is
    normalized through lower() — the one rule a user of collated group
    keys must know.  The oracle replays both as lower() arithmetic,
    which is identical for ASCII brands (UTF8_LCASE full casefold
    differs from lower() only outside ASCII, e.g. dotted-I)."""
    part = load_table(spark, sf_dir, "part")
    t = part.select(
        F.when(F.col("p_partkey") % 3 == 0, F.upper("p_brand"))
        .when(F.col("p_partkey") % 3 == 1, F.lower("p_brand"))
        .otherwise(F.col("p_brand"))
        .alias("b"),
        "p_retailprice",
    )
    ci = t.select(F.expr("b COLLATE UTF8_LCASE").alias("k"), "p_retailprice")
    return (
        ci.groupBy("k")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("price_sum"),
            F.sum(
                F.when(F.col("k") == F.lit("brand#22"), 1).otherwise(0)
            ).alias("n_eq_lit"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("brand_ci"),
            "n_parts",
            "price_sum",
            "n_eq_lit",
        )
    )


@register(
    "scalar_decimal_exact",
    oracle="""
    WITH dec AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity      AS DECIMAL(12,2)) AS qty,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
               CAST(l_discount      AS DECIMAL(12,2)) AS disc,
               CAST(l_tax           AS DECIMAL(12,2)) AS tax
        FROM lineitem
    ),
    derived AS (
        SELECT *,
               CAST(price * (1 - disc) AS DECIMAL(18,4)) AS disc_price
        FROM dec
    )
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(qty)   AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
           CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
           CAST(CAST(SUM(disc_price) AS DECIMAL(38,4)) AS VARCHAR)
               AS sum_disc_price,
           CAST(CAST(SUM(CAST(disc_price * (1 + tax) AS DECIMAL(18,6)))
                     AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
           CAST(SUM(CASE WHEN TRY_CAST(price AS DECIMAL(7,2)) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM derived
    GROUP BY l_returnflag, l_linestatus
    """,
)
def scalar_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ``DecimalType`` money arithmetic over the lineitem money
    columns — the reference's catalog declares its six numeric stream
    columns ``decimal`` (``cloudformation/template.yml:65-76``); this is
    the warehouse-standard exact-money surface (VERDICT r8 "What's
    missing" #1).

    Determinism: every step is EXACT decimal arithmetic — the only
    double->decimal boundary is the initial CAST of cents-valued inputs
    (never halfway at scale 2), each product is cast to an explicit
    precision/scale WIDE ENOUGH that no rounding occurs
    (``DECIMAL(12,2) * DECIMAL(13,2)`` has true scale 4; ``* (1+tax)``
    true scale 6), and sums stay far inside DECIMAL(38).  Keeping
    operands narrow also keeps the natural product precision <= 38 in
    BOTH engines (DuckDB errors rather than silently widening).  The
    overflow lane is ``try_cast`` to DECIMAL(7,2) — NULL exactly when
    price >= 100000, a RARE hazard (the r6 try_ density rule; decimal
    precision checks are branch-based, not exception-based).  Final
    decimals are compared as fixed-scale strings because DuckDB's
    pandas bridge degrades DECIMAL to float64 — the rendered scale is
    itself part of the contract.

    The aggregate round-trips through parquet (DECIMAL logical type in
    the footer) before the final projection, proving the type survives
    storage — this executes a small write at build (plan_audit
    executed-sweep list).  At 100 TB: one map-side-combined hash
    aggregate on low-cardinality keys; decimal ops are codegen'd
    long-backed arithmetic for precision <= 18 intermediates."""
    from pyspark.sql.types import DecimalType

    from ..tmpdirs import entry_tmp_dir

    li = load_table(spark, sf_dir, "lineitem")
    dec = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast(DecimalType(12, 2)).alias("qty"),
        F.col("l_extendedprice").cast(DecimalType(12, 2)).alias("price"),
        F.col("l_discount").cast(DecimalType(12, 2)).alias("disc"),
        F.col("l_tax").cast(DecimalType(12, 2)).alias("tax"),
    )
    disc_price = (F.col("price") * (F.lit(1) - F.col("disc"))).cast(
        DecimalType(18, 4)
    )
    charge = (disc_price * (F.lit(1) + F.col("tax"))).cast(DecimalType(18, 6))
    agg = dec.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").cast(DecimalType(38, 2)).alias("sum_qty"),
        F.sum("price").cast(DecimalType(38, 2)).alias("sum_price"),
        F.sum(disc_price).cast(DecimalType(38, 4)).alias("sum_disc_price"),
        F.sum(charge).cast(DecimalType(38, 6)).alias("sum_charge"),
        F.sum(
            F.when(
                F.col("price").try_cast(DecimalType(7, 2)).isNull(), 1
            ).otherwise(0)
        ).alias("n_overflow"),
        F.count("*").alias("n_rows"),
    )
    out = entry_tmp_dir("scalar_decimal_exact")
    agg.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("string").alias("sum_qty"),
        F.col("sum_price").cast("string").alias("sum_price"),
        F.col("sum_disc_price").cast("string").alias("sum_disc_price"),
        F.col("sum_charge").cast("string").alias("sum_charge"),
        "n_overflow",
        "n_rows",
    )
