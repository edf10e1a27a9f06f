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
