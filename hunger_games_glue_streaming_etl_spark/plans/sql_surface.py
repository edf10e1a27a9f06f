"""The last three SQL-front-end surfaces a Spark user reaches that the
registry didn't cover (VERDICT r5 "Next round" #3-5): native
``WITH RECURSIVE`` through ``spark.sql``, declarative SQL UDFs
(``CREATE TEMPORARY FUNCTION ... RETURN expr``), and session variables
(``DECLARE VARIABLE`` / ``SET VAR``).  All three were probed working in
this image's PySpark 4.1.2 before registering.

View naming: these entries register temp views under the CANONICAL table
names (``lineitem``, ``documents``, ...) — unlike the rest of the registry,
which suffixes view names — because the recursive entry's whole point is
that the SAME SQL text runs on both engines (the DuckDB oracle reads views
with canonical names).  ``createOrReplaceTempView`` keeps that idempotent;
no other registry entry resolves bare canonical names, so nothing can
accidentally bind to these views.

Reference scope note: the reference job (TributeStreamingJob.py) drives its
whole pipeline through the DataFrame API; these entries extend the engine's
§2C SQL-surface coverage beyond it, per SURVEY.md §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.batch import load_table
from .registry import ORACLE, register


def _canonical_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# 1) Native WITH RECURSIVE — ONE SQL text, both engines.
#
# Nation-level trade reachability: an edge supplier-nation -> customer-nation
# exists when any order line ships between them; reach(nation, hops) is the
# minimum hop count from the seed nation within <= 3 hops.  The seed is
# corpus-derived (MIN edge source) so the entry can't go vacuous at small
# scale factors — at sf0.001 nation 0 has no outgoing edges at all.  The
# recursion enumerates paths (UNION ALL + depth guard) and the outer
# aggregate collapses to MIN — well-defined and hash-exact because hops is
# an integer and the node set is the 25-row nation dimension, so the path
# fan-out is bounded (<= 25^3) regardless of fact-table scale.
#
# At 100 TB: the edge CTE collapses the fact join to a <=625-row DISTINCT
# before any recursion (keys-only shuffle); the recursive part never touches
# fact rows.  Unbounded-diameter reachability over BIG node sets stays on
# the checkpointed DataFrame-loop path (plans/graph_ops.py) — this entry
# pins the SQL front end, not a new scale path.
# ---------------------------------------------------------------------------
_REACHABILITY_SQL = """
WITH RECURSIVE trade_edges(src, dst) AS (
    SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    WHERE s.s_nationkey <> c.c_nationkey
),
reach(node, depth) AS (
    SELECT MIN(src) AS node, 0 AS depth FROM trade_edges
    UNION ALL
    SELECT e.dst AS node, r.depth + 1 AS depth
    FROM reach r JOIN trade_edges e ON r.node = e.src
    WHERE r.depth < 3
)
SELECT CAST(node AS BIGINT) AS nation_key,
       CAST(MIN(depth) AS INT) AS hops
FROM reach
GROUP BY node
"""


@register("sql_recursive_reachability", oracle=_REACHABILITY_SQL)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth transitive closure through Spark's native recursive
    CTE (PySpark 4.1): min-hop reachability over the nation-level trade
    graph from nation 0.  The oracle is the IDENTICAL SQL text in DuckDB
    (the ``join_lateral_topk`` pattern) — both engines' ``WITH RECURSIVE
    ... UNION ALL`` fixpoint semantics agree, so edges, recursion, and the
    MIN collapse can't diverge."""
    _canonical_views(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    return spark.sql(_REACHABILITY_SQL)


# ---------------------------------------------------------------------------
# 2) SQL UDF: the quality-score derivation routed through
#    CREATE TEMPORARY FUNCTION ... RETURNS DOUBLE RETURN <expr>.
#
# The body is the SQL spelling of functions.text.quality_score (same bands,
# same ROUND(.., 6)); Catalyst inlines the function body into the plan —
# no Python worker, no UDF node at execution (asserted in
# tests/test_plan_shapes.py).  The oracle is string-reused from
# text_quality_score so the two surfaces can never diverge.
# ---------------------------------------------------------------------------
_QUALITY_UDF_DDL = r"""
CREATE OR REPLACE TEMPORARY FUNCTION doc_quality(t STRING) RETURNS DOUBLE
RETURN ROUND(
    0.25 * (CASE WHEN length(t) >= 100 AND length(t) <= 10000
                 THEN 1.0 ELSE 0.5 END)
  + 0.25 * (CASE WHEN length(replace(regexp_replace(lower(trim(t)), '\\s+', ' '), ' ', ''))
                      / CAST(size(split(regexp_replace(lower(trim(t)), '\\s+', ' '), ' ')) AS DOUBLE)
                      BETWEEN 3 AND 12
                 THEN 1.0 ELSE 0.5 END)
  + 0.25 * (1 - CAST(length(regexp_replace(t, '[^!-/:-@\\[-`{-~]', '')) AS DOUBLE)
                / greatest(CAST(length(t) AS DOUBLE), 1.0))
  + 0.25 * size(array_distinct(split(regexp_replace(lower(trim(t)), '\\s+', ' '), ' ')))
         / greatest(CAST(size(split(regexp_replace(lower(trim(t)), '\\s+', ' '), ' ')) AS DOUBLE), 1.0),
  6)
"""


@register("sql_udf_quality_score", oracle=None)  # oracle assigned below
def sql_udf_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined SQL function surface: the document quality score as a
    declarative ``CREATE TEMPORARY FUNCTION`` whose body Catalyst inlines
    (whole-stage codegen, zero Python).  Same result set as
    ``text_quality_score`` by construction — the oracle string is reused
    verbatim, so this entry isolates exactly one variable: the UDF
    front end."""
    spark.sql(_QUALITY_UDF_DDL)
    _canonical_views(spark, sf_dir, "documents")
    return spark.sql("SELECT doc_id, doc_quality(text) AS quality FROM documents")


# the registry decorator has run by module-import time; wire the reused
# oracle text afterwards so a text_ops edit can't silently fork the two.
# The explicit import declares the dependency — before it, this line only
# worked because chat_ops (imported earlier in plans/__init__) happened to
# import text_ops first (ADVICE r6).
from . import text_ops  # noqa: E402  (must run before the ORACLE lookup)

ORACLE["sql_udf_quality_score"] = ORACLE["text_quality_score"]


# ---------------------------------------------------------------------------
# 3) Session variables: DECLARE VARIABLE + SET VAR parameterizing a dial.
# ---------------------------------------------------------------------------
@register(
    "sql_session_variable_dial",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars BETWEEN 200 AND 5000
    GROUP BY lang
    """,
)
def sql_session_variable_dial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-variable surface: the length-band dial of a corpus rollup
    parameterized through ``DECLARE VARIABLE`` + ``SET VAR`` and referenced
    by name in the query (the oracle inlines the values).  Variables are
    constant-folded at analysis, so the BETWEEN still pushes to the scan
    as a literal range predicate."""
    spark.sql("DECLARE OR REPLACE VARIABLE len_lo BIGINT DEFAULT 0")
    spark.sql("DECLARE OR REPLACE VARIABLE len_hi BIGINT DEFAULT 0")
    spark.sql("SET VAR len_lo = 200")
    spark.sql("SET VAR len_hi = 5000")
    _canonical_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE n_chars BETWEEN len_lo AND len_hi
        GROUP BY lang
        """
    )


# ---------------------------------------------------------------------------
# 4) CACHE TABLE — the SQL caching surface (late round 6).


@register(
    "sql_cache_table",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents GROUP BY 1, 2
    """,
)
def sql_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CACHE [LAZY] TABLE ... AS SELECT`` — the SQL front end of the
    reference's dim-caching op (A6, `.cache()` on the joined dims): a
    projected cached view whose first action materializes it into the
    in-memory columnar store (InMemoryRelation; plan-asserted in
    `tests/test_plan_shapes.py`), so every later query over it skips the
    source scan.  LAZY so registration itself stays plan-only.  The
    cached projection carries only (lang, source, n_chars) — the
    column-pruned footprint is what makes dim caching viable at scale;
    caching the raw text column would be the anti-pattern.  UNCACHE +
    DROP first keeps the entry idempotent across a long-lived session."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_cache_src"
    )
    spark.sql("UNCACHE TABLE IF EXISTS docs_cached")
    spark.sql("DROP VIEW IF EXISTS docs_cached")
    spark.sql(
        "CACHE LAZY TABLE docs_cached AS "
        "SELECT lang, source, n_chars FROM docs_cache_src"
    )
    return spark.sql(
        """
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(n_chars) AS chars_sum
        FROM docs_cached GROUP BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# 5) CREATE TABLE + INSERT INTO — the SQL DML write surface (late round 6).


@register(
    "sql_insert_into_select",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM (
        SELECT lang, n_chars FROM documents WHERE source = 'src0'
        UNION ALL
        SELECT lang, n_chars FROM documents WHERE source = 'src1'
    ) GROUP BY 1
    """,
)
def sql_insert_into_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML writes — ``CREATE TABLE ... USING parquet`` + two
    ``INSERT INTO ... SELECT`` batches (the warehouse ingest statement a
    SQL-first user reaches before any DataFrame API): each INSERT is an
    append job through the same file-commit protocol as a DataFrame
    write, so batch N+1 never rewrites batch N's files — the append-only
    ingest shape.  The aggregate over the table must equal the UNION ALL
    of the two source selections, which the oracle pins.  Catalog
    hygiene per the round-6 rule: managed-table warehouse dirs orphan
    across sessions (in-memory catalog forgets, dir persists), so the
    entry DROPs **and** rmtrees the location before creating."""
    import os
    import shutil

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_insert_src"
    )
    spark.sql("DROP TABLE IF EXISTS ingest_docs")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), "ingest_docs")
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        "CREATE TABLE ingest_docs (lang STRING, n_chars BIGINT) USING parquet"
    )
    spark.sql(
        "INSERT INTO ingest_docs "
        "SELECT lang, n_chars FROM docs_insert_src WHERE source = 'src0'"
    )
    spark.sql(
        "INSERT INTO ingest_docs "
        "SELECT lang, n_chars FROM docs_insert_src WHERE source = 'src1'"
    )
    return spark.sql(
        """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               SUM(n_chars) AS chars_sum
        FROM ingest_docs GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# 6) Column DEFAULTs in DML (late round 6).


@register(
    "sql_insert_default_columns",
    oracle="""
    SELECT tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(chars) AS BIGINT) AS chars_sum,
           MIN(doc_id) AS min_doc_id
    FROM (
        SELECT doc_id, CAST(-1 AS BIGINT) AS chars, 'unknown' AS tag
        FROM documents WHERE source = 'src0'
        UNION ALL
        SELECT doc_id, n_chars AS chars, lang AS tag
        FROM documents WHERE source = 'src1'
    ) GROUP BY 1
    """,
)
def sql_insert_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DEFAULT values in DML (`CREATE TABLE ... DEFAULT` + a
    column-subset `INSERT INTO (cols)`): the legacy-producer ingest shape
    — an old writer supplies only the columns it knows and the table
    contract backfills the rest, declaratively and atomically, instead of
    every reader re-implementing COALESCE.  One INSERT names only
    ``doc_id`` (chars/tag take their DEFAULTs), one supplies all three;
    the rollup GROUPs BY the defaulted tag so both row classes are
    non-vacuous and the backfill values are value-hashed.  Same catalog
    hygiene as `sql_insert_into_select` (DROP + rmtree first)."""
    import os
    import shutil

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_default_src"
    )
    spark.sql("DROP TABLE IF EXISTS ingest_defaults")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), "ingest_defaults")
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        "CREATE TABLE ingest_defaults ("
        " doc_id BIGINT,"
        " chars BIGINT DEFAULT -1,"
        " tag STRING DEFAULT 'unknown'"
        ") USING parquet"
    )
    spark.sql(
        "INSERT INTO ingest_defaults (doc_id) "
        "SELECT doc_id FROM docs_default_src WHERE source = 'src0'"
    )
    spark.sql(
        "INSERT INTO ingest_defaults "
        "SELECT doc_id, n_chars, lang FROM docs_default_src WHERE source = 'src1'"
    )
    return spark.sql(
        """
        SELECT tag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               SUM(chars) AS chars_sum,
               MIN(doc_id) AS min_doc_id
        FROM ingest_defaults GROUP BY 1
        """
    )


@register(
    "sql_parameterized_identifier",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice < 150000.0
    GROUP BY o_orderpriority, o_orderstatus
    UNION ALL
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'P' AND o_totalprice < 250000.0
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def sql_parameterized_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` — the injection-safe templating surface
    (Spark 3.4+/4.x): NAMED parameter markers (``:name`` + ``args``
    dict), POSITIONAL markers (``?`` + ``args`` list), and the
    ``IDENTIFIER(:tbl)`` clause that lets a parameter name a TABLE (and
    a grouping COLUMN here) without string-splicing SQL text.  Values
    bind as typed literals at parse time, so Catalyst constant-folds and
    pushes them down exactly like hand-inlined literals (same scan
    filters, same plan) — templating costs nothing at 100 TB, while
    string-spliced SQL invites both injection and accidental plan-cache
    misses.  The oracle replays both parameter sets inlined; both lanes
    carry their filter columns so the union is self-describing."""
    _canonical_views(spark, sf_dir, "orders")
    named = spark.sql(
        """
        SELECT IDENTIFIER(:gcol) AS o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :status AND o_totalprice < :cap
        GROUP BY IDENTIFIER(:gcol), o_orderstatus
        """,
        args={"tbl": "orders", "gcol": "o_orderpriority", "status": "F", "cap": 150000.0},
    )
    positional = spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderstatus = ? AND o_totalprice < ?
        GROUP BY o_orderpriority, o_orderstatus
        """,
        args=["P", 250000.0],
    )
    return named.unionAll(positional)


@register(
    "sql_insert_overwrite_dynamic",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN lang = (SELECT MIN(lang) FROM documents)
                         THEN n_chars * 2 ELSE n_chars END)
                AS BIGINT) AS chars_sum
    FROM documents GROUP BY 1
    """,
)
def sql_insert_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT OVERWRITE`` under DYNAMIC partition-overwrite mode — the
    partition-level revision verb (the third DML shape after append
    INSERT and DEFAULT backfill): a corrected slice replaces ONLY the
    partitions it produces rows for, atomically per partition, leaving
    every other partition's files untouched.  The entry seeds a
    lang-partitioned table from the full corpus, then overwrites one
    corpus-derived partition (MIN lang — a collected scalar dial, the
    round-6 pruning rule) with doubled char counts.  Both lanes pin the
    mode's semantics: under STATIC mode the other langs' rows would
    vanish (their n_rows lanes prove survival), and under plain append
    the revised lang's n_rows would double (its count lane proves
    replacement).  At 100 TB this is the nightly re-statement pattern —
    rewrite yesterday's partition, never the table; cost scales with the
    revised slice.  The conf is restored after the INSERT because the
    write executes eagerly inside the entry (unlike the lazy
    Python-DataSource reader, which must NOT restore)."""
    import os
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_ow_src")
    rev_lang = docs.selectExpr("min(lang)").collect()[0][0]
    spark.sql("DROP TABLE IF EXISTS ow_docs_dyn")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), "ow_docs_dyn")
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        "CREATE TABLE ow_docs_dyn (doc_id BIGINT, n_chars BIGINT, lang STRING) "
        "USING parquet PARTITIONED BY (lang)"
    )
    spark.sql(
        "INSERT INTO ow_docs_dyn SELECT doc_id, n_chars, lang FROM docs_ow_src"
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # named parameter marker, not string splicing — a lang value
        # containing a quote must not break the statement (ADVICE r6)
        spark.sql(
            "INSERT OVERWRITE ow_docs_dyn "
            "SELECT doc_id, n_chars * 2 AS n_chars, lang FROM docs_ow_src "
            "WHERE lang = :rev",
            args={"rev": rev_lang},
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.sql(
        """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               SUM(n_chars) AS chars_sum
        FROM ow_docs_dyn GROUP BY 1
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    LIMIT 3
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (``|>``, Spark 4.0+): the linear FROM-first query
    form — each stage feeds the next, the order you read is the order it
    runs.  Join, filter, aggregate-with-inline-GROUP-BY, order, limit all
    through pipe stages; Catalyst lowers it to the identical plan the
    standard form produces, which is exactly what the oracle pins (same
    result set, hash-checked).  Surface-only entry: no new execution
    machinery, the point is that a user of the pipe dialect can run it
    here."""
    _canonical_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        FROM orders
        |> JOIN customer ON o_custkey = c_custkey
        |> WHERE c_mktsegment = 'BUILDING'
        |> AGGREGATE COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        |> LIMIT 3
        """
    )



@register(
    "sql_script_transform",
    oracle="""
    SELECT o_orderpriority AS prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders GROUP BY 1
    """,
)
def sql_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style script transform (``SELECT TRANSFORM ... USING 'cat'``)
    — the legacy streaming-ETL surface where rows pipe through an external
    process per partition.  Spark runs the no-serde form (explicit ``ROW
    FORMAT DELIMITED``) natively, no Hive needed; ``cat`` is POSIX so the
    identity mapping is portable.  Values round-trip as tab-delimited
    text, so the BIGINT key survives exactly (string↔int is lossless) and
    the downstream aggregate hash-checks against the source of truth.

    Scale shape: the script launches once per PARTITION (not per row) and
    streams stdin→stdout; cost is the text serialization boundary, the
    same class as a row-wise Python UDF — the entry exists to cover the
    surface, and its docstring is the warning to prefer Arrow kernels."""
    _canonical_views(spark, sf_dir, "orders")
    return spark.sql(
        r"""
        SELECT prio,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS key_sum
        FROM (
            SELECT TRANSFORM(o_orderkey, o_orderpriority)
              ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
              USING 'cat' AS (k STRING, prio STRING)
              ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
            FROM orders
        )
        GROUP BY prio
        """
    )


@register(
    "sql_distribute_cluster_by",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 4
    """,
)
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CLUSTER BY`` (= DISTRIBUTE BY + SORT BY) — manual control of the
    shuffle distribution from SQL.  The point at 100 TB: a downstream
    aggregate on the SAME key reuses the clustering instead of adding its
    own exchange — the plan carries exactly ONE shuffle (asserted in
    ``tests/test_plan_shapes.py``), the write-side analogue of bucketing
    for a single query.  HAVING keeps the entry non-vacuous at sf0.001."""
    _canonical_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM (SELECT * FROM lineitem CLUSTER BY l_orderkey)
        GROUP BY l_orderkey
        HAVING COUNT(*) >= 4
        """
    )


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4 BEGIN…END: DECLARE / SET / WHILE / IF) and
# EXECUTE IMMEDIATE — the remaining procedural front-end surfaces, probed
# working in this build (scripting behind spark.sql.scripting.enabled).
# ---------------------------------------------------------------------------


@register(
    "sql_scripting_control_flow",
    oracle="""
    WITH dial AS (
        SELECT LEAST(
            CASE WHEN x <= 1 THEN 1
                 ELSE 1 << LENGTH(bin(CAST(x - 1 AS BIGINT))) END,
            256) AS buckets
        FROM (SELECT (COUNT(*) + 63) // 64 AS x FROM orders) n
    )
    SELECT o_custkey % buckets AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders CROSS JOIN dial
    GROUP BY o_custkey % buckets
    """,
)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING: one BEGIN…END block computes a
    corpus-derived bucket dial procedurally — DECLARE two variables, SET
    the count, double `buckets` in a WHILE loop until buckets·64 ≥ n,
    cap it with IF — then aggregates orders by the dialed bucket.  The
    loop is the smallest power of two ≥ ⌈n/64⌉ (log₂ rounds, driver-side
    control flow only; every statement in the script is still a
    distributed query).  The oracle collapses the loop to the closed
    form ``1 << LENGTH(bin(x-1))`` — minimal binary strings are
    identical cross-engine (the round-5 leading-zero rule), so the
    procedural dial and the declarative one hash-match exactly.
    ``spark.sql.scripting.enabled`` is set and left on (parse-time conf;
    the r5 restore rule)."""
    _canonical_views(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql("""
    BEGIN
      DECLARE n BIGINT DEFAULT 0;
      DECLARE buckets BIGINT DEFAULT 1;
      SET n = (SELECT COUNT(*) FROM orders);
      WHILE buckets * 64 < n DO
        SET buckets = buckets * 2;
      END WHILE;
      IF buckets > 256 THEN
        SET buckets = 256;
      END IF;
      SELECT o_custkey % buckets AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM orders
      GROUP BY o_custkey % buckets;
    END
    """)


@register(
    "sql_execute_immediate_param",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS acctbal_total
    FROM customer
    WHERE c_mktsegment <> (SELECT MIN(c_mktsegment) FROM customer)
    GROUP BY c_mktsegment
    """,
)
def sql_execute_immediate_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with a positional parameter bound from a session
    variable whose value is itself a scalar subquery over the corpus
    (SET VAR seg = (SELECT MIN(...))) — the dynamic-SQL surface a
    migrating dbt/stored-proc user reaches for first.  The parameter
    marker keeps the payload SQL a constant string (no string splicing),
    and the oracle inlines the same subquery, so the result hashes."""
    _canonical_views(spark, sf_dir, "customer")
    spark.sql("DECLARE OR REPLACE VARIABLE seg STRING DEFAULT ''")
    spark.sql("SET VAR seg = (SELECT MIN(c_mktsegment) FROM customer)")
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND(SUM(c_acctbal), 2) AS acctbal_total "
        "FROM customer WHERE c_mktsegment <> ? GROUP BY c_mktsegment' "
        "USING seg"
    )
