"""Mergeable-sketch queries — count-min frequency estimation and Bloom
membership, built from the PORTABLE 48-bit md5 hash family so the sketch
contents themselves (not just a tolerance band) are bit-identical between
Spark and DuckDB and every entry hash-checks end to end.

This completes the sketch story next to the banded engine-internal
sketches (`agg_approx_distinct_error` pins HLL, `agg_approx_percentile_error`
pins KLL): those use Spark's own implementations and can only be pinned
within a band; these two are *reimplemented from their definitions* on both
engines, which is exactly what makes a sketch useful at 100 TB — the
counter/bit arrays are tiny fixed-size states that partial-aggregate
map-side and merge associatively across any number of executors or days.
The third tier is the native Apache DataSketches surface
(`sketch_native.py`): Spark 4's built-in `hll_sketch_agg` /
`kll_sketch_agg_*` / `theta_sketch_agg` families — JVM-side binary
sketch states with explicit merge functions (`hll_union_agg`,
`theta_union`/`theta_intersection`/`theta_difference`), band-oracled
because their binary states are engine-internal.

Design notes (reference has no sketch surface; this is engine extension):
  - CMS: depth×width counter grid, ``est(x) = min_j C[j][h_j(x)]`` —
    Cormode & Muthukrishnan 2005.  The grid is ``D·W`` BIGINTs regardless
    of corpus size; overestimation is one-sided (``est ≥ exact`` always),
    which the entry exposes as a structural ``overcount ≥ 0`` column.
  - Bloom: K portable hash positions into an M-bit space; the filter is
    the DISTINCT position set (≤ M rows of BIGINT).  At 100 TB you'd pack
    the positions into ``M/64`` longs with a bitwise-OR aggregate — same
    semantics, same merges; the position-set form is what both engines
    can compute identically in SQL.  No false negatives is structural
    (``actually_present ⇒ maybe_present``); false positives are
    deterministic given the shared hash family, so even they hash-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, tokens
from ..sources.batch import load_table
from .registry import register

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

_CMS_DEPTH = 4
_CMS_WIDTH = 512


def _pos_sql(seed_expr: str, key_expr: str, mod: int) -> str:
    """DuckDB twin of ``pmod(portable_hash64(key, seed), mod)``."""
    return (
        f"CAST(('0x' || substr(md5(CAST({seed_expr} AS VARCHAR) || ':' || "
        f"{key_expr}), 1, 12)) AS BIGINT) % {mod}"
    )


def cms_cells(ex: DataFrame) -> DataFrame:
    """(token, n_exact) → one row per (depth, cell) hash assignment."""
    return ex.select(
        "token",
        "n_exact",
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        portable_hash64(F.col("token"), seed=j), F.lit(_CMS_WIDTH)
                    )
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("depth", "cell"),
    )


def cms_counters(ex: DataFrame) -> DataFrame:
    """Count-min counter grid from per-token exact counts: ≤ D·W rows of
    (depth, cell, c) BIGINTs.  This is the sketch STATE — partial-agged
    map-side here, and associatively mergeable across any partitioning of
    the corpus (cell-wise sum), which `tests/test_relational_units.py`
    pins by rebuilding the grid from two disjoint halves."""
    return cms_cells(ex).groupBy("depth", "cell").agg(
        F.sum("n_exact").cast("long").alias("c")
    )


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents
    ),
    ex AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY token
    ),
    cells AS (
        SELECT token, n_exact, d.j AS depth,
               {_pos_sql('d.j', 'token', _CMS_WIDTH)} AS cell
        FROM ex CROSS JOIN (SELECT unnest(range({_CMS_DEPTH})) AS j) d
    ),
    counters AS (
        SELECT depth, cell, CAST(SUM(n_exact) AS BIGINT) AS c
        FROM cells GROUP BY depth, cell
    ),
    est AS (
        SELECT c2.token, c2.n_exact, MIN(ct.c) AS n_cms
        FROM cells c2 JOIN counters ct USING (depth, cell)
        GROUP BY c2.token, c2.n_exact
    )
    SELECT token, n_exact, n_cms, n_cms - n_exact AS overcount
    FROM est ORDER BY n_exact DESC, token LIMIT 20
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the corpus's top-20 tokens,
    next to their exact counts — the heavy-hitters pass a 100 TB frequency
    monitor runs where an exact per-token aggregate is affordable only
    once (here it doubles as the ground truth the entry pins against).

    The sketch is built FROM the exact per-token aggregate (summing
    per-token counts into cells is identical to counting occurrences, and
    saves re-exploding the corpus ``D`` times); the counter grid is
    ``{_CMS_DEPTH}×{_CMS_WIDTH}`` BIGINTs — constant size at any corpus
    scale, partial-aggregated map-side, associatively mergeable across
    executors/streams/days.  Estimates are ``min_j C[j][h_j(tok)]`` with
    the portable hash family, so grid AND estimates are bit-identical
    cross-engine: the sketch itself is hash-checked, strictly stronger
    than a tolerance band.  ``overcount = n_cms − n_exact ≥ 0`` exposes
    the one-sided error structurally.  One explode-shuffle (the exact
    agg), then everything downstream touches ≤ distinct-token rows."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("token")
    )
    ex = toks.groupBy("token").agg(F.count("*").alias("n_exact"))
    cells = cms_cells(ex)
    counters = cms_counters(ex)
    est = (
        cells.join(F.broadcast(counters), ["depth", "cell"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").alias("n_cms"))
    )
    return (
        est.select(
            "token",
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.col("n_exact").desc(), "token")
        .limit(20)
    )


_BLOOM_BITS = 4096
_BLOOM_K = 5


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    ks AS (SELECT unnest(range({_BLOOM_K})) AS i),
    bits AS (
        SELECT DISTINCT {_pos_sql('ks.i', 'members.k', _BLOOM_BITS)} AS pos
        FROM members CROSS JOIN ks
    ),
    probes AS (SELECT DISTINCT o_custkey FROM orders),
    probe_pos AS (
        SELECT p.o_custkey, ks.i,
               {_pos_sql('ks.i', 'CAST(p.o_custkey AS VARCHAR)', _BLOOM_BITS)} AS pos
        FROM probes p CROSS JOIN ks
    ),
    hits AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k_hits
        FROM probe_pos SEMI JOIN bits USING (pos)
        GROUP BY o_custkey
    )
    SELECT p.o_custkey,
           COALESCE(h.k_hits, 0) AS k_hits,
           COALESCE(h.k_hits, 0) = {_BLOOM_K} AS maybe_present,
           EXISTS (SELECT 1 FROM members m
                   WHERE m.k = CAST(p.o_custkey AS VARCHAR)) AS actually_present
    FROM probes p LEFT JOIN hits h USING (o_custkey)
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership: build a {_BLOOM_K}-hash /
    {_BLOOM_BITS}-bit filter over the BUILDING-segment customer keys, then
    probe it with every ordering customer — the explicit form of the
    runtime Bloom join-pruning the engine already applies implicitly
    (plan-asserted in ``tests/test_plan_shapes.py``), exposed as a
    first-class mergeable artifact a pipeline can persist and ship to
    other jobs/days (the "semi-join reduction without moving the build
    side" pattern).

    The filter is the DISTINCT hash-position set (≤ {_BLOOM_BITS} BIGINT
    rows — broadcastable at ANY build-side cardinality; at 100 TB you'd
    pack it into {_BLOOM_BITS}//64 longs via bitwise-OR partials, same
    associative merge).  Probing is K map-side hashes + a broadcast
    semi-join; nothing shuffles but the tiny position set.  Both row
    classes are structural: members always probe ``maybe_present`` (no
    false negatives), and the deterministic shared hash family makes even
    the false-positive outcomes identical cross-engine — every row
    hash-checks."""
    customer = load_table(spark, sf_dir, "customer")
    members = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
        .distinct()
    )
    bloom_pos = lambda key_col: [  # noqa: E731
        F.pmod(portable_hash64(key_col, seed=i), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]
    bits = (
        members.select(F.explode(F.array(*bloom_pos(F.col("k")))).alias("pos"))
        .distinct()
    )
    probes = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    probe_pos = probes.select(
        "o_custkey",
        F.explode(
            F.array(*bloom_pos(F.col("o_custkey").cast("string")))
        ).alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("k_hits"))
    )
    actual = members.select(
        F.col("k").cast("bigint").alias("o_custkey"),
        F.lit(True).alias("actually_present"),
    )
    return (
        probes.join(hits, "o_custkey", "left")
        .join(F.broadcast(actual), "o_custkey", "left")
        .select(
            "o_custkey",
            F.coalesce(F.col("k_hits"), F.lit(0).cast("long")).alias("k_hits"),
            (
                F.coalesce(F.col("k_hits"), F.lit(0).cast("long"))
                == _BLOOM_K
            ).alias("maybe_present"),
            F.coalesce(F.col("actually_present"), F.lit(False)).alias(
                "actually_present"
            ),
        )
    )


_HLL_M = 256  # 2^8 buckets; standard error 1.04/sqrt(256) ≈ 6.5%

_HLL_REGS_SQL = """
    h AS (
        SELECT CAST(('0x' || substr(md5('0:' || CAST(l_orderkey AS VARCHAR)),
                     1, 12)) AS BIGINT) AS hv
        FROM lineitem
    ),
    r AS (
        SELECT hv % 256 AS bucket,
               CASE WHEN hv // 256 = 0 THEN CAST(41 AS BIGINT)
                    ELSE 41 - length(bin(hv // 256)) END AS rho
        FROM h
    ),
    regs AS (SELECT bucket, MAX(rho) AS register FROM r GROUP BY bucket),
    full_regs AS (
        SELECT g.b AS bucket,
               CAST(COALESCE(regs.register, 0) AS BIGINT) AS register
        FROM (SELECT unnest(range(256)) AS b) g
        LEFT JOIN regs ON g.b = regs.bucket
    )
"""


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """Portable HyperLogLog register vector over ``key_col``: 256 rows of
    (bucket, register) BIGINTs — the sketch STATE, mergeable by
    element-wise MAX across any partitioning of the corpus (unit-pinned
    next to the CMS grid's cell-wise-sum merge).

    The rank (leading-zero count + 1 of the 40-bit post-bucket hash) is
    computed as ``41 − length(bin(rest))`` — a STRING-length trick, not
    ``floor(log2)``, because log isn't bit-stable cross-engine while
    ``bin()`` renders the identical minimal binary string in both (and
    MAX over integers is order-free).  Empty buckets materialize as
    register 0 via a 256-row grid join."""
    h = portable_hash64(F.col(key_col).cast("string"))
    rows = (
        df.select(h.alias("__h"))
        .select(
            F.pmod(F.col("__h"), F.lit(_HLL_M)).alias("bucket"),
            F.expr("shiftright(__h, 8)").alias("__rest"),
        )
        .select(
            "bucket",
            F.when(F.col("__rest") == 0, F.lit(41).cast("long"))
            .otherwise((F.lit(41) - F.length(F.expr("bin(__rest)"))).cast("long"))
            .alias("__rho"),
        )
    )
    regs = rows.groupBy("bucket").agg(F.max("__rho").alias("register"))
    grid = df.sparkSession.range(_HLL_M).select(F.col("id").alias("bucket"))
    return grid.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("register", F.lit(0).cast("long")).alias("register")
    )


@register(
    "sketch_hll_registers",
    oracle=f"""
    WITH {_HLL_REGS_SQL}
    SELECT bucket, register FROM full_regs
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register vector for ``lineitem.l_orderkey`` NDV — the third
    portable sketch next to CMS and Bloom, and the one ANALYZE actually
    ships at 100 TB (1 register byte per bucket per column, merged
    across files/partitions/days by element-wise MAX).  The banded
    `agg_approx_distinct*` entries pin Spark's ENGINE HLL within ±5%;
    this entry pins a definition-rebuilt HLL's exact state: both engines
    compute identical registers, so the sketch contents hash-check.
    One map-side hash + a 256-key MAX aggregate — nothing else moves."""
    return hll_registers(load_table(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "sketch_hll_estimate",
    oracle=f"""
    WITH {_HLL_REGS_SQL},
    s AS (
        SELECT SUM(1.0e0 / CAST((CAST(1 AS BIGINT) << register) AS DOUBLE))
                   AS ssum
        FROM full_regs
    ),
    n AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
        FROM lineitem
    )
    SELECT n.n_exact,
           ((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)) * 65536.0e0) / s.ssum
               AS hll_est,
           ABS(((0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)) * 65536.0e0) / s.ssum
               / CAST(n.n_exact AS DOUBLE) - 1.0e0) <= 0.15e0 AS rel_ok
    FROM n CROSS JOIN s
    """,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL raw estimate ``α·m²/Σ2^−M[j]`` from the portable registers,
    next to the exact NDV and a ±15% quality gate (raw-estimate regime:
    raw ≫ 5m/2 at every fixture scale, so the small-range linear-counting
    correction — which needs `ln`, the one non-portable op — never
    applies and is deliberately omitted).

    The ESTIMATE double is itself hash-exact, which is only possible
    because every term is dyadic: ``2^−register`` is an exact power of
    two, the 256-term sum spans < 53 bits of exponent so every partial
    sum is exact (order-free — safe across any Spark partitioning), and
    the final multiply/divide are correctly rounded with the same tree
    in both engines.  The exact-NDV side runs as its own single-row
    aggregate cross-joined 1×1 (never mixed into another projection —
    the round-5 Expand rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_orderkey")
    s = regs.agg(
        F.sum(
            F.lit(1.0)
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), register) AS DOUBLE)")
        ).alias("ssum")
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    est = (
        (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0)))
        * F.lit(65536.0)
    ) / F.col("ssum")
    return n.crossJoin(F.broadcast(s)).select(
        "n_exact",
        est.alias("hll_est"),
        (
            F.abs(est / F.col("n_exact").cast("double") - F.lit(1.0))
            <= F.lit(0.15)
        ).alias("rel_ok"),
    )


def bloom_packed_words(keys: DataFrame, key_col: str = "k") -> DataFrame:
    """The 100 TB form of the Bloom build: pack the {_BLOOM_BITS}-bit
    filter into {_BLOOM_BITS}//64 BIGINT words with a `bit_or` aggregate —
    one row per non-empty word of (word_idx, word).  This is the shape a
    production build ships (constant {_BLOOM_BITS}//8 bytes however large
    the build side), with map-side `bit_or` partials and associative
    merge; the position-set form the REGISTRY entry uses is semantically
    identical (unit-pinned) but SQL-portable for the oracle gate.
    Probe: ``word[pos >> 6] & (1 << (pos & 63)) != 0`` for all K
    positions."""
    pos = [
        F.pmod(portable_hash64(F.col(key_col), seed=i), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]
    return (
        keys.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            F.expr("shiftright(pos, 6)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
