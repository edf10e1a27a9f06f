"""End-to-end corpus-curation pipeline as ONE checked contract query —
the composition the LLM-data operators exist for: quality gate → exact
dedup (keep the canonical copy) → near-dup removal (drop the later of
each verified Jaccard pair).  Each stage reuses the already-verified
operator, and the oracle reproduces the full three-stage flow in SQL, so
the COMPOSITION is hash-checked, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import pin
from ..functions.text import quality_score
from ..operators.dedup import exact_dedup_groups, ngram_jaccard_pairs
from ..sources.batch import load_table
from .registry import register

_QUALITY_THRESHOLD = 0.86
_JACCARD_THRESHOLD = 0.5

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

_QUALITY_SQL = f"""
    ROUND(0.25 * (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 10000 THEN 1.0 ELSE 0.5 END)
        + 0.25 * (CASE WHEN LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) >= 3
                        AND LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) <= 12
                   THEN 1.0 ELSE 0.5 END)
        + 0.25 * (1 - CAST(LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                      / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0))
        + 0.25 * len(list_distinct({_TOKS})) * 1.0 / GREATEST(len({_TOKS}), 1), 6)
"""


@register(
    "curation_clean_corpus",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, lang, n_chars, text FROM documents
        WHERE {_QUALITY_SQL} >= {_QUALITY_THRESHOLD}
    ),
    fp AS (SELECT doc_id, md5({_NORM}) AS f FROM q),
    keep1 AS (
        SELECT fp.doc_id FROM fp
        JOIN (SELECT f, MIN(doc_id) AS m FROM fp GROUP BY f) g
          ON fp.f = g.f AND fp.doc_id = g.m
    ),
    surv AS (SELECT q.* FROM q JOIN keep1 USING (doc_id)),
    words AS (SELECT doc_id, {_TOKS} AS w FROM surv),
    idx AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 2, 1) + 1)) AS i FROM words
    ),
    sh AS (
        SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle FROM idx
    ),
    shh AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('0:' || shingle), 1, 12)) AS BIGINT) AS hsh
        FROM sh
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM shh a JOIN shh b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    near_dropped AS (
        SELECT DISTINCT id_b AS doc_id FROM shared
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 6) >= {_JACCARD_THRESHOLD}
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM surv
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
    """,
)
def curation_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation flow on ``documents``: (1) quality gate at the
    corpus-median threshold, (2) exact dedup keeping each group's
    canonical (min-id) copy, (3) near-dup removal dropping the higher id
    of every exact-Jaccard ≥ 0.5 pair among the survivors (hot-shingle
    guard on).  Returns the clean corpus roster.  All three stages are
    the registered operators, composed; the oracle runs the same three
    stages in SQL, so stage ordering and interactions are value-checked
    end to end.  (The fixture corpus has no exact duplicates, so stage 2
    is additionally pinned on a planted-duplicate corpus in
    tests/test_core_queries.py.)"""
    return clean_corpus(load_table(spark, sf_dir, "documents"))


def clean_corpus(docs: DataFrame) -> DataFrame:
    """The three-stage flow on any (doc_id, lang, n_chars, text) frame —
    separated from the registry entry so synthetic corpora can exercise
    every stage (incl. exact-dup groups absent from the fixtures)."""
    # persist: the quality-gated set feeds the fingerprint groupBy, the
    # canonical join, and the survivor join — without pinning it the
    # regex-heavy quality expression re-runs per consumer (27 scans of
    # the parquet observed in the unpinned plan)
    # (r16 A/B note: an eager localCheckpoint here measured a WASH
    # isolated-warm — 3.88 vs 4.02 s median at sf0.1 — the lazy pin's
    # cache fills on the first consumer and the regex filter does not
    # re-execute; kept declarative per the r4 measure-first rule.)
    passing = pin(docs.filter(quality_score("text") >= _QUALITY_THRESHOLD))
    groups = exact_dedup_groups(passing)
    canonical_ids = groups.filter(F.col("doc_id") == F.col("canonical_id")).select(
        "doc_id"
    )
    survivors = pin(passing.join(canonical_ids, "doc_id"))
    near_dropped = (
        ngram_jaccard_pairs(
            survivors, jaccard_threshold=_JACCARD_THRESHOLD, df_cap=64
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return survivors.join(near_dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )

@register(
    "split_train_holdout",
    oracle="""
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 12))
                     AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'holdout' END AS split
    FROM documents
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/holdout assignment by portable key hash —
    the reproducible split every training-data pipeline needs: stable
    across runs, engines, and partitionings (hash of the KEY, never
    rand()/sample(), which reshuffle membership on every execution and
    leak holdout docs into training).  Hash-checked: DuckDB reproduces
    the identical 48-bit md5-prefix hash, so both engines assign every
    document to the same side."""
    from ..functions.text import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(portable_hash64(F.col("doc_id").cast("string")), F.lit(100))
    return docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("holdout").alias("split"),
    )


# ---------------------------------------------------------------------------
# Winsorization (outlier capping at discrete per-group quantile cuts)
# ---------------------------------------------------------------------------

_WINSOR_LO_PCT = 5  # cap below the p05 / above the p95 order statistic


@register(
    "curation_winsorize_quantiles",
    oracle=f"""
    WITH c AS (
        SELECT l_returnflag AS rf, l_quantity AS q,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT rf, q, cnt,
               SUM(cnt) OVER (PARTITION BY rf ORDER BY q
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS running,
               SUM(cnt) OVER (PARTITION BY rf) AS total
        FROM c
    ),
    cuts AS (
        SELECT rf,
               MIN(CASE WHEN running >= ({_WINSOR_LO_PCT} * total + 99) // 100
                        THEN q END) AS lo_cut,
               MIN(CASE WHEN running >= ((100 - {_WINSOR_LO_PCT}) * total + 99) // 100
                        THEN q END) AS hi_cut,
               CAST(MAX(total) AS BIGINT) AS n_rows
        FROM cum GROUP BY rf
    )
    SELECT l.l_returnflag, cuts.lo_cut, cuts.hi_cut, cuts.n_rows,
           CAST(COUNT(*) FILTER (WHERE l.l_quantity < cuts.lo_cut) AS BIGINT)
               AS n_clipped_lo,
           CAST(COUNT(*) FILTER (WHERE l.l_quantity > cuts.hi_cut) AS BIGINT)
               AS n_clipped_hi,
           CAST(SUM(CAST(CASE WHEN l.l_quantity < cuts.lo_cut THEN cuts.lo_cut
                              WHEN l.l_quantity > cuts.hi_cut THEN cuts.hi_cut
                              ELSE l.l_quantity END AS BIGINT)) AS BIGINT)
               AS winsorized_sum
    FROM lineitem l JOIN cuts ON l.l_returnflag = cuts.rf
    GROUP BY 1, 2, 3, 4
    """,
)
def curation_winsorize_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — cap per-group outliers at the discrete p05/p95
    order statistics (a standard robust-statistics cleaning pass for
    numeric feature columns before training).  The cut is the SMALLEST
    value whose running count reaches ``ceil(p·n)`` — a rank selection
    over the per-(group, value) count table, NOT an interpolated
    percentile, so no float arithmetic enters the comparison path and
    both engines agree bit-for-bit (the `ln`-rule applied to quantiles).

    Scale shape: the count table collapses the corpus to (group,
    distinct-value) rows BEFORE any window — for bounded-domain columns
    (quantity: 50 values/group) the cumulative window runs over dozens
    of rows regardless of corpus size, and the cuts re-join as a
    broadcast.  For unbounded-domain doubles, bucket the value first
    (fixed-point grid) or use the KLL twin (`agg_approx_percentile_error`)
    — interpolated exact percentiles never feed a filter (CLAUDE.md
    round-rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_quantity").alias("q")
    ).agg(F.count("*").alias("cnt"))
    w_run = (
        Window.partitionBy("rf")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("rf")
    cum = c.select(
        "rf",
        "q",
        F.sum("cnt").over(w_run).alias("running"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    lo_rank = F.expr(f"({_WINSOR_LO_PCT} * total + 99) div 100")
    hi_rank = F.expr(f"({100 - _WINSOR_LO_PCT} * total + 99) div 100")
    cuts = cum.groupBy("rf").agg(
        F.min(F.when(F.col("running") >= lo_rank, F.col("q"))).alias("lo_cut"),
        F.min(F.when(F.col("running") >= hi_rank, F.col("q"))).alias("hi_cut"),
        F.max("total").alias("n_rows"),
    )
    j = li.join(
        F.broadcast(cuts), li.l_returnflag == cuts.rf
    )
    clipped = (
        F.when(F.col("l_quantity") < F.col("lo_cut"), F.col("lo_cut"))
        .when(F.col("l_quantity") > F.col("hi_cut"), F.col("hi_cut"))
        .otherwise(F.col("l_quantity"))
        .cast("long")
    )
    return j.groupBy("l_returnflag", "lo_cut", "hi_cut", "n_rows").agg(
        F.count_if(F.col("l_quantity") < F.col("lo_cut"))
        .cast("long")
        .alias("n_clipped_lo"),
        F.count_if(F.col("l_quantity") > F.col("hi_cut"))
        .cast("long")
        .alias("n_clipped_hi"),
        F.sum(clipped).alias("winsorized_sum"),
    )


@register(
    "curation_domain_caps",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://site' || CAST(doc_id % 37 AS VARCHAR)
                   || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    d AS (
        SELECT doc_id,
               regexp_extract(url, 'https://([^/]+)/', 1) AS domain
        FROM u
    ),
    r AS (
        SELECT doc_id, domain,
               ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY CAST(('0x' || substr(md5('0:' || 'dom:'
                       || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT),
                       doc_id
               ) AS rnk
        FROM d
    )
    SELECT doc_id, domain, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 8
    """,
)
def curation_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps (the CommonCrawl curation rule that stops
    one template-heavy site from dominating a language's mixture): URLs
    are planted deterministically (the fixtures carry none), the domain is
    recovered by the SAME regex in both engines, and each domain keeps its
    first 8 docs in portable-hash order — an unbiased per-domain sample
    whose manifest is hash-exact.  At 100 TB: domain extraction is
    map-side; the rank is one window per domain key (millions of domains
    → natural parallelism; a pathological single-domain corpus routes
    through the two-level cumsum like packing).  Non-vacuous at every sf
    (37 planted domains, every one over its cap at sf0.01+)."""
    from ..functions.text import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    d = u.select(
        "doc_id", F.regexp_extract("url", "https://([^/]+)/", 1).alias("domain")
    )
    w = Window.partitionBy("domain").orderBy(
        portable_hash64(F.concat(F.lit("dom:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 8)
        .select("doc_id", "domain", "rnk")
    )


@register(
    "curation_url_canonicalize",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               source || '.example.com/a/' || CAST(doc_id // 40 AS VARCHAR)
                      || '?id=' || CAST(doc_id % 20 AS VARCHAR) AS canonical_url,
               CASE WHEN doc_id % 8 < 4 THEN 1 ELSE 0 END AS has_utm
        FROM documents
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS rep_doc_id,
           CAST(SUM(has_utm) AS BIGINT) AS n_utm_stripped
    FROM u GROUP BY canonical_url
    """,
)
def curation_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the FIRST dedup key of every web-crawl
    pipeline (before any content hash): case-fold the host, strip the
    ``www.`` prefix, drop tracking params and fragments, keep semantic
    params.  The planted raw URLs carry every variance class (mixed-case
    host, WWW./www., ``utm_source`` on the ``doc_id % 8 < 4`` lane, a
    fragment on odd ids) and are built so each canonical group pairs ids
    40 apart — one member WITH tracking params and one without, so the
    group count is wrong unless stripping actually works.  Spark runs the
    real parse (``parse_url`` HOST/PATH + the 3-arg QUERY-param form,
    which also discards the fragment) while the oracle rebuilds the
    canonical from the planted FORMULA — the binary-codec oracle style:
    parser + normalizer must land on planted truth.  At 100 TB this is
    pure map-side expression work feeding one hash aggregate on the
    canonical key; raw URLs never need to leave the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM/a/"),
        F.floor(F.col("doc_id") / 40).cast("long").cast("string"),
        F.when(F.col("doc_id") % 8 < 4, F.lit("?utm_source=feed&id=")).otherwise(
            F.lit("?id=")
        ),
        (F.col("doc_id") % 20).cast("string"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("#frag")).otherwise(F.lit("")),
    )
    parsed = docs.select(
        "doc_id",
        raw.alias("raw_url"),
        (F.col("doc_id") % 8 < 4).cast("int").alias("has_utm"),
    ).select(
        "doc_id",
        "has_utm",
        F.concat(
            F.regexp_replace(
                F.lower(F.parse_url(F.col("raw_url"), F.lit("HOST"))),
                r"^www\.",
                "",
            ),
            F.parse_url(F.col("raw_url"), F.lit("PATH")),
            F.lit("?id="),
            F.parse_url(F.col("raw_url"), F.lit("QUERY"), F.lit("id")),
        ).alias("canonical_url"),
    )
    return parsed.groupBy("canonical_url").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("rep_doc_id"),
        F.sum("has_utm").alias("n_utm_stripped"),
    )


# ---- DSIR-style importance selection ---------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): score raw
# documents by how target-domain-like their hashed n-gram features are —
# the log-ratio of target vs raw feature probabilities summed over the
# doc's tokens — and keep the top slice.  The log is the INTEGER log2
# ``length(bin(x))`` (identical minimal binary strings in both engines —
# the r5 dyadic rule), applied to SQUARED counts for half-bit granularity;
# everything is integer arithmetic, so scores and the selection threshold
# are hash-exact cross-engine where float log-sums never could be.
_DSIR_TARGET_RESIDUE = 5
_DSIR_TMOD_MIN = 10
_DSIR_DOCS_PER_TARGET = 50
_DSIR_BUCKETS = 256
_PHASH_SQL = "CAST(('0x' || substr(md5('0:' || tok), 1, 12)) AS BIGINT)"


@register(
    "curation_dsir_importance_select",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
    dial AS (
        SELECT GREATEST({_DSIR_TMOD_MIN}, c // {_DSIR_DOCS_PER_TARGET}) AS tmod
        FROM n
    ),
    toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    feat AS (SELECT doc_id, {_PHASH_SQL} % {_DSIR_BUCKETS} AS b FROM toks),
    cnt AS (
        SELECT b,
               CAST(SUM(CASE WHEN doc_id % tmod = {_DSIR_TARGET_RESIDUE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS tc,
               CAST(SUM(CASE WHEN doc_id % tmod <> {_DSIR_TARGET_RESIDUE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS rc
        FROM feat, dial GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(tc) AS BIGINT) AS tt, CAST(SUM(rc) AS BIGINT) AS tr
        FROM cnt
    ),
    scored AS (
        SELECT f.doc_id,
               CAST(SUM(
                   length(bin((c.tc+1)*(c.tc+1))) - length(bin((c.rc+1)*(c.rc+1)))
                 + length(bin((tr+1)*(tr+1))) - length(bin((tt+1)*(tt+1)))
               ) AS BIGINT) AS dsir_score
        FROM feat f JOIN cnt c USING (b) CROSS JOIN tot CROSS JOIN dial
        WHERE f.doc_id % tmod <> {_DSIR_TARGET_RESIDUE}
        GROUP BY f.doc_id
    ),
    hist AS (
        SELECT dsir_score AS s, COUNT(*) AS hc FROM scored GROUP BY dsir_score
    ),
    run AS (
        SELECT s, SUM(hc) OVER (ORDER BY s) AS rc2, SUM(hc) OVER () AS nd
        FROM hist
    ),
    thr AS (SELECT MIN(s) AS t FROM run WHERE rc2 >= (9*nd+9)//10)
    SELECT doc_id, dsir_score, dsir_score >= t AS selected
    FROM scored, thr
    """,
)
def curation_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: hashed-unigram importance weights of
    every raw document against a bounded target-domain sample, with the
    top-decile selection verdict.  The target slice is corpus-derived but
    BOUNDED (doc_id % tmod == 5 with tmod = GREATEST(10, n//50) — <= ~50
    docs at any corpus size, the qmod-dial pattern); the per-doc score is
    Σ_tokens [ilog2((tc+1)²) − ilog2((rc+1)²)] + n_tokens·[ilog2((tr+1)²)
    − ilog2((tt+1)²)] — the integer half-bit form of DSIR's
    Σ log p̂_tgt(b)/p̂_raw(b) — and `selected` applies the discrete-rank
    top-10% threshold (smallest score with running doc count ≥
    ceil(0.9·N): integer arithmetic, scale-stable where a score>0 cut is
    not — measured flipping 100%→0.1% across fixtures).

    Scale shape: the feature-count table is {_DSIR_BUCKETS} rows →
    broadcast; scoring is map-side against it plus two 1-row dials; the
    shuffles are the per-doc aggregate and the ~|score range| row
    histogram (bounded by tokens/doc × half-bits, not corpus size — the
    threshold windows run over that bounded frame).  Magnitude bound:
    squared counts overflow past ~2^31 tokens per bucket (~5·10^11
    tokens per shard at 256 buckets) — shard the count table and sum
    per-shard scores past that, the TV-distance sharding rule."""
    from ..functions.text import portable_hash64, tokens

    docs = load_table(spark, sf_dir, "documents")
    dial = docs.agg(
        F.greatest(
            F.lit(_DSIR_TMOD_MIN).cast("long"),
            F.floor(F.count("*") / _DSIR_DOCS_PER_TARGET).cast("long"),
        ).alias("__tmod")
    )
    # eager checkpoints (r15): the hashed-token frame fed the count
    # table's broadcast build, the totals' broadcast build, and the
    # scoring aggregate — three separate jobs each re-executing the
    # token explode (the r7 broadcast-builds-race-the-cache rule).
    # Checkpointing the (doc_id, bucket) longs runs the explode ONCE;
    # cnt/scored checkpoints keep the two downstream broadcast builds
    # (tot, thr) from re-running their lineage.  1.41 -> 1.29 s
    # isolated-warm at sf0.1; values unchanged (hash-green).
    feat = (
        docs.crossJoin(F.broadcast(dial))
        .select("doc_id", "__tmod", F.explode(tokens("text")).alias("tok"))
        .select(
            "doc_id",
            "__tmod",
            (portable_hash64(F.col("tok")) % _DSIR_BUCKETS).alias("b"),
        )
        .localCheckpoint(eager=True)
    )
    is_tgt = F.col("doc_id") % F.col("__tmod") == _DSIR_TARGET_RESIDUE
    cnt = feat.groupBy("b").agg(
        F.sum(F.when(is_tgt, 1).otherwise(0)).cast("long").alias("tc"),
        F.sum(F.when(is_tgt, 0).otherwise(1)).cast("long").alias("rc"),
    ).localCheckpoint(eager=True)
    tot = cnt.agg(
        F.sum("tc").cast("long").alias("tt"), F.sum("rc").cast("long").alias("tr")
    )

    def ilog2sq(x):  # length(bin(x²)) — floor(2·log2 x)+1, half-bit log
        return F.length(F.bin(x * x))

    term = (
        ilog2sq(F.col("tc") + 1)
        - ilog2sq(F.col("rc") + 1)
        + ilog2sq(F.col("tr") + 1)
        - ilog2sq(F.col("tt") + 1)
    ).cast("long")
    scored = (
        feat.filter(~is_tgt)
        .join(F.broadcast(cnt), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.sum(term).cast("long").alias("dsir_score"))
        .localCheckpoint(eager=True)
    )
    hist = scored.groupBy(F.col("dsir_score").alias("s")).agg(
        F.count("*").alias("hc")
    )
    w_run = Window.orderBy("s")
    w_all = Window.partitionBy()
    run = hist.select(
        "s",
        F.sum("hc").over(w_run).alias("rc2"),
        F.sum("hc").over(w_all).alias("nd"),
    )
    thr = run.filter(
        F.col("rc2") >= F.expr("(9 * nd + 9) div 10")
    ).agg(F.min("s").alias("t"))
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "dsir_score",
        (F.col("dsir_score") >= F.col("t")).alias("selected"),
    )


# ---- k-anonymity generalization ladder --------------------------------------
# Privacy-preserving release prep for a training/analytics extract: rows
# are published at the FINEST quasi-identifier granularity whose group
# still holds >= K indistinguishable rows, climbing a generalization
# ladder (full QI -> drop the balance band -> nation only -> fully
# suppressed) — local recoding, the Mondrian-style semantics.  The ladder
# is what keeps the entry non-degenerate at every corpus size: a single
# fixed granularity measured all-suppressed at sf0.001 and
# barely-suppressed at sf0.1, while the ladder grants levels 1-3 / 0-1 /
# 0-1 across the fixtures.
_KANON_K = 5
_KANON_BAND = 1000


@register(
    "curation_k_anonymity_ladder",
    oracle=f"""
    WITH g AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band
        FROM customer
    ),
    s0 AS (
        SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS n0
        FROM g GROUP BY c_nationkey, c_mktsegment, bal_band
    ),
    s1 AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n1
        FROM g GROUP BY c_nationkey, c_mktsegment
    ),
    s2 AS (
        SELECT c_nationkey, COUNT(*) AS n2 FROM g GROUP BY c_nationkey
    )
    SELECT g.c_custkey,
           CAST(CASE WHEN n0 >= {_KANON_K} THEN 0
                     WHEN n1 >= {_KANON_K} THEN 1
                     WHEN n2 >= {_KANON_K} THEN 2
                     ELSE 3 END AS BIGINT) AS level,
           CASE WHEN n2 >= {_KANON_K} THEN g.c_nationkey END AS anon_nation,
           CASE WHEN n1 >= {_KANON_K} THEN g.c_mktsegment END AS anon_segment,
           CASE WHEN n0 >= {_KANON_K} THEN g.bal_band END AS anon_bal_band,
           CAST(CASE WHEN n0 >= {_KANON_K} THEN n0
                     WHEN n1 >= {_KANON_K} THEN n1
                     WHEN n2 >= {_KANON_K} THEN n2 END AS BIGINT) AS group_n
    FROM g JOIN s0 USING (c_nationkey, c_mktsegment, bal_band)
           JOIN s1 USING (c_nationkey, c_mktsegment)
           JOIN s2 USING (c_nationkey)
    """,
)
def curation_k_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymous release of the customer quasi-identifiers
    (nation, market segment, account-balance band): each row published at
    the finest ladder level whose group still holds >= 5 rows, with the
    granted group size; rows no level can protect are fully suppressed
    (all QI columns NULL).  The guarantee is POPULATION k-anonymity:
    every published row's non-NULL QI values match >= K individuals in
    the dataset (group_n states that count), i.e. each row is
    QI-indistinguishable from >= K-1 others — the release multiset
    itself can show a generalized combination fewer times because finer
    siblings published at a lower ladder level absorb part of the group
    (local recoding's standard trade; strict release-level uniformity
    needs global recoding, which over-generalizes everyone to the
    worst group's level).

    Scale shape: the three group-size tables are bounded by the QI
    DOMAIN (<= ~1.4k / 125 / 25 rows at any corpus size) -> all three
    broadcast; the grant pass is map-side; no corpus-sized shuffle beyond
    the three partial-combine aggregations."""
    g = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
    )
    s0 = g.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n0")
    )
    s1 = g.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n1"))
    s2 = g.groupBy("c_nationkey").agg(F.count("*").alias("n2"))
    k = _KANON_K
    j = (
        g.join(F.broadcast(s0), ["c_nationkey", "c_mktsegment", "bal_band"])
        .join(F.broadcast(s1), ["c_nationkey", "c_mktsegment"])
        .join(F.broadcast(s2), ["c_nationkey"])
    )
    return j.select(
        "c_custkey",
        F.when(F.col("n0") >= k, 0)
        .when(F.col("n1") >= k, 1)
        .when(F.col("n2") >= k, 2)
        .otherwise(3)
        .cast("long")
        .alias("level"),
        F.when(F.col("n2") >= k, F.col("c_nationkey")).alias("anon_nation"),
        F.when(F.col("n1") >= k, F.col("c_mktsegment")).alias("anon_segment"),
        F.when(F.col("n0") >= k, F.col("bal_band")).alias("anon_bal_band"),
        F.when(F.col("n0") >= k, F.col("n0"))
        .when(F.col("n1") >= k, F.col("n1"))
        .when(F.col("n2") >= k, F.col("n2"))
        .cast("long")
        .alias("group_n"),
    )


# ---- differential-privacy release mechanics ----------------------------------
# The second privacy-tier entry: user-level contribution bounding + noise
# addition — the two mechanical steps of a DP count release, and the parts
# that are genuinely DISTRIBUTED work at 100 TB (clamping is a per-user
# aggregate over the whole corpus; the noise is O(groups)).  The noise is
# a difference of two geometric(1/2) draws (= discrete Laplace with
# p = 1/2), generated from the portable hash's leading-zero count — the
# recorded-seed replayability real DP deployments use for audit, which is
# also exactly what lets the release value-hash cross-engine.  The clamp C
# is the discrete-rank p50 of per-(user, type) contributions (deriving the
# bound from a quantile is standard contribution-bounding practice; a
# production release would spend privacy budget on that quantile too).
# This entry demonstrates and checks the MECHANISM; it does not claim a
# calibrated (ε, δ) for the fixture release.


@register(
    "dp_bounded_contribution_counts",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ),
    hist AS (SELECT cnt, COUNT(*) AS hc FROM per_user GROUP BY cnt),
    run AS (
        SELECT cnt, SUM(hc) OVER (ORDER BY cnt) AS rc, SUM(hc) OVER () AS n
        FROM hist
    ),
    cdial AS (SELECT MIN(cnt) AS c FROM run WHERE rc >= (n + 1) // 2),
    agg AS (
        SELECT event_type,
               CAST(SUM(LEAST(cnt, c)) AS BIGINT) AS bounded,
               CAST(SUM(CASE WHEN cnt > c THEN 1 ELSE 0 END) AS BIGINT)
                   AS clamped_users,
               CAST(MAX(c) AS BIGINT) AS sensitivity_c
        FROM per_user CROSS JOIN cdial GROUP BY event_type
    )
    SELECT event_type,
           bounded
             + (48 - length(bin(CAST(('0x' || substr(md5('0:dpa:' || event_type), 1, 12)) AS BIGINT))))
             - (48 - length(bin(CAST(('0x' || substr(md5('0:dpb:' || event_type), 1, 12)) AS BIGINT))))
               AS dp_count,
           clamped_users, sensitivity_c
    FROM agg
    """,
)
def dp_bounded_contribution_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-release mechanics for per-type event counts: every user's
    contribution clamped at the derived sensitivity bound C (p50 of
    per-(user, type) contributions by discrete rank — clamps ~1/3 of
    pairs on the fixtures while keeping ~88% of the mass), then
    seed-replayable discrete-Laplace noise (difference of two
    geometric(1/2) leading-zero draws from the portable hash) added per
    group.  `clamped_users` is the auditing metric a real release would
    keep internal.

    Scale shape: the clamp is one per-(user, type) aggregate (map-side
    partial combine), the C dial's rank window runs over the contribution
    HISTOGRAM (bounded by the max per-user activity, not the corpus), and
    the noise is O(groups) map-side arithmetic.  Everything is integer →
    the whole release value-hashes."""
    from ..functions.text import portable_hash64

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    hist = per_user.groupBy("cnt").agg(F.count("*").alias("hc"))
    w_run = Window.orderBy("cnt")
    w_all = Window.partitionBy()
    run = hist.select(
        "cnt",
        F.sum("hc").over(w_run).alias("rc"),
        F.sum("hc").over(w_all).alias("n"),
    )
    cdial = run.filter(F.col("rc") >= F.expr("(n + 1) div 2")).agg(
        F.min("cnt").alias("c")
    )
    agg = (
        per_user.crossJoin(F.broadcast(cdial))
        .groupBy("event_type")
        .agg(
            F.sum(F.least(F.col("cnt"), F.col("c"))).cast("long").alias("bounded"),
            F.sum((F.col("cnt") > F.col("c")).cast("long"))
            .cast("long")
            .alias("clamped_users"),
            F.max("c").cast("long").alias("sensitivity_c"),
        )
    )

    def lz(seed: str):  # leading zeros of the 48-bit hash: geometric(1/2)
        return F.lit(48) - F.length(
            F.bin(portable_hash64(F.concat(F.lit(seed), F.col("event_type"))))
        )

    return agg.select(
        "event_type",
        (F.col("bounded") + lz("dpa:") - lz("dpb:")).cast("long").alias("dp_count"),
        "clamped_users",
        "sensitivity_c",
    )


# the clamped-SUM half of the standard DP aggregate pair (VERDICT r14
# next #8).  Differences from the counts sibling that make it the SUM
# mechanism and not a copy: (1) per-user contributions are VALUES
# (integer cents of order spend), so their histogram is near-unique per
# user — the clamp dial therefore ranks over the DYADIC GRID of
# contributions (cents div 4096; grid cardinality bounded by the value
# RANGE, never the user count — the r12 quantile-clip-dial form) instead
# of the raw-count histogram; (2) the discrete-Laplace noise is scaled
# by a sensitivity-derived unit GREATEST(1, C div 64) — a SUM release's
# noise must be proportional to the contribution bound, where a COUNT
# release's unit is 1.  Same seed-replayable geometric(1/2) difference
# from the portable hash, same honest scoping: mechanism demonstrated
# and hash-checked, no calibrated (ε, δ) claimed for the fixture.
_DP_SUM_NOISE_A = (
    "(48 - length(bin(CAST(('0x' || substr(md5('0:dpsa:' || o_orderpriority),"
    " 1, 12)) AS BIGINT))))"
)
_DP_SUM_NOISE_B = (
    "(48 - length(bin(CAST(('0x' || substr(md5('0:dpsb:' || o_orderpriority),"
    " 1, 12)) AS BIGINT))))"
)


@register(
    "dp_clamped_sum_release",
    oracle=f"""
    WITH per_user AS (
        SELECT o_custkey, o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey, o_orderpriority
    ),
    hist AS (SELECT cents // 4096 AS g, COUNT(*) AS hc
             FROM per_user GROUP BY 1),
    run AS (SELECT g, SUM(hc) OVER (ORDER BY g) AS rc,
                   SUM(hc) OVER () AS n
            FROM hist),
    cdial AS (SELECT (MIN(g) + 1) * 4096 - 1 AS c
              FROM run WHERE rc >= (900 * n + 999) // 1000),
    agg AS (
        SELECT o_orderpriority,
               CAST(SUM(LEAST(cents, c)) AS BIGINT) AS bounded,
               CAST(SUM(CASE WHEN cents > c THEN 1 ELSE 0 END) AS BIGINT)
                   AS clamped_users,
               CAST(MAX(c) AS BIGINT) AS sensitivity_c
        FROM per_user CROSS JOIN cdial GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           bounded + ({_DP_SUM_NOISE_A} - {_DP_SUM_NOISE_B})
                     * GREATEST(1, sensitivity_c // 64) AS dp_sum,
           clamped_users, sensitivity_c
    FROM agg
    """,
)
def dp_clamped_sum_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-release mechanics for per-priority revenue: each customer's
    spend contribution (integer cents — FLOOR(x·100 + 0.5), the
    cents-valued-money rule) is clamped at the derived sensitivity
    bound C, then sensitivity-scaled seed-replayable discrete-Laplace
    noise is added per group.  C is the dyadic-grid ceiling of the p90
    per-(customer, priority) contribution: the grid (cents div 4096,
    ~$40.96 cells) keeps the rank histogram bounded by the VALUE RANGE
    rather than the user count — per-user sums are near-unique, so a
    raw-value histogram would be corpus-sized (the counts sibling's
    raw histogram works only because counts collide).  The discrete-
    rank dial clamps ~10% of (customer, priority) pairs on the fixtures
    (measured 5–21 at sf0.001, ~130 at sf0.01, ~1300 at sf0.1 — never
    100%, the r14 fixed-clamp lesson), keeping both the utility and the
    audit column informative.

    Scale shape: one per-(user, group) aggregate with map-side combine,
    a grid histogram bounded by value range, a 1-row broadcast dial, and
    O(groups) noise arithmetic.  Overflow budget (r6 rule): bounded ≤
    C·users_per_group ≈ 1.1e9 · 1.5e3 ≈ 1.7e12 at sf0.1 — ~5e6×
    headroom under 2^63; shard the sum past ~10^9 users per group.
    Everything is integer, so the whole release — clamp, dial, noise —
    value-hashes cross-engine."""
    from ..functions.text import portable_hash64

    per_user = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    hist = per_user.groupBy(F.expr("cents div 4096").alias("g")).agg(
        F.count("*").alias("hc")
    )
    w_run = Window.orderBy("g")
    w_all = Window.partitionBy()
    run = hist.select(
        "g",
        F.sum("hc").over(w_run).alias("rc"),
        F.sum("hc").over(w_all).alias("n"),
    )
    cdial = run.filter(F.col("rc") >= F.expr("(900 * n + 999) div 1000")).agg(
        ((F.min("g") + 1) * 4096 - 1).alias("c")
    )
    agg = (
        per_user.crossJoin(F.broadcast(cdial))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.least(F.col("cents"), F.col("c"))).cast("long").alias("bounded"),
            F.sum((F.col("cents") > F.col("c")).cast("long"))
            .cast("long")
            .alias("clamped_users"),
            F.max("c").cast("long").alias("sensitivity_c"),
        )
    )

    def lz(seed: str):  # leading zeros of the 48-bit hash: geometric(1/2)
        return F.lit(48) - F.length(
            F.bin(portable_hash64(F.concat(F.lit(seed), F.col("o_orderpriority"))))
        )

    return agg.select(
        "o_orderpriority",
        (
            F.col("bounded")
            + (lz("dpsa:") - lz("dpsb:"))
            * F.greatest(F.lit(1).cast("long"), F.expr("sensitivity_c div 64"))
        )
        .cast("long")
        .alias("dp_sum"),
        "clamped_users",
        "sensitivity_c",
    )
