"""Training-data pipeline operators beyond dedup/similarity: benchmark
decontamination, GPT-style sequence packing, TF-IDF term ranking, weighted
source mixing, deterministic training-order shuffling, and SemDeDup-style
semantic dedup within embedding-cluster cells.

These are the remaining first-class stages of an LLM corpus pipeline
(curate → decontaminate → mix → pack → shuffle); the reference has none of
them (its whole compute surface is the 149-line tribute stream,
``script/TributeStreamingJob.py``), so like the dedup/similarity tier they
are engine extensions mandated by the north-star, built set-oriented for
the 100 TB shape and hash-checked against DuckDB.

Determinism notes (the oracle rules that shaped these):

* every hash is the portable 48-bit md5 prefix (``functions.text.
  portable_hash64``) so both engines reproduce it bit-for-bit;
* TF-IDF uses a *rational* inverse-df weight ``tf·(n+1)/(df+1)`` —
  multiply and divide are correctly-rounded IEEE ops, so scores are
  bit-identical across engines, whereas ``ln`` is NOT (Spark's
  ``Math.log`` and DuckDB's ``std::log`` disagree in the last ulp on
  ~2.5% of the df domain — measured, 126/5000 inputs);
* window ORDER BYs carry a unique tiebreak (term asc / doc_id asc);
* integer division (``div`` / ``//``) for chunk math, never float casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, shingles, token_count, tokens
from ..operators.similarity import _assign_cluster, dot
from ..sources.batch import load_table
from .registry import register
from .text_ops import _NORM, _TOKS

# ---- shared SQL fragments ---------------------------------------------------


def _phash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of ``portable_hash64`` (48-bit md5-prefix integer)."""
    return f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 12)) AS BIGINT)"


# distinct word 4-grams per doc, mirroring functions.text.shingles(k=4):
# concat_ws drops the NULL out-of-range tail elements, and docs shorter
# than 4 words contribute their full text as the single gram.
_GRAMS4 = f"""
    words AS (
        SELECT doc_id, {_TOKS} AS w FROM documents
    ),
    idx AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 3, 1) + 1)) AS i
        FROM words
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               {_phash_sql("concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])")} AS gh
        FROM idx
    )
"""

DECONTAM_EVAL_MOD = 10
DECONTAM_MIN_SHARED = 2
PACK_CAPACITY = 256

# deterministic per-language sampling rates, in basis points of 10_000
MIX_RATES_BP = {"en": 9000, "de": 7000, "fr": 5000, "es": 5000, "zh": 3000}
SHUFFLE_SHARDS = 8
SEMANTIC_CELLS = 8
SEMANTIC_COSINE_THRESHOLD = 0.35


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH {_GRAMS4},
    ev AS (
        SELECT DISTINCT gh FROM sh WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
    )
    SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM sh JOIN ev USING (gh)
    WHERE sh.doc_id % {DECONTAM_EVAL_MOD} <> 0
    GROUP BY sh.doc_id
    HAVING COUNT(*) >= {DECONTAM_MIN_SHARED}
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥ 2
    distinct word 4-grams with the held-out eval slice (doc_id % 10 = 0
    stands in for the benchmark corpus).  The standard n-gram-overlap
    check (GPT-3 appendix C / PaLM style), as a set-oriented join.

    At scale: only 48-bit gram hashes shuffle (text never moves); the
    eval side is DISTINCT'd and broadcast — real benchmark suites are
    tiny next to a 100 TB train corpus, so the probe side streams map-side
    with zero shuffle.  Raising k or the min-shared threshold tightens
    precision; both are literal knobs."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(shingles("text", 4)).alias("g"),
    ).select("doc_id", portable_hash64(F.col("g")).alias("gh"))
    ev = (
        grams.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        .select("gh")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
        .join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= DECONTAM_MIN_SHARED)
    )


_PACK_BASE = f"""
    t AS (
        SELECT doc_id, source, CAST(len({_TOKS}) AS INT) AS n_tokens
        FROM documents
    ),
    o AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_off
        FROM t
    ),
    packed AS (
        SELECT doc_id, source, n_tokens, start_off,
               CAST(start_off // {PACK_CAPACITY} AS BIGINT) AS chunk_first,
               CAST((start_off + n_tokens - 1) // {PACK_CAPACITY} AS BIGINT)
                   AS chunk_last
        FROM o
    )
"""


def _pack_manifest(t: DataFrame) -> DataFrame:
    """The packing window over any (doc_id, source, n_tokens, ...) frame —
    ONE definition shared by `pack_sequences_concat`/`_stats` and
    `pipeline_pretrain_corpus`, so a capacity/offset change can never
    desynchronize the standalone stage from the composed pipeline.
    Carries every input column through, adding start_off/chunk_first/
    chunk_last."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = t.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return off.select(
        "*",
        F.expr(f"start_off div {PACK_CAPACITY}").cast("long").alias("chunk_first"),
        F.expr(f"(start_off + n_tokens - 1) div {PACK_CAPACITY}")
        .cast("long")
        .alias("chunk_last"),
    )


def _packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", token_count("text").cast("int").alias("n_tokens")
    )
    return _pack_manifest(toks)


@register(
    "pack_sequences_concat",
    oracle=f"WITH {_PACK_BASE} SELECT * FROM packed",
)
def pack_sequences_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing manifest (concat-then-chunk): documents
    are concatenated in doc_id order within their source shard and cut
    every 256 tokens; each doc gets its token offset and the first/last
    context chunk it lands in.  This is the packing layout GPT-2/3-class
    pretraining uses (no padding, docs straddle chunk boundaries).

    At scale the window is per-source — shards pack independently and in
    parallel (one running sum per shard, no global ordering); a 100 TB
    corpus has thousands of source shards, so parallelism is free and no
    single partition sees more than one shard's manifest."""
    return _packed_docs(spark, sf_dir)


@register(
    "pack_sequences_stats",
    oracle=f"""
    WITH {_PACK_BASE}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {PACK_CAPACITY} - 1) // {PACK_CAPACITY} AS BIGINT)
               AS n_chunks,
           CAST(SUM(CASE WHEN chunk_first <> chunk_last THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddlers
    FROM packed GROUP BY source
    """,
)
def pack_sequences_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing audit: chunk count and boundary-straddling docs —
    the numbers a data loader needs to size an epoch and the attention
    mask's cross-doc leak exposure."""
    packed = _packed_docs(spark, sf_dir)
    return packed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(f"(sum(n_tokens) + {PACK_CAPACITY} - 1) div {PACK_CAPACITY}")
        .cast("long")
        .alias("n_chunks"),
        F.sum(
            F.when(F.col("chunk_first") != F.col("chunk_last"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_straddlers"),
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dfq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    s AS (
        SELECT doc_id, term, tf, df,
               tf * (n_docs + 1.0) / (df + 1.0) AS tfidf
        FROM tf JOIN dfq USING (term) CROSS JOIN n
    ),
    r AS (
        SELECT doc_id, term, tf, df, ROUND(tfidf, 6) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS INT) AS rank
        FROM s
    )
    SELECT * FROM r WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF with a rational
    inverse-df weight ``tf·(n+1)/(df+1)`` (see module docstring: ``ln``
    is not bit-stable across engines; multiply/divide are, so scores and
    ranking are deterministic everywhere).

    At scale: explode → two partial-agg shuffles on compact keys (the
    wordcount cost class), the df side joins on term, the doc-count is a
    1-row broadcast.  Per-doc top-k is a bounded window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", "term", "tf", "df",
            F.round("tfidf", 6).alias("tfidf"), "rank",
        )
    )


def _mix_rate_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in MIX_RATES_BP.items()
    )
    return f"CASE {cases} ELSE 0 END"


# Spark twins of the mix SQL above — ONE definition each, shared by
# `mix_weighted_sample` and `pipeline_pretrain_corpus` so the hash salt /
# rate table can never silently diverge between the standalone stage and
# the composed pipeline.
def _mix_bucket_col() -> "F.Column":
    return (
        portable_hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
        % 10000
    )


def _mix_rate_col() -> "F.Column":
    rate = F.lit(0)
    for lang, bp in MIX_RATES_BP.items():
        rate = F.when(F.col("lang") == lang, bp).otherwise(rate)
    return rate


@register(
    "mix_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST({_phash_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
                AS BIGINT) AS bucket
    FROM documents
    WHERE {_phash_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
          < {_mix_rate_sql()}
    """,
)
def mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: each language is down-sampled at its target
    rate (en 90%, de 70%, fr/es 50%, zh 30%) by a deterministic keyed
    hash — the standard way to hit a mixture spec reproducibly across
    reruns and engines (no ``rand()``: resampling a 100 TB corpus must be
    stable under retries and partition reshuffles).

    Pure map-side filter — no shuffle at all; the hash is the portable
    48-bit md5 prefix, uniform enough that realized rates track targets
    at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", _mix_bucket_col().cast("long"))
        .filter(F.col("bucket") < _mix_rate_col())
        .select("doc_id", "lang", "source", "bucket")
    )


@register(
    "shuffle_training_order",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               {_phash_sql("'shuf:' || CAST(doc_id AS VARCHAR)")} AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(hv % {SHUFFLE_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY hv % {SHUFFLE_SHARDS} ORDER BY hv, doc_id
           ) AS INT) AS pos
    FROM h
    """,
)
def shuffle_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: a keyed hash assigns
    every document a shard and a position within the shard — the
    reproducible permutation a distributed data loader consumes (same
    order on every rerun, resumable mid-epoch, no driver-side state).

    At scale: one shuffle on the 8-way shard key; within-shard ordering
    is a per-partition sort of (hash, id) pairs — text never moves, and
    shard count scales to loader worker count."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        portable_hash64(
            F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
        ).alias("hv"),
    )
    w = Window.partitionBy(F.col("hv") % SHUFFLE_SHARDS).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hv") % SHUFFLE_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


@register(
    "semantic_dedup_cells",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {SEMANTIC_CELLS}
    ),
    a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dp AS (
        SELECT vec_id, cid, list_dot_product(v, cvec) AS d
        FROM a CROSS JOIN c
    ),
    asg AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dp
    ),
    cell AS (
        SELECT a.vec_id, cid AS cell_id, v
        FROM asg JOIN a USING (vec_id) WHERE rn = 1
    )
    SELECT x.cell_id, x.vec_id AS id_a, y.vec_id AS id_b,
           ROUND(list_dot_product(x.v, y.v), 6) AS cosine
    FROM cell x JOIN cell y
      ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
    WHERE ROUND(list_dot_product(x.v, y.v), 6) >= {SEMANTIC_COSINE_THRESHOLD}
    """,
)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: vectors are assigned to the cell of
    their nearest centroid (deterministic seeds: the first 8 vectors by
    id — same convention as the PQ/IVF builds), and near-duplicate pairs
    (cosine ≥ 0.35) are found *within cells only*.  The cell partition is
    what makes semantic dedup tractable at corpus scale: pair candidates
    are bounded per cell instead of O(n²) global, at the cost of missing
    cross-cell pairs (the SemDeDup trade; raise the cell count to shrink
    cells, or run the exact ``dedup_embedding_cosine_pairs`` baseline to
    measure the miss rate).

    Only the 8 centroid vectors reach the driver (bounded collect, the
    IVF precedent); assignment argmax materializes the k dot products as
    columns first (the O(k²) when-chain trap documented in
    ``operators.similarity._assign_cluster``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.orderBy("vec_id").limit(SEMANTIC_CELLS).collect()
    centroids = [[float(x) for x in r.embedding] for r in seeds]
    cells = _assign_cluster(emb, centroids, "embedding").select(
        "vec_id", F.col("__cluster").alias("__cell"), "embedding"
    )
    # cell ids in the output are the centroid vec_ids (= 0..7 only if ids
    # are dense; map through the actual seed ids so sparse/UUID-keyed
    # tables work — the round-2 IVF seeding lesson).  Tables smaller than
    # SEMANTIC_CELLS seed fewer cells — clamp to what exists.
    seed_ids = [r.vec_id for r in seeds]
    n_cells = len(seed_ids)
    cell_id = F.lit(seed_ids[-1])
    for i in reversed(range(n_cells - 1)):
        cell_id = F.when(F.col("__cell") == i, F.lit(seed_ids[i])).otherwise(cell_id)
    cells = cells.select(
        F.col("vec_id"), cell_id.cast("long").alias("cell_id"), "embedding"
    )
    a = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
    )
    b = cells.select(
        F.col("cell_id"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
    )
    pairs = a.join(b, "cell_id").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(dot(F.col("__va"), F.col("__vb")), 6)
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= SEMANTIC_COSINE_THRESHOLD)
        .select("cell_id", "id_a", "id_b", "cosine")
    )


# ---- the full pretraining corpus-prep composition ---------------------------

# quality/jaccard fragments mirror plans/curation.py (same thresholds);
# re-stated here with `source`/`text` carried through so the packing stage
# has what it needs.
_P_QUALITY_SQL = f"""
    ROUND(0.25 * (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 10000 THEN 1.0 ELSE 0.5 END)
        + 0.25 * (CASE WHEN LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) >= 3
                        AND LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) <= 12
                   THEN 1.0 ELSE 0.5 END)
        + 0.25 * (1 - CAST(LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                      / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0))
        + 0.25 * len(list_distinct({_TOKS})) * 1.0 / GREATEST(len({_TOKS}), 1), 6)
"""

_PIPELINE_SQL = f"""
    WITH q AS (
        SELECT doc_id, lang, source, text FROM documents
        WHERE {_P_QUALITY_SQL} >= 0.86
    ),
    fp AS (SELECT doc_id, md5({_NORM}) AS f FROM q),
    keep1 AS (
        SELECT fp.doc_id FROM fp
        JOIN (SELECT f, MIN(doc_id) AS m FROM fp GROUP BY f) g
          ON fp.f = g.f AND fp.doc_id = g.m
    ),
    surv AS (SELECT q.* FROM q JOIN keep1 USING (doc_id)),
    words3 AS (SELECT doc_id, {_TOKS} AS w FROM surv),
    idx3 AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 2, 1) + 1)) AS i
        FROM words3
    ),
    sh3 AS (
        SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
        FROM idx3
    ),
    shh3 AS (
        SELECT doc_id, {_phash_sql("shingle")} AS hsh FROM sh3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shh3 GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM shh3 a JOIN shh3 b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    near_dropped AS (
        SELECT DISTINCT id_b AS doc_id FROM shared
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 6) >= 0.5
    ),
    clean AS (
        SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped)
    ),
    wordsE AS (SELECT doc_id, {_TOKS} AS w FROM documents WHERE doc_id % {DECONTAM_EVAL_MOD} = 0),
    idxE AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 3, 1) + 1)) AS i
        FROM wordsE
    ),
    ev AS (
        SELECT DISTINCT
               {_phash_sql("concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])")} AS gh
        FROM idxE
    ),
    wordsT AS (
        SELECT doc_id, {_TOKS} AS w FROM clean
        WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0
    ),
    idxT AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 3, 1) + 1)) AS i
        FROM wordsT
    ),
    shT AS (
        SELECT DISTINCT doc_id,
               {_phash_sql("concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])")} AS gh
        FROM idxT
    ),
    flagged AS (
        SELECT doc_id FROM shT JOIN ev USING (gh)
        GROUP BY doc_id HAVING COUNT(*) >= {DECONTAM_MIN_SHARED}
    ),
    kept AS (
        SELECT * FROM clean
        WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0
          AND doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    mixed AS (
        SELECT * FROM kept
        WHERE {_phash_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000
              < {_mix_rate_sql()}
    ),
    t AS (
        SELECT doc_id, lang, source, CAST(len({_TOKS}) AS INT) AS n_tokens
        FROM mixed
    ),
    o AS (
        SELECT doc_id, lang, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_off
        FROM t
    )
    SELECT doc_id, lang, source, n_tokens, start_off,
           CAST(start_off // {PACK_CAPACITY} AS BIGINT) AS chunk_first,
           CAST((start_off + n_tokens - 1) // {PACK_CAPACITY} AS BIGINT) AS chunk_last
    FROM o
"""


@register("pipeline_pretrain_corpus", oracle=_PIPELINE_SQL)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pretraining data-prep flow as one declarative plan:
    quality gate → exact dedup → near-dup removal (the curation stages,
    same thresholds as ``curation_clean_corpus``) → benchmark
    decontamination (4-gram overlap vs the eval slice) → per-language
    mixture sampling → GPT-style sequence packing per source shard.
    Returns the final packed-chunk manifest — what a training loader
    would actually consume.

    This is the composition the individual operators exist for; the
    oracle replays all six stages in one SQL pipeline, so stage ordering
    and interactions (e.g. dedup before decontamination, mixing before
    packing so offsets reflect the sampled corpus) are value-checked end
    to end.  Every stage is set-oriented — the whole flow is shuffles on
    compact keys plus one windowed running sum per source shard."""
    from .curation import clean_corpus

    docs = load_table(spark, sf_dir, "documents")
    clean = docs.join(
        clean_corpus(docs).select("doc_id"), "doc_id"
    )
    # decontaminate: eval grams come from the RAW corpus slice (the
    # benchmark exists regardless of curation); train side is the cleaned
    # non-eval remainder
    ev = (
        docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        .select("doc_id", F.explode(shingles("text", 4)).alias("g"))
        .select(portable_hash64(F.col("g")).alias("gh"))
        .distinct()
    )
    train = clean.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
    flagged = (
        train.select("doc_id", F.explode(shingles("text", 4)).alias("g"))
        .select("doc_id", portable_hash64(F.col("g")).alias("gh"))
        .join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= DECONTAM_MIN_SHARED)
        .select("doc_id")
    )
    kept = train.join(flagged, "doc_id", "left_anti")
    mixed = kept.filter(_mix_bucket_col() < _mix_rate_col())
    t = mixed.select(
        "doc_id", "lang", "source", token_count("text").cast("int").alias("n_tokens")
    )
    return _pack_manifest(t).select(
        "doc_id", "lang", "source", "n_tokens", "start_off",
        "chunk_first", "chunk_last",
    )


# ---- data-budget selection and lexical search -------------------------------

BUDGET_TOKENS_PER_LANG = 2000

_BUDGET_HASH = "'budget:' || CAST(doc_id AS VARCHAR)"


@register(
    "corpus_token_budget_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, CAST(len({_TOKS}) AS INT) AS n_tokens,
               {_phash_sql(_BUDGET_HASH)} AS hv
        FROM documents
    ),
    o AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY hv, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM o WHERE cum_tokens <= {BUDGET_TOKENS_PER_LANG}
    """,
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: each language gets a fixed token budget and
    takes documents in deterministic keyed-hash order until the budget is
    spent — how a mixture spec expressed in TOKENS (not doc counts or
    rates) is realized reproducibly.  The hash order is an unbiased sample
    of the language's corpus; the running sum makes the cut exact.

    At scale: one window per language partition (languages are few and
    balanced here; for a skewed axis — e.g. per-source budgets over
    thousands of shards — the same plan parallelizes per shard)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        token_count("text").cast("int").alias("n_tokens"),
        portable_hash64(
            F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))
        ).alias("__hv"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("__hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= BUDGET_TOKENS_PER_LANG)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


BM25_QUERY_TERMS = ("spark", "window", "join")
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_sql() -> str:
    per_term = []
    for t in BM25_QUERY_TERMS:
        per_term.append(
            f"""
    tf_{t} AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE term = '{t}' GROUP BY doc_id
    ),
    df_{t} AS (SELECT CAST(COUNT(*) AS BIGINT) AS df FROM tf_{t})"""
        )
    score_terms = " + ".join(
        f"COALESCE(tf_{t}.tf * ({BM25_K1} + 1.0) * ((SELECT n_docs FROM n) + 1.0)"
        f" / ((SELECT df FROM df_{t}) + 1.0)"
        f" / (tf_{t}.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl"
        f" / (SELECT avgdl FROM avg_dl))), 0.0)"
        for t in BM25_QUERY_TERMS
    )
    joins = " ".join(
        f"LEFT JOIN tf_{t} ON tf_{t}.doc_id = dl.doc_id" for t in BM25_QUERY_TERMS
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(len({_TOKS}) AS INT) AS dl FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    avg_dl AS (SELECT SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
    {",".join(per_term)},
    scored AS (
        SELECT dl.doc_id, ROUND({score_terms}, 6) AS bm25
        FROM dl {joins}
    )
    SELECT doc_id, bm25 FROM scored
    WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """


@register("text_bm25_search", oracle=_bm25_sql())
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical search: top-20 documents for a fixed query term set,
    with the standard k1/b length normalization and a *rational* idf
    ``(N+1)/(df+1)`` (same reasoning as TF-IDF above: every op in the
    score is a correctly-rounded IEEE multiply/divide/add, so scores are
    bit-identical across engines; ``ln``-idf is not).  Per-term partial
    scores are summed in fixed query order on both sides.

    At scale: ONE tokenize+explode serves doc lengths and all per-term
    stats (the pinned token stream is aggregated twice — per-doc lengths,
    and a pivot over only query-term rows); n/avgdl/df sides are 1-row
    broadcasts; top-k is TakeOrderedAndProject."""
    from ..caching import pin

    terms = list(BM25_QUERY_TERMS)
    docs = load_table(spark, sf_dir, "documents")
    toks = pin(docs.select("doc_id", F.explode(tokens("text")).alias("term")))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("int").alias("dl"))
    n_stats = docs.agg(F.count("*").cast("long").alias("n_docs"))
    avg_stats = dl.agg((F.sum("dl") * 1.0 / F.count("*")).alias("avgdl"))
    # one pass for every term's tf: pivot with an explicit value list
    # (deterministic columns), then df = per-column non-null count
    tf_all = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .pivot("term", terms)
        .count()
        .select("doc_id", *[F.col(t).alias(f"tf_{t}") for t in terms])
    )
    df_all = tf_all.agg(
        *[F.count(F.col(f"tf_{t}")).cast("long").alias(f"df_{t}") for t in terms]
    )
    scored = (
        dl.join(tf_all, "doc_id", "left")
        .crossJoin(F.broadcast(n_stats))
        .crossJoin(F.broadcast(avg_stats))
        .crossJoin(F.broadcast(df_all))
    )
    score = None
    for t in terms:
        term_score = F.coalesce(
            F.col(f"tf_{t}")
            * (BM25_K1 + 1.0)
            * (F.col("n_docs") + 1.0)
            / (F.col(f"df_{t}") + 1.0)
            / (
                F.col(f"tf_{t}")
                + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
            F.lit(0.0),
        )
        score = term_score if score is None else score + term_score
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(F.col("bm25") > 0)
        .select("doc_id", "bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
