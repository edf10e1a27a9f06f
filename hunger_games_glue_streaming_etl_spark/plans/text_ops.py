"""Text-analysis queries over the ``documents`` table (LLM-pipeline
extension surface: token stats, quality scoring, language-ID,
fingerprinting).  Every operator is a pure column-expression composition
(functions/text.py) — JVM-side, codegen'd, no Python in the row path — and
every oracle reproduces the exact same formula in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    lang_id,
    normalized_text,
    portable_hash64,
    quality_score,
    token_count,
    tokens,
)
from ..caching import pin
from ..sources.batch import load_table
from .registry import register

# shared SQL fragment: normalized text + token list (mirrors
# functions.text.normalized_text / tokens)
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INT) AS n_tokens,
           CAST(LENGTH(text) AS INT) AS n_chars_actual,
           ROUND(LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}), 6) AS mean_token_len,
           ROUND(len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}), 6) AS type_token_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, char count, mean token length, type-token
    ratio — the basic corpus-stats pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            F.length(F.regexp_replace(normalized_text("text"), " ", ""))
            / n_tok.cast("double"),
            6,
        ).alias("mean_token_len"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double"), 6
        ).alias("type_token_ratio"),
    )


@register(
    "text_bpe_token_estimate",
    oracle="""
    SELECT doc_id,
           CAST(COALESCE(list_sum(list_transform(
               list_filter(
                   string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                   w -> length(w) > 0),
               w -> GREATEST(1, CAST(CEIL(length(w) / 4.0) AS BIGINT)))), 0)
           AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word (BPE-ish) token-count estimate: per word,
    max(1, ceil(len/4)) — the oracle mirrors the regex split, empty-word
    filter, and per-word ceiling exactly (integer arithmetic throughout,
    so the twin is value-identical, not just approximate)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count("text").alias("n_bpe_tokens"))


def _bpe_oracle() -> str:
    from ..operators import bpe

    return bpe.oracle_sql()


@register("text_bpe_encode", oracle=_bpe_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merge-table BPE encode (canonical lowest-rank-pair merge loop
    over a planted deterministic vocab) — the upgrade from
    ``text_bpe_token_estimate``: exact token sequences and counts, not a
    length heuristic.  Spark runs the per-document loop Arrow-batched
    (``mapInPandas``, no shuffle); the DuckDB oracle replays the SAME
    algorithm as a recursive CTE GENERATED from the same merge table
    (``operators/bpe.py``), so vocab, merge order, and the iteration cap
    cannot diverge between engines — the whole token string is
    value-hashed, not just the count."""
    from ..operators.bpe import bpe_encode_frame

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_frame(docs)


def _bpe_train_oracle() -> str:
    from ..operators import bpe

    return bpe.train_oracle_sql()


@register("text_bpe_train_merges", oracle=_bpe_train_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-table TRAINING — the learned-vocab
    counterpart ``text_bpe_encode``'s docstring promises: 8 canonical
    merge-learning rounds over a deterministic corpus sample, each round
    one lead-window pair count (distributed) + a 1-row argmax dial +
    a set-oriented merge application (left != right makes occurrences
    provably disjoint, so merge-all is a window expression, no
    sequential scan; rounds are localCheckpoint-truncated per the r4
    iterative rule).  The oracle unrolls the SAME 8 rounds as generated
    chained CTEs (``operators/bpe.py:train_oracle_sql``) — normalization,
    counting, tiebreak, and application replayed identically, so the
    learned table AND its learn-time pair counts hash-check."""
    from ..operators.bpe import bpe_train_merges

    return bpe_train_merges(load_table(spark, sf_dir, "documents"))


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter({_TOKS}, t -> t IN ({markers})))"


_LANG_CASE = (
    "CASE WHEN GREATEST("
    + ", ".join(f"s_{lang}" for lang in LANG_MARKERS)
    + ") = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = GREATEST(" + ", ".join(f"s_{x}" for x in LANG_MARKERS) + f") THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    + " ELSE 'und' END"
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
        FROM documents
    )
    SELECT doc_id, labeled_lang, {_LANG_CASE} AS predicted_lang,
           CAST(s_en AS INT) AS en_hits
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: per-language stopword-marker hit counts →
    deterministic argmax (first language in marker order wins ties, 'und'
    when no marker hits).  The fixtures' text is synthetic, so the value of
    this operator is the vectorized scoring shape, not lexicon quality."""
    from ..functions.text import stopword_lang_scores

    docs = load_table(spark, sf_dir, "documents")
    scores = stopword_lang_scores("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id("text").alias("predicted_lang"),
        scores["en"].cast("int").alias("en_hits"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(LENGTH(text) AS DOUBLE) AS n_chars,
               CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
               LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) AS mean_tok_len,
               CAST(LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct,
               len(list_distinct({_TOKS})) * 1.0 / GREATEST(len({_TOKS}), 1) AS ttr
        FROM documents
    )
    SELECT doc_id,
           ROUND(0.25 * (CASE WHEN n_chars >= 100 AND n_chars <= 10000 THEN 1.0 ELSE 0.5 END)
                 + 0.25 * (CASE WHEN mean_tok_len >= 3 AND mean_tok_len <= 12 THEN 1.0 ELSE 0.5 END)
                 + 0.25 * (1 - punct / GREATEST(n_chars, 1.0))
                 + 0.25 * ttr, 6) AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length band + token-length band +
    punctuation ratio + lexical diversity) — the cheap pre-filter pass of a
    training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@register(
    "text_quality_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               CAST(LENGTH(text) AS DOUBLE) AS nc,
               LENGTH(REPLACE({_NORM}, ' ', '')) * 1.0 / len({_TOKS}) AS mean_tok_len,
               CAST(LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS punct,
               len(list_distinct({_TOKS})) * 1.0 / GREATEST(len({_TOKS}), 1) AS ttr
        FROM documents
    )
    SELECT doc_id, lang, n_chars
    FROM t
    WHERE ROUND(0.25 * (CASE WHEN nc >= 100 AND nc <= 10000 THEN 1.0 ELSE 0.5 END)
        + 0.25 * (CASE WHEN mean_tok_len >= 3 AND mean_tok_len <= 12 THEN 1.0 ELSE 0.5 END)
        + 0.25 * (1 - punct / GREATEST(nc, 1.0))
        + 0.25 * ttr, 6) >= 0.86
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision: keep documents above the quality bar — 0.86
    sits at the corpus median so the filter demonstrably rejects (the filter
    form of ``text_quality_score``; predicate pushes to the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(quality_score("text") >= 0.86).select("doc_id", "lang", "n_chars")


@register(
    "wordcount_top20",
    oracle=f"""
    SELECT t.tok AS token, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, unnest(string_split({_NORM}, ' ')) AS t(tok)
    GROUP BY t.tok
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode → count → top-k pipeline (array explode surface
    + deterministic global top-k).  At 100 TB: partial aggregation collapses
    the exploded stream map-side, so the shuffle carries one row per
    (partition, distinct token), not one per token occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(
                   range(1, GREATEST(len(w) - 3 + 1, 1) + 1),
                   i -> CAST(('0x' || substr(md5('0:' ||
                            concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 12))
                        AS BIGINT)) AS hs
        FROM n
    ),
    w AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, GREATEST(len(hs) - 8 + 1, 1) + 1),
                   j -> list_min(hs[j:j+7]))) AS fps
        FROM h
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM w
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint set per document (ordered token 3-gram
    hashes, per-8-window minima — Schleimer/Wilkerson/Aiken) — the
    overlap-detection fingerprint for plagiarism/contamination checks.
    The oracle reproduces the identical gram hash (shared 48-bit
    md5-prefix, same null-dropping tail behavior) and window minima, so
    fingerprints match bit-for-bit.  The persists between stages are the
    mandatory O(n²)-avoidance barriers (see functions/text.py)."""
    from ..functions.text import (
        tokens,
        winnowing_gram_hashes,
        winnowing_window_minima,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokenized = pin(docs.select("doc_id", tokens("text").alias("__w")))
    hashed = pin(
        tokenized.select("doc_id", winnowing_gram_hashes(F.col("__w")).alias("__hs"))
    )
    return hashed.select(
        "doc_id",
        F.explode(winnowing_window_minima(F.col("__hs"))).alias("fingerprint"),
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS w FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i+1])) AS gram
        FROM toks
    ), gc AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
    ), gs AS (
        SELECT doc_id, SUM(c) AS total, MAX(c) AS top,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        FROM gc GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(w) AS INT) AS n_tokens,
           ROUND(1 - len(list_distinct(w)) * 1.0 / len(w), 6) AS dup_token_frac,
           CAST(COALESCE(total, 0) AS BIGINT) AS n_bigrams,
           ROUND(COALESCE(top * 1.0 / total, 0), 6) AS top_bigram_frac,
           ROUND(COALESCE(dup * 1.0 / total, 0), 6) AS dup_bigram_frac
    FROM toks t LEFT JOIN gs ON t.doc_id = gs.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document — the curation filters
    that catch boilerplate/templated text which length and TTR miss:
    duplicate-token fraction, total bigram occurrences, top-bigram
    fraction (most frequent bigram's share), duplicate-bigram fraction
    (share of bigram occurrences whose bigram repeats).  Multiplicity
    matters, so this uses ``grams`` (non-distinct), not ``shingles``.

    At scale: one explode (n_tokens rows per doc) with map-side partial
    aggregation on (doc_id, gram), then a per-doc rollup and an id join —
    the same cost class as wordcount.  No text column ever shuffles."""
    from ..functions.text import grams

    docs = load_table(spark, sf_dir, "documents")
    gram_counts = (
        docs.select("doc_id", F.explode(grams("text", 2)).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
    )
    gram_stats = gram_counts.groupBy("doc_id").agg(
        F.sum("count").alias("__total"),
        F.max("count").alias("__top"),
        F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias("__dup"),
    )
    toks = tokens("text")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            1 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("dup_token_frac"),
    )
    return per_doc.join(gram_stats, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        F.coalesce(F.col("__total"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(
            F.coalesce(F.col("__top") / F.col("__total"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.col("__dup") / F.col("__total"), F.lit(0.0)), 6
        ).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model coherence — the KenLM-shaped quality signal real
# curation stacks score documents with (CCNet/RedPajama filter on LM
# perplexity).  A true LM needs log-probs, and `ln` is NOT bit-stable
# across engines (measured, CLAUDE.md r3), so the score here is the
# fixed-point conditional-probability mass: for every bigram instance
# (w1, w2) in a doc, the corpus-level MLE  c(w1 w2) / c(w1 ·)  scaled to
# integer millionths with FLOOR division — integer multiply/divide/add
# only, so the per-doc SUM is order-independent and hash-exact.  High
# score ⇒ the doc's word transitions are common corpus-wide (fluent
# boilerplate scores high, shuffled-word junk scores low) — the same
# ranking a perplexity filter produces, without the transcendentals.
# ---------------------------------------------------------------------------

BIGRAM_FP_SCALE = 1_000_000


def phash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of ``portable_hash64`` (48-bit md5-prefix integer)."""
    return f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 12)) AS BIGINT)"


@register(
    "text_bigram_coherence",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i+1])) AS gram
        FROM toks
    ),
    h AS (
        SELECT doc_id,
               {phash_sql("gram")} AS bg_h,
               {phash_sql("string_split(gram, ' ')[1]")} AS pre_h
        FROM g
    ),
    bg AS (SELECT bg_h, COUNT(*) AS c_bg FROM h GROUP BY bg_h),
    pre AS (SELECT pre_h, COUNT(*) AS c_pre FROM h GROUP BY pre_h),
    inst AS (
        SELECT doc_id, ({BIGRAM_FP_SCALE} * c_bg) // c_pre AS fp
        FROM h JOIN bg USING (bg_h) JOIN pre USING (pre_h)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(fp) AS BIGINT) AS coherence_fp,
           CAST(SUM(fp) // COUNT(*) AS BIGINT) AS avg_coherence_fp
    FROM inst GROUP BY doc_id
    """,
)
def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM coherence: Σ over the doc's bigram instances
    of ⌊10⁶·c(w₁w₂)/c(w₁·)⌋ using corpus-wide counts, plus the per-bigram
    average — a deterministic stand-in for the perplexity filters
    (CCNet-style) that rank documents by how typical their word
    transitions are.

    At scale: bigrams and their prefix tokens are hashed map-side
    (text never crosses a shuffle); corpus counts are two hash-keyed
    partial-agg shuffles; instances rejoin the counts on those 48-bit
    keys (collisions merge identically in both engines — counts are
    keyed by the SAME hash in the oracle); the final rollup shuffles
    (doc_id, fp) longs.  Wordcount cost class."""
    from ..functions.text import grams, portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    inst = pin(
        docs.select("doc_id", F.explode(grams("text", 2)).alias("gram")).select(
            "doc_id",
            portable_hash64(F.col("gram")).alias("bg_h"),
            portable_hash64(F.substring_index("gram", " ", 1)).alias("pre_h"),
        )
    )
    bg = inst.groupBy("bg_h").agg(F.count("*").alias("c_bg"))
    pre = inst.groupBy("pre_h").agg(F.count("*").alias("c_pre"))
    scored = (
        inst.join(bg, "bg_h")
        .join(pre, "pre_h")
        .select(
            "doc_id",
            F.expr(f"({BIGRAM_FP_SCALE}L * c_bg) div c_pre").alias("fp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("fp").cast("long").alias("coherence_fp"),
        F.expr("sum(fp) div count(*)").cast("long").alias("avg_coherence_fp"),
    )


VOCAB_SIZE = 16  # fixture corpus has 31 distinct tokens; 16 ⇒ real OOV
OOV_FP_SCALE = 1_000_000


@register(
    "text_vocab_oov",
    oracle=f"""
    WITH inst AS (
        SELECT doc_id,
               {phash_sql("tok")} AS th
        FROM documents, unnest({_TOKS}) AS t(tok)
    ),
    c AS (SELECT th, COUNT(*) AS n FROM inst GROUP BY th),
    vocab AS (
        SELECT th FROM c ORDER BY n DESC, th LIMIT {VOCAB_SIZE}
    )
    SELECT i.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.th IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(({OOV_FP_SCALE} * SUM(CASE WHEN v.th IS NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS oov_rate_fp
    FROM inst i LEFT JOIN vocab v ON i.th = v.th
    GROUP BY i.doc_id
    """,
)
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-vocabulary build + per-document out-of-vocabulary rate —
    the tokenizer-coverage diagnostic a training pipeline runs before
    committing to a vocab (high OOV ⇒ wrong tokenizer/language mix).
    Vocab = top ``VOCAB_SIZE`` tokens by corpus frequency with a
    deterministic (count DESC, hash ASC) tiebreak, ranked on 48-bit token
    hashes; OOV rate is fixed-point millionths (integer division — no
    float anywhere).

    At scale: token instances are hashed map-side (text never shuffles);
    the count shuffle collapses map-side; the vocab is top-V of the count
    table (TakeOrderedAndProject — per-partition heaps) and broadcasts to
    the instance stream; the per-doc rollup ships (doc_id, flag) longs.
    V is a constant here; production sizes it ~100k with the identical
    plan shape."""
    from ..functions.text import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    inst = pin(
        docs.select("doc_id", F.explode(tokens("text")).alias("__tok")).select(
            "doc_id", portable_hash64(F.col("__tok")).alias("th")
        )
    )
    counts = inst.groupBy("th").agg(F.count("*").alias("n"))
    vocab = counts.orderBy(F.col("n").desc(), "th").limit(VOCAB_SIZE).select(
        F.col("th").alias("vth")
    )
    flagged = inst.join(
        F.broadcast(vocab), inst["th"] == F.col("vth"), "left"
    ).select("doc_id", F.isnull("vth").cast("long").alias("is_oov"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("is_oov").cast("long").alias("n_oov"),
        F.expr(f"({OOV_FP_SCALE} * sum(is_oov)) div count(*)")
        .cast("long")
        .alias("oov_rate_fp"),
    )


# linear quality-classifier weights (integer fixed-point; thousandths for
# the rate features).  The shape is a fastText/logreg-style model-based
# quality filter with PRE-TRAINED weights baked in — scoring is a pure
# column expression, so the "model" runs JVM-side at full codegen speed.
_QC_STOP_W = 3          # stopword-rate weight (signal of natural prose)
_QC_MTL_W = 1           # mean-token-length weight
_QC_PUNCT_W = -2        # punctuation-rate weight (penalize noisy text)
_QC_LEN_DIV = 4         # length feature: n_tokens // 4
_QC_THRESHOLD = 4600    # decision boundary (median-ish on the fixtures)


@register(
    "quality_classifier_linear",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS f_toks,
               CAST((LENGTH(REPLACE({_NORM}, ' ', '')) * 1000)
                    // GREATEST(len({_TOKS}), 1) AS BIGINT) AS f_mtl,
               CAST((len(list_filter({_TOKS},
                         t -> t IN ('the','and','of','to','in','is','that','with')))
                     * 1000) // GREATEST(len({_TOKS}), 1) AS BIGINT) AS f_stop,
               CAST(LENGTH(text)
                    - LENGTH(regexp_replace(text, '[.!?,;]', '', 'g'))
                    AS BIGINT) AS f_punct
        FROM documents
    )
    SELECT doc_id, f_toks, f_stop, f_mtl,
           CAST({_QC_STOP_W} * f_stop + {_QC_MTL_W} * f_mtl
                + ({_QC_PUNCT_W}) * ((f_punct * 1000) // GREATEST(f_toks, 1))
                + f_toks // {_QC_LEN_DIV} AS BIGINT) AS logit_fp,
           ({_QC_STOP_W} * f_stop + {_QC_MTL_W} * f_mtl
                + ({_QC_PUNCT_W}) * ((f_punct * 1000) // GREATEST(f_toks, 1))
                + f_toks // {_QC_LEN_DIV}) >= {_QC_THRESHOLD} AS accept
    FROM f
    """,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the linear-classifier shape
    (fastText / logistic regression over handcrafted features) that sits
    between heuristic gates and LLM judges in real curation stacks.
    Features (all integer fixed-point, thousandths for rates): token
    count, stopword rate, mean token length, punctuation rate.  The
    decision is a fixed-weight integer dot product against a threshold —
    no sigmoid, because ``exp`` is not bit-stable cross-engine and the
    decision only needs the logit's ORDER, which is exp-invariant.

    ~51% of the fixture corpus passes at both sfs (median-ish boundary —
    never vacuous).  At scale: pure column expressions, one projection,
    no shuffle, no Python; swapping in real trained weights changes five
    constants, not the plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1))
    f_mtl = (
        F.length(F.regexp_replace(normalized_text("text"), " ", ""))
        .cast("long") * 1000
    ) / safe_tok
    f_mtl = F.floor(f_mtl).cast("long")
    stop_hits = F.size(
        F.filter(
            toks,
            lambda t: t.isin(
                "the", "and", "of", "to", "in", "is", "that", "with"
            ),
        )
    ).cast("long")
    f_stop = F.floor((stop_hits * 1000) / safe_tok).cast("long")
    f_punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[.!?,;]", ""))
    ).cast("long")
    punct_rate = F.floor((f_punct * 1000) / safe_tok).cast("long")
    logit = (
        F.lit(_QC_STOP_W) * f_stop
        + F.lit(_QC_MTL_W) * f_mtl
        + F.lit(_QC_PUNCT_W) * punct_rate
        + F.floor(n_tok / _QC_LEN_DIV).cast("long")
    )
    return docs.select(
        "doc_id",
        n_tok.alias("f_toks"),
        f_stop.alias("f_stop"),
        f_mtl.alias("f_mtl"),
        logit.cast("long").alias("logit_fp"),
        (logit >= _QC_THRESHOLD).alias("accept"),
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks

# oracle CTE bodies shared with pipeline_rag_retrieval (llm_pipeline.py):
# d -> per-doc token list, c -> chunk count, chunk_x -> one row per chunk
# with its exact text (the same d/c/x pipeline the Spark helper builds)
CHUNK_CTES_SQL = f"""
    d AS (
        SELECT doc_id, {_TOKS} AS w, CAST(len({_TOKS}) AS BIGINT) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, w, n,
               CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                    ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})
                             // {CHUNK_STRIDE} END AS n_chunks
        FROM d
    ),
    chunk_x AS (
        SELECT doc_id, n, n_chunks, ci,
               CASE WHEN n - ci * {CHUNK_STRIDE} < {CHUNK_TOKENS}
                    THEN n - ci * {CHUNK_STRIDE}
                    ELSE {CHUNK_TOKENS} END AS chunk_len,
               array_to_string(
                   list_slice(w, ci * {CHUNK_STRIDE} + 1,
                              ci * {CHUNK_STRIDE}
                              + (CASE WHEN n - ci * {CHUNK_STRIDE} < {CHUNK_TOKENS}
                                      THEN n - ci * {CHUNK_STRIDE}
                                      ELSE {CHUNK_TOKENS} END)), ' ') AS chunk_text
        FROM c, unnest(generate_series(0, n_chunks - 1)) AS t(ci)
    )
"""


def sliding_chunk_frame(docs: DataFrame) -> DataFrame:
    """One row per (doc, chunk): ``doc_id, n, n_chunks, ci, chunk_len,
    chunk_text`` — the Spark twin of ``CHUNK_CTES_SQL``'s ``chunk_x``.
    Map-side only (explode before any shuffle); callers must hash or
    project away ``chunk_text`` before shuffling (SCALING.md §1)."""
    chunk = F.lit(CHUNK_TOKENS).cast("long")
    stride = F.lit(CHUNK_STRIDE).cast("long")
    base = docs.select(
        "doc_id",
        tokens("text").alias("w"),
        F.size(tokens("text")).cast("long").alias("n"),
    ).withColumn(
        "n_chunks",
        F.when(F.col("n") <= chunk, F.lit(1).cast("long")).otherwise(
            F.expr(
                f"1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}"
            )
        ),
    )
    ex = base.select(
        "doc_id",
        "w",
        "n",
        "n_chunks",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
            "ci"
        ),
    )
    start = F.col("ci") * stride
    chunk_len = F.least(chunk, F.col("n") - start)
    chunk_text = F.array_join(
        F.slice("w", (start + 1).cast("int"), chunk_len.cast("int")), " "
    )
    return ex.select(
        "doc_id",
        "n",
        "n_chunks",
        "ci",
        chunk_len.alias("chunk_len"),
        chunk_text.alias("chunk_text"),
    )


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH {CHUNK_CTES_SQL}
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(MAX(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(chunk_len) AS BIGINT) AS covered_slots,
           CAST(SUM({phash_sql("chunk_text")}) AS BIGINT) AS chunks_hash_sum
    FROM chunk_x GROUP BY doc_id
    """,
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG/context-window prep
    stage: split each document into CHUNK_TOKENS-token chunks with a
    CHUNK_TOKENS−CHUNK_STRIDE-token overlap, so no retrieval span
    straddles a chunk boundary unseen.  Emits one
    audit row per document: token count, chunk count (exact integer
    formula, `div` both sides), total covered token slots (overlap
    counted per chunk), and the SUM of the portable 48-bit hash of every
    chunk's text — hash-exact evidence that BOTH engines produced
    byte-identical chunk strings.  Scale: chunking is map-side (explode
    before any shuffle); only (doc_id, ints) cross the groupBy shuffle —
    chunk text is hashed in place and never shuffled (SCALING.md §1)."""
    docs = load_table(spark, sf_dir, "documents")
    per_chunk = sliding_chunk_frame(docs).select(
        "doc_id",
        "n",
        "n_chunks",
        "chunk_len",
        portable_hash64(F.col("chunk_text")).alias("chunk_h"),
    )
    return per_chunk.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.max("n_chunks").alias("n_chunks"),
        F.sum("chunk_len").alias("covered_slots"),
        F.sum("chunk_h").alias("chunks_hash_sum"),
    )


# ---- HTML boilerplate extraction (WET-style, round 7) ----------------------
#
# The first stage of every web-scale pretrain pipeline: raw HTML ->
# main-content text.  The fixtures carry no HTML, so both engines CONSTRUCT
# the same page around each document's text (the planted-corpus pattern) and
# run the SAME extraction regexes: drop <head>/<script>/<nav>/<footer>
# blocks, strip remaining tags, collapse whitespace.  ASCII-only,
# lookahead-free patterns — Java regex and DuckDB's RE2 agree on every one
# (the pii_scrub_planted precedent).  DuckDB needs the 'g' flag for global
# replace; Spark is global by default.

_HTML_BUILD_SQL = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
    || '</title><style>p (margin:0) </style></head><body>'
    || '<nav><a href="/home">home</a> <a href="/about">about</a></nav>'
    || '<p>' || substr(text, 1, 120) || '</p>'
    || '<script>var tracking_id = ' || CAST(doc_id AS VARCHAR) || ';</script>'
    || '<p>' || substr(text, 121, 200) || '</p>'
    || '<footer>copyright corp</footer></body></html>'
"""

_HTML_STRIP_STEPS = [
    ("(?s)<head>.*?</head>", ""),
    ("(?s)<script[^>]*>.*?</script>", ""),
    ("(?s)<nav>.*?</nav>", ""),
    ("(?s)<footer>.*?</footer>", ""),
    ("<[^>]+>", " "),
]


@register(
    "text_html_extract",
    oracle=f"""
    WITH page AS (
        SELECT doc_id, {_HTML_BUILD_SQL} AS html FROM documents
    ),
    x AS (
        SELECT doc_id, html,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(html, '(?s)<head>.*?</head>', '', 'g'),
                                   '(?s)<script[^>]*>.*?</script>', '', 'g'),
                               '(?s)<nav>.*?</nav>', '', 'g'),
                           '(?s)<footer>.*?</footer>', '', 'g'),
                       '<[^>]+>', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS extracted
        FROM page
    )
    SELECT doc_id, extracted,
           CAST(LENGTH(html) - LENGTH(extracted) AS BIGINT) AS boilerplate_chars
    FROM x
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> main-content text extraction (the WET/trafilatura stage of a
    web-crawl pretrain pipeline): both engines build the identical page
    around each document, then head/script/nav/footer blocks are removed,
    tags stripped, whitespace collapsed — the extracted text itself is
    value-hashed, so any regex or flag divergence fails the gate.  At
    100 TB this is a pure map-side regex chain over the raw crawl: no
    shuffle, codegen'd, and the boilerplate_chars column is the audit a
    curation dashboard tracks."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p (margin:0) </style></head><body>"),
        F.lit('<nav><a href="/home">home</a> <a href="/about">about</a></nav>'),
        F.lit("<p>"),
        F.substring(F.col("text"), 1, 120),
        F.lit("</p>"),
        F.lit("<script>var tracking_id = "),
        F.col("doc_id").cast("string"),
        F.lit(";</script>"),
        F.lit("<p>"),
        F.substring(F.col("text"), 121, 200),
        F.lit("</p>"),
        F.lit("<footer>copyright corp</footer></body></html>"),
    )
    page = docs.select("doc_id", html.alias("html"))
    extracted = F.col("html")
    for pat, rep in _HTML_STRIP_STEPS:
        extracted = F.regexp_replace(extracted, pat, rep)
    extracted = F.trim(F.regexp_replace(extracted, r"\s+", " "))
    return page.select(
        "doc_id",
        extracted.alias("extracted"),
        (F.length("html") - F.length(extracted)).cast("long").alias(
            "boilerplate_chars"
        ),
    )
