"""Text-analysis column expressions for the LLM-data-pipeline operators:
tokenization, shingling, portable hashing, quality scoring, language-ID,
SimHash.  All pure ``pyspark.sql.functions`` compositions — JVM-side,
whole-stage-codegen'd, no Python in the hot path.

Cross-engine hashing: the dedup operators need a hash both Spark and the
DuckDB oracle compute identically.  ``xxhash64`` (Spark) and ``hash``
(DuckDB) are different algorithms, so the portable form is
``conv(substr(md5(x), 1, 12), 16, 10) :: bigint`` — 48 bits of md5, identical
hex in both engines.  At production scale swap ``portable_hash64`` for
``F.xxhash64`` (one engine, no oracle): ~10× cheaper per call, same
operator shape.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets for the heuristic language-ID.
# Deliberately tiny and hard-coded: the operator's value is the *shape*
# (vectorized per-language scoring + argmax), not lexicon quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
}


def normalized_text(col: str | Column = "text") -> Column:
    """Lower-cased, whitespace-collapsed, trimmed — the canonical form every
    fingerprint/dedup operator hashes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized_text(col), " ")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """Sub-word-ish token estimate: word-parts split on non-alphanumerics
    plus a length/4 term per long word — the cheap static proxy for a BPE
    tokenizer's token count (real BPE needs a vocab; this keeps the same
    order of magnitude deterministically)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"[^a-z0-9]+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.when(F.length(w) == 0, 0)
        .otherwise(F.greatest(F.lit(1), F.ceil(F.length(w) / 4)))
        .cast("long"),
    )


def shingles(col: str | Column = "text", k: int = 3) -> Column:
    """Distinct word-level k-shingles (array<string>) — the unit set for
    Jaccard/MinHash.  Docs shorter than k words yield their full text as the
    single shingle so they still participate."""
    w = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0)))
    make = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return F.array_distinct(make)


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """48-bit integer hash identical in Spark and DuckDB (md5-hex prefix).
    ``seed`` derives independent hash families for MinHash."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 12), 16, 10
    ).cast("long")


def stopword_lang_scores(col: str | Column = "text") -> dict[str, Column]:
    """Per-language marker-hit counts over the token array."""
    toks = tokens(col)
    return {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(markers))  # noqa: B023 — bound per iteration below
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str | Column = "text") -> Column:
    """Argmax of the marker scores with deterministic tiebreak (first in
    LANG_MARKERS order wins; 'und' when nothing matches)."""
    scores = stopword_lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lang] == best, lang).otherwise(expr)
    return F.when(best == 0, "und").otherwise(expr)


def quality_score(col: str | Column = "text") -> Column:
    """Deterministic document-quality heuristic in [0, 1]:

    0.25·length_band + 0.25·mean-token-length band + 0.25·(1 − punct ratio)
    + 0.25·type-token ratio — the standard cheap pre-filter shape for
    LLM-corpus curation (length/punctuation/lexical-diversity bands).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    mean_tok_len = (F.length(F.regexp_replace(normalized_text(col), " ", "")) / n_tok)
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n_tok, F.lit(1.0))
    length_band = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(0.5)
    tok_band = F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 1.0).otherwise(0.5)
    return F.round(
        0.25 * length_band + 0.25 * tok_band + 0.25 * (1 - punct_ratio) + 0.25 * ttr, 6
    )


def simhash(col: str | Column = "text", bits: int = 32) -> Column:
    """SimHash over whitespace tokens (portable-hash bit votes).

    For each bit k: sum ±1 votes across tokens (positive when bit k of the
    token hash is set); the sign of the sum sets bit k of the fingerprint.
    32 bits discriminates well on shared-vocabulary corpora (16 bits is
    false-positive-heavy) while keeping the oracle SQL tractable; the
    production form is 64-bit ``xxhash64`` — identical operator shape.
    """
    toks = tokens(col)

    def vote_merge(k: int):
        # PySpark introspects lambda arity — higher-order-function lambdas
        # must take exactly (acc, x), so bind k via this closure
        return lambda acc, t: acc + F.when(
            F.shiftright(portable_hash64(t), k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for k in range(bits):
        vote = F.aggregate(toks, F.lit(0).cast("long"), vote_merge(k))
        out = out + F.when(vote > 0, F.lit(1 << k)).otherwise(0).cast("long")
    return out


def simhash16(col: str | Column = "text") -> Column:
    return simhash(col, bits=16)
