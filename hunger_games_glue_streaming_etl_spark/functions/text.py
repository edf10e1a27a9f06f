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
    single shingle so they still participate.

    Built by zipping the token array with its own k−1 shifted slices —
    ``element_at`` inside a ``transform`` lambda would re-evaluate the
    ``split`` per element access (measured ~40× slower at 300 tokens/doc).
    ``zip_with`` pads the shorter (shifted) side with null, so the k−1
    trailing partial shingles become null and are compacted away, leaving
    exactly size−k+1 full k-grams — identical to the index-based form.
    """
    w = tokens(col)
    zipped = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        zipped = F.zip_with(zipped, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    full = F.array_compact(zipped)
    return F.array_distinct(
        F.when(F.size(w) < k, F.array(F.array_join(w, " "))).otherwise(full)
    )


def grams(col: str | Column = "text", k: int = 2) -> Column:
    """Word-level k-grams WITH multiplicity (array<string>) — the unit for
    repetition analysis, where ``shingles``'s ``array_distinct`` would
    erase exactly the signal being measured.  Same zip-shift construction
    (no per-element ``element_at`` re-evaluation); docs shorter than k
    words yield an empty array."""
    w = tokens(col)
    zipped = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        zipped = F.zip_with(zipped, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_compact(zipped)


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """48-bit integer hash identical in Spark and DuckDB (md5-hex prefix).
    ``seed`` derives independent hash families for MinHash."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 12), 16, 10
    ).cast("long")


# Universal-hash family over one base hash: h_i(x) = (a_i·(h(x) mod p) + b_i) mod p.
# One md5 per value instead of one per family — the md5 is the expensive
# step; the affine maps are integer ops.  p = 2^31−1 (Mersenne prime) keeps
# every product under 2^62: no BIGINT overflow in either engine (Spark wraps
# silently, DuckDB raises — neither is acceptable).
MINHASH_PRIME = 2_147_483_647


def hash_family_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for family i; a_i ∈ [1, p)."""
    a = (1_000_003 * i + 12_345) % (MINHASH_PRIME - 1) + 1
    b = (7_919 * i + 104_729) % MINHASH_PRIME
    return a, b


def universal_hash(base: Column, i: int) -> Column:
    a, b = hash_family_params(i)
    return (F.lit(a) * (base % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME


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


def simhash_word_hashes(col: str | Column = "text", bits: int = 64) -> Column:
    """Per-token hash material for SimHash: array (one element per token)
    of ``(bits+31)//32``-long arrays — token's seed-w portable hash for
    w = 0..n_words−1.  Kept JVM-side (md5 is codegen'd); the vote fold
    over this column is the part worth moving to an Arrow kernel
    (``operators.dedup.simhash_fingerprints``) — per BASELINE.md the
    64-wide ``zip_with`` fold is codegen-bound, not hash-bound."""
    n_words = (bits + 31) // 32
    return F.transform(
        tokens(col),
        lambda t: F.array(*[portable_hash64(t, seed=w) for w in range(n_words)]),
    )


def simhash(col: str | Column = "text", bits: int = 64) -> Column:
    """SimHash over whitespace tokens (portable-hash bit votes).

    For each bit k: sum ±1 votes across tokens (positive when bit k of the
    token's hash material is set); the sign of the sum sets bit k of the
    fingerprint.  Up to 64 bits: ``portable_hash64`` yields 48 usable bits
    per seed, so bit k draws from bit (k mod 32) of the token's
    seed-(k//32) hash — every tested power stays ≤ 2^31 (no shift/FP edge
    cases) and both engines reproduce the words exactly.  Bit 63, when
    set, contributes the *negative* two's-complement term (−2^63): the
    fingerprint is the signed 64-bit value, identical in Spark and DuckDB
    BIGINTs, and XOR/bit_count Hamming math is unaffected by sign.  The
    production form is ``xxhash64`` — identical operator shape.
    """
    # hash each token ONCE per word (md5 is the expensive step), then fold:
    # one aggregate pass carrying all per-bit vote counters as an array
    # accumulator — not `bits` separate aggregates re-hashing tokens.  Bit
    # k is tested as floor(word / 2^(k mod 32)) % 2; the (word index,
    # test power) pairs ride a literal struct array zipped against the
    # accumulator, and `h[...]` indexes the lambda-bound word array (a
    # bound value, NOT a re-evaluated source expression).
    hashed = simhash_word_hashes(col, bits)
    test_info = F.array(
        *[
            F.struct(
                F.lit(k // 32 + 1).alias("w"),  # 1-based for element_at
                F.lit(1 << (k % 32)).cast("long").alias("p"),
            )
            for k in range(bits)
        ]
    )
    zero_votes = F.array_repeat(F.lit(0).cast("long"), bits)
    votes = F.aggregate(
        hashed,
        zero_votes,
        lambda acc, h: F.zip_with(
            test_info,
            acc,
            lambda ti, a: a
            + F.when(
                F.floor(F.element_at(h, ti["w"]) / ti["p"]).cast("long") % 2 == 1, 1
            ).otherwise(-1),
        ),
    )
    signed_terms = F.array(
        *[
            F.lit((1 << k) if k < 63 else -(1 << 63)).cast("long")
            for k in range(bits)
        ]
    )
    weighted = F.zip_with(
        signed_terms, votes, lambda s, v: F.when(v > 0, s).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash16(col: str | Column = "text") -> Column:
    return simhash(col, bits=16)


# Winnowing fingerprints (Schleimer/Wilkerson/Aiken) are split into two
# column stages that the caller MUST separate with a materialization
# barrier (persist/cache of the intermediate hash-array column):
# referencing the gram-hash transform inside the window-minimum lambda
# would re-evaluate ALL gram hashes per window (O(n²) md5 calls per
# document — measured 60× slower).  With the barrier, `slice` reads a
# plain array attribute and the pass is O(n · window).


def winnowing_gram_hashes(tokens_col: Column, k: int = 3) -> Column:
    """Stage 1: portable 48-bit hash of every ORDERED token k-gram of the
    (already-materialized) token array — array<long>, one element per
    position (unlike ``shingles``, order is kept and duplicates are not
    collapsed: winnowing needs the positional sequence).  ``F.get`` reads
    past-the-end positions as null and ``concat_ws`` drops them, so
    documents shorter than k tokens contribute their full text as the
    single gram.  Token grams (~hundreds/doc) rather than char grams
    (~thousands/doc) keep the md5 count per document small."""
    n_grams = F.greatest(F.size(tokens_col) - k + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: portable_hash64(
            F.concat_ws(
                " ", *[F.get(tokens_col, i + off - 1) for off in range(k)]
            )
        ),
    )


def winnowing_window_minima(hashes_col: Column, window: int = 8) -> Column:
    """Stage 2: the deduplicated minimum of each sliding ``window`` over
    the gram-hash array — the compact, position-robust fingerprint set
    whose overlap estimates document overlap even under reordering."""
    n_windows = F.greatest(F.size(hashes_col) - window + 1, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(hashes_col, j, window)),
        )
    )


def winnowing_anchor_positions(hashes_col: Column, window: int = 8) -> Column:
    """Stage 2 variant keeping POSITIONS, not just values: the distinct
    1-based gram positions winnowing selects — for window j the position
    of the window's minimum hash (leftmost on a hash tie, mirrored by
    DuckDB's ``list_position`` first-occurrence rule).  Positions are what
    the unaligned passage-dedup entries need for keep-first semantics:
    the anchor's HASH finds the shared passage at any alignment, the
    position says where in the document it sits.  ~2 anchors per window
    survive the distinct (the winnowing density bound), so rows stay
    O(n/window) per document.  Same O(n·window) cost discipline as
    ``winnowing_window_minima`` — the caller must pin ``hashes_col``'s
    frame first (see the barrier comment above)."""
    n_windows = F.greatest(F.size(hashes_col) - window + 1, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: (
                j
                - 1
                + F.array_position(
                    F.slice(hashes_col, j, window),
                    F.array_min(F.slice(hashes_col, j, window)),
                )
            ).cast("long"),
        )
    )


# ---- PII scrubbing ---------------------------------------------------------
#
# Regex-based detection/redaction of the classic PII shapes a pretraining
# corpus scrub removes.  The driver's synthetic corpus contains no PII, so
# these are NOT registered as contract queries (a zero-row/zero-count entry
# would be vacuous); behavior is pinned on a planted corpus in
# tests/test_llm_pipeline.py.  Patterns are deliberately conservative
# (precision over recall): a corpus scrub that eats prose is worse than one
# that misses an exotic phone format.

PII_PATTERNS: dict[str, str] = {
    # order matters for redaction: more specific shapes first so e.g. an
    # SSN isn't half-eaten by the phone pattern
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(col: str | Column = "text") -> dict[str, Column]:
    """Per-category PII match counts (detection / audit pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern in PII_PATTERNS.items()
    }


def redact_pii(col: str | Column = "text", replacement: str = "[PII]") -> Column:
    """Text with every PII match replaced by ``replacement`` — idempotent
    (the replacement token matches none of the patterns), pure column
    expression (codegen'd, map-side only at any scale)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, replacement)
    return c
