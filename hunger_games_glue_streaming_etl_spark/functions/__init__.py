from .text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    lang_id,
    normalized_text,
    portable_hash64,
    quality_score,
    shingles,
    simhash,
    simhash16,
    stopword_lang_scores,
    token_count,
    tokens,
)

__all__ = [
    "LANG_MARKERS",
    "bpe_ish_token_count",
    "lang_id",
    "normalized_text",
    "portable_hash64",
    "quality_score",
    "shingles",
    "simhash",
    "simhash16",
    "stopword_lang_scores",
    "token_count",
    "tokens",
]
