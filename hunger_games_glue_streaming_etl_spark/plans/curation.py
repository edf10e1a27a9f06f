"""End-to-end corpus-curation pipeline as ONE checked contract query —
the composition the LLM-data operators exist for: quality gate → exact
dedup (keep the canonical copy) → near-dup removal (drop the later of
each verified Jaccard pair).  Each stage reuses the already-verified
operator, and the oracle reproduces the full three-stage flow in SQL, so
the COMPOSITION is hash-checked, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
