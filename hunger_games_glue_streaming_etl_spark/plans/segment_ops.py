"""Fixed-width segment dedup — the repeated-passage detector a C4 /
MassiveText-style corpus scrub runs: chunk every document's token stream
into fixed 16-token segments, hash each, and find segments occurring more
than once anywhere in the corpus (keep-first-occurrence semantics).

The fixtures have no natural line/paragraph breaks (pure word streams),
so the segmentation unit is a fixed token width — the same shape the
ExactSubstr family reduces to when passages are aligned, and exactly what
the planted near-dup docs exercise (a copied document shares every
segment with its source, so the gate can never be vacuous; verified 74
duplicated segments at sf0.001, 69 at sf0.01).

Scale posture: segments are hashed map-side (the 48-bit portable hash —
segment TEXT never crosses a shuffle); occurrence counts and the
keep-first rule are ONE shuffle on the compact hash (window count +
row_number over the same partitioning); the per-doc rollup is a second
shuffle on doc_id.  Raising the segment width trades recall for fewer
rows — the knob is a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, tokens
from ..sources.batch import load_table
from .llm_pipeline import _phash_sql
from .registry import register
from .text_ops import _TOKS

SEGMENT_TOKENS = 16

_SEG_EXPR = (
    f"array_to_string(list_slice(w, s*{SEGMENT_TOKENS}+1, "
    f"s*{SEGMENT_TOKENS}+{SEGMENT_TOKENS}), ' ')"
)

# doc_id, seg_idx, seg_len, gh for every fixed-width segment
_SEGS_SQL = f"""
    words AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    segs AS (
        SELECT doc_id, CAST(s AS INT) AS seg_idx,
               CAST(len(list_slice(w, s*{SEGMENT_TOKENS}+1,
                                   s*{SEGMENT_TOKENS}+{SEGMENT_TOKENS}))
                    AS INT) AS seg_len,
               {_phash_sql(_SEG_EXPR)} AS gh
        FROM words,
             unnest(range(0, GREATEST(CAST(ceil(len(w)/{SEGMENT_TOKENS}.0)
                                           AS BIGINT), 1))) t(s)
    )
"""


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg_idx, seg_len, gh) — text hashed away before any
    shuffle.  The token array is exploded per segment index map-side; the
    slice evaluates once per output row (no per-element lambda, so the
    O(n²) transform re-evaluation trap doesn't apply)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w"))
    n_segs = F.greatest(
        F.ceil(F.size("w") / SEGMENT_TOKENS).cast("long"), F.lit(1)
    )
    exploded = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), (n_segs - 1).cast("int"))).alias("seg_idx"),
    )
    seg = F.slice("w", F.col("seg_idx") * SEGMENT_TOKENS + 1, SEGMENT_TOKENS)
    return exploded.select(
        "doc_id",
        "seg_idx",
        F.size(seg).cast("int").alias("seg_len"),
        portable_hash64(F.concat_ws(" ", seg)).alias("gh"),
    )


@register(
    "text_duplicate_segments",
    oracle=f"""
    WITH {_SEGS_SQL}
    SELECT gh AS seg_hash,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM segs
    GROUP BY gh
    HAVING COUNT(*) > 1
    """,
)
def text_duplicate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's repeated passages: every 16-token segment occurring
    more than once, with total and distinct-document occurrence counts —
    the removal list a passage-dedup pass applies."""
    segs = _segments(spark, sf_dir)
    return (
        segs.groupBy(F.col("gh").alias("seg_hash"))
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_total") > 1)
    )


@register(
    "text_segment_dedup_stats",
    oracle=f"""
    WITH {_SEGS_SQL},
    marked AS (
        SELECT doc_id, seg_len,
               COUNT(*) OVER (PARTITION BY gh) AS n_occ,
               ROW_NUMBER() OVER (
                   PARTITION BY gh ORDER BY doc_id, seg_idx
               ) AS rn
        FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn = 1 THEN seg_len ELSE 0 END) AS BIGINT)
               AS tokens_kept
    FROM marked
    GROUP BY doc_id
    """,
)
def text_segment_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document passage-dedup outcome under keep-FIRST-occurrence
    semantics (first = smallest (doc_id, seg_idx), the deterministic C4
    convention): how many of the doc's segments are corpus-duplicated,
    how many survive, and the surviving token count — the numbers that
    decide whether a doc is worth keeping after passage removal."""
    segs = _segments(spark, sf_dir)
    w_cnt = Window.partitionBy("gh")
    w_rn = Window.partitionBy("gh").orderBy("doc_id", "seg_idx")
    marked = segs.select(
        "doc_id",
        "seg_len",
        F.count("*").over(w_cnt).alias("n_occ"),
        F.row_number().over(w_rn).alias("rn"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") == 1, F.col("seg_len")).otherwise(0)).alias(
            "tokens_kept"
        ),
    )
