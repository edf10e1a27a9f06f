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


# ---------------------------------------------------------------------------
# UNALIGNED repeated-passage detection (VERDICT r12 next #1 — the ExactSubstr
# shape).  The fixed-grid entries above hash segments at positions 0, 16,
# 32, …, so a passage copied at an offset not ≡ 0 (mod 16) shares NO segment
# with its source and is invisible — the planted test
# ``test_unaligned_copy_invisible_to_aligned_segments`` proves it.  The fix is
# the suffix-array family's practical reduction: hash EVERY stride-1 rolling
# K-token window (so a copy at any offset shares all interior window hashes),
# then winnow (per-W-window minimum, positions kept) so each document
# contributes ~2 rows per W-window instead of one per token — the
# Schleimer/Wilkerson/Aiken density bound.  Winnowing guarantee: any shared
# run of ≥ K+W−1 tokens shares at least one selected ANCHOR HASH, regardless
# of alignment.  Scale shape: grams are hashed map-side (48-bit portable
# hash — passage text never crosses a shuffle); the anchor aggregate is ONE
# shuffle on the compact hash; per-doc rollups shuffle doc_id longs.
# ---------------------------------------------------------------------------

ROLL_TOKENS = 16  # rolling window width (tokens) — matches SEGMENT_TOKENS
WINNOW_W = 8  # winnowing window (grams): guarantee run length = 16+8-1 = 23

_ROLL_GRAM = "concat_ws(' ', " + ", ".join(
    f"w[i+{off}]" for off in range(ROLL_TOKENS)
) + ")"

# doc_id, pos (1-based gram position), gh for every winnowing-selected anchor
_ANCHORS_SQL = f"""
    words AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    hsx AS (
        SELECT doc_id,
               list_transform(
                   range(1, GREATEST(len(w) - {ROLL_TOKENS} + 1, 1) + 1),
                   i -> {_phash_sql(_ROLL_GRAM)}) AS hs
        FROM words
    ),
    sel AS (
        SELECT doc_id, hs,
               unnest(list_distinct(list_transform(
                   range(1, GREATEST(len(hs) - {WINNOW_W} + 1, 1) + 1),
                   j -> CAST(j - 1 + list_position(hs[j:j+{WINNOW_W - 1}],
                                 list_min(hs[j:j+{WINNOW_W - 1}])) AS BIGINT))))
                   AS pos
        FROM hsx
    ),
    anch AS (SELECT doc_id, pos, hs[pos] AS gh FROM sel)
"""


def _anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gh) winnowing anchors over stride-1 rolling
    ROLL_TOKENS-grams.  Two pinned stages (the mandatory O(n²)-avoidance
    barriers — see functions/text.py): tokens, then gram hashes; the
    anchor-position selection reads the hash array as a plain attribute,
    so each window costs O(W) slices, not re-hashing."""
    from ..caching import pin
    from ..functions.text import (
        winnowing_anchor_positions,
        winnowing_gram_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = pin(docs.select("doc_id", tokens("text").alias("__w")))
    hashed = pin(
        toks.select(
            "doc_id",
            winnowing_gram_hashes(F.col("__w"), k=ROLL_TOKENS).alias("__hs"),
        )
    )
    # map positions → (pos, hash) structs BEFORE the explode: exploded rows
    # carry 16 bytes each instead of the whole per-doc hash array (the r12
    # token-budget rule — generator output must not copy O(doc) payload per
    # row).  __hs is a pinned plain attribute, so element_at inside the
    # transform is an O(1) read, not a re-evaluated expression.
    anchor_structs = F.transform(
        winnowing_anchor_positions(F.col("__hs"), window=WINNOW_W),
        lambda p: F.struct(
            p.alias("pos"),
            F.element_at(F.col("__hs"), p.cast("int")).alias("gh"),
        ),
    )
    return hashed.select(
        "doc_id", F.explode(anchor_structs).alias("__a")
    ).select("doc_id", F.col("__a.pos").alias("pos"), F.col("__a.gh").alias("gh"))


@register(
    "text_duplicate_passages_unaligned",
    oracle=f"""
    WITH {_ANCHORS_SQL},
    grp AS (
        SELECT gh, doc_id, pos,
               MIN(doc_id) OVER (PARTITION BY gh) AS fd
        FROM anch
    )
    SELECT gh AS anchor_hash,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(MIN(CASE WHEN doc_id = fd THEN pos END) AS BIGINT) AS first_pos
    FROM grp
    GROUP BY gh
    HAVING COUNT(*) > 1
    """,
)
def text_duplicate_passages_unaligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated passages at ANY alignment: every winnowing anchor hash
    selected at more than one (doc, position) — the removal list an
    ExactSubstr-style corpus scrub applies, with keep-first attribution
    (the smallest (doc_id, pos) owner).  A passage copied at offset +7
    tokens — invisible to ``text_duplicate_segments``'s fixed 16-token
    grid — shares every interior rolling gram with its source, and
    winnowing selects at least one common anchor per ≥23-token shared
    run (guarantee pinned in tests/test_passage_unaligned.py)."""
    anch = _anchors(spark, sf_dir)
    w_first = Window.partitionBy("gh")
    grp = anch.select(
        "gh", "doc_id", "pos", F.min("doc_id").over(w_first).alias("fd")
    )
    return (
        grp.groupBy(F.col("gh").alias("anchor_hash"))
        .agg(
            F.count("*").alias("n_anchors"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.min(F.when(F.col("doc_id") == F.col("fd"), F.col("pos")))
            .cast("long")
            .alias("first_pos"),
        )
        .filter(F.col("n_anchors") > 1)
    )


@register(
    "text_passage_dedup_unaligned_stats",
    oracle=f"""
    WITH {_ANCHORS_SQL},
    marked AS (
        SELECT doc_id,
               COUNT(*) OVER (PARTITION BY gh) AS n_occ,
               ROW_NUMBER() OVER (
                   PARTITION BY gh ORDER BY doc_id, pos
               ) AS rn
        FROM anch
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_anchors,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM marked
    GROUP BY doc_id
    """,
)
def text_passage_dedup_unaligned_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unaligned-passage outcome under keep-FIRST semantics
    (first = smallest (doc_id, pos), same convention as the aligned
    entry): how many of the doc's anchors are corpus-duplicated and how
    many it owns as first occurrences — the per-doc score an ExactSubstr
    scrub thresholds on (a doc whose anchors are mostly non-first is
    mostly copied text).  Covers every document (singleton anchors count
    as kept), so the entry can never be vacuous."""
    anch = _anchors(spark, sf_dir)
    w_cnt = Window.partitionBy("gh")
    w_rn = Window.partitionBy("gh").orderBy("doc_id", "pos")
    marked = anch.select(
        "doc_id",
        F.count("*").over(w_cnt).alias("n_occ"),
        F.row_number().over(w_rn).alias("rn"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_anchors"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_anchors"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
    )


# Shared gaps-and-islands chain over the duplicated anchors (rn > 1 =
# non-first occurrences, each claiming its ROLL_TOKENS-token gram span;
# overlapping/adjacent spans coalesce).  Reused by the scrub-plan entry and
# the scrub-APPLY entry so range definitions cannot diverge between them.
_SCRUB_CTES = f"""
    marked AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY gh ORDER BY doc_id, pos
               ) AS rn
        FROM anch
    ),
    dup AS (
        SELECT doc_id, pos, pos + {ROLL_TOKENS} - 1 AS e
        FROM marked WHERE rn > 1
    ),
    flagged AS (
        SELECT doc_id, pos, e,
               CASE WHEN pos > COALESCE(MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                    THEN 1 ELSE 0 END AS isl_start
        FROM dup
    ),
    islands AS (
        SELECT doc_id, pos, e,
               SUM(isl_start) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS isl
        FROM flagged
    )
"""


def _scrub_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, range_id, range_start, range_end, range_len) — the merged
    token-range removal intervals, Spark twin of ``_SCRUB_CTES``."""
    anch = _anchors(spark, sf_dir)
    w_rn = Window.partitionBy("gh").orderBy("doc_id", "pos")
    dup = (
        anch.select(
            "doc_id", "pos", F.row_number().over(w_rn).alias("rn")
        )
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos", (F.col("pos") + ROLL_TOKENS - 1).alias("e"))
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.select(
        "doc_id",
        "pos",
        "e",
        F.when(
            F.col("pos")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("isl_start"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "doc_id", "pos", "e", F.sum("isl_start").over(w_run).alias("isl")
    )
    return islands.groupBy(
        "doc_id", F.col("isl").cast("long").alias("range_id")
    ).agg(
        F.min("pos").alias("range_start"),
        F.max("e").alias("range_end"),
        (F.max("e") - F.min("pos") + 1).alias("range_len"),
    )


@register(
    "text_passage_scrub_ranges",
    oracle=f"""
    WITH {_ANCHORS_SQL},
    {_SCRUB_CTES}
    SELECT doc_id, CAST(isl AS BIGINT) AS range_id,
           MIN(pos) AS range_start, MAX(e) AS range_end,
           MAX(e) - MIN(pos) + 1 AS range_len
    FROM islands GROUP BY doc_id, isl
    """,
)
def text_passage_scrub_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub PLAN the unaligned detector exists to produce: per
    document, the merged token ranges to delete — every non-first
    duplicated anchor claims its 16-token gram span, and overlapping or
    adjacent spans coalesce into maximal ranges (gaps-and-islands: an
    island starts where a span's start exceeds the running max end + 1).
    One row per (doc, range) with start/end/length in token positions —
    what a rewrite pass applies verbatim.  All-integer arithmetic over
    the anchor rows, two same-key window passes (doc_id partitioning),
    hash-exact cross-engine.  Keep-first means the first occurrence of
    every passage survives scrubbing somewhere in the corpus."""
    return _scrub_ranges(spark, sf_dir)


@register(
    "text_passage_scrub_apply",
    oracle=f"""
    WITH {_ANCHORS_SQL},
    {_SCRUB_CTES},
    ranges AS (
        SELECT doc_id, MIN(pos) AS s, MAX(e) AS e
        FROM islands GROUP BY doc_id, isl
    ),
    rlist AS (
        SELECT doc_id, list({{'s': s, 'e': e}}) AS rs
        FROM ranges GROUP BY doc_id
    ),
    appl AS (
        SELECT w.doc_id, w.w,
               COALESCE(r.rs, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS rs
        FROM words w LEFT JOIN rlist r USING (doc_id)
    ),
    kept AS (
        SELECT doc_id, w,
               list_filter(range(1, len(w) + 1),
                   i -> len(list_filter(rs,
                            r -> i >= r.s AND i <= r.e)) = 0) AS ki
        FROM appl
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(w) - len(ki) AS BIGINT) AS n_removed,
           array_to_string(list_transform(ki, i -> w[i]), ' ')
               AS scrubbed_text
    FROM kept
    """,
)
def text_passage_scrub_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the scrub plan: the REWRITTEN corpus after unaligned
    passage removal — per document the tokens outside every removal
    range, rejoined in order, plus the token accounting.  This is the
    deliverable of the ExactSubstr family (the deduplicated corpus a
    training run actually reads), hash-exact including the full scrubbed
    text.

    Scale shape: the ranges table is tiny (one row per merged removal
    interval), so it aggregates to a per-doc struct array and joins back
    on doc_id longs; the rewrite itself is MAP-SIDE array arithmetic —
    token membership tests against the doc's few ranges via nested HOF
    lambdas, document text never crossing a shuffle.  The token array is
    pinned before the HOFs (the mandatory O(n²)-avoidance barrier), so
    ``element_at`` reads are O(1) attribute lookups.  Every document
    appears in the output (docs without removals pass through verbatim),
    so the entry can never be vacuous; planted removals are pinned in
    tests/test_passage_unaligned.py."""
    from ..caching import pin

    docs = load_table(spark, sf_dir, "documents")
    toks = pin(docs.select("doc_id", tokens("text").alias("__w")))
    rs = _scrub_ranges(spark, sf_dir).groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("range_start").cast("long").alias("s"),
                F.col("range_end").cast("long").alias("e"),
            )
        ).alias("__rs")
    )
    joined = toks.join(rs, "doc_id", "left").select(
        "doc_id",
        "__w",
        F.coalesce(
            F.col("__rs"),
            F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)"),
        ).alias("__rs"),
    )
    kept = F.filter(
        F.sequence(F.lit(1).cast("long"), F.size("__w").cast("long")),
        lambda i: ~F.exists(
            F.col("__rs"), lambda r: (i >= r["s"]) & (i <= r["e"])
        ),
    )
    return joined.select(
        "doc_id",
        F.size("__w").cast("long").alias("n_tokens"),
        (F.size("__w") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                kept, lambda i: F.element_at(F.col("__w"), i.cast("int"))
            ),
        ).alias("scrubbed_text"),
    )
