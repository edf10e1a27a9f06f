"""Deduplication operators for large-scale corpus curation: exact, MinHash
(+LSH banding), n-gram Jaccard, SimHash, embedding-cosine near-dup.

All set-oriented and partition-parallel — the 100 TB shape is:

* **exact**: hash the normalized text, groupBy the 48/64-bit fingerprint
  (one shuffle on a compact key, never on the text itself);
* **MinHash-LSH**: per-doc signature (narrow, no shuffle) → explode to
  (band, band_hash) → self-join on the band bucket (shuffle on band_hash —
  bucket sizes are the skew knob: more bands → smaller buckets) → exact
  Jaccard only on candidates (the O(n²) kill);
* **SimHash**: fingerprint per doc, candidates via banded equality on
  fingerprint chunks, Hamming verify;
* **embedding cosine**: brute force is O(n²) and exists as the correctness
  baseline; the scale path is LSH bucketing (see ``similarity.py``).

Hashes use ``functions.text.portable_hash64`` so the DuckDB oracle can
reproduce signatures bit-for-bit (swap for ``xxhash64`` off-oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import pin
from ..functions.text import (
    normalized_text,
    portable_hash64,
    shingles,
    simhash,
    simhash_word_hashes,
    universal_hash,
)

# alias for bodies whose ``shingles=`` parameter shadows the function
_shingle_strings = shingles

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row per
    document with its group's canonical (min) id and group size — the
    keep-one-per-group decision is a trivial filter on top."""
    fp = F.md5(normalized_text(text_col)).alias("fingerprint")
    with_fp = docs.select(F.col(id_col), fp)
    groups = with_fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").cast("long").alias("group_size"),
    )
    return with_fp.join(groups, "fingerprint").select(
        id_col, "fingerprint", "canonical_id", "group_size"
    )


def shingle_sets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded k-shingles as portable 48-bit HASHES —
    already distinct per doc as strings (``shingles`` applies
    array_distinct) before hashing, so no dedup shuffle here.

    Hashing before the explode leaves the executor means the Jaccard
    self-join and the DF-cap window shuffle 8-byte longs instead of
    ~20-byte shingle strings — the "text never shuffles" posture the rest
    of the dedup tier already keeps.  A 48-bit collision (P ≈ n²/2⁴⁹ per
    doc, ~1e-11 at fixture scale) would merge two shingles *identically in
    both engines* (the oracle hashes the same way), so the gate stays
    exact; production MinHash pipelines hash shingles anyway."""
    exploded = docs.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("__s")
    )
    return exploded.select(
        F.col(id_col), portable_hash64(F.col("__s")).alias("shingle")
    )


def minhash_wide(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Wide MinHash signatures: one row per doc, columns h0..h{n-1}.

    One explode + one hash-aggregate computes all ``num_hashes`` families in
    a single pass.  Each family is an affine universal hash over ONE shared
    md5 base hash per shingle (``functions.text.universal_hash``) — md5 is
    the expensive step, so this is ~num_hashes× cheaper than seeded
    rehashing, and still bit-reproducible in the DuckDB oracle.  The shuffle
    key is the doc id; payload is n×8 bytes.

    ``shingles`` supplies an already-built ``shingle_sets`` frame — its
    hash column is the SAME ``portable_hash64(shingle)`` this function
    computes, so a caller that needs the hashed shingles anyway
    (``minhash_lsh_pairs``'s exact-Jaccard verify) shares one
    explode+md5 pass with the signature aggregate (r16)."""
    if shingles is not None:
        sh = shingles.select(
            F.col(id_col), F.col("shingle").alias("base_hash")
        )
    else:
        sh = docs.select(
            F.col(id_col),
            F.explode(_shingle_strings(text_col, k)).alias("shingle"),
        ).select(
            F.col(id_col), portable_hash64(F.col("shingle")).alias("base_hash")
        )
    return sh.groupBy(id_col).agg(
        *[
            F.min(universal_hash(F.col("base_hash"), s)).alias(f"h{s}")
            for s in range(num_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """Long-form MinHash signatures (doc_id, seed, minhash) — the
    oracle-comparable view of ``minhash_wide`` (stack, no extra shuffle)."""
    wide = minhash_wide(docs, text_col, id_col, num_hashes, k)
    stack = ", ".join(f"{s}, h{s}" for s in range(num_hashes))
    return wide.selectExpr(
        id_col, f"stack({num_hashes}, {stack}) AS (seed, minhash)"
    ).select(id_col, F.col("seed").cast("int").alias("seed"), "minhash")


def minhash_oph_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = DEFAULT_NUM_HASHES,
    k: int = 3,
) -> DataFrame:
    """DENSIFIED ONE-PERMUTATION MinHash (Li/Owen/Zhang OPH + rotation
    densification) — the production-scale MinHash: instead of evaluating
    ``m`` hash families per shingle (``minhash_wide``), hash each shingle
    ONCE, route it to bin ``h % m``, and take the per-bin minimum — the
    per-shingle work drops from O(m) to O(1), which at 100 TB is the
    difference between the hash pass dominating the corpus scan or
    disappearing into it.  Collision probability per bin still estimates
    Jaccard (each bin is the min of a random 1/m slice of the union).

    Empty bins (docs with < m distinct shingles leave gaps) are DENSIFIED
    by rotation: bin j borrows the value of the nearest non-empty bin to
    its right (cyclically), offset-tagged with ``t·2^48`` so a borrow at
    distance t only collides with a borrow of the SAME source bin at the
    same distance — preserving the estimator's unbiasedness on sparse
    docs (Shrivastava & Li's rotation scheme).  Everything is integer
    arithmetic on the portable 48-bit hash, so signatures are
    bit-reproducible in the DuckDB oracle; magnitudes bounded by
    2^48 + 15·2^48 < 2^52.

    Returns long-form (doc_id, bin, sig).  Scale shape: one explode, one
    m-column min-aggregate keyed by doc id (map-side combinable), the
    densification is map-side coalesce arithmetic — same shuffle bytes
    as ``minhash_wide`` with 1/m of its hash compute."""
    borrow_step = 1 << 48  # > any 48-bit hash value: borrows never alias raws
    sh = shingle_sets(docs, text_col, id_col, k)
    binned = sh.groupBy(id_col).agg(
        *[
            F.min(
                F.when(F.pmod(F.col("shingle"), F.lit(m)) == b, F.col("shingle"))
            ).alias(f"m{b}")
            for b in range(m)
        ]
    )
    dense = binned.select(
        F.col(id_col),
        *[
            F.coalesce(
                *[
                    F.col(f"m{(b + t) % m}") + F.lit(t * borrow_step)
                    for t in range(m)
                ]
            ).alias(f"s{b}")
            for b in range(m)
        ],
    )
    stack = ", ".join(f"{b}, s{b}" for b in range(m))
    return dense.selectExpr(
        id_col, f"stack({m}, {stack}) AS (bin, sig)"
    ).select(F.col(id_col), F.col("bin").cast("int").alias("bin"), "sig")


def minhash_band_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, band_hash): each band hashes r = num_hashes/bands
    adjacent signature values.  Docs sharing any (band, band_hash) are LSH
    candidates; more bands → higher recall and smaller buckets."""
    r = num_hashes // bands
    wide = minhash_wide(docs, text_col, id_col, num_hashes, k, shingles=shingles)
    # explode an inline array of (band, band_hash) structs — one pass over
    # the wide signatures, no union re-computing the aggregate per band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(",", *[F.col(f"h{b * r + i}") for i in range(r)])
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return wide.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    bucket_cap: int | None = None,
    bucket_cap_dial: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates → exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    The exact-Jaccard join runs only on LSH candidates — at 100 TB the band
    join is the only quadratic-risk step and its bucket sizes are tuned by
    the bands/rows split.

    ``bucket_cap=c`` is the scale guard for that step, symmetric to
    ``ngram_jaccard_pairs``'s ``df_cap``: band buckets larger than c are
    excluded from candidate generation, bounding any bucket's join
    contribution at c² rows.  A near-dup group of multiplicity m fills
    its buckets to size ~m, so the loss mode is the same documented
    cliff — groups with m > c vanish (pinned in
    ``test_minhash_lsh_bucket_cap_recall_cliff``).  Unlike ``df_cap``
    there is no correction arm (a dropped bucket's candidates are never
    seen), so size c above the duplication profile's group sizes;
    identical-text mega-groups are the exact-hash tier's job upstream
    (``pipeline_near_dedup`` runs it first).

    ``bucket_cap_dial`` (mutually exclusive with ``bucket_cap``) rides the
    cap in as a 1-row corpus-derived broadcast — ``derived_df_cap`` works
    here too, because a band bucket's size IS duplicate-group
    multiplicity (a group of m near-identical docs fills its buckets to
    ~m), the same quantity the DF-histogram quantile tracks.
    """
    if bucket_cap is not None and bucket_cap_dial is not None:
        raise ValueError(
            "bucket_cap and bucket_cap_dial are mutually exclusive"
        )
    # persist: both sides of the self-join (and nothing upstream) read the
    # computed buckets — without it the signature aggregation runs twice
    # (r15 A/B note: an eager localCheckpoint here + in the verify's
    # shingle frame, for the cluster-loop callers, measured a WASH
    # isolated-warm — the edge checkpoint downstream already materializes
    # this pipeline once, so the lazy pin isn't double-executing; kept
    # declarative per the r4 measure-first rule.)
    # ONE hashed-shingle frame for the band signatures AND the exact
    # verify (r16): the two explode+md5 passes were value-identical —
    # sharing the pin halves the corpus hash work; the bucket stages
    # execute before the verify stages in the final action, so the cache
    # fills during the signature aggregate and the verify reads it.
    sh = pin(shingle_sets(docs, text_col, id_col, k))
    buckets = pin(
        minhash_band_buckets(
            docs, text_col, id_col, num_hashes, bands, k, shingles=sh
        )
    )
    if bucket_cap is not None or bucket_cap_dial is not None:
        from pyspark.sql import Window

        # bucket size via a window over the SAME (band, band_hash)
        # partitioning the self-join shuffles on — ReuseExchange shares it
        w_b = Window.partitionBy("band", "band_hash")
        buckets = buckets.withColumn("__bsz", F.count("*").over(w_b))
        if bucket_cap_dial is not None:
            buckets = buckets.crossJoin(F.broadcast(bucket_cap_dial))
            cap_pred = F.col("__cap")
        else:
            cap_pred = F.lit(bucket_cap)
        buckets = buckets.filter(F.col("__bsz") <= cap_pred).drop(
            "__bsz", "__cap"
        )
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _jaccard_verify_candidates(
        docs, candidates, text_col, id_col, k, shingles=sh
    ).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def derived_df_cap(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    floor: int = 64,
    quantile_permille: int = 990,
    mult: int = 4,
) -> DataFrame:
    """Corpus-derived hot-shingle cap as ONE broadcastable row (VERDICT
    r11 next #4 — "size df_cap from the DF histogram, not a fixed
    constant", now code):

        cap = GREATEST(floor, mult · k̂),   k̂ = p99 of the shingle-DF
                                             histogram (discrete rank)

    Why this fixes the fixed cap's recall cliff: a duplicate group of
    multiplicity m shares every shingle at DF ≥ m, so a cap below the
    corpus's duplication level hides whole groups (the pinned
    ``test_ngram_jaccard_df_cap_recall_cliff``).  Replicating a corpus
    k× multiplies the bulk of the DF distribution by k, so a
    DF-histogram quantile TRACKS the duplication profile — the cap
    scales with the corpus's actual duplication where a constant
    cannot, while ``mult`` keeps headroom above k̂ for groups hotter
    than the quantile.  The floor preserves the fixed cap's behavior on
    low-duplication corpora (at fixture scale the dial evaluates to the
    old 64 exactly, so parity with the fixed-cap entry is by
    construction).

    Cost/scale shape: the DF aggregate rides the same shuffle-by-shingle
    the Jaccard self-join needs anyway; the HISTOGRAM (DF value →
    shingle count) is bounded by the distinct DF values — ≤ max-DF rows
    regardless of corpus size — so the rank-selection window is
    metadata-scale, and the result is a 1-row broadcast dial (the
    shuffle-shard-dial pattern).  Exact integer arithmetic end to end:
    both engines rebuild the identical cap, so entries exposing it stay
    hash-checked."""
    return _derived_cap_from_shingles(
        shingle_sets(docs, text_col, id_col, k), floor, quantile_permille, mult
    )


def _derived_cap_from_shingles(
    sh: DataFrame,
    floor: int = 64,
    quantile_permille: int = 990,
    mult: int = 4,
) -> DataFrame:
    """``derived_df_cap`` over an existing (id, shingle) frame — lets a
    caller that already pinned its shingles (``ngram_jaccard_pairs``)
    build the dial from the cache instead of re-exploding the corpus."""
    return _derived_cap_from_df_counts(
        sh.groupBy("shingle").agg(F.count("*").alias("__df")),
        floor,
        quantile_permille,
        mult,
    )


def _derived_cap_from_df_counts(
    dfh: DataFrame,
    floor: int = 64,
    quantile_permille: int = 990,
    mult: int = 4,
) -> DataFrame:
    """The dial's histogram + discrete-rank selection over an existing
    per-shingle document-frequency frame (one ``__df`` column) — lets a
    caller that already aggregated DF (``family_screen_profile``) build
    the dial without a second groupBy-shingle pass."""
    from pyspark.sql import Window

    hist = dfh.groupBy("__df").agg(F.count("*").alias("__n"))
    w_run = (
        Window.partitionBy()
        .orderBy("__df")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "__df",
        F.sum("__n").over(w_run).alias("__running"),
        F.sum("__n").over(Window.partitionBy()).alias("__total"),
    )
    rank = F.expr(f"({quantile_permille} * __total + 999) div 1000")
    return cum.agg(
        F.greatest(
            F.lit(floor).cast("long"),
            F.lit(mult)
            * F.min(F.when(F.col("__running") >= rank, F.col("__df"))),
        ).alias("__cap")
    )


# candidate-volume routing threshold for the family screen (VERDICT r14
# next #3): route to the sparse chain generator when the derived-cap
# screen's EXACT candidate count exceeds this many pairs per document.
# Measured ratios on the replica fixtures (cand_est // n_docs): sf0.001=29,
# sf0.01=27, sf0.1=253 (dense, 4.0x margin), 2x=533, 5x=1372, 10x=2768,
# 20x=5560 (sparse, 5.4x margin) — the ratio tracks the duplication
# multiple ~linearly, so the oracle-checked natural scales stay dense and
# the quadratic-cost notches route sparse.  Either branch is CORRECT at
# any scale (the oracle replays the same route from the same histogram),
# so the threshold is a cost dial, not a correctness boundary.
FAMILY_ROUTE_CAND_PER_DOC = 1024


def family_screen_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Duplication profile of the derived-cap screen as ONE row
    ``(cand_est, n_docs)``: ``cand_est`` is the screen's exact
    within-bucket candidate-pair count Σ df·(df−1)/2 over shingles with
    DF ≤ the derived cap — the quadratic cost the dense screen would
    actually pay — and ``n_docs`` the corpus size.  The family entry
    routes to the sparse chain generator when
    ``cand_est > FAMILY_ROUTE_CAND_PER_DOC · n_docs``.

    Integer arithmetic end to end so DuckDB rebuilds the identical
    profile.  Overflow budget (the round-6 bound-at-target-scale rule):
    Σ df(df−1)/2 ≤ df_cap/2 · Σdf ≤ df_cap/2 · total_shingle_rows, so a
    100 TB corpus (~10^12 shingle rows) with df_cap ~10^4 sums to
    ~5·10^15 — ~1800× headroom under 2^63.  The DF aggregate rides the
    same shuffle-by-shingle the screen needs anyway, and the pinned
    shingle frame is plan-identical to the screen's own, so the
    profile's materializing action fills the cache the chosen branch
    then reads.

    Pass ``shingles`` to profile an already-pinned (id, shingle) frame —
    the family entry builds the shingle frame ONCE and shares it between
    this profile and whichever screen branch the route picks (r16: the
    un-shared form re-aggregated the DF histogram and re-derived the
    dial inside the dense branch, +51% at sf0.1).  The per-shingle DF
    aggregate is pinned and consumed by BOTH the dial's histogram and
    the candidate estimate, so one groupBy-shingle pass serves both; the
    derived cap rides out as a ``df_cap`` column so the caller can hand
    the routed branch the literal value instead of re-deriving the dial
    (same value by construction — the dial is a deterministic function
    of the DF histogram)."""
    sh = (
        shingles
        if shingles is not None
        else pin(shingle_sets(docs, text_col, id_col, k))
    )
    dfh = pin(sh.groupBy("shingle").agg(F.count("*").alias("__df")))
    dial = _derived_cap_from_df_counts(dfh)
    est = (
        dfh.crossJoin(F.broadcast(dial))
        .filter(F.col("__df") <= F.col("__cap"))
        .agg(
            F.sum(F.expr("__df * (__df - 1) div 2"))
            .cast("long")
            .alias("cand_est"),
            F.max("__cap").alias("df_cap"),
        )
    )
    return est.crossJoin(docs.agg(F.count("*").alias("n_docs")))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    k: int = 3,
    df_cap: int | None = None,
    df_cap_dial: DataFrame | str | None = None,
    expose_cap: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via the shared-shingle join.
    Correctness baseline for ``minhash_lsh_pairs``.

    ``df_cap=None`` is the fully exact form: candidates are every pair
    sharing ≥1 shingle, and the shared-shingle join streams straight into
    the (id_a, id_b) count aggregate — quadratic in the per-shingle bucket
    size (one stopword-like shingle shared by f docs creates f² join rows).

    ``df_cap=c`` is the hot-shingle-guarded form for scale: shingles with
    document frequency > c are excluded from *candidate generation* (their
    join contribution is bounded by c² rows), then every candidate's
    Jaccard is recomputed exactly over ALL its shingles — so reported
    values are identical to the exact form; the only possible difference
    is a missed pair whose every shared shingle is hotter than the cap,
    which at any useful threshold is a pair dominated by boilerplate —
    OR a duplicate group whose multiplicity exceeds the cap (all its
    shared shingles have DF = group size).  Size the cap above the
    duplication profile's group sizes; the cliff and its recovery are
    pinned in ``test_ngram_jaccard_df_cap_recall_cliff_at_group_
    multiplicity`` and measured at 20× replication in BASELINE.md's
    round-11 sweep (candidate volume is non-monotone in replication k:
    surviving shingles need base-DF ≤ cap/k).  Mega-groups beyond any
    affordable cap belong to the exact-hash and MinHash-LSH tiers.

    ``df_cap_dial`` (mutually exclusive with ``df_cap``) takes the cap as
    a 1-row corpus-derived DataFrame (``derived_df_cap``) riding in on a
    broadcast — the cap then tracks the corpus duplication profile
    instead of being frozen at deploy time (the r11 20× finding).  Pass
    the string ``"derived"`` to build that dial from THIS call's pinned
    shingle frame (one corpus explode total, not two); ``expose_cap``
    appends the dial value as a ``df_cap`` column for hash-checking.

    ``shingles`` supplies an already-pinned (id, shingle) frame so a
    caller that has profiled the corpus (``family_screen_profile``) can
    share one explode+hash pass with the screen instead of rebuilding a
    plan-identical frame (r16).
    """
    if df_cap is not None and df_cap_dial is not None:
        raise ValueError("df_cap and df_cap_dial are mutually exclusive")
    # pin: the exploded shingles feed both self-join sides + the sizes agg
    sh = (
        shingles
        if shingles is not None
        else pin(shingle_sets(docs, text_col, id_col, k))
    )
    if isinstance(df_cap_dial, str):
        if df_cap_dial != "derived":
            raise ValueError(f"unknown df_cap_dial: {df_cap_dial!r}")
        df_cap_dial = _derived_cap_from_shingles(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if df_cap is not None or df_cap_dial is not None:
        from pyspark.sql import Window

        # per-shingle document frequency via a window over the SAME
        # shuffle-by-shingle the self-join needs — no extra aggregation
        # job, no broadcast collect; the plan stays one lazy DAG and
        # Spark's ReuseExchange shares the shuffle between the join sides
        w_sh = Window.partitionBy("shingle")
        sh_df = sh.withColumn("__df", F.count("*").over(w_sh))
        if df_cap_dial is not None:
            # corpus-derived cap: ride the 1-row dial in as a broadcast
            # (`derived_df_cap`) — the lazy crossJoin keeps the whole
            # plan one DAG, like the shuffle-shard dials
            sh_df = sh_df.crossJoin(F.broadcast(df_cap_dial))
            cap_pred = F.col("__cap")
        else:
            cap_pred = F.lit(df_cap)
        # (drop is lenient about absent columns — __cap exists only on
        # the dial path)
        sh_rare = sh_df.filter(F.col("__df") <= cap_pred).drop("__df", "__cap")
        # same single-pass join→count as the exact form, minus hot
        # shingles: per-shingle contribution is bounded at df_cap²
        shared_rare = (
            sh_rare.select(F.col(id_col).alias("id_a"), "shingle")
            .join(sh_rare.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("__shared_rare"))
        )
        # pin: feeds both the hot correction and the final merge
        shared_rare = pin(shared_rare)
        # exact correction: add each candidate pair's hot-shingle overlap
        # (hot shingles per doc are few, candidates are few — tiny joins;
        # with no hot shingles this arm is an empty-relation no-op)
        sh_hot = sh_df.filter(F.col("__df") > cap_pred).drop("__df", "__cap")
        shared_hot = (
            shared_rare.select("id_a", "id_b")
            .join(sh_hot.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
            .join(sh_hot.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("__shared_hot"))
        )
        shared = (
            shared_rare.join(shared_hot, ["id_a", "id_b"], "left")
            .select(
                "id_a",
                "id_b",
                (
                    F.col("__shared_rare") + F.coalesce(F.col("__shared_hot"), F.lit(0))
                ).alias("shared"),
            )
        )
    else:
        shared = (
            sh.select(F.col(id_col).alias("id_a"), "shingle")
            .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("shared"))
        )
    result = _jaccard_from_shared(shared, sizes).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    if expose_cap:
        if df_cap_dial is None:
            raise ValueError("expose_cap requires df_cap_dial")
        result = result.crossJoin(
            F.broadcast(df_cap_dial.select(F.col("__cap").alias("df_cap")))
        )
    return result


def _jaccard_verify_candidates(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for a candidate pair set: attach id_a's shingles to
    each candidate, then count matches against id_b's shingle set.  Work
    scales with |candidates| × shingles per doc — never with the full
    pair space.

    Join-strategy discipline (the 100×-notch driver-OOM fix): NOTHING
    corpus-sized in this verifier may be statically broadcast.  Catalyst
    cannot estimate the Arrow-kernel/explode shingle frame (it guesses
    tiny), so the static plan built the ENTIRE (id, shingle) frame — and,
    through the former explicit ``F.broadcast(candidates)`` hint, the
    quadratic candidate set too — as driver-side broadcast tables:
    notEnoughMemoryToBuildAndBroadcastTable at the 100× replica fixture
    (components / canonical_keep / pipeline_near_dedup all died there;
    50× survived on heap luck).  Both shingle-attach joins are therefore
    merge-hinted (sort-merge on the id/shingle shuffle the aggregation
    needs anyway), and the candidate join carries no hint at all.

    ``shingles`` supplies an already-pinned (id, hash) frame so the
    caller's candidate generator and this verifier share one explode+md5
    pass (r16 — ``minhash_lsh_pairs`` built two value-identical shingle
    frames, one for the band signatures and one here)."""
    sh = (
        shingles
        if shingles is not None
        else pin(shingle_sets(docs, text_col, id_col, k))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    cand_shingles = candidates.join(
        sh.select(F.col(id_col).alias("id_a"), "shingle").hint("merge"), "id_a"
    )
    shared = (
        cand_shingles.join(
            sh.select(F.col(id_col).alias("id_b"), "shingle").hint("merge"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    return _jaccard_from_shared(shared, sizes)


def _jaccard_from_shared(shared: DataFrame, sizes: DataFrame) -> DataFrame:
    id_col = sizes.columns[0]
    return (
        shared.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


def fuzzy_levenshtein_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 24,
    prefix_len: int = 16,
    salt_cap: int | None = 1024,
) -> DataFrame:
    """Edit-distance near-dup pairs with prefix blocking: pairs whose
    normalized texts share the first ``prefix_len`` characters and differ
    by ≤ ``max_distance`` edits.

    Blocking keeps this far from O(n²): the equi-join on the prefix bucket
    shuffles once and pairs only within buckets (typo-class duplicates —
    OCR noise, template fills, trailing edits — rarely touch the opening
    characters; a shifted-prefix variant can be unioned in for insertions
    at the front).  Two lossless pre-filters run before the O(d·m) DP:
    the length band (|len_a − len_b| ≤ d is a lower bound on edit
    distance) and Spark's thresholded ``levenshtein(…, threshold)``,
    which abandons a pair's DP as soon as the distance provably exceeds
    the cap.

    ``salt_cap`` is the hot-bucket guard for templated corpora (f docs
    sharing one opening → an f-row join key).  Each doc has exactly ONE
    prefix, so — unlike the shingle ``df_cap`` — dropping hot buckets
    would lose their pairs outright; instead hot buckets are *salted*:
    docs split into ⌈f/cap⌉ groups of ≤ cap, one side explodes to every
    group, and the join runs on (prefix, group).  Results are identical
    (every in-bucket pair still meets exactly once); what changes is the
    plan shape — no single join key ever carries more than ``salt_cap``
    build-side rows, so the bucket's inherent f² comparisons spread
    across f/cap × f/cap tasks instead of one straggler.  ``None``
    disables salting (plain prefix equi-join).
    """
    norm = normalized_text(text_col)
    base = docs.select(
        F.col(id_col),
        norm.alias("__t"),
        F.substring(norm, 1, prefix_len).alias("__pfx"),
        F.length(norm).alias("__len"),
    )
    if salt_cap is None:
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col("__t").alias("__ta"),
            "__pfx",
            F.col("__len").alias("__la"),
        )
        b = base.select(
            F.col(id_col).alias("id_b"),
            F.col("__t").alias("__tb"),
            "__pfx",
            F.col("__len").alias("__lb"),
        )
        joined = a.join(b, "__pfx")
    else:
        from pyspark.sql import Window

        # group index + group count via windows over the SAME
        # shuffle-by-prefix the join needs (id orders deterministically);
        # cold buckets (f ≤ cap) get one group and degenerate to the
        # plain equi-join with a single-element explode
        w_pfx = Window.partitionBy("__pfx")
        w_rn = w_pfx.orderBy(id_col)
        grouped = base.withColumn(
            "__g", ((F.row_number().over(w_rn) - 1) / salt_cap).cast("int")
        ).withColumn(
            "__ng", F.ceil(F.count("*").over(w_pfx) / salt_cap).cast("int")
        )
        a = grouped.select(
            F.col(id_col).alias("id_a"),
            F.col("__t").alias("__ta"),
            "__pfx",
            F.col("__len").alias("__la"),
            F.explode(F.sequence(F.lit(0), F.col("__ng") - 1)).alias("__g"),
        )
        b = grouped.select(
            F.col(id_col).alias("id_b"),
            F.col("__t").alias("__tb"),
            "__pfx",
            F.col("__len").alias("__lb"),
            "__g",
        )
        joined = a.join(b, ["__pfx", "__g"])
    dist = F.levenshtein("__ta", "__tb", max_distance)
    return (
        joined.filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_distance)
        )
        .select("id_a", "id_b", dist.cast("long").alias("distance"))
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )


SIMHASH_BITS = 64


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) 64-bit fingerprints (signed two's-complement
    value — bit 63 set ⇒ negative; XOR/bit_count Hamming is sign-safe).

    Hybrid plan: tokenization + per-token md5 hashing stay JVM-side
    (codegen'd, identical to ``functions.text.simhash``), but the 64-wide
    vote fold runs as an Arrow-batched pandas kernel — the pure-expression
    fold is codegen-bound at 64 bits (~5 s/6k docs at sf0.1; the kernel
    measures the same values in well under a second).  Bit-for-bit equal
    to the expression form (``simhash``), which remains the oracle's
    spec and is equality-tested in ``tests/test_dedup_similarity.py``."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    bits = SIMHASH_BITS
    n_words = (bits + 31) // 32

    # Bound the per-slice vote matrix: the fold materializes a
    # (total_tokens × bits) int64 transient, which at a 50×-corpus Arrow
    # batch (~8k docs × ~200 tokens) is ~1 GB — allocation/GC pressure
    # made the entry SUPER-linear (0.65 s → 180 s at 50×, ratio 278).
    # Slicing the batch so each fold sees ≤ 2^18 tokens caps the
    # transient at ~134 MB; per-row results are bit-identical (votes are
    # per-row integer sums — slice boundaries can't change them).
    _MAX_FOLD_TOKENS = 1 << 18

    def _fold_batch(hashed: pd.Series) -> pd.Series:
        if len(hashed) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        # NULL text -> NULL hash array; the expression form yields a NULL
        # fingerprint for that row, so mirror it (and keep the fast path
        # numpy-only when the batch has no nulls)
        null_mask = np.fromiter(
            (h is None for h in hashed), dtype=bool, count=len(hashed)
        )
        if null_mask.any():
            out = pd.Series([None] * len(hashed), dtype="object")
            present = [h for h in hashed if h is not None]
            if present:
                out[~null_mask] = _fold_batch(pd.Series(present)).values
            return out
        counts = np.fromiter((len(h) for h in hashed), dtype=np.int64, count=len(hashed))
        total = int(counts.sum())
        if total == 0:
            return pd.Series(np.zeros(len(hashed), dtype=np.int64))
        if total > _MAX_FOLD_TOKENS and len(hashed) > 1:
            parts, start, run = [], 0, 0
            for i, c in enumerate(counts):
                if run + int(c) > _MAX_FOLD_TOKENS and i > start:
                    parts.append(_fold_batch(hashed.iloc[start:i]))
                    start, run = i, 0
                run += int(c)
            parts.append(_fold_batch(hashed.iloc[start:]))
            return pd.Series(
                np.concatenate([p.values for p in parts]).astype(np.int64)
            )
        flat = np.concatenate(
            [
                np.asarray(list(h), dtype=np.int64).reshape(-1, n_words)
                for h in hashed
                if len(h)
            ]
        )
        # bit k of the fingerprint votes on bit (k % 32) of word k // 32:
        # columns [word0 bits 0..31, word1 bits 0..31, ...] == k = 0..bits-1
        shifts = np.arange(32, dtype=np.int64)
        cols = [((flat[:, w, None] >> shifts) & 1) for w in range(n_words)]
        word_bits = np.hstack(cols)[:, :bits]
        votes_terms = (2 * word_bits - 1).astype(np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        if (counts > 0).all():
            votes = np.add.reduceat(votes_terms, starts, axis=0)
        else:
            # reduceat misreads empty segments (duplicate starts); zero-token
            # docs can't come from tokens() (split always yields ≥1 element)
            # so this path only guards hand-built inputs — plain loop is fine.
            votes = np.zeros((len(counts), bits), dtype=np.int64)
            pos = 0
            for i, c in enumerate(counts):
                if c:
                    votes[i] = votes_terms[pos : pos + c].sum(axis=0)
                pos += c
        mask = (votes > 0).astype(np.uint64)
        fp = (mask << np.arange(bits, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        ).view(np.int64)
        return pd.Series(fp)

    @pandas_udf(LongType())
    def _fold(hashed: pd.Series) -> pd.Series:
        return _fold_batch(hashed)

    hashed = docs.select(
        F.col(id_col), simhash_word_hashes(text_col, bits).alias("__h")
    )
    return hashed.select(id_col, _fold(F.col("__h")).alias("simhash"))


def _chunk_bounds(bits: int, n_chunks: int) -> list[tuple[int, int]]:
    """(start_bit, width) of ``n_chunks`` disjoint chunks covering ``bits``
    (widths differ by ≤1 when they don't divide evenly)."""
    base, rem = divmod(bits, n_chunks)
    bounds, start = [], 0
    for p in range(n_chunks):
        width = base + (1 if p < rem else 0)
        bounds.append((start, width))
        start += width
    return bounds


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Screen-then-verify, and the screen is *exact*: with ``max_hamming+1``
    disjoint chunks, any pair differing in ≤ max_hamming bits must share
    at least one identical chunk (pigeonhole), so candidate generation
    loses nothing and the Hamming verify runs only on chunk-collision
    pairs — never O(n²).  64-bit fingerprints in 4×16-bit chunks give 65k
    bucket values per chunk: at 10⁹ docs a bucket holds ~n/65536 docs, vs
    ~n/256 with the old 32-bit/8-bit-chunk layout whose candidate volume
    re-approached n² (the round-2 scale flag)."""
    n_chunks = max_hamming + 1
    # pin: the fingerprint aggregation feeds both self-join sides
    # (measured 3.4× at sf0.1 — n_docs rows of (id, long), tiny to cache)
    fp = pin(simhash_fingerprints(docs, text_col, id_col))
    chunks = F.array(
        *[
            F.struct(
                F.lit(p).alias("part"),
                # unsigned shift + mask: correct for the sign-bit chunk too
                F.shiftrightunsigned(F.col("simhash"), start)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk"),
            )
            for p, (start, width) in enumerate(_chunk_bounds(SIMHASH_BITS, n_chunks))
        ]
    )
    exploded = fp.select(id_col, "simhash", F.explode(chunks).alias("pc")).select(
        id_col, "simhash", F.col("pc.part").alias("part"), F.col("pc.chunk").alias("chunk")
    )
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "part", "chunk"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "part", "chunk"
    )
    cand = (
        a.join(b, ["part", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.35,
    max_crossjoin_rows: int = 100_000,
    known_row_count: int | None = None,
) -> DataFrame:
    """Brute-force cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    O(n²) correctness baseline — unit-norm inputs make dot product = cosine.
    The scale path is ``similarity.lsh_bucket_pairs`` (random-hyperplane
    buckets), same verify expression.

    Guarded: above ``max_crossjoin_rows`` (bounded cached probe, same
    mechanism as ``similarity._fits_broadcast``) the call auto-routes to
    ``similarity.embedding_pairs_exact_tiled`` — value-identical pairs
    (sequential bit-exact accumulation, same HALF_UP rounding) through a
    distributed block-pair plan, so no direct caller can ever get an
    unbounded crossJoin at scale.  Below the ceiling the expression-tree
    crossJoin stays, as the zero-dependency reference plan the oracle was
    originally validated against."""
    from .similarity import _fits_broadcast, embedding_pairs_exact_tiled

    if not _fits_broadcast(embeddings, max_crossjoin_rows, known_row_count):
        return embedding_pairs_exact_tiled(
            embeddings,
            cosine_threshold,
            vec_col=vec_col,
            id_col=id_col,
            exact_accumulation=True,
        )
    # materialize the double-cast arrays once per ROW before the pair join —
    # casting inside the per-pair dot would repeat n× per vector (measured
    # −29% at sf0.1; arithmetic identical, still bit-exact vs the oracle)
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    a = embeddings.select(F.col(id_col).alias("id_a"), dbl.alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), dbl.alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot, 6).alias("cosine"))
        .filter(F.col("cosine") >= cosine_threshold)
    )


def ngram_chain_edges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """SPARSIFIED near-dup candidate edges: per capped shingle bucket,
    only the doc_id-ADJACENT pairs (rank r ↔ r+1), each verified with
    the exact full-overlap Jaccard — a connectivity-preserving spanning
    subset of the derived-cap screen's candidate set.

    The full screen's within-bucket self-join emits d² candidate rows
    per bucket and pays the verify aggregate on all of them — recall is
    what you pay for (BASELINE round-13: the family entry over it costs
    867 s at 50×).  For FAMILY recovery the d² pairs are redundant: a
    bucket's docs are chained by d−1 adjacent edges.  Adjacency ORDER
    is the whole trick (the sorted-neighborhood method from record
    linkage): ordering by raw doc_id is adversarial — the replica
    fixture stripes families every ``stride`` ids, so family members
    are almost never doc_id-adjacent in a shared bucket (measured:
    9.4k of 100k docs covered at 20×).  Ordering by the doc's MIN
    SHINGLE HASH first (its 1-hash MinHash signature — near-identical
    shingle sets share their minimum with probability ≈ jaccard, so
    family members collapse to one sort key) makes every family a
    CONTIGUOUS RUN inside every shared bucket; the chain connects the
    run, and cross-family edges at run boundaries simply fail
    verification.  Candidate volume stays Σd (linear); verification
    joins candidates back to both docs' full hashed shingle sets, so
    reported Jaccards are exactly the full screen's values on the
    surviving edges.  All shuffles carry 48-bit hashes and doc_id
    longs — text never shuffles."""
    from pyspark.sql import Window

    # EAGER materialization, not pin (r15): the hashed shingle frame is
    # (id, long) rows consumed by FIVE branches of one action (the cap
    # dial's broadcast build, per-doc mins, the capped chain window, doc
    # sizes, and both verify attach joins) — a lazy pin raced the cache
    # fill and re-executed the text explode + md5 hashing per branch
    # (the r4 multi-consumer rule; the r9 small-frame checkpoint
    # precedent).  Text itself still never shuffles.
    sh = shingle_sets(docs, text_col, id_col, k).localCheckpoint(eager=True)
    dial = _derived_cap_from_shingles(sh)
    mins = sh.groupBy(id_col).agg(F.min("shingle").alias("__mk"))
    w_sh = Window.partitionBy("shingle")
    sh_df = (
        sh.withColumn("__df", F.count("*").over(w_sh))
        .crossJoin(F.broadcast(dial))
        .filter(F.col("__df") <= F.col("__cap"))
        .drop("__df", "__cap")
        .join(mins, id_col)
    )
    w_rn = Window.partitionBy("shingle").orderBy("__mk", id_col)
    chain = (
        sh_df.select(
            "shingle",
            F.col(id_col).alias("id_a"),
            F.lead(id_col).over(w_rn).alias("id_b"),
        )
        .filter(F.col("id_b").isNotNull())
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    shared = (
        chain.join(
            sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__c"))
    )
    return (
        shared.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("__na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("__nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__c") / (F.col("__na") + F.col("__nb") - F.col("__c")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
