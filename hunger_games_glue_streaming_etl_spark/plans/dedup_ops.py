"""Deduplication queries over ``documents`` / ``embeddings`` (LLM-pipeline
extension surface).  Every stage of the MinHash-LSH pipeline is registered
separately — fingerprints, signatures, band buckets, verified pairs — so the
oracle checks each transform, not just the end result.

The oracle SQL reproduces the *identical* algorithm (same normalization,
same k-shingles via concat_ws with null-dropping ends, same 48-bit md5-prefix
hash families, same band hashing) — signatures match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    derived_df_cap,
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_oph_signatures,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from ..sources.batch import load_table
from .registry import register

# ---- shared oracle SQL fragments (mirror functions/text.py exactly) --------

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

# k=3 word shingles, distinct, with concat_ws dropping out-of-range (NULL)
# tail elements exactly like Spark's element_at-past-end → concat_ws skip.
_SHINGLES = f"""
    words AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
    ),
    idx AS (
        SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 2, 1) + 1)) AS i FROM words
    ),
    sh AS (
        SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle FROM idx
    )
"""

_PORTABLE_HASH = "CAST(('0x' || substr(md5('0:' || shingle), 1, 12)) AS BIGINT)"

# universal-hash families over one base hash (functions.text.universal_hash):
# h_i = (a_i·(base mod p) + b_i) mod p, p = 2^31−1
from ..functions.text import MINHASH_PRIME, hash_family_params  # noqa: E402

_FAMILIES = ", ".join(
    f"({i}, {hash_family_params(i)[0]}, {hash_family_params(i)[1]})"
    for i in range(DEFAULT_NUM_HASHES)
)

_SIG = f"""
    base AS (
        SELECT doc_id, {_PORTABLE_HASH} AS h FROM sh
    ),
    sig AS (
        SELECT doc_id, CAST(fam.seed AS INT) AS seed,
               MIN((fam.a * (h % {MINHASH_PRIME}) + fam.b) % {MINHASH_PRIME}) AS minhash
        FROM base CROSS JOIN (VALUES {_FAMILIES}) AS fam(seed, a, b)
        GROUP BY doc_id, fam.seed
    )
"""

_R = DEFAULT_NUM_HASHES // DEFAULT_BANDS

_BUCKETS = f"""
    buckets AS (
        SELECT doc_id, CAST(seed // {_R} AS INT) AS band,
               md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_hash
        FROM sig
        GROUP BY doc_id, seed // {_R}
    )
"""

# hashed-shingle view: the Spark side joins 48-bit shingle hashes (text
# never shuffles — operators.dedup.shingle_sets); same hash here keeps the
# comparison exact even under a (astronomically unlikely) collision
_JACCARD = f"""
    shh AS (SELECT doc_id, {_PORTABLE_HASH} AS hsh FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM shh a JOIN shh b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT id_a, id_b,
               ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
        FROM shared
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
    )
"""


@register(
    "dedup_exact_groups",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
    ),
    groups AS (
        SELECT fingerprint, MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM fp GROUP BY fingerprint
    )
    SELECT fp.doc_id, fp.fingerprint, groups.canonical_id, groups.group_size
    FROM fp JOIN groups USING (fingerprint)
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-text md5 fingerprint + duplicate-group stats
    (shuffle on the 128-bit fingerprint, never on text)."""
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_signatures",
    oracle=f"WITH {_SHINGLES}, {_SIG} SELECT doc_id, seed, minhash FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 hash families over word 3-shingles) —
    bit-identical to the oracle's SQL reproduction."""
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_oph_signatures",
    oracle=f"""
    WITH {_SHINGLES},
    bh AS (
        SELECT DISTINCT doc_id, {_PORTABLE_HASH} AS h FROM sh
    ),
    rawbin AS (
        SELECT doc_id, h % {DEFAULT_NUM_HASHES} AS bin, MIN(h) AS mv
        FROM bh GROUP BY 1, 2
    ),
    bins AS (
        SELECT d.doc_id, t.b AS bin
        FROM (SELECT DISTINCT doc_id FROM bh) d
        CROSS JOIN (SELECT unnest(range({DEFAULT_NUM_HASHES})) AS b) t
    ),
    cand AS (
        SELECT bins.doc_id, bins.bin,
               rb.mv + ((rb.bin - bins.bin + {DEFAULT_NUM_HASHES})
                        % {DEFAULT_NUM_HASHES}) * {1 << 48} AS sig,
               ROW_NUMBER() OVER (
                   PARTITION BY bins.doc_id, bins.bin
                   ORDER BY (rb.bin - bins.bin + {DEFAULT_NUM_HASHES})
                            % {DEFAULT_NUM_HASHES}
               ) AS rn
        FROM bins JOIN rawbin rb ON rb.doc_id = bins.doc_id
    )
    SELECT doc_id, CAST(bin AS INT) AS bin, CAST(sig AS BIGINT) AS sig
    FROM cand WHERE rn = 1
    """,
)
def dedup_minhash_oph_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified ONE-PERMUTATION MinHash signatures — hash each shingle
    once, bin by h % m, per-bin min, rotation densification for empty
    bins: O(1) hash work per shingle where the classic family approach
    (`dedup_minhash_signatures`) pays O(m) — the variant a 100 TB corpus
    scan actually runs (see operators/dedup.py::minhash_oph_signatures).
    The whole signature — including every densified borrow — is integer
    arithmetic on the portable hash, hash-exact vs an oracle replaying
    bins, mins, and the rotation."""
    return minhash_oph_signatures(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_bands",
    oracle=f"WITH {_SHINGLES}, {_SIG}, {_BUCKETS} SELECT doc_id, band, band_hash FROM buckets",
)
def dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band buckets (4 bands × 4 rows) — docs sharing a (band,
    band_hash) are near-dup candidates."""
    return minhash_band_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES}, {_SIG}, {_BUCKETS},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    {_JACCARD.replace("jac AS (", "jac0 AS (")}
    SELECT c.id_a, c.id_b, j.jaccard
    FROM cand c JOIN jac0 j ON c.id_a = j.id_a AND c.id_b = j.id_b
    WHERE j.jaccard >= 0.5
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup pipeline: LSH candidates → exact-Jaccard verify →
    pairs ≥ 0.5 (the corpus plants ~25 near-dup pairs; LSH with 4×4 bands
    recalls the high-similarity ones without the O(n²) scan)."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES}, {_JACCARD}
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs — the ground truth the LSH pipeline's
    recall is measured against (see unit test).  Runs with the hot-shingle
    guard (df_cap=64): shingles in >64 docs are dropped from candidate
    generation, bounding the self-join at c² per shingle, while every
    candidate's Jaccard is recomputed over all its shingles — on this
    corpus (max shingle DF = 25) the result is provably identical to the
    uncapped form, which the plain-SQL oracle computes."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), df_cap=64)


# the corpus-derived hot-shingle cap dial as reusable CTE text (Spark twin:
# operators.dedup.derived_df_cap / _derived_cap_from_shingles) - shared by
# the derived-cap screen and the sparsified family sibling so the dial
# definition cannot diverge between entries
_CAP_DIAL_CTES = f"""
    shh0 AS (SELECT doc_id, {_PORTABLE_HASH} AS hsh FROM sh),
    dfh AS (SELECT hsh, COUNT(*) AS dfv FROM shh0 GROUP BY hsh),
    hist AS (SELECT dfv, COUNT(*) AS n FROM dfh GROUP BY dfv),
    cum AS (SELECT dfv,
                   SUM(n) OVER (ORDER BY dfv ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS running,
                   SUM(n) OVER () AS total
            FROM hist),
    cap AS (SELECT CAST(GREATEST(64, 4 * MIN(CASE WHEN running >=
                            (990 * total + 999) // 1000 THEN dfv END))
                   AS BIGINT) AS df_cap
            FROM cum)
"""


@register(
    "dedup_ngram_jaccard_derived_cap",
    oracle=f"""
    WITH {_SHINGLES},
    {_CAP_DIAL_CTES},
    {_JACCARD}
    SELECT j.id_a, j.id_b, j.jaccard, cap.df_cap
    FROM jac j CROSS JOIN cap WHERE j.jaccard >= 0.5
    """,
)
def dedup_ngram_jaccard_derived_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard pairs with the CORPUS-DERIVED hot-shingle cap
    (``derived_df_cap``: GREATEST(64, 4·p99 of the shingle-DF histogram),
    a 1-row broadcast dial — VERDICT r11 next #4).  Where the fixed
    df_cap=64 loses whole duplicate groups once replication pushes their
    shingle DFs past it, the derived cap scales with the corpus's
    measured duplication profile (recovery pinned at 80× multiplicity in
    ``test_ngram_jaccard_derived_cap_survives_replication``).  The dial
    itself is EXPOSED as the ``df_cap`` output column and the oracle
    recomputes it from the same histogram-rank definition, so the
    data-dependent cap — not just the pair set — is hash-checked (the
    round-4 data-derived-dial rule).  ``df_cap_dial="derived"`` builds
    the dial from the screen's own pinned shingle frame — one lineage in
    the plan (wall is unchanged at sf0.1, ~6.8 s either way: the capped
    self-join dominates and the lazy pin means the dial broadcasts race
    the cache fill — the r7 lesson — but the single-lineage form can't
    drift out of sync with the screen's shingling)."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        df_cap_dial="derived",
        expose_cap=True,
    )


def _simhash_sql() -> str:
    # 64-bit portable simhash: bit k votes from bit (k mod 32) of the
    # token's seed-(k//32) 48-bit md5-prefix hash — exactly
    # functions.text.simhash(bits=64).  Bit 63's term is the negative
    # two's-complement value so the signed BIGINTs match Spark's long;
    # positives sum to ≤ 2^63−1 before the one negative term, no overflow.
    def tok_hash(seed: int) -> str:
        return f"CAST(('0x' || substr(md5('{seed}:' || t.tok), 1, 12)) AS BIGINT)"

    terms = []
    for k in range(64):
        h, bit = tok_hash(k // 32), k % 32
        val = f"{1 << k}::BIGINT" if k < 63 else "(-9223372036854775808)::BIGINT"
        terms.append(
            f"(CASE WHEN SUM(CASE WHEN ({h} >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN {val} ELSE 0::BIGINT END)"
        )
    bits = " + ".join(terms)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok FROM documents
    ), t AS (SELECT doc_id, tok FROM toks)
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
    FROM t GROUP BY doc_id
    """


@register("dedup_simhash_fingerprints", oracle=_simhash_sql())
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (token-hash bit votes) — near-dups land
    within small Hamming distance."""
    return simhash_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH fp AS ({_simhash_sql().strip()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs (Hamming ≤ 3 over 64 bits), screen-then-verify
    via 4 disjoint 16-bit chunks.  The screen is EXACT by pigeonhole (≤ 3
    differing bits can't touch all 4 chunks), so the Spark plan — which
    never goes O(n²) — returns identical pairs to the oracle's brute-force
    Hamming join; 65k bucket values per chunk keep bucket occupancy
    ~n/65536 at extreme corpus sizes."""
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ 0.35 (unit-norm fixtures; the
    threshold sits above the p99.9 of the random-pair distribution so the
    result is the non-random tail).

    Uses the numpy-blocked exact scan (column-at-a-time sequential
    accumulation — bit-identical to both the expression-tree form and the
    oracle's list_dot_product, ~10× faster).  The pure-codegen baseline
    (`embedding_near_dup_pairs`) and the pair-set equality between the two
    are kept under unit test."""
    from ..operators.similarity import embedding_pairs_exact_blocked

    return embedding_pairs_exact_blocked(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_fuzzy_levenshtein_pairs",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ),
    b AS (SELECT doc_id, t, substr(t, 1, 16) AS pfx, length(t) AS len FROM n)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.t, c.t) AS BIGINT) AS distance
    FROM b a JOIN b c
      ON a.pfx = c.pfx AND a.doc_id < c.doc_id
     AND abs(a.len - c.len) <= 24
    WHERE levenshtein(a.t, c.t) <= 24
    """,
)
def dedup_fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match dedup: edit-distance ≤ 24 within 16-char-prefix blocks
    (typo/OCR-class duplicates).  The oracle mirrors the blocking exactly;
    both engines compute standard Levenshtein, so distances are
    value-identical.  Spark-side the DP is thresholded (abandons a pair
    once the distance provably exceeds the cap)."""
    from ..operators.dedup import fuzzy_levenshtein_pairs

    return fuzzy_levenshtein_pairs(load_table(spark, sf_dir, "documents"))


# ---- LSH-bucketed embedding near-dup (the 100 TB scale path) ---------------
# The hyperplanes are deterministic integer-hash functions of (plane, dim),
# so the oracle reproduces the bucketing exactly: same sign tests on the
# same literal plane vectors, candidates = bucket Hamming distance <= 1.

def _lsh_bucket_sql(vec_expr: str, n_planes: int, dim: int) -> str:
    from ..operators.similarity import hyperplanes

    terms = []
    for p, plane in enumerate(hyperplanes(n_planes, dim)):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


_LSH_PAIRS_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    b AS (
        SELECT vec_id, vec, {_lsh_bucket_sql("vec", 8, 64)} AS bucket FROM v
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, c.vec), 6) AS cosine
    FROM b a JOIN b c ON a.vec_id < c.vec_id
    WHERE bit_count(CAST(xor(a.bucket, c.bucket) AS BIGINT)) <= 1
      AND ROUND(list_dot_product(a.vec, c.vec), 6) >= 0.35
"""


@register("dedup_embedding_lsh_pairs", oracle=_LSH_PAIRS_ORACLE)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH buckets — the
    scale path for ``dedup_embedding_cosine_pairs``: candidates are pairs
    whose 8-plane sign buckets differ in ≤ 1 bit (one-side multi-probe),
    verified with the bit-exact sequential dot.  Nothing is collected to
    the driver; work scales with bucket occupancy, not n².  Recall vs the
    exact scan rises with probe radius (radius = n_planes ≡ exact; the
    ⊇/⊆ relations are unit-tested)."""
    from ..operators.similarity import lsh_bucket_pairs

    return lsh_bucket_pairs(
        load_table(spark, sf_dir, "embeddings"), n_planes=8, probe_radius=1, dim=64
    )


_SIDE = (
    "CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 12)) "
    "AS BIGINT) % 4"
)


@register(
    "dedup_incremental_new_vs_base",
    oracle=f"""
    WITH {_SHINGLES}, {_SIG}, {_BUCKETS},
    sides AS (SELECT doc_id, {_SIDE} AS s FROM documents),
    base_b AS (
        SELECT DISTINCT b.band, b.band_hash
        FROM buckets b JOIN sides USING (doc_id) WHERE s < 3
    ),
    newb AS (
        SELECT b.doc_id, b.band, b.band_hash
        FROM buckets b JOIN sides USING (doc_id) WHERE s >= 3
    ),
    hits AS (
        SELECT doc_id, CAST(COUNT(DISTINCT band) AS BIGINT) AS n_hit_bands
        FROM newb JOIN base_b USING (band, band_hash)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_hit_bands, 0) AS n_hit_bands,
           COALESCE(h.n_hit_bands, 0) > 0 AS flagged
    FROM sides d LEFT JOIN hits h USING (doc_id)
    WHERE d.s >= 3
    """,
)
def dedup_incremental_new_vs_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: flag NEW documents that near-duplicate the
    EXISTING corpus — the shape a continuously-ingesting curation pipeline
    runs every batch (dedup new data against 100 TB of history WITHOUT
    re-pairing history against itself).  The corpus splits 75/25 into
    base/new by the portable key hash (the ``split_train_holdout``
    mechanism — deterministic, engine-portable); the base side collapses
    to its DISTINCT (band, band_hash) set — at scale this IS the
    persistent LSH index a real incremental system maintains, keys only,
    append-only — and new docs semi-join it per band.  Nothing but 16-byte
    band keys crosses the shuffle; history text/signatures are never
    touched.  Hash-checked end-to-end: both engines rebuild the identical
    signatures, split, and index.  Non-vacuity: planted near-dup pairs
    straddle the split at sf0.001 AND sf0.01 (flagged rows exist)."""
    from ..functions.text import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    side = F.pmod(portable_hash64(F.col("doc_id").cast("string")), F.lit(4))
    buckets = minhash_band_buckets(docs).withColumn(
        "__s", F.pmod(portable_hash64(F.col("doc_id").cast("string")), F.lit(4))
    )
    base_b = buckets.filter(F.col("__s") < 3).select("band", "band_hash").distinct()
    new_b = buckets.filter(F.col("__s") >= 3)
    hits = (
        new_b.join(base_b, ["band", "band_hash"], "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("band").alias("n_hit_bands"))
    )
    return (
        docs.filter(side >= 3)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_bands"), F.lit(0).cast("long")).alias(
                "n_hit_bands"
            ),
            (F.coalesce(F.col("n_hit_bands"), F.lit(0).cast("long")) > 0).alias(
                "flagged"
            ),
        )
    )


# ---- image perceptual-hash dedup (VERDICT r6 "Next round" #4) --------------
#
# The DuckDB oracle rebuilds dHash/aHash from the planted pixel FORMULA
# (operators/image_hash.py:planted_pixels) arithmetically — the Spark side
# runs the real binary pipeline (encode PGM -> decode bytes -> downsample
# -> hash) and must land on identical integers, proving codec + kernel +
# hash agree end-to-end.  Every step is integer-only so the gate is
# hash-exact; each 64-bit hash rides as two 32-bit halves (no 1<<63 under
# ANSI — the r6 overflow rule).


def collapsed_pairs_tail_sql(hi: str, lo: str, max_hamming: int = 3) -> str:
    """Oracle tail mirroring ``image_hash.hi_lo_near_pairs``' duplicate
    collapse: assumes a CTE ``fp(doc_id, {hi}, {lo})`` is already in
    scope, groups identical fingerprints to a min-doc_id representative,
    emits Hamming-0 member->rep edges, and brute-forces the near screen
    over DISTINCT fingerprints only (same GROUP BY + equi-join as the
    Spark side).  PRECONDITION: non-NULL fingerprints (ADVICE r8 low) —
    the equi-joins here and in ``hi_lo_near_pairs`` drop NULL rows,
    which every planted kernel rules out by construction.
    Appended with a leading comma so it composes onto any WITH chain."""
    xors = (
        f"bit_count(xor(a.{hi}, b.{hi})) + bit_count(xor(a.{lo}, b.{lo}))"
    )
    return f""",
    g AS (SELECT {hi}, {lo}, MIN(doc_id) AS rep FROM fp GROUP BY {hi}, {lo}),
    dup AS (
        SELECT g.rep AS id_a, fp.doc_id AS id_b, CAST(0 AS INT) AS hamming
        FROM fp JOIN g ON fp.{hi} = g.{hi} AND fp.{lo} = g.{lo}
        WHERE fp.doc_id <> g.rep
    ),
    near AS (
        SELECT a.rep AS id_a, b.rep AS id_b, CAST({xors} AS INT) AS hamming
        FROM g a JOIN g b ON a.rep < b.rep
        WHERE {xors} <= {max_hamming}
    )
    SELECT id_a, id_b, hamming FROM dup
    UNION ALL
    SELECT id_a, id_b, hamming FROM near
    """


def _img_px_sql(row: str, col: str) -> str:
    """Planted pixel value at raster (row, col) — mirror of planted_pixels."""
    idx = f"(({row}) * 18 + ({col}))"
    return (
        f"((((base * 2654435761 + {idx} * 40503) % 65536) % 200) + shift"
        f" + CASE WHEN pert = 1 AND {idx} = hot THEN 50 ELSE 0 END)"
    )


def _img_cell_sql(id_source: str = "SELECT doc_id FROM documents") -> str:
    """CTE body: 9x8 downsampled grid cells per document (integer mean).
    ``id_source`` parameterizes the id domain so the binaryFile pipeline
    entry (plans/multimodal_ops.py) can reuse the identical hash algebra
    over its nation-derived asset ids."""
    quad = " + ".join(
        _img_px_sql(r, c)
        for r, c in (
            ("2*r", "2*c"),
            ("2*r", "2*c+1"),
            ("2*r+1", "2*c"),
            ("2*r+1", "2*c+1"),
        )
    )
    return f"""
    d AS (
        SELECT doc_id, doc_id // 4 AS base, doc_id % 3 AS shift,
               (doc_id // 4) % 288 AS hot,
               CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS pert
        FROM ({id_source})
    ),
    rc AS (
        SELECT r, c
        FROM (SELECT unnest(generate_series(0, 7)) AS r),
             (SELECT unnest(generate_series(0, 8)) AS c)
    ),
    cell AS (
        SELECT doc_id, r, c, ({quad}) // 4 AS v FROM d, rc
    )
    """


_IMG_FP_SQL = f"""
    WITH {_img_cell_sql()},
    dbit AS (
        SELECT a.doc_id, a.r, a.c, CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
        FROM cell a JOIN cell b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        WHERE a.c <= 7
    ),
    am AS (SELECT doc_id, SUM(v) // 64 AS m FROM cell WHERE c <= 7 GROUP BY doc_id),
    abit AS (
        SELECT cell.doc_id, r, c, CASE WHEN v >= m THEN 1 ELSE 0 END AS bit
        FROM cell JOIN am ON cell.doc_id = am.doc_id
        WHERE c <= 7
    ),
    dfp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN r < 4 THEN CAST(bit AS BIGINT) << (r * 8 + c) ELSE 0 END) AS BIGINT) AS dh_hi,
               CAST(SUM(CASE WHEN r >= 4 THEN CAST(bit AS BIGINT) << ((r - 4) * 8 + c) ELSE 0 END) AS BIGINT) AS dh_lo
        FROM dbit GROUP BY doc_id
    ),
    afp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN r < 4 THEN CAST(bit AS BIGINT) << (r * 8 + c) ELSE 0 END) AS BIGINT) AS ah_hi,
               CAST(SUM(CASE WHEN r >= 4 THEN CAST(bit AS BIGINT) << ((r - 4) * 8 + c) ELSE 0 END) AS BIGINT) AS ah_lo
        FROM abit GROUP BY doc_id
    )
    SELECT dfp.doc_id, dh_hi, dh_lo, ah_hi, ah_lo
    FROM dfp JOIN afp ON dfp.doc_id = afp.doc_id
"""


@register("dedup_image_dhash_fingerprints", oracle=_IMG_FP_SQL)
def dedup_image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashes (dHash gradient bits + aHash mean bits) over
    a planted binary-image corpus keyed by doc_id: the Arrow kernel
    encodes each deterministic raster to real PGM bytes, decodes them
    back, integer-downsamples 2x2, and packs 64 bits per hash as two
    32-bit halves.  See operators/image_hash.py for the 100 TB posture
    (payloads never leave the kernel; only id + 4 BIGINTs shuffle)."""
    from ..operators.image_hash import image_hash_fingerprints

    return image_hash_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_image_dhash_pairs",
    oracle=f"""
    WITH fp AS ({_IMG_FP_SQL.strip()}){collapsed_pairs_tail_sql("dh_hi", "dh_lo")}
    """,
)
def dedup_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate edges by dHash Hamming <= 3, via the exact
    pigeonhole 4x16-bit chunk screen with identical fingerprints
    collapsed to a min-id representative first (VERDICT r7 #1): members
    of a duplicate group emit Hamming-0 edges to their representative,
    only distinct fingerprints enter the bucket join, so an
    exact-dup-heavy corpus costs O(k) edges, never k^2/2.  The oracle
    replays the same GROUP BY collapse and brute-forces only distinct
    fingerprints.  Non-vacuous by construction: doc_id div 4 groups
    share a base image (brightness shifts -> Hamming 0 dup edges; the
    one-pixel perturbed docs -> Hamming <= 2 near edges)."""
    from ..operators.image_hash import image_dhash_near_pairs

    return image_dhash_near_pairs(load_table(spark, sf_dir, "documents"))


# ---- audio perceptual-fingerprint dedup (the audio face of dHash) ----------


def _aud_samp_sql(idx: str) -> str:
    """Planted PCM sample at index — mirror of audio_hash.planted_samples."""
    return (
        f"((((base * 2654435761 + ({idx}) * 48271) % 65536) % 24000) + dc"
        f" + CASE WHEN pert = 1 AND ({idx}) = hot THEN 8000 ELSE 0 END)"
    )


_AUD_FP_SQL = f"""
    WITH d AS (
        SELECT doc_id, doc_id // 4 AS base, (doc_id % 3) * 16 AS dc,
               (doc_id // 4) % 256 AS hot,
               CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS pert
        FROM documents
    ),
    js AS (SELECT unnest(generate_series(0, 63)) AS j),
    frame AS (
        SELECT doc_id, j,
               ({_aud_samp_sql("4*j")} + {_aud_samp_sql("4*j+1")}
                + {_aud_samp_sql("4*j+2")} + {_aud_samp_sql("4*j+3")}) AS s
        FROM d, js
    ),
    abit AS (
        SELECT a.doc_id, a.j, CASE WHEN a.s < b.s THEN 1 ELSE 0 END AS bit
        FROM frame a JOIN frame b ON a.doc_id = b.doc_id AND b.j = a.j + 1
        WHERE a.j <= 62
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN j < 32 THEN CAST(bit AS BIGINT) << j ELSE 0 END) AS BIGINT) AS af_hi,
           CAST(SUM(CASE WHEN j >= 32 THEN CAST(bit AS BIGINT) << (j - 32) ELSE 0 END) AS BIGINT) AS af_lo
    FROM abit GROUP BY doc_id
"""


@register("dedup_audio_fingerprints", oracle=_AUD_FP_SQL)
def dedup_audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-gradient audio fingerprints (chromaprint-style sign-of-delta
    over frame energies) via the REAL binary pipeline: plant deterministic
    PCM keyed by doc_id, encode actual RIFF/WAV bytes, decode them back,
    frame, hash — all in one Arrow kernel.  DC offsets (the audio analog
    of brightness) don't move the bits; the one-sample perturbed docs stay
    within Hamming 2.  See operators/audio_hash.py for the 100 TB
    posture."""
    from ..operators.audio_hash import audio_fingerprints

    return audio_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_audio_fingerprint_pairs",
    oracle=f"""
    WITH fp AS ({_AUD_FP_SQL.strip()}){collapsed_pairs_tail_sql("af_hi", "af_lo")}
    """,
)
def dedup_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate edges by fingerprint Hamming <= 3, via the
    SAME collapse-then-screen as the image-dHash pairs
    (``image_hash.hi_lo_near_pairs``) — one screen, every modality:
    identical fingerprints emit Hamming-0 representative edges, only
    distinct fingerprints enter the bucket join.  The oracle replays the
    identical GROUP BY collapse and brute-forces distinct fingerprints."""
    from ..operators.audio_hash import audio_near_pairs

    return audio_near_pairs(load_table(spark, sf_dir, "documents"))


def img_dhash_pairs_sql(id_source: str) -> str:
    """Full dHash Hamming<=3 brute-force pairs SQL over an arbitrary id
    domain — shared by the binaryFile image-dedup pipeline entry."""
    return f"""
    WITH {_img_cell_sql(id_source)},
    dbit AS (
        SELECT a.doc_id, a.r, a.c, CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
        FROM cell a JOIN cell b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
        WHERE a.c <= 7
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN r < 4 THEN CAST(bit AS BIGINT) << (r * 8 + c) ELSE 0 END) AS BIGINT) AS dh_hi,
               CAST(SUM(CASE WHEN r >= 4 THEN CAST(bit AS BIGINT) << ((r - 4) * 8 + c) ELSE 0 END) AS BIGINT) AS dh_lo
        FROM dbit GROUP BY doc_id
    ){collapsed_pairs_tail_sql("dh_hi", "dh_lo")}
    """


# ---- video perceptual-fingerprint dedup (the modality triple's third leg) --


def _vid_px_sql(row: str, col: str) -> str:
    """Planted luma value at (frame f, raster row, col) — mirror of
    video_hash.planted_luma (f is in scope from the fr CTE)."""
    idx = f"(({row}) * 18 + ({col}))"
    return (
        f"((((base * 2654435761 + (f * 288 + {idx}) * 40503) % 65536) % 200) + shift"
        f" + CASE WHEN pert = 1 AND f = 0 AND {idx} = hot THEN 50 ELSE 0 END)"
    )


def _vid_fp_sql() -> str:
    quad = " + ".join(
        _vid_px_sql(r, c)
        for r, c in (
            ("2*r", "2*c"),
            ("2*r", "2*c+1"),
            ("2*r+1", "2*c"),
            ("2*r+1", "2*c+1"),
        )
    )
    return f"""
    WITH d AS (
        SELECT doc_id, doc_id // 4 AS base, doc_id % 3 AS shift,
               (doc_id // 4) % 288 AS hot,
               CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS pert
        FROM documents
    ),
    fr AS (SELECT unnest([0, 2, 4]) AS f),
    rc AS (
        SELECT r, c
        FROM (SELECT unnest(generate_series(0, 7)) AS r),
             (SELECT unnest(generate_series(0, 8)) AS c)
    ),
    cell AS (
        SELECT doc_id, f, r, c, ({quad}) // 4 AS v FROM d, fr, rc
    ),
    vbit AS (
        SELECT a.doc_id, a.f, a.r, a.c, CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
        FROM cell a JOIN cell b
          ON a.doc_id = b.doc_id AND a.f = b.f AND a.r = b.r AND b.c = a.c + 1
        WHERE a.c <= 7
    ),
    ffp AS (
        SELECT doc_id, f,
               CAST(SUM(CASE WHEN r < 4 THEN CAST(bit AS BIGINT) << (r * 8 + c) ELSE 0 END) AS BIGINT) AS fhi,
               CAST(SUM(CASE WHEN r >= 4 THEN CAST(bit AS BIGINT) << ((r - 4) * 8 + c) ELSE 0 END) AS BIGINT) AS flo
        FROM vbit GROUP BY doc_id, f
    ),
    fp AS (
        SELECT doc_id, CAST(bit_xor(fhi) AS BIGINT) AS vf_hi,
               CAST(bit_xor(flo) AS BIGINT) AS vf_lo
        FROM ffp GROUP BY doc_id
    )
    """


@register(
    "dedup_video_fingerprints",
    oracle=f"{_vid_fp_sql()} SELECT doc_id, vf_hi, vf_lo FROM fp",
)
def dedup_video_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TMK-style video fingerprints: real Y4M (C444) clips planted per
    doc_id, stride-2 frame sampling, per-frame integer dHash, XOR fold —
    brightness-invariant, one-pixel-one-frame perturbations stay within
    Hamming 2.  The whole encode→parse→sample→hash loop runs on real
    bytes in one Arrow kernel; the oracle rebuilds per-frame hashes from
    the luma formula and `bit_xor`-aggregates.  See
    operators/video_hash.py for the stride-bounds-decode-cost argument."""
    from ..operators.video_hash import video_fingerprints

    return video_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_video_fingerprint_pairs",
    oracle=f"""
    {_vid_fp_sql()}{collapsed_pairs_tail_sql("vf_hi", "vf_lo")}
    """,
)
def dedup_video_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate edges by fold-hash Hamming <= 3 through the
    SAME collapse-then-screen as image and audio — one screen, all three
    modalities; duplicate fingerprints emit Hamming-0 representative
    edges, the oracle replays the identical GROUP BY collapse."""
    from ..operators.video_hash import video_near_pairs

    return video_near_pairs(load_table(spark, sf_dir, "documents"))


# Centered-bucket twin: the dyadic-grid corpus mean (FLOOR(val·4096)
# BIGINT sums per dim, two correctly-rounded divisions — the r12
# quantile-dial pattern, both engines replay it) shifts the BUCKETING
# only; the verification dot stays on the raw vectors.
_LSH_CENTERED_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    ev AS (
        SELECT vec_id, generate_subscripts(vec, 1) AS dim, unnest(vec) AS val
        FROM v
    ),
    csum AS (
        SELECT dim,
               CAST(SUM(CAST(FLOOR(val * 4096.0) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM ev GROUP BY dim
    ),
    ctr AS (
        SELECT list((CAST(s AS DOUBLE) / n) / 4096.0 ORDER BY dim) AS c
        FROM csum
    ),
    vc AS (
        SELECT vec_id, vec,
               list_transform(generate_series(1, len(vec)),
                              i -> vec[i] - c[i]) AS cvec
        FROM v CROSS JOIN ctr
    ),
    b AS (
        SELECT vec_id, vec, {_lsh_bucket_sql("cvec", 8, 64)} AS bucket
        FROM vc
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, c.vec), 6) AS cosine
    FROM b a JOIN b c ON a.vec_id < c.vec_id
    WHERE bit_count(CAST(xor(a.bucket, c.bucket) AS BIGINT)) <= 1
      AND ROUND(list_dot_product(a.vec, c.vec), 6) >= 0.35
"""


@register("dedup_embedding_lsh_pairs_centered", oracle=_LSH_CENTERED_ORACLE)
def dedup_embedding_lsh_pairs_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs with CENTERED sign-LSH bucketing — the
    round-13 occupancy fix for the screen's measured 50× degeneracy.
    Origin-anchored hyperplanes cannot split an angular cluster they
    never cross: the 50× numpy census measured one 8-plane bucket
    holding 30.5k of 100k vectors (2.8B candidate pairs); bucketing
    vector − corpus-mean instead halves the max bucket (13.3k) and cuts
    candidates ~3× with the SAME verification contract (the exact dot on
    raw vectors).  The center is the deterministic dyadic-grid mean
    (``embedding_center_dial`` — exact integer moments, two correctly-
    rounded divisions), a data-derived 1-row dial both engines compute,
    so the whole centered pipeline stays hash-exact.  On the replica
    fixture the true output is itself quadratic (95.4% of pairs pass the
    raw-dot threshold — see full_registry_sweep's adjudication), so the
    win is candidate-volume, not output-volume; on real centered-able
    geometry it is the difference between a working screen and n²."""
    from ..operators.similarity import embedding_center_dial, lsh_bucket_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_pairs(
        emb,
        n_planes=8,
        probe_radius=1,
        dim=64,
        center=embedding_center_dial(emb),
    )
