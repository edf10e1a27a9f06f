"""Similarity-search queries over ``embeddings``: exact brute-force cosine
top-k (oracle-checked) and the LSH-bucketed approximate variants (checked
against the exact result in unit tests — recall is probabilistic, so a SQL
oracle would have to duplicate the Spark plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import pin
from ..operators.similarity import (
    cosine_topk,
    embedding_pairs_blas,
    ivf_ann_topk,
    lsh_ann_topk,
    lsh_bucket_stats,
)
from ..sources.batch import load_table
from .registry import register

_QUERY_VEC_ID = 0
_K = 10

_EXACT_TOPK_ORACLE = f"""
    SELECT a.vec_id,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}) q
    ORDER BY cosine DESC, a.vec_id
    LIMIT {_K}
    """


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(emb.vec_id == _QUERY_VEC_ID).select("embedding").head()
    return list(row[0])


@register("sim_cosine_topk", oracle=_EXACT_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-10 for the vec_id-0 query
    vector (TakeOrderedAndProject — per-partition heaps, k-row merge; no
    global sort materialized).  Bit-identical dot product vs the oracle."""
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K)


def _lsh_ann_oracle() -> str:
    from .dedup_ops import _lsh_bucket_sql

    return f"""
    WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {_lsh_bucket_sql("CAST(embedding AS DOUBLE[])", 4, 64)} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id, ROUND(list_dot_product(a.v, q.v), 6) AS cosine
    FROM b a JOIN (SELECT * FROM b WHERE vec_id = {_QUERY_VEC_ID}) q
      ON a.bucket = q.bucket
    ORDER BY cosine DESC, a.vec_id
    LIMIT {_K}
    """


@register("sim_lsh_ann_topk", oracle=_lsh_ann_oracle())
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: scan only the query's
    random-hyperplane bucket (~1/2^planes of the table).  Even the
    PARTIAL probe is deterministic — the oracle rebuilds the buckets from
    the literal hyperplanes and joins on the query vector's own bucket,
    so the approximate result itself is hash-checked (recall vs exact is
    additionally asserted in tests)."""
    return lsh_ann_topk(
        load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K, n_planes=4
    )


@register("sim_lsh_ann_topk_fullprobe", oracle=_EXACT_TOPK_ORACLE)
def sim_lsh_ann_topk_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-probe dial at its endpoint: probe_radius = n_planes scans
    every bucket, so the LSH plan must reproduce the exact top-k — hash-
    checked against the brute-force oracle.  This pins the recall
    semantics of the dial itself (partial radii are strict subsets of this
    scan), turning the former rows-only status into a value check."""
    return lsh_ann_topk(
        load_table(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=_K,
        n_planes=4,
        probe_radius=4,
    )


@register("sim_embedding_pairs_blas")
def sim_embedding_pairs_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-BLAS brute-force cosine pairs — the vectorized scale path for
    dedup_embedding_cosine_pairs (~10× the expression-tree throughput).
    Rows-only check (numpy pairwise summation differs in the last ULP from
    sequential); pair-set equality vs the exact path is unit-tested."""
    return embedding_pairs_blas(load_table(spark, sf_dir, "embeddings"))


_ivf_centroid_cache: dict[str, list[list[float]]] = {}


@register("sim_ivf_ann_topk")
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-indexed approximate top-k: Lloyd-iterated coarse quantizer (pure
    DataFrame ops), probe the 4 of 16 cells nearest the query.  The
    quantizer is built once per table and reused across queries — that's
    the point of an index.  Rows-only check; recall vs the exact top-k is
    asserted in tests (probing all cells ≡ exact scan)."""
    from ..operators.similarity import ivf_build_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _ivf_centroid_cache:
        # 8 cells × 1 Lloyd iteration: the build runs inside this query's
        # budget in single-shot contexts (driver/bench), so keep it lean —
        # quantizer quality beyond one iteration doesn't change the
        # demonstrated shape, and the recall test covers correctness
        _ivf_centroid_cache[sf_dir] = ivf_build_centroids(
            emb, n_centroids=8, iterations=1
        )
    return ivf_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_centroids=8,
        n_probe=2,
        centroids=_ivf_centroid_cache[sf_dir],
    )


@register("sim_ivf_ann_topk_fullprobe", oracle=_EXACT_TOPK_ORACLE)
def sim_ivf_ann_topk_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with every cell probed (n_probe = n_centroids) — by definition
    the exact scan, so the IVF assignment/probe machinery is hash-checked
    against the brute-force oracle (the partial-probe entry above stays
    rows-only; this pins its mechanics)."""
    from ..operators.similarity import ivf_build_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _ivf_centroid_cache:
        _ivf_centroid_cache[sf_dir] = ivf_build_centroids(
            emb, n_centroids=8, iterations=1
        )
    return ivf_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_centroids=8,
        n_probe=8,
        centroids=_ivf_centroid_cache[sf_dir],
    )


_pq_codebook_cache: dict[str, list] = {}


@register("sim_pq_ann_topk")
def sim_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: vectors compressed to 8 codebook codes,
    first-pass scan scores rows via a driver-precomputed lookup table
    (no per-row dot), top 4k candidates re-ranked with the exact dot.
    Codebooks are built once per table (distributed Lloyd) and cached.
    Rows-only check; full-refine ≡ exact is unit-tested."""
    from ..operators.similarity import pq_ann_topk, pq_build_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _pq_codebook_cache:
        _pq_codebook_cache[sf_dir] = pq_build_codebooks(emb)
    return pq_ann_topk(
        emb, _query_vec(spark, sf_dir), k=_K, refine=4,
        codebooks=_pq_codebook_cache[sf_dir],
    )


_RECALL_ORACLE = f"""
    SELECT a.vec_id,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
           TRUE AS recall_ok
    FROM embeddings a
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}) q
    ORDER BY cosine DESC, a.vec_id
    LIMIT {_K}
    """


def _recall_check(
    spark: SparkSession, sf_dir: str, approx: DataFrame, floor_hits: int
) -> DataFrame:
    """Exact top-k rows plus a pinned ``recall_ok`` boolean: the hash gate
    re-checks the brute-force values AND that the approximate index found
    at least ``floor_hits`` of them (same tolerance-band trick as
    ``agg_approx_distinct_error`` — the raw approximate result can never be
    oracle-identical because the Lloyd centroid averages are summation-order
    dependent, but recall@k is an integer robust to that jitter: measured
    9/10 (IVF) and 8/10 (PQ) across rebuild trials at sf0.001 AND sf0.01)."""
    exact = pin(
        cosine_topk(
            load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K
        )
    )
    hits = (
        exact.select("vec_id")
        .join(approx.select("vec_id"), "vec_id")
        .agg(F.count("*").alias("__hits"))
    )
    return exact.crossJoin(F.broadcast(hits)).select(
        "vec_id", "cosine", (F.col("__hits") >= floor_hits).alias("recall_ok")
    )


@register("sim_ivf_recall_check", oracle=_RECALL_ORACLE)
def sim_ivf_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to ``sim_ivf_ann_topk``: probing 2 of 8 IVF
    cells must recall ≥5 of the exact top-10 (measured 9, stable across
    centroid rebuilds).  Upgrades the partial-probe path from rows-only to
    a value check without oracling the nondeterministic centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _ivf_centroid_cache:
        from ..operators.similarity import ivf_build_centroids

        _ivf_centroid_cache[sf_dir] = ivf_build_centroids(
            emb, n_centroids=8, iterations=1
        )
    approx = ivf_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_centroids=8,
        n_probe=2,
        centroids=_ivf_centroid_cache[sf_dir],
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=_K // 2)


@register("sim_pq_scaled_refine_recall_check", oracle=_RECALL_ORACLE)
def sim_pq_scaled_refine_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with the CORPUS-DERIVED refine band (``pq_scaled_refine`` —
    VERDICT r12 next #4): the round-13 sweep measured the fixed refine=4
    cliffing at 4/10 on base sf0.1 and 0/10 at 50×; scaling the exact
    re-rank band with the corpus (n//125, clamped 4..64) restores the
    floor everywhere — measured 8/10 (sf0.01), 9/10 (sf0.1), 10/10
    (20× AND 50×, BASELINE.md round-13).  Floor ≥8, HIGHER than the
    fixed-dial entry's ≥5 (same pattern as the scaled-probe IVF
    entry)."""
    from ..operators.similarity import pq_ann_topk, pq_build_codebooks, pq_scaled_refine

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _pq_codebook_cache:
        _pq_codebook_cache[sf_dir] = pq_build_codebooks(emb)
    approx = pq_ann_topk(
        emb, _query_vec(spark, sf_dir), k=_K,
        refine=pq_scaled_refine(emb.count()),
        codebooks=_pq_codebook_cache[sf_dir],
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


@register("sim_pq_recall_check", oracle=_RECALL_ORACLE)
def sim_pq_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to ``sim_pq_ann_topk``: the LUT scan with
    refine=4 re-rank must recall ≥5 of the exact top-10 (measured 8,
    stable across codebook rebuilds).  Calibrated-band caveat (round-13
    sweep, BASELINE.md): the FIXED refine=4 band degrades off the oracle
    fixtures — 4/10 at sf0.1, 0/10 at 50× — which is why the derived-dial
    sibling ``sim_pq_scaled_refine_recall_check`` exists; this entry keeps
    the frozen dial so its calibration history stays comparable."""
    from ..operators.similarity import pq_ann_topk, pq_build_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _pq_codebook_cache:
        _pq_codebook_cache[sf_dir] = pq_build_codebooks(emb)
    approx = pq_ann_topk(
        emb, _query_vec(spark, sf_dir), k=_K, refine=4,
        codebooks=_pq_codebook_cache[sf_dir],
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=_K // 2)


def _bucket_stats_oracle() -> str:
    from .dedup_ops import _lsh_bucket_sql

    return f"""
    SELECT CAST({_lsh_bucket_sql("CAST(embedding AS DOUBLE[])", 4, 64)} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM embeddings
    GROUP BY 1
    """


@register("sim_lsh_bucket_stats", oracle=_bucket_stats_oracle())
def sim_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy histogram for the ANN index (skew diagnostic).
    Hash-checked: the deterministic hyperplanes are reproduced literally
    in the oracle, so bucket ids and occupancies must match exactly."""
    return lsh_bucket_stats(
        load_table(spark, sf_dir, "embeddings"), n_planes=4
    ).withColumnRenamed("__bucket", "bucket")


_SQ8_ORACLE = f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val
          FROM x),
    a AS (SELECT MAX(ABS(val)) AS a FROM e),
    c AS (SELECT e.vec_id, e.dim,
                 CASE WHEN a.a = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(FLOOR((e.val * 127.0) / a.a) AS BIGINT)
                 END AS code
          FROM e CROSS JOIN a),
    q AS (SELECT dim, code AS qq FROM c WHERE vec_id = {_QUERY_VEC_ID})
    SELECT c.vec_id, CAST(SUM(c.code * q.qq) AS BIGINT) AS sq8_score
    FROM c JOIN q USING (dim)
    GROUP BY c.vec_id
    ORDER BY sq8_score DESC, c.vec_id
    LIMIT {_K}
    """


@register("sim_sq8_ann_topk", oracle=_SQ8_ORACLE)
def sim_sq8_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN (the int8-embedding-dot family — the third
    index class next to LSH and IVF/PQ): one corpus-derived signed scale →
    int8 codes → BIGINT integer dot — every stage bit-deterministic, so
    the APPROXIMATE scores themselves are hash-checked (exact order
    statistic + integer arithmetic; no Lloyd jitter anywhere).  The scan
    is shuffle-free modulo the 1-row dial build and the k-row heap merge;
    codes are 4× smaller than the floats they replace.  The oracle
    quantizes through an exploded twin of the same expressions (the
    per-component products are integers, so summation order is free)."""
    from ..operators.similarity import sq8_ann_topk

    return sq8_ann_topk(
        load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K
    )


@register("sim_sq8_recall_check", oracle=_RECALL_ORACLE)
def sim_sq8_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion pinning SQ8's QUALITY, not just its
    determinism: the quantized top-10 must recall ≥8 of the exact float
    top-10 (8-bit symmetric quantization of unit-norm vectors perturbs
    each component by ≤1/127 of the corpus scale; the ≥8 floor leaves
    room for genuine near-ties — measured 10/10 at sf0.001 AND sf0.01)."""
    from ..operators.similarity import sq8_ann_topk

    approx = sq8_ann_topk(
        load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


# ---- ANN scale mitigations (VERDICT r11 next #2) ----------------------------
# The 20× sweep measured the FIXED dials degrading on scaled corpora:
# fixed-probe IVF (2 of 8 cells) misses replica-family members in unprobed
# cells, and the MAX(|x|) SQ8 scale is inflated ~3.5× by the fixture's dim-0
# spread.  These entries are the documented mitigations AS CODE, registered
# as parameterized variants — the original entries keep their frozen dials
# (their oracles and calibration history stay untouched).

_ivf_scaled_cache: dict[str, tuple[int, int, list[list[float]]]] = {}


def _scaled_ivf_index(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import ivf_build_centroids, ivf_scaled_dials

    if sf_dir not in _ivf_scaled_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        n_cells, n_probe = ivf_scaled_dials(emb.count())
        cents = ivf_build_centroids(emb, n_centroids=n_cells, iterations=1)
        _ivf_scaled_cache[sf_dir] = (n_cells, n_probe, cents)
    return _ivf_scaled_cache[sf_dir]


@register("sim_ivf_ann_topk_scaled_probe", oracle=_RECALL_ORACLE)
def sim_ivf_ann_topk_scaled_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with CORPUS-DERIVED dials (``ivf_scaled_dials``):
    n_cells grows with the table (64 vectors/cell, clamped 4..64) and
    n_probe tracks it at ~25%, so the probed fraction — and therefore
    recall — no longer decays as the corpus scales, where the fixed
    2-of-8 probe of ``sim_ivf_recall_check`` measurably did on the 20×
    replica fixture.  Recall-band oracle (Lloyd centroids are
    summation-order jittery, so the approximate rows can't hash): the
    exact top-10 is hash-checked and the scaled-probe index must recall
    ≥8 of it — a HIGHER floor than the fixed-dial entry's ≥5.  Measured
    hits: 9 (sf0.001), 9 (sf0.01), 8 (sf0.1), **10 at 20× where the
    fixed 2-of-8 dial measured 0/10** (BASELINE.md round-12)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _scaled_ivf_index(spark, sf_dir)
    approx = ivf_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_centroids=n_cells,
        n_probe=n_probe,
        centroids=cents,
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


_SQ8_CLIPPED_CTES = f"""
    x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val
          FROM x),
    cnt AS (SELECT CAST(CEIL(ABS(val) * 4096.0) AS BIGINT) AS g,
                   COUNT(*) AS c
            FROM e GROUP BY 1),
    cum AS (SELECT g,
                   SUM(c) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS running,
                   SUM(c) OVER () AS total
            FROM cnt),
    a AS (SELECT MIN(CASE WHEN running >= (995 * total + 999) // 1000
                          THEN g END) / 4096.0 AS a
          FROM cum),
    c AS (SELECT e.vec_id, e.dim,
                 CASE WHEN a.a = 0 THEN CAST(0 AS BIGINT)
                      ELSE GREATEST(CAST(-127 AS BIGINT),
                                    LEAST(CAST(127 AS BIGINT),
                                          CAST(FLOOR((e.val * 127.0) / a.a)
                                               AS BIGINT)))
                 END AS code
          FROM e CROSS JOIN a),
    q AS (SELECT dim, code AS qq FROM c WHERE vec_id = {_QUERY_VEC_ID})
    """

_SQ8_CLIPPED_ORACLE = f"""
    WITH {_SQ8_CLIPPED_CTES}
    SELECT c.vec_id, CAST(SUM(c.code * q.qq) AS BIGINT) AS sq8_score
    FROM c JOIN q USING (dim)
    GROUP BY c.vec_id
    ORDER BY sq8_score DESC, c.vec_id
    LIMIT {_K}
    """


@register("sim_sq8_ann_topk_clipped", oracle=_SQ8_CLIPPED_ORACLE)
def sim_sq8_ann_topk_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 ANN with the QUANTILE-CLIPPED scale (``sq8_clipped_dials``):
    the scale is the p99.5 order statistic of |component| instead of the
    max (quantile picked by measurement — see ``sq8_clipped_dials`` for
    the non-monotone recall-vs-clip curve), so an outlier tail can no
    longer coarsen every vector's codes (the 20× fixture's dim-0 spread
    inflated the MAX scale ~3.5×, driving recall@10 to 0/10; the clipped
    scale recovers 10/10 there and stays 10/10 on the base fixture).
    Values beyond the clip saturate to ±127 — FAISS's trained-SQ8
    behavior.  The quantile is a rank selection on a dyadic grid
    (CEIL(|x|·2^12), exact ops only), so the dial — and therefore every
    code and score — stays bit-deterministic: the APPROXIMATE top-k is
    hash-checked against an oracle replaying the identical grid, rank,
    clamp, and integer dot."""
    from ..operators.similarity import sq8_ann_topk_clipped

    return sq8_ann_topk_clipped(
        load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K
    )


@register("sim_sq8_clipped_recall_check", oracle=_RECALL_ORACLE)
def sim_sq8_clipped_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall companion for the clipped-scale SQ8: the quantized top-10
    must recall ≥8 of the exact float top-10 — same floor as the
    MAX-scale entry at fixture scale.  Measured hits: 9 (sf0.001),
    10 (sf0.01), 10 (sf0.1), **10 at 20× where the MAX scale measured
    0/10** (the mitigation's measurable claim; BASELINE.md round-12)."""
    from ..operators.similarity import sq8_ann_topk_clipped

    approx = sq8_ann_topk_clipped(
        load_table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=_K
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


# ---- SQ8 + exact-dot refine: the 50× offset-outlier answer ------------------
# (VERDICT r12 next #3 — the round's own honest finding: the p99.5 clip
# extends SQ8 to 20× but 0/10 at 50× on offset-outlier geometry.  The refine
# pass makes recall depend on the CANDIDATE SET, not on int8 resolving
# sub-step order — see operators.similarity.sq8_ann_topk_refined.)

# CORPUS-DERIVED refine band (the pq_scaled_refine pattern, min floor 8):
# clamp(8, 64, n // 125) — identical to the historical fixed 8 at the
# oracle fixtures (n = 500 → 8), growing to 64 past ~8k rows.  The 100×
# notch is why this is a dial and not a constant: int8 codes SATURATE on
# the fixture's dim-0 ladder there (everything beyond the clip rails at
# ±127), so the first pass ties en masse and the deterministic vec_id
# tiebreak fills a FIXED 80-candidate band with the lowest-id saturated
# rows — the true top-10 (highest offsets) never enter it, and refine
# can't rescue candidates never generated (measured: refine=8 → recall
# 0/10 for q0/q499 at 100×; derived refine=64 → 10/10 for every query).
_REFINE_MIN = 8

# DuckDB twin of pq_scaled_refine(n, min_refine=8)
_REF_DIAL = "(SELECT GREATEST(8, LEAST(64, COUNT(*) // 125)) AS refine FROM embeddings)"


def _sq8_refine(spark: SparkSession, sf_dir: str) -> int:
    from ..operators.similarity import pq_scaled_refine

    return pq_scaled_refine(
        load_table(spark, sf_dir, "embeddings").count(), min_refine=_REFINE_MIN
    )


_SQ8_REFINED_ORACLE = f"""
    WITH {_SQ8_CLIPPED_CTES},
    refdial AS {_REF_DIAL},
    cand AS (
        SELECT vec_id FROM (
            SELECT c.vec_id,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(SUM(c.code * q.qq) AS BIGINT) DESC,
                                c.vec_id
                   ) AS rn
            FROM c JOIN q USING (dim)
            GROUP BY c.vec_id
        ) t CROSS JOIN refdial WHERE rn <= refine * {_K}
    )
    SELECT cand.vec_id,
           ROUND(list_dot_product(CAST(emb.embedding AS DOUBLE[]),
                                  CAST(qv.embedding AS DOUBLE[])), 6) AS cosine
    FROM cand
    JOIN embeddings emb ON emb.vec_id = cand.vec_id
    CROSS JOIN (SELECT embedding FROM embeddings
                WHERE vec_id = {_QUERY_VEC_ID}) qv
    ORDER BY cosine DESC, cand.vec_id
    LIMIT {_K}
    """


@register("sim_sq8_ann_topk_refined", oracle=_SQ8_REFINED_ORACLE)
def sim_sq8_ann_topk_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scan → exact-dot refine: the int8 code scan nominates the top
    ``refine·k`` candidates (deterministic (score, id) order), and only
    those rows pay the exact float dot — FAISS's IndexRefineFlat shape
    over the clipped-scale codes.  Every stage bit-deterministic, so the
    REFINED top-k itself is hash-checked (stronger than the recall bands
    the Lloyd indexes support).  The refine band is CORPUS-DERIVED
    (clamp(8, 64, n//125) — equal to the original fixed 8 at the oracle
    fixtures, so historical rows carry over; see the 100× saturation-tie
    finding above for why a fixed band eventually excludes the true
    top-k).  This is the quantizer tier that survives the 50×
    offset-outlier geometry where the clipped first-pass ORDER measures
    0/10 (see the recall companion)."""
    from ..operators.similarity import sq8_ann_topk_refined

    return sq8_ann_topk_refined(
        load_table(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=_K,
        refine=_sq8_refine(spark, sf_dir),
    )


@register("sim_sq8_refined_recall_check", oracle=_RECALL_ORACLE)
def sim_sq8_refined_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall companion for the refined SQ8: the re-ranked top-10 must
    recall ≥8 of the exact float top-10.  The refine band is what the
    clip alone cannot be: robust to sub-step family geometry — measured
    hits 10/10 at every notch through 50× with the fixed band, and with
    the DERIVED band (identical at oracle scales) also 10/10 at 100×,
    where the fixed 8 measured 0/10 on the saturation-tie queries
    (BASELINE.md round-13)."""
    from ..operators.similarity import sq8_ann_topk_refined

    approx = sq8_ann_topk_refined(
        load_table(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=_K,
        refine=_sq8_refine(spark, sf_dir),
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


# ---- incremental ANN index maintenance (VERDICT r6 "Next round" #6) --------


def _inc_phash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5('0:' || {expr}), 1, 12)) AS BIGINT)"


@register(
    "sim_incremental_index_assign",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {_inc_phash("'inc:' || CAST(vec_id AS VARCHAR)")} % 4 AS side
        FROM embeddings
    ),
    base AS (SELECT vec_id, v FROM s WHERE side < 3),
    newb AS (SELECT vec_id, v FROM s WHERE side >= 3),
    nc AS (SELECT GREATEST(4, LEAST(64, COUNT(*) // 64)) AS k FROM base),
    ranked AS (
        SELECT vec_id AS cid, v AS cvec,
               ROW_NUMBER() OVER (
                   ORDER BY {_inc_phash("'icell:' || CAST(vec_id AS VARCHAR)")},
                            vec_id
               ) AS rnk
        FROM base
    ),
    c AS (SELECT cid, cvec, rnk FROM ranked WHERE rnk <= (SELECT k FROM nc)),
    a AS (
        SELECT MAX(ABS(val)) AS a
        FROM (SELECT unnest(v) AS val FROM base)
    ),
    dp AS (
        SELECT n.vec_id, c.cid, c.rnk, list_dot_product(n.v, c.cvec) AS d
        FROM newb n CROSS JOIN c
    ),
    asg AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, rnk) AS rn
        FROM dp
    ),
    codes AS (
        SELECT e.vec_id,
               CAST(SUM(CASE WHEN a.a = 0 THEN 0
                             ELSE CAST(FLOOR((e.val * 127.0) / a.a) AS BIGINT)
                                  * CAST(FLOOR((e.val * 127.0) / a.a) AS BIGINT)
                        END) AS BIGINT) AS sq8_self
        FROM (SELECT vec_id, unnest(v) AS val FROM newb) e CROSS JOIN a
        GROUP BY e.vec_id
    )
    SELECT asg.vec_id, asg.cid AS cell_id, codes.sq8_self
    FROM asg JOIN codes USING (vec_id)
    WHERE rn = 1
    """,
)
def sim_incremental_index_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN maintenance: the corpus splits 75/25 by portable
    hash into the EXISTING index side and a NEW ingest batch (the
    ``dedup_incremental_new_vs_base`` mechanism); centroid seeds
    (deterministic keyed-hash sample) and the SQ8 scale are computed from
    the index side only and FROZEN, and the new batch is assigned to the
    frozen cells + coded with the frozen scale — no rebuild, no
    re-assignment of history (drift pinned in
    tests/test_dedup_similarity.py).  The oracle nests the same frozen
    CTEs, so cell assignments AND integer code checksums are hash-exact.
    See ``operators/similarity.py:frozen_index_assign`` for the 100 TB
    posture (index = collected centroids + 1-row scale; only new-batch
    keys shuffle)."""
    from ..functions.text import portable_hash64
    from ..operators.similarity import frozen_index_assign

    emb = load_table(spark, sf_dir, "embeddings")
    side = F.pmod(
        portable_hash64(F.concat(F.lit("inc:"), F.col("vec_id").cast("string"))),
        F.lit(4),
    )
    base = emb.filter(side < 3)
    new = emb.filter(side >= 3)
    return frozen_index_assign(base, new)


_ivfpq_cache: dict[str, tuple] = {}


def _ivfpq_index(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import ivf_scaled_dials, ivfpq_build

    if sf_dir not in _ivfpq_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        n_cells, n_probe = ivf_scaled_dials(n)
        cents, cbs = ivfpq_build(emb, n_cells=n_cells)
        _ivfpq_cache[sf_dir] = (n, n_cells, n_probe, cents, cbs)
    return _ivfpq_cache[sf_dir]


@register("sim_ivfpq_residual_recall_check", oracle=_RECALL_ORACLE)
def sim_ivfpq_residual_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ RESIDUAL index (FAISS IndexIVFPQ — the next-tier quantizer
    VERDICT r12 named): the corpus-derived IVF quantizer picks the cell,
    PQ encodes vector − centroid, and the scan touches only the probed
    cells, scoring rows as the driver-precomputed per-cell base term plus
    the residual-code LUT sum.  Residuals have a far smaller dynamic
    range than raw vectors — the centroid absorbs cell-level offsets,
    including the offset-outlier dimension that collapses any GLOBAL
    SQ8/PQ scale at 50× (BASELINE.md round-12/13) — so the same code
    budget buys resolution exactly where the adversarial geometry needs
    it.  All dials corpus-derived: cells/probe from ``ivf_scaled_dials``,
    the exact re-rank band from ``pq_scaled_refine`` with an ≥8 floor
    (within-cell PQ order noise needs a wider band than raw PQ at small
    corpora: refine=4 measured 6/10 at sf0.001, refine=8 measures 9/10).
    Recall-band oracle (Lloyd centroids are summation-order jittery);
    floor ≥8, the scaled-tier contract.  Calibrated-band caveat
    (round-13 multi-query sweep, BASELINE.md): the floor is pinned to
    THIS entry's declared query (vec_id 0) as well as the fixture
    distribution — on the replica geometry, other queries' families can
    land in cells ranked LAST by centroid dot (probe ordering
    anti-correlated, prototype-proven irreducible), where only the
    scan-all-codes ``sim_sq8_ann_topk_refined`` tier stays 10/10 for
    every query."""
    from ..operators.similarity import ivfpq_ann_topk, pq_scaled_refine

    emb = load_table(spark, sf_dir, "embeddings")
    n, n_cells, n_probe, cents, cbs = _ivfpq_index(spark, sf_dir)
    approx = ivfpq_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_probe=n_probe,
        refine=pq_scaled_refine(n, min_refine=8),
        centroids=cents,
        codebooks=cbs,
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=8)


# ---- Balanced IVF: the first HASH-EXACT learned index ----------------------
# Round-13 late census of the 50x replica fixture (norm-skewed MIPS
# geometry) measured the standard build's two structural defects:
# first-id seeds all land in replica 0, and raw-dot assignment funnels
# 98,537 of 100k vectors into ONE cell (any probe of that cell is a
# full-table scan; any probe missing it recalls ~nothing).  The balanced
# build (hash-ranked seeds + cosine assignment, operators/similarity.py
# ivf_balanced_build) cuts the max cell to 10,758 and lifts the
# worst-query recall@10 at the scale notches (multi-query sweep:
# min 1 -> min 3 at 50x, min 1 -> min 4 at 20x at the same 25% probe
# budget).  A ball-bound probe ordering (q.c + |q|.radius) was
# prototyped and REJECTED: under funneled cells its apparent recovery
# was just probing the mega-cell (98.7% scanned); under balanced cells
# it chases big-radius cells that lack the query's neighbors (0/10).
#
# The Lloyd refinement uses DYADIC-GRID means (exact BIGINT moments,
# correctly-rounded divisions), so unlike every earlier learned index
# the centroids - and therefore the assignment, probe ranks, and
# approximate top-k itself - are bit-reproducible in DuckDB: this entry
# value-hashes the LEARNED index's output where its siblings can only
# band-check recall.

_ivf_balanced_cache: dict[str, tuple[int, int, list[list[float]]]] = {}


def _balanced_ivf_index(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import ivf_balanced_build, ivf_scaled_dials

    if sf_dir not in _ivf_balanced_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        n_cells, n_probe = ivf_scaled_dials(emb.count())
        cents = ivf_balanced_build(emb, n_cells)
        _ivf_balanced_cache[sf_dir] = (n_cells, n_probe, cents)
    return _ivf_balanced_cache[sf_dir]


_IVF_BALANCED_CTES = f"""
    v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    dial AS (
        SELECT k, GREATEST(2, LEAST(k, CAST(CEIL(0.25 * k) AS BIGINT))) AS np
        FROM (SELECT GREATEST(4, LEAST(64, COUNT(*) // 64)) AS k
              FROM embeddings) d
    ),
    ranked AS (
        SELECT vec_id, vec,
               ROW_NUMBER() OVER (
                   ORDER BY {_inc_phash("CAST(vec_id AS VARCHAR)")}, vec_id
               ) - 1 AS cell
        FROM v
    ),
    seeds AS (
        SELECT cell, vec FROM ranked CROSS JOIN dial WHERE cell < k
    ),
    sn AS (
        SELECT cell,
               list_transform(vec, x -> x / sqrt(list_dot_product(vec, vec)))
                   AS cn
        FROM seeds
    ),
    a0 AS (
        SELECT vec_id, vec, cell FROM (
            SELECT v.vec_id, v.vec, sn.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.vec, sn.cn) DESC, sn.cell
                   ) AS rn
            FROM v CROSS JOIN sn
        ) t WHERE rn = 1
    ),
    gs AS (
        SELECT cell, dim,
               CAST(SUM(CAST(FLOOR(val * 4096.0) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM (SELECT cell, generate_subscripts(vec, 1) AS dim,
                     unnest(vec) AS val
              FROM a0) e
        GROUP BY cell, dim
    ),
    cm AS (
        SELECT cell, list((CAST(s AS DOUBLE) / n) / 4096.0 ORDER BY dim)
                   AS mvec
        FROM gs GROUP BY cell
    ),
    c1 AS (
        SELECT seeds.cell, COALESCE(cm.mvec, seeds.vec) AS cvec
        FROM seeds LEFT JOIN cm ON seeds.cell = cm.cell
    ),
    c1n AS (
        SELECT cell, cvec,
               list_transform(cvec,
                              x -> x / sqrt(list_dot_product(cvec, cvec)))
                   AS cn
        FROM c1
    ),
    q AS (SELECT vec FROM v WHERE vec_id = {_QUERY_VEC_ID}),
    probe AS (
        SELECT cell FROM (
            SELECT c1n.cell,
                   ROW_NUMBER() OVER (
                       ORDER BY list_dot_product(c1n.cvec, q.vec) DESC,
                                c1n.cell
                   ) AS rn
            FROM c1n CROSS JOIN q
        ) p CROSS JOIN dial WHERE rn <= np
    ),
    a1 AS (
        SELECT vec_id, vec, cell FROM (
            SELECT v.vec_id, v.vec, c1n.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.vec, c1n.cn) DESC, c1n.cell
                   ) AS rn
            FROM v CROSS JOIN c1n
        ) t WHERE rn = 1
    )"""

_IVF_BALANCED_ORACLE = f"""
    WITH {_IVF_BALANCED_CTES}
    SELECT a1.vec_id,
           ROUND(list_dot_product(a1.vec, q.vec), 6) AS cosine,
           CAST(a1.cell AS INT) AS cell
    FROM a1 JOIN probe USING (cell) CROSS JOIN q
    ORDER BY cosine DESC, a1.vec_id
    LIMIT {_K}
    """


@register("sim_ivf_balanced_ann_topk", oracle=_IVF_BALANCED_ORACLE)
def sim_ivf_balanced_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced-IVF approximate top-k, value-hashed END TO END: the
    oracle replays the whole learned build — hash-ranked seeds, cosine
    assignment, the dyadic-grid Lloyd mean, seed fallback for empty
    cells, raw-dot probe ranking, and the probed-cells top-k — so the
    approximate result itself is the hash gate (its learned-index
    siblings can only band-check recall because float centroid means are
    summation-order jitter; the dyadic mean closes that split).  Probe
    budget is the standard ``ivf_scaled_dials`` 25%.  Output carries the
    winning ``cell`` so the assignment identity is hashed too."""
    from ..operators.similarity import ivf_balanced_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
    return ivf_balanced_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=cents,
    )


@register("sim_ivf_balanced_recall_check", oracle=_RECALL_ORACLE)
def sim_ivf_balanced_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall companion for the balanced tier — an honest TRADE entry,
    floor ≥4: balance spreads base-scale near-ties across cells, so
    vec-0 recall@10 is LOWER than the funneled scaled-probe entry at
    base notches (measured 7 sf0.001, 7 sf0.01, 4 sf0.1) and HIGHER
    where it matters structurally (10 at 20× AND 50×, where the index
    also has no mega-cell: max occupancy 10.8% vs 98.5%; worst-query
    multi-sweep min 4/3 vs the funneled build's 1).  Query-pinned
    calibrated band (BASELINE.md round-13 balanced-IVF census)."""
    from ..operators.similarity import ivf_balanced_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
    approx = ivf_balanced_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=cents,
    )
    return _recall_check(spark, sf_dir, approx, floor_hits=4)


# ---- IVF-PQ serving on the hash-exact stack (VERDICT r13 #3) ----------------
# The FAISS-IndexIVFPQ SERVING entry the residual tier lacked: balanced-IVF
# coarse quantizer (hash-exact, oracled above) + donor-sampled residual
# codebooks (n_codes hash-ranked rows' residual slices — zero training
# iterations, which is exactly what keeps the codebook SQL-replayable) +
# the corpus-derived exact-dot refine band.  Unlike sim_ivfpq_residual_*
# (Lloyd-float codebooks, band-only), the approximate top-k here is
# value-hashed end to end.

_ivfpq_bal_cb_cache: dict[str, list] = {}


def _balanced_pq_codebooks(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import ivfpq_balanced_codebooks

    if sf_dir not in _ivfpq_bal_cb_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        _, _, cents = _balanced_ivf_index(spark, sf_dir)
        _ivfpq_bal_cb_cache[sf_dir] = ivfpq_balanced_codebooks(emb, cents)
    return _ivfpq_bal_cb_cache[sf_dir]


_IVFPQ_BAL_ORACLE = f"""
    WITH {_IVF_BALANCED_CTES},
    refdial AS {_REF_DIAL},
    pv AS (
        SELECT a1.vec_id, a1.vec, a1.cell FROM a1 JOIN probe USING (cell)
    ),
    donors AS (
        SELECT did, code FROM (
            SELECT vec_id AS did,
                   ROW_NUMBER() OVER (
                       ORDER BY {_inc_phash("'pqd:' || CAST(vec_id AS VARCHAR)")},
                                vec_id
                   ) - 1 AS code
            FROM v) t WHERE code < 16
    ),
    cvd AS (
        SELECT cell, generate_subscripts(cvec, 1) AS dim, unnest(cvec) AS cval
        FROM c1
    ),
    dres AS (
        SELECT t.code, t.dim, t.val - cvd.cval AS rv,
               (t.dim - 1) // 8 AS s
        FROM (SELECT d.code, a1.cell,
                     generate_subscripts(a1.vec, 1) AS dim,
                     unnest(a1.vec) AS val
              FROM donors d JOIN a1 ON a1.vec_id = d.did) t
        JOIN cvd ON cvd.cell = t.cell AND cvd.dim = t.dim
    ),
    csub AS (
        SELECT code, s, list(rv ORDER BY dim) AS lc FROM dres GROUP BY code, s
    ),
    pres AS (
        SELECT t.vec_id, t.dim, t.val - cvd.cval AS rv,
               (t.dim - 1) // 8 AS s
        FROM (SELECT vec_id, cell, generate_subscripts(vec, 1) AS dim,
                     unnest(vec) AS val
              FROM pv) t
        JOIN cvd ON cvd.cell = t.cell AND cvd.dim = t.dim
    ),
    rsub AS (
        SELECT vec_id, s, list(rv ORDER BY dim) AS lr
        FROM pres GROUP BY vec_id, s
    ),
    enc AS (
        SELECT vec_id, s, code FROM (
            SELECT rsub.vec_id, rsub.s, csub.code,
                   ROW_NUMBER() OVER (
                       PARTITION BY rsub.vec_id, rsub.s
                       ORDER BY list_dot_product(rsub.lr, csub.lc) DESC,
                                csub.code
                   ) AS rn
            FROM rsub JOIN csub ON rsub.s = csub.s
        ) t WHERE rn = 1
    ),
    recon AS (
        SELECT enc.vec_id, list(w.cw ORDER BY enc.s, w.pos) AS rvec
        FROM enc JOIN (
            SELECT code, s, generate_subscripts(lc, 1) AS pos, unnest(lc) AS cw
            FROM csub) w ON w.code = enc.code AND w.s = enc.s
        GROUP BY enc.vec_id
    ),
    appr AS (
        SELECT pv.vec_id,
               list_dot_product(c1.cvec, q.vec)
                   + list_dot_product(q.vec, recon.rvec) AS a
        FROM pv JOIN recon USING (vec_id)
        JOIN c1 ON c1.cell = pv.cell CROSS JOIN q
    ),
    cand AS (
        SELECT vec_id FROM (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY a DESC, vec_id) AS rn
            FROM appr) t CROSS JOIN refdial WHERE rn <= refine * {_K}
    )
    SELECT v.vec_id, ROUND(list_dot_product(v.vec, q.vec), 6) AS cosine
    FROM v JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY cosine DESC, v.vec_id
    LIMIT {_K}
    """


@register("sim_ivfpq_ann_topk", oracle=_IVFPQ_BAL_ORACLE)
def sim_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ residual SERVING entry (VERDICT r13 #3 — the tier shipped
    the operator and the recall check but no first-class top-k query):
    the FAISS-IndexIVFPQ shape on the hash-exact stack.  Coarse level is
    the balanced IVF (hash-ranked seeds, cosine assignment, dyadic-grid
    Lloyd mean); PQ codewords are the 16 hash-ranked donor rows' residual
    slices (vector − owning centroid, driver-computed from bounded
    metadata); encoding is the dim-ordered Arrow kernel
    (``_pq_assign(exact=True)``) so kernel codes equal the oracle's
    relational argmax bit-for-bit; the first pass scores probed-cell rows
    as per-cell base term + dot(q, reconstructed residual); the top
    refine·k candidates (corpus-derived band, ``pq_scaled_refine`` ≥8,
    the saturation-cliff fix) pay the exact re-rank.  The whole pipeline
    — seeds, centroids, assignment, codebooks, codes, candidate band,
    final top-k — replays in DuckDB, so the approximate result itself is
    the hash gate.  See operators/similarity.py::ivfpq_balanced_ann_topk
    for the 100 TB scan shape."""
    from ..operators.similarity import ivfpq_balanced_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
    return ivfpq_balanced_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=_K,
        n_cells=n_cells,
        n_probe=n_probe,
        refine=_sq8_refine(spark, sf_dir),
        centroids=cents,
        codebooks=_balanced_pq_codebooks(spark, sf_dir),
    )


# ---- Distributed k-means (dyadic Lloyd) + cluster-prototype curation -------
# The balanced-IVF build generalized to a first-class CLUSTERING operator:
# R Lloyd rounds, every round's mean on the dyadic grid (exact BIGINT
# moments), so the full learned clustering value-hashes against an oracle
# that unrolls the rounds as generated chained CTEs (the BPE-training
# precedent applied to k-means).  Downstream, the D4-style curation move:
# keep only the Q most-central docs per embedding cluster
# (cluster-balanced downsampling — over-dense clusters stop dominating
# the corpus), Q corpus-derived.

_KMEANS_ROUNDS = 2


def _kmeans_ctes(rounds: int) -> str:
    """Unrolled k-means CTE chain: seeds -> (normalize, assign, grid-mean,
    COALESCE-fallback) x rounds -> final normalized centroids + assignment.
    Every arithmetic site is the portable form (left-fold dots, exact
    BIGINT grid moments, correctly-rounded divisions), so the chain is
    bit-identical to the Spark build at every round."""
    parts = [f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    dial AS (
        SELECT k, GREATEST(4, n // (4 * k)) AS q FROM (
            SELECT GREATEST(4, LEAST(64, COUNT(*) // 64)) AS k,
                   COUNT(*) AS n
            FROM embeddings) d
    ),
    ranked AS (
        SELECT vec_id, vec,
               ROW_NUMBER() OVER (
                   ORDER BY {_inc_phash("CAST(vec_id AS VARCHAR)")}, vec_id
               ) - 1 AS cell
        FROM v
    ),
    c0 AS (SELECT cell, vec AS cvec FROM ranked CROSS JOIN dial WHERE cell < k)"""]
    for r in range(rounds):
        parts.append(f""",
    c{r}n AS (
        SELECT cell,
               list_transform(cvec,
                              x -> x / sqrt(list_dot_product(cvec, cvec)))
                   AS cn
        FROM c{r}
    ),
    a{r} AS (
        SELECT vec_id, vec, cell FROM (
            SELECT v.vec_id, v.vec, c{r}n.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.vec, c{r}n.cn) DESC,
                                c{r}n.cell
                   ) AS rn
            FROM v CROSS JOIN c{r}n
        ) t WHERE rn = 1
    ),
    gs{r} AS (
        SELECT cell, dim,
               CAST(SUM(CAST(FLOOR(val * 4096.0) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM (SELECT cell, generate_subscripts(vec, 1) AS dim,
                     unnest(vec) AS val
              FROM a{r}) e
        GROUP BY cell, dim
    ),
    cm{r} AS (
        SELECT cell, list((CAST(s AS DOUBLE) / n) / 4096.0 ORDER BY dim)
                   AS mvec
        FROM gs{r} GROUP BY cell
    ),
    c{r + 1} AS (
        SELECT c{r}.cell, COALESCE(cm{r}.mvec, c{r}.cvec) AS cvec
        FROM c{r} LEFT JOIN cm{r} ON c{r}.cell = cm{r}.cell
    )""")
    parts.append(f""",
    cfn AS (
        SELECT cell,
               list_transform(cvec,
                              x -> x / sqrt(list_dot_product(cvec, cvec)))
                   AS cn
        FROM c{rounds}
    ),
    af AS (
        SELECT vec_id, vec, cell FROM (
            SELECT v.vec_id, v.vec, cfn.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.vec, cfn.cn) DESC, cfn.cell
                   ) AS rn
            FROM v CROSS JOIN cfn
        ) t WHERE rn = 1
    )""")
    return "".join(parts)


_kmeans_cache: dict[str, tuple[int, list[list[float]]]] = {}


def _kmeans_index(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import ivf_balanced_build, ivf_scaled_dials

    if sf_dir not in _kmeans_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        n_cells, _ = ivf_scaled_dials(emb.count())
        cents = ivf_balanced_build(emb, n_cells, iterations=_KMEANS_ROUNDS)
        _kmeans_cache[sf_dir] = (n_cells, cents)
    return _kmeans_cache[sf_dir]


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import _assign_cluster, _unit

    emb = load_table(spark, sf_dir, "embeddings")
    _, cents = _kmeans_index(spark, sf_dir)
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return _assign_cluster(
        emb.select("vec_id", dv.alias("__v")), [_unit(c) for c in cents], "__v"
    )


@register(
    "sim_kmeans_dyadic_clusters",
    oracle=f"""
    WITH {_kmeans_ctes(_KMEANS_ROUNDS)}
    SELECT vec_id, CAST(cell AS INT) AS cluster,
           CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS cluster_size
    FROM af
    """,
)
def sim_kmeans_dyadic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embedding corpus, {_KMEANS_ROUNDS}
    Lloyd rounds, fully value-hashed: hash-ranked seeds, cosine
    assignment (no raw-dot funnel), and DYADIC-GRID means each round
    (exact BIGINT moments per (cell, dim) + correctly-rounded divisions
    — float means are summation-order jitter, which is why the older
    ``lloyd_refine`` path is containment-tested instead of oracled).
    The oracle unrolls the rounds as generated chained CTEs (the
    BPE-training shape) and the full (vec_id, cluster, cluster_size)
    assignment hash-matches.  At scale: per round, one kernel pass over
    the vectors + one (cell, dim)-grouped shuffle of BIGINT moments;
    only k·d grid sums reach the driver per round."""
    w = Window.partitionBy("__cluster")
    return _kmeans_assigned(spark, sf_dir).select(
        "vec_id",
        F.col("__cluster").cast("int").alias("cluster"),
        F.count("*").over(w).cast("long").alias("cluster_size"),
    )


@register(
    "curation_cluster_prototypes",
    oracle=f"""
    WITH {_kmeans_ctes(_KMEANS_ROUNDS)},
    scored AS (
        SELECT af.vec_id, af.cell,
               list_dot_product(af.vec, cfn.cn)
                   / sqrt(list_dot_product(af.vec, af.vec)) AS centrality
        FROM af JOIN cfn USING (cell)
    ),
    rk AS (
        SELECT vec_id, cell, centrality,
               ROW_NUMBER() OVER (
                   PARTITION BY cell ORDER BY centrality DESC, vec_id
               ) AS rnk
        FROM scored
    )
    SELECT vec_id, CAST(cell AS INT) AS cluster,
           ROUND(centrality, 6) AS centrality
    FROM rk CROSS JOIN dial WHERE rnk <= q
    """,
)
def curation_cluster_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus downsampling (the D4-style curation move):
    keep only the Q most-CENTRAL docs per k-means cluster — over-dense
    embedding clusters (boilerplate families, template spam) stop
    dominating the training mix, and what survives is each cluster's
    prototypes.  Q is corpus-derived (GREATEST(4, n // (4k)) — a fixed
    cap would either starve small corpora or stop capping large ones).
    Centrality = cosine(vector, assigned centroid); everything from the
    seeds to the per-cluster rank is the portable arithmetic, so the
    KEPT SET itself is the hash gate, not a recall band."""
    from ..operators.similarity import dot

    emb_n = load_table(spark, sf_dir, "embeddings").count()
    n_cells, cents = _kmeans_index(spark, sf_dir)
    from ..operators.similarity import _unit

    cap = max(4, emb_n // (4 * n_cells))
    cn = [_unit(c) for c in cents]
    cn_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cn])
    assigned = _kmeans_assigned(spark, sf_dir)
    scored = assigned.select(
        "vec_id",
        F.col("__cluster").cast("int").alias("cluster"),
        (
            dot(F.col("__v"), F.element_at(cn_arr, F.col("__cluster") + 1))
            / F.sqrt(dot(F.col("__v"), F.col("__v")))
        ).alias("__centrality"),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("__centrality").desc(), "vec_id"
    )
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= cap)
        .select("vec_id", "cluster", F.round("__centrality", 6).alias("centrality"))
    )


# ---- Embedding-distribution drift audit over the k-means cells -------------

_DRIFT_ORACLE = f"""
    WITH {_kmeans_ctes(_KMEANS_ROUNDS)},
    sided AS (
        SELECT af.vec_id, af.cell, af.vec,
               {_inc_phash("'drift:' || CAST(vec_id AS VARCHAR)")} % 2 AS side
        FROM af
    ),
    shifted AS (
        SELECT vec_id, list_prepend(vec[1] + 4.0, vec[2:]) AS vec
        FROM sided WHERE side = 1
    ),
    ash AS (
        SELECT vec_id, cell FROM (
            SELECT s.vec_id, cfn.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY list_dot_product(s.vec, cfn.cn) DESC, cfn.cell
                   ) AS rn
            FROM shifted s CROSS JOIN cfn
        ) t WHERE rn = 1
    ),
    counts AS (
        SELECT cfn.cell,
               CAST(COALESCE(a.ca, 0) AS BIGINT) AS cnt_ref,
               CAST(COALESCE(a.cb, 0) AS BIGINT) AS cnt_same,
               CAST(COALESCE(sh.cs, 0) AS BIGINT) AS cnt_shift
        FROM cfn
        LEFT JOIN (SELECT cell,
                          SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS ca,
                          SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cb
                   FROM sided GROUP BY cell) a ON cfn.cell = a.cell
        LEFT JOIN (SELECT cell, COUNT(*) AS cs FROM ash GROUP BY cell) sh
               ON cfn.cell = sh.cell
    ),
    tot AS (
        SELECT CAST(SUM(cnt_ref) AS BIGINT) AS na,
               CAST(SUM(cnt_same) AS BIGINT) AS nb,
               CAST(SUM(cnt_shift) AS BIGINT) AS ns
        FROM counts
    ),
    num AS (
        SELECT cell, cnt_ref, cnt_same, cnt_shift,
               CAST(ABS(cnt_ref * nb - cnt_same * na) AS BIGINT) AS num_same,
               CAST(ABS(cnt_ref * ns - cnt_shift * na) AS BIGINT) AS num_shift
        FROM counts CROSS JOIN tot
    ),
    verdict AS (
        SELECT (5 * CAST(SUM(num_same) AS BIGINT)
                    <= 2 * (SELECT na FROM tot) * (SELECT nb FROM tot))
                   AS no_drift_same_dist,
               (5 * CAST(SUM(num_shift) AS BIGINT)
                    >= 2 * (SELECT na FROM tot) * (SELECT ns FROM tot))
                   AS drift_detected_planted
        FROM num
    )
    SELECT CAST(num.cell AS INT) AS cluster, cnt_ref, cnt_same, cnt_shift,
           num_same, num_shift, no_drift_same_dist, drift_detected_planted
    FROM num CROSS JOIN verdict
    """


@register("dq_embedding_drift_cells", oracle=_DRIFT_ORACLE)
def dq_embedding_drift_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift audit — the production monitor the
    streaming cell histogram exists to feed: two corpus snapshots are
    compared by their per-cell histograms under the FROZEN k-means index,
    via total-variation distance computed entirely in exact integers
    (per-cell numerator |cnt_ref·n_cur − cnt_cur·n_ref|; TV ≤ τ becomes
    the cross-multiplied integer comparison 5·Σnum ≤ 2·n_ref·n_cur for
    τ = 0.2 — no float summation anywhere, so every row AND the verdict
    hash-match).  Magnitude bound: cnt·n < 2^63 ⇒ each side under ~2^31
    rows; shard the statistic (sum numerators per shard) beyond that.

    Planted contract, not a statistical band: the same-distribution pair
    (portable-hash halves of one corpus) must NOT alarm, and a
    deterministic +4.0 dim-0 shift of the second half MUST (measured TV:
    same ≤ 0.101, shifted ≥ 0.333 across sf0.001..50× — τ = 0.2 splits
    with ≥2× margin at every notch)."""
    from ..functions.text import portable_hash64
    from ..operators.similarity import _assign_cluster, _unit

    emb = load_table(spark, sf_dir, "embeddings")
    _, cents = _kmeans_index(spark, sf_dir)
    cn = [_unit(c) for c in cents]
    d = len(cents[0])
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        dv.alias("__v"),
        (
            portable_hash64(
                F.concat(F.lit("drift:"), F.col("vec_id").cast("string"))
            )
            % 2
        ).alias("side"),
    )
    assigned = _assign_cluster(base, cn, "__v")
    shifted = base.filter(F.col("side") == 1).withColumn(
        "__v",
        F.concat(
            F.array(F.element_at("__v", 1) + F.lit(4.0)),
            F.slice(F.col("__v"), 2, d - 1),
        ),
    )
    ash = _assign_cluster(shifted, cn, "__v")
    ref_counts = assigned.groupBy("__cluster").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    sh_counts = ash.groupBy("__cluster").agg(F.count("*").cast("long").alias("cs"))
    cells = spark.range(len(cents)).select(F.col("id").cast("int").alias("cluster"))
    counts = (
        cells.join(
            ref_counts.withColumnRenamed("__cluster", "cluster"), "cluster", "left"
        )
        .join(sh_counts.withColumnRenamed("__cluster", "cluster"), "cluster", "left")
        .select(
            "cluster",
            F.coalesce("ca", F.lit(0)).cast("long").alias("cnt_ref"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cnt_same"),
            F.coalesce("cs", F.lit(0)).cast("long").alias("cnt_shift"),
        )
    )
    # tiny (k-row) frame with THREE downstream consumers in one action —
    # eagerly truncate so the two assignment passes underneath run once
    # (the r9 multi-consumer rule; ReuseExchange is not guaranteed under AQE)
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("cnt_ref").cast("long").alias("na"),
        F.sum("cnt_same").cast("long").alias("nb"),
        F.sum("cnt_shift").cast("long").alias("ns"),
    )
    num = counts.crossJoin(F.broadcast(tot)).select(
        "cluster",
        "cnt_ref",
        "cnt_same",
        "cnt_shift",
        F.abs(F.col("cnt_ref") * F.col("nb") - F.col("cnt_same") * F.col("na"))
        .cast("long")
        .alias("num_same"),
        F.abs(F.col("cnt_ref") * F.col("ns") - F.col("cnt_shift") * F.col("na"))
        .cast("long")
        .alias("num_shift"),
        "na",
        "nb",
        "ns",
    )
    verdict = num.agg(
        (
            F.lit(5) * F.sum("num_same").cast("long")
            <= F.lit(2) * F.first("na") * F.first("nb")
        ).alias("no_drift_same_dist"),
        (
            F.lit(5) * F.sum("num_shift").cast("long")
            >= F.lit(2) * F.first("na") * F.first("ns")
        ).alias("drift_detected_planted"),
    )
    return num.drop("na", "nb", "ns").crossJoin(F.broadcast(verdict))


# ---- Batched multi-query refined-SQ8 recall ---------------------------------

# CORPUS-DERIVED query set (VERDICT r13 #4 — de-pin the multi-query batch):
# qmod = GREATEST(100, n // 5) keeps the batch at ~5 queries at EVERY scale
# (never corpus-proportional — the RAG qmod lesson) while spreading the
# query ids across the whole vec_id domain, so at the replica notches the
# batch probes every replica stripe instead of being pinned inside
# replica 0.  At the oracle fixtures (n=500) qmod=100 → qids 0..400.
_MQ_QDIAL = "(SELECT GREATEST(100, COUNT(*) // 5) AS qmod FROM embeddings)"


def _mq_query_ids(spark: SparkSession, sf_dir: str) -> list[int]:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qmod = max(100, n // 5)
    return [
        r[0]
        for r in emb.filter(F.col("vec_id") % qmod == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]


_SQ8_MQ_ORACLE = f"""
    WITH {_SQ8_CLIPPED_CTES},
    qdial AS {_MQ_QDIAL},
    qs AS (
        SELECT vec_id AS qid, dim, code AS qq
        FROM c CROSS JOIN qdial WHERE vec_id % qmod = 0
    ),
    sc AS (
        SELECT qs.qid, c.vec_id, CAST(SUM(c.code * qs.qq) AS BIGINT) AS s
        FROM c JOIN qs USING (dim)
        GROUP BY qs.qid, c.vec_id
    ),
    refdial AS {_REF_DIAL},
    cand AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY s DESC, vec_id
                   ) AS rn
            FROM sc
        ) t CROSS JOIN refdial WHERE rn <= refine * {_K}
    ),
    qv AS (
        SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings CROSS JOIN qdial WHERE vec_id % qmod = 0
    ),
    exsc AS (
        SELECT qv.qid, a.vec_id,
               ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), qv.v), 6)
                   AS cos
        FROM embeddings a CROSS JOIN qv
    ),
    extop AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY cos DESC, vec_id
                   ) AS rn
            FROM exsc
        ) t WHERE rn <= {_K}
    ),
    reftop AS (
        SELECT qid, vec_id FROM (
            SELECT exsc.qid, exsc.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY exsc.qid ORDER BY exsc.cos DESC, exsc.vec_id
                   ) AS rn
            FROM exsc JOIN cand USING (qid, vec_id)
        ) t WHERE rn <= {_K}
    )
    , hits AS (
        SELECT qid, CAST(COUNT(*) AS BIGINT) AS h
        FROM reftop JOIN extop USING (qid, vec_id)
        GROUP BY qid
    )
    -- LEFT JOIN from the query set + COALESCE so a total recall collapse
    -- still emits recall_at_10 = 0 / recall_ok = false (ADVICE r13): an
    -- inner join here would silently drop the exact failure mode this
    -- entry asserts against.
    SELECT qv.qid,
           COALESCE(hits.h, CAST(0 AS BIGINT)) AS recall_at_10,
           COALESCE(hits.h, CAST(0 AS BIGINT)) >= 8 AS recall_ok
    FROM qv LEFT JOIN hits ON qv.qid = hits.qid
    """


@register("sim_sq8_refined_recall_multiquery", oracle=_SQ8_MQ_ORACLE)
def sim_sq8_refined_recall_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving for the ROBUST tier, with the round-13
    multi-query sweep's caveat closed in-contract and the query set
    DE-PINNED (VERDICT r13 #4): the batch is ~5 queries DERIVED from the
    corpus (vec_id % GREATEST(100, n//5) = 0 — spread across the whole id
    domain, so replica-fixture notches are probed in every stripe, never
    just replica 0; count stays ~5 at any scale, the RAG qmod lesson).
    The queries ride as a broadcast frame (codes + doubles, no driver
    round-trip), one corpus scan scores all of them, and the per-query
    recall@10 of the exact-dot-refined top-k is computed as exact
    integers (hash-checked, not band-checked — both engines reproduce
    both top-k sets bit-for-bit).  A query with ZERO overlap still emits
    recall_at_10=0/recall_ok=false (left-join + coalesce both sides —
    ADVICE r13).  Floor ≥8 per query; the corpus-derived refine band
    measured 10/10 at sf0.1, 20×, 50×, AND 100× — the fixed refine=8
    form measured 0/10 for two queries at 100× (the saturation-tie
    finding; BASELINE.md round-13); derived-set recall re-swept r14."""
    from ..operators.similarity import sq8_refined_recall_batch

    return sq8_refined_recall_batch(
        load_table(spark, sf_dir, "embeddings"),
        _mq_query_ids(spark, sf_dir),
        k=_K,
        refine=_sq8_refine(spark, sf_dir),
        floor_hits=8,
    )


# ---- Two-index ENSEMBLE serving (round 14) ----------------------------------
# The de-pinned multi-query sweep's finding (BASELINE.md round-14): at 20×
# sq8_refined is 10/10 on base-corpus queries but 3–5/10 inside the
# saturated replica stripes, while balanced-IVF is the exact mirror — no
# single tier dominates the adversarial geometry.  The classic serving
# answer is an ensemble: union both tiers' candidates, ONE exact-dot
# re-rank — recall ≥ pointwise max of the members by construction, and
# both generators are hash-exact, so the per-query recall integers still
# value-hash.

# shared CTE prefix of the ensemble multi-query oracles: both index
# builds, the derived query batch, per-qid candidate union, and the
# exact per-(qid, vec) scores — reused verbatim by the recall oracle and
# the streaming top-k oracle so the ensemble definition cannot diverge
_ENSEMBLE_MQ_CTES = f"""{_IVF_BALANCED_CTES},
    qdial AS {_MQ_QDIAL},
    refdial AS {_REF_DIAL},
    sqe AS (
        SELECT vec_id, generate_subscripts(vec, 1) AS dim, unnest(vec) AS val
        FROM v
    ),
    sqcnt AS (SELECT CAST(CEIL(ABS(val) * 4096.0) AS BIGINT) AS g,
                     COUNT(*) AS c
              FROM sqe GROUP BY 1),
    sqcum AS (SELECT g,
                     SUM(c) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS running,
                     SUM(c) OVER () AS total
              FROM sqcnt),
    sqa AS (SELECT MIN(CASE WHEN running >= (995 * total + 999) // 1000
                            THEN g END) / 4096.0 AS a
            FROM sqcum),
    sqc AS (SELECT sqe.vec_id, sqe.dim,
                   CASE WHEN sqa.a = 0 THEN CAST(0 AS BIGINT)
                        ELSE GREATEST(CAST(-127 AS BIGINT),
                                      LEAST(CAST(127 AS BIGINT),
                                            CAST(FLOOR((sqe.val * 127.0) / sqa.a)
                                                 AS BIGINT)))
                   END AS code
            FROM sqe CROSS JOIN sqa),
    mq AS (
        SELECT vec_id AS qid FROM v CROSS JOIN qdial WHERE vec_id % qmod = 0
    ),
    qcodes AS (
        SELECT mq.qid, sqc.dim, sqc.code AS qq
        FROM sqc JOIN mq ON sqc.vec_id = mq.qid
    ),
    qvecs AS (
        SELECT mq.qid, v.vec AS qv FROM v JOIN mq ON v.vec_id = mq.qid
    ),
    ssc AS (
        SELECT qcodes.qid, sqc.vec_id,
               CAST(SUM(sqc.code * qcodes.qq) AS BIGINT) AS s
        FROM sqc JOIN qcodes USING (dim)
        GROUP BY qcodes.qid, sqc.vec_id
    ),
    cand_sq8 AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY s DESC, vec_id
                   ) AS rn
            FROM ssc
        ) t CROSS JOIN refdial WHERE rn <= refine * {_K}
    ),
    qprobe AS (
        SELECT qid, cell FROM (
            SELECT qvecs.qid, c1n.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY qvecs.qid
                       ORDER BY list_dot_product(c1n.cvec, qvecs.qv) DESC,
                                c1n.cell
                   ) AS rn
            FROM c1n CROSS JOIN qvecs
        ) p CROSS JOIN dial WHERE rn <= np
    ),
    cand_ivf AS (
        SELECT qprobe.qid, a1.vec_id
        FROM a1 JOIN qprobe ON a1.cell = qprobe.cell
    ),
    cands AS (
        SELECT qid, vec_id FROM cand_sq8
        UNION
        SELECT qid, vec_id FROM cand_ivf
    ),
    exsc AS (
        SELECT qvecs.qid, v.vec_id,
               ROUND(list_dot_product(v.vec, qvecs.qv), 6) AS cos
        FROM v CROSS JOIN qvecs
    )"""

_ENSEMBLE_MQ_ORACLE = f"""
    WITH {_ENSEMBLE_MQ_CTES},
    extop AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY cos DESC, vec_id
                   ) AS rn
            FROM exsc
        ) t WHERE rn <= {_K}
    ),
    reftop AS (
        SELECT qid, vec_id FROM (
            SELECT exsc.qid, exsc.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY exsc.qid
                       ORDER BY exsc.cos DESC, exsc.vec_id
                   ) AS rn
            FROM exsc JOIN cands USING (qid, vec_id)
        ) t WHERE rn <= {_K}
    ),
    hits AS (
        SELECT qid, CAST(COUNT(*) AS BIGINT) AS h
        FROM reftop JOIN extop USING (qid, vec_id)
        GROUP BY qid
    )
    SELECT mq.qid,
           COALESCE(hits.h, CAST(0 AS BIGINT)) AS recall_at_10,
           COALESCE(hits.h, CAST(0 AS BIGINT)) >= 8 AS recall_ok
    FROM mq LEFT JOIN hits ON mq.qid = hits.qid
    """


@register("sim_ensemble_recall_multiquery", oracle=_ENSEMBLE_MQ_ORACLE)
def sim_ensemble_recall_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENSEMBLE ANN serving: clipped-SQ8 refine band ∪ balanced-IVF probed
    cells per derived query, one exact-dot re-rank over the union — the
    serving shape for the round-14 de-pinned sweep's finding that no
    single index dominates the replica geometry (sq8_refined covers
    base-corpus queries, balanced-IVF covers the saturated stripes; the
    union's recall is ≥ the pointwise max at every query by
    construction, see operators/similarity.py::ensemble_refined_recall_batch).
    Query set is the corpus-derived batch (vec_id % GREATEST(100, n//5));
    both candidate generators and the re-rank are bit-deterministic, so
    the per-query recall INTEGERS hash against an oracle replaying both
    index builds; a total collapse still emits recall_ok=false (LEFT
    JOIN + COALESCE both sides).  Floor ≥8 per query — a calibrated
    band, measured 10/10 at sf0.1 AND 20× where each member tier alone
    dips to 3–4 (BASELINE.md round-14)."""
    from ..operators.similarity import ensemble_refined_recall_batch

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
    return ensemble_refined_recall_batch(
        emb,
        _mq_query_ids(spark, sf_dir),
        cents,
        n_probe,
        k=_K,
        refine=_sq8_refine(spark, sf_dir),
        floor_hits=8,
    )


_ENSEMBLE_TOPK_ORACLE = f"""
    WITH {_IVF_BALANCED_CTES},
    refdial AS {_REF_DIAL},
    sqe AS (
        SELECT vec_id, generate_subscripts(vec, 1) AS dim, unnest(vec) AS val
        FROM v
    ),
    sqcnt AS (SELECT CAST(CEIL(ABS(val) * 4096.0) AS BIGINT) AS g,
                     COUNT(*) AS c
              FROM sqe GROUP BY 1),
    sqcum AS (SELECT g,
                     SUM(c) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS running,
                     SUM(c) OVER () AS total
              FROM sqcnt),
    sqa AS (SELECT MIN(CASE WHEN running >= (995 * total + 999) // 1000
                            THEN g END) / 4096.0 AS a
            FROM sqcum),
    sqc AS (SELECT sqe.vec_id, sqe.dim,
                   CASE WHEN sqa.a = 0 THEN CAST(0 AS BIGINT)
                        ELSE GREATEST(CAST(-127 AS BIGINT),
                                      LEAST(CAST(127 AS BIGINT),
                                            CAST(FLOOR((sqe.val * 127.0) / sqa.a)
                                                 AS BIGINT)))
                   END AS code
            FROM sqe CROSS JOIN sqa),
    sqq AS (SELECT dim, code AS qq FROM sqc WHERE vec_id = {_QUERY_VEC_ID}),
    ssc AS (
        SELECT sqc.vec_id, CAST(SUM(sqc.code * sqq.qq) AS BIGINT) AS s
        FROM sqc JOIN sqq USING (dim)
        GROUP BY sqc.vec_id
    ),
    cand_sq8 AS (
        SELECT vec_id FROM (
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS rn
            FROM ssc
        ) t CROSS JOIN refdial WHERE rn <= refine * {_K}
    ),
    cand_ivf AS (
        SELECT a1.vec_id FROM a1 JOIN probe USING (cell)
    ),
    cands AS (
        SELECT vec_id FROM cand_sq8 UNION SELECT vec_id FROM cand_ivf
    )
    SELECT v.vec_id, ROUND(list_dot_product(v.vec, q.vec), 6) AS cosine
    FROM v JOIN cands USING (vec_id) CROSS JOIN q
    ORDER BY cosine DESC, v.vec_id
    LIMIT {_K}
    """


@register("sim_ensemble_ann_topk", oracle=_ENSEMBLE_TOPK_ORACLE)
def sim_ensemble_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query ENSEMBLE serving entry — the top-k twin of
    `sim_ensemble_recall_multiquery`: union the clipped-SQ8 refine band
    with the balanced-IVF probed cells, exact-dot re-rank the union,
    emit the top-10 (vec_id, cosine).  Both candidate generators and the
    re-rank are bit-deterministic, so the APPROXIMATE result itself is
    the hash gate (the oracle replays both index builds and the union).
    This is the shape a user serves: the round-14 sweep measured the
    ensemble as the only tier at 10/10 recall for every query at every
    notch through 100× (BASELINE.md round-14)."""
    from ..operators.similarity import ensemble_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells, n_probe, cents = _balanced_ivf_index(spark, sf_dir)
    return ensemble_ann_topk(
        emb,
        _query_vec(spark, sf_dir),
        cents,
        n_probe,
        k=_K,
        refine=_sq8_refine(spark, sf_dir),
    )
