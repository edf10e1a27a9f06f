"""Algorithmic soundness tests for the dedup/similarity extension operators:
non-vacuity (the corpus's planted near-dups are actually found), LSH recall
vs the exact baselines, and hand-computable golden cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from hunger_games_glue_streaming_etl_spark.operators.similarity import (
    cosine_topk,
    lsh_ann_topk,
)
from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

from conftest import SF_DIR


def test_assign_cluster_kernel_matches_expression_path(spark):
    """The Arrow assignment kernel (k > 16 path) must produce EXACTLY the
    expression path's cluster ids: its column-at-a-time accumulation is
    the same left-fold add sequence, so even near-tie argmaxes agree.
    Forced on 20 centroids (past the auto-switch threshold)."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        _assign_cluster,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = emb.orderBy("vec_id").limit(20).collect()
    cents = [[float(x) for x in r.embedding] for r in seeds]
    expr = {
        r["vec_id"]: r["__cluster"]
        for r in _assign_cluster(emb, cents, "embedding", kernel=False)
        .select("vec_id", "__cluster")
        .collect()
    }
    kern = {
        r["vec_id"]: r["__cluster"]
        for r in _assign_cluster(emb, cents, "embedding", kernel=True)
        .select("vec_id", "__cluster")
        .collect()
    }
    assert expr == kern and len(expr) == emb.count()


def test_connected_components_golden_graph(spark):
    """Hand-checkable fixpoint: a 4-node chain (transitive closure across
    edges that were never a direct pair), a 2-node island, and a singleton
    — labels are the min reachable id, sizes count whole components."""
    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        component_sizes,
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 7, 8, 9]], ["id"])
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (7, 8)], ["src", "dst"]
    )
    out = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in component_sizes(connected_components(nodes, edges)).collect()
    }
    assert out == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        7: (7, 2), 8: (7, 2),
        9: (9, 1),
    }


def test_exact_dedup_finds_planted_duplicates(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),  # same after normalization
            (3, "something else"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in exact_dedup_groups(docs).collect()}
    assert out[1]["group_size"] == 2 and out[2]["group_size"] == 2
    assert out[1]["canonical_id"] == 1 and out[2]["canonical_id"] == 1
    assert out[3]["group_size"] == 1


def test_ngram_jaccard_nonvacuous_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, jaccard_threshold=0.5).collect()
    assert len(pairs) > 0  # the corpus plants near-dup pairs
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH (4 bands x 4 rows) must recall the high-similarity pairs: at
    jaccard >= 0.8 the probability a pair shares no band is
    (1 - 0.8^4)^4 < 12% per pair; the planted pairs are ~0.9+."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, jaccard_threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
    }
    assert lsh <= exact  # verify step guarantees no false positives
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.75  # recall bound for the band config


def test_simhash_identical_docs_zero_hamming(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark window join batch stream filter"),
            (2, "spark window join batch stream filter"),
            (3, "completely different vocabulary entirely here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0


def test_simhash_kernel_matches_expression_form(spark):
    """The Arrow vote-fold kernel (`simhash_fingerprints`) must be
    bit-for-bit equal to the pure-expression `functions.text.simhash` —
    the expression form IS the oracle's spec, so any divergence breaks
    the hash gate.  Covers empty text, single token, mixed whitespace,
    and a long repetitive doc."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.functions.text import simhash
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "x"),
            (3, "  a\tb\nc  d   e "),
            (4, "spark " * 300),
            (5, "the quick brown fox jumps over the lazy dog"),
            (6, None),  # NULL text -> NULL fingerprint, not a kernel crash
        ],
        ["doc_id", "text"],
    )
    kern = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    expr = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", simhash("text", SIMHASH_BITS).alias("s")
        ).collect()
    }
    assert kern == expr


def test_fuzzy_salting_losslessly_splits_hot_prefix_bucket(spark):
    """A templated corpus puts f docs behind ONE 16-char prefix (the f²
    join-key blowup).  Salting must (a) keep results identical to the
    plain equi-join — every in-bucket pair still meets exactly once — and
    (b) split the hot bucket into ⌈f/cap⌉ bounded groups."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        fuzzy_levenshtein_pairs,
    )

    template = "dear valued customer thank you for contacting support about "
    rows = [(i, template + f"issue number {i} case") for i in range(40)]
    rows += [(100 + i, f"unrelated document {i} with its own opening line") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def pairset(salt_cap):
        return {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in fuzzy_levenshtein_pairs(
                docs, max_distance=12, salt_cap=salt_cap
            ).collect()
        }

    plain, salted = pairset(None), pairset(8)
    assert plain == salted
    assert len(plain) > 0  # the template pairs are within 12 edits
    # the 40-doc bucket splits into ceil(40/8)=5 groups of ≤8: the salted
    # per-key build side is bounded at salt_cap even though f=40
    assert len({(a, b) for a, b in plain if a < 40 and b < 40}) > 0


def test_simhash_chunk_occupancy_at_sf01(spark):
    """64-bit fingerprints must actually spread across the 16-bit chunk
    space — the round-2 scale flag was 32-bit/8-bit chunks giving only 256
    bucket values per chunk.  At sf0.1 (5k docs) the four chunk parts
    together must occupy ≥4096 distinct (part, chunk) buckets."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        SIMHASH_BITS,
        _chunk_bounds,
        simhash_fingerprints,
    )

    assert SIMHASH_BITS == 64
    bounds = _chunk_bounds(SIMHASH_BITS, 4)
    assert bounds == [(0, 16), (16, 16), (32, 16), (48, 16)]
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("part"),
                        F.shiftrightunsigned("simhash", start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for p, (start, width) in enumerate(bounds)
                ]
            )
        ).alias("pc")
    ).select("pc.part", "pc.chunk")
    occupancy = chunks.distinct().count()
    assert occupancy >= 4096, f"only {occupancy} distinct (part, chunk) buckets"


def test_lsh_ann_results_subset_of_exact_scores(spark):
    """ANN results must score identically to the exact path (same verify
    expression) and achieve reasonable recall on the bucketed subset."""
    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(emb, q, k=50).collect()}
    approx = {r["vec_id"]: r["cosine"] for r in lsh_ann_topk(emb, q, k=10, n_planes=4).collect()}
    assert 0 in approx  # the query vector itself shares its own bucket
    assert approx[0] == max(approx.values())
    for vid, cos in approx.items():
        if vid in exact:
            assert exact[vid] == cos  # identical scoring expression


def test_ivf_ann_full_probe_equals_exact(spark):
    """Probing ALL cells makes IVF an exact scan — same top-k as brute
    force; probing fewer cells returns a subset with identical scores."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_build_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    cents = ivf_build_centroids(emb, n_centroids=8, iterations=1)
    exact = [
        (r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()
    ]
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivf_ann_topk(
            emb, q, k=10, n_centroids=8, n_probe=8, centroids=cents
        ).collect()
    ]
    assert full == exact
    part = {
        r["vec_id"]: r["cosine"]
        for r in ivf_ann_topk(
            emb, q, k=10, n_centroids=8, n_probe=2, centroids=cents
        ).collect()
    }
    assert 0 in part  # the query vector's own cell is always probed
    exact_scores = dict(exact)
    for vid, cos in part.items():
        if vid in exact_scores:
            assert cos == exact_scores[vid]


def test_ivf_seeds_robust_to_sparse_string_ids(spark):
    """IVF seeding must not assume dense 0-based ids: UUID-style string
    keys (where ``id < k`` matches nothing) must still seed a working
    index, cycling seeds when the table is smaller than n_centroids."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_build_centroids,
    )

    dim = 8
    rows = [
        (f"doc-{i * 7919 % 97:02x}-uuid", [float(i == j) for j in range(dim)])
        for i in range(5)
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    cents = ivf_build_centroids(emb, n_centroids=8, iterations=1)
    assert len(cents) == 8 and all(len(c) == dim for c in cents)
    out = ivf_ann_topk(
        emb, rows[0][1], k=2, n_centroids=8, n_probe=8, centroids=cents
    ).collect()
    assert out[0]["vec_id"] == rows[0][0] and out[0]["cosine"] == 1.0


def test_broadcast_probe_cached_and_bypassable(spark):
    """The bounded broadcast-ceiling probe must run at most one job per
    distinct plan per session (it regressed pair queries 2× when paid per
    call), and a caller-supplied row count must skip the probe entirely."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        _broadcast_probe_cache,
        _fits_broadcast,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    _broadcast_probe_cache.clear()
    assert _fits_broadcast(emb, 200_000, None)
    assert len(_broadcast_probe_cache) == 1
    assert _fits_broadcast(emb, 200_000, None)  # second call is a cache hit
    assert len(_broadcast_probe_cache) == 1
    assert not _fits_broadcast(emb, 10, None)  # over-ceiling probe says no
    _broadcast_probe_cache.clear()
    assert not _fits_broadcast(emb, 10, 11)  # known count: no probe, no entry
    assert _fits_broadcast(emb, 10, 10)
    assert len(_broadcast_probe_cache) == 0


def test_pq_and_lsh_pairs_robust_to_sparse_ids_and_empty_input(spark):
    """PQ codebooks must not assume dense 0-based ids (seed from the
    n_codes smallest ids, cycle when the table is small); lsh_bucket_pairs
    must return empty, not crash, on an empty table."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        lsh_bucket_pairs,
        pq_ann_topk,
        pq_build_codebooks,
    )

    dim = 8
    rows = [(1000 + 7 * i, [float(i == j) for j in range(dim)]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_build_codebooks(emb, n_subspaces=2, n_codes=16, dim=dim)
    assert len(cb) == 2 and all(len(c) == 16 for c in cb)  # cycled seeds
    out = pq_ann_topk(
        emb, rows[0][1], k=3, n_subspaces=2, n_codes=16, refine=5, codebooks=cb
    ).collect()
    assert out[0]["vec_id"] == 1000 and out[0]["cosine"] == 1.0

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_bucket_pairs(empty).collect() == []


def test_pq_ann_full_refine_equals_exact_and_partial_overlaps(spark):
    """refine×k covering the table makes PQ re-rank everything with the
    exact dot — must equal the brute-force top-k; at partial refine the
    returned cosines must agree with exact wherever ids overlap."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        cosine_topk,
        pq_ann_topk,
        pq_build_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(emb.vec_id == 0).select("embedding").head()[0])
    cb = pq_build_codebooks(emb)
    exact = [
        (r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()
    ]
    n = emb.count()
    full = [
        (r["vec_id"], r["cosine"])
        for r in pq_ann_topk(emb, q, k=10, refine=n, codebooks=cb).collect()
    ]
    assert full == exact
    part = {
        r["vec_id"]: r["cosine"]
        for r in pq_ann_topk(emb, q, k=10, refine=4, codebooks=cb).collect()
    }
    assert 0 in part and part[0] == 1.0  # the query vector always survives
    exact_scores = dict(exact)
    for vid, cos in part.items():
        if vid in exact_scores:
            assert cos == exact_scores[vid]


def test_blocked_exact_pairs_bitwise_equal_codegen(spark):
    """The numpy column-at-a-time scan must be BIT-identical to the
    expression-tree brute force (same sequential accumulation order)."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        embedding_pairs_exact_blocked,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    a = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, cosine_threshold=0.2).collect()
    }
    b = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_pairs_exact_blocked(emb, cosine_threshold=0.2).collect()
    }
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)  # bitwise, no tolerance


def test_ngram_jaccard_df_cap_adversarial_stopword_corpus(spark):
    """Every doc shares a boilerplate phrase (its shingles have DF = n_docs,
    the f² join-blowup case).  With a cap below that DF the boilerplate is
    excluded from candidate generation, yet reported pairs and Jaccard
    values stay identical to the uncapped exact form, because verification
    recomputes over ALL shingles."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    boiler = "this document is provided as is without warranty"
    # unique tail long enough that boilerplate-only overlap stays < 0.5
    docs = [
        (i, boiler + " " + " ".join(f"tok{i}x{j}" for j in range(12)))
        for i in range(40)
    ]
    # planted near-dup: docs 100/101 differ by one trailing word
    docs += [
        (100, f"{boiler} the quick brown fox jumps over the lazy dog today"),
        (101, f"{boiler} the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5, df_cap=10).collect()
    }
    assert (100, 101) in exact  # the planted pair clears the threshold
    assert capped == exact  # same pairs, bit-identical jaccard values


def test_ngram_jaccard_df_cap_recall_cliff_at_group_multiplicity(spark):
    """The cap's ONE loss mode, pinned: a duplicate group of multiplicity
    m > df_cap shares ONLY shingles of DF = m, so every shared shingle is
    excluded from candidate generation and the whole group is silently
    missed.  Sizing the cap above the expected duplicate multiplicity
    recovers it exactly (the 20×-corpus measurement in BASELINE.md's
    round-11 sweep: survivors need base-DF ≤ cap/k, so at replication
    k > cap recall cliffs).  Operationally: df_cap bounds per-shingle join
    work at cap² and must sit ABOVE the duplication profile's group sizes;
    mega-groups beyond any affordable cap belong to the exact-hash and
    MinHash-LSH tiers (``pipeline_near_dedup`` composes them)."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    m = 14  # group multiplicity, above the cap under test
    docs = [(i, f"{common} suffix{i}") for i in range(m)]
    # filler docs with no overlap so the corpus isn't one giant group
    docs += [
        (200 + i, " ".join(f"fill{i}w{j}" for j in range(12))) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5).collect()
    }
    group_pairs = {(a, b) for a in range(m) for b in range(a + 1, m)}
    assert group_pairs <= set(exact)  # replicas clear the 0.5 threshold

    # cap BELOW the multiplicity: every shared shingle has DF = m > cap,
    # none generates candidates — the whole group vanishes (the cliff)
    cliffed = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5, df_cap=10).collect()
    }
    assert cliffed.isdisjoint(group_pairs)

    # cap ABOVE the multiplicity: bit-identical to the exact form
    recovered = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5, df_cap=16).collect()
    }
    assert recovered == exact


def test_minhash_lsh_bucket_cap_recall_cliff(spark):
    """The LSH band join's scale guard, symmetric to df_cap: a duplicate
    group of multiplicity m with IDENTICAL signatures fills every band
    bucket to exactly m members, so ``bucket_cap`` below m drops the
    whole group (hard cliff — no correction arm exists), while a cap
    above m is bit-identical to uncapped.  A merely NEAR-identical group
    degrades gradually instead: divergent shingles scatter some bands
    into sub-buckets that stay under the cap, so a subset of the group's
    pairs survives — the cap's loss mode is probabilistic for near-dups
    and total only at signature-identical multiplicity > cap."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    m = 14
    # identical-text group: every minhash signature identical → every band
    # bucket holds all m members
    docs = [(i, common) for i in range(m)]
    # near-identical group (textually disjoint from the identical group so
    # their band buckets never merge): unique suffix diverges some slots
    common2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    docs += [(100 + i, f"{common2} suffix{i}") for i in range(m)]
    docs += [
        (200 + i, " ".join(f"fill{i}w{j}" for j in range(12))) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    }
    ident_pairs = {(a, b) for a in range(m) for b in range(a + 1, m)}
    near_pairs = {(100 + a, 100 + b) for a in range(m) for b in range(a + 1, m)}
    assert ident_pairs <= set(uncapped)  # jaccard = 1.0 group fully recalled
    assert near_pairs & set(uncapped)

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5, bucket_cap=10).collect()
    }
    # hard cliff: the identical group's buckets all have size 14 > 10
    assert capped.isdisjoint(ident_pairs)
    # gradual degradation: the near-dup group keeps only a strict subset
    assert capped & near_pairs
    assert not near_pairs <= capped

    # cap above the multiplicity: bit-identical to uncapped
    recovered = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=0.5, bucket_cap=2 * m
        ).collect()
    }
    assert recovered == uncapped


def test_fuzzy_levenshtein_pairs_golden_and_blocking(spark):
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        fuzzy_levenshtein_pairs,
    )

    common = "the quick brown fox jumps over the lazy dog and keeps running"
    docs = spark.createDataFrame(
        [
            (1, common + " tonight"),
            (2, common + " tonite"),          # distance 3 from doc 1
            (3, "Z" + common),                 # different prefix -> blocked out
            (4, common + " " + "x" * 60),      # same prefix, distance > cap
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_levenshtein_pairs(docs, max_distance=10).collect()
    }
    assert out == {(1, 2): 3}
    # on the fixture corpus: non-vacuous, and every pair is a true near-dup
    fixture = load_table(spark, SF_DIR, "documents")
    pairs = fuzzy_levenshtein_pairs(fixture).collect()
    assert pairs and all(0 <= r["distance"] <= 24 for r in pairs)


def test_lsh_bucket_pairs_full_probe_equals_exact(spark):
    """probe_radius = n_planes makes every pair a candidate — the bucketed
    scale path must then reproduce the exact scan bit-for-bit; a partial
    radius must return a subset with identical cosines."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        lsh_bucket_pairs,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_bucket_pairs(emb, n_planes=4, probe_radius=4).collect()
    }
    assert full == exact  # recall 1 at full probe, bit-identical cosines
    partial = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_bucket_pairs(emb, n_planes=4, probe_radius=1).collect()
    }
    assert partial  # non-vacuous on the fixture corpus
    assert set(partial) <= set(exact)
    assert all(partial[k] == exact[k] for k in partial)


def test_tiled_exact_pairs_bitwise_equal_and_no_driver_collect(spark):
    """The distributed block-pair plan (no driver materialization) must be
    bit-identical to the broadcast fast path, and the dispatcher must
    route to it above the row ceiling."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        embedding_pairs_exact_blocked,
        embedding_pairs_exact_tiled,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_pairs_exact_blocked(emb).collect()
    }
    tiled = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_pairs_exact_tiled(emb).collect()
    }
    assert tiled == fast  # bitwise, no tolerance
    # dispatcher: a tiny ceiling forces the tiled plan — same result
    routed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_pairs_exact_blocked(emb, max_broadcast_rows=10).collect()
    }
    assert routed == fast


def test_shingle_df_stays_below_cap_at_fixture_scale(spark):
    """``dedup_ngram_jaccard_pairs`` and ``curation_clean_corpus`` run with
    ``df_cap=64`` but are hash-checked against the UNCAPPED-exact oracle;
    equality is exact-by-construction only while no shingle's document
    frequency reaches the cap (a capped-out shingle can only hide a pair
    whose EVERY shared shingle is hot).  Pin that coupling: a fixture or
    sf change that pushes DF past the cap must fail loudly here, not
    mysteriously at the correctness gate.  (ADVICE r2: max DF was 25.)"""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import shingle_sets

    for sf_dir in ("/root/testdata/sf0.001", SF_DIR):
        docs = load_table(spark, sf_dir, "documents")
        sh = shingle_sets(docs, "text", "doc_id", 3)
        max_df = sh.groupBy("shingle").count().agg(F.max("count")).first()[0]
        assert max_df < 64, f"{sf_dir}: hottest shingle DF {max_df} >= cap 64"


def test_star_contraction_matches_propagation(spark):
    """The large-star/small-star variant is a drop-in: identical labels to
    the propagation loop on the golden graph AND on a seeded random graph
    (cross-validated implementations — the two share no code path)."""
    import random

    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 7, 8, 9]], ["id"])
    edges = spark.createDataFrame([(2, 1), (2, 3), (4, 3), (7, 8)], ["src", "dst"])
    prop = {
        r["node"]: r["component_id"]
        for r in connected_components(nodes, edges).collect()
    }
    star = {
        r["node"]: r["component_id"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert star == prop

    rng = random.Random(42)
    n = 120
    redges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(80)
    ]
    redges = [(a, b) for a, b in redges if a != b]
    rnodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    redf = spark.createDataFrame(redges, ["src", "dst"])
    prop = {
        r["node"]: r["component_id"]
        for r in connected_components(rnodes, redf).collect()
    }
    star = {
        r["node"]: r["component_id"]
        for r in connected_components_star(rnodes, redf).collect()
    }
    assert star == prop and len(star) == n


def test_star_contraction_handles_long_chain(spark):
    """The adversarial input the propagation loop can't do in bounded
    rounds: a 200-node path needs ~200 propagation rounds (the loop's
    bound raises), but star contraction collapses it in O(log n) —
    max_rounds=15 suffices and every node labels 0."""
    import pytest as _pytest

    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])

    with _pytest.raises(RuntimeError):
        connected_components(nodes, chain, max_rounds=5)

    labels = connected_components_star(nodes, chain, max_rounds=15).collect()
    assert len(labels) == n
    assert {r["component_id"] for r in labels} == {0}


def test_reliable_checkpoint_dir_parity(spark, tmp_path):
    """VERDICT r4 #3: both CC loops accept a ``checkpoint_dir`` that
    routes per-round truncation through reliable ``DataFrame.checkpoint``
    (survives executor loss on a real fleet) — results identical to the
    localCheckpoint default on a graph deep enough to need several
    rounds."""
    import random

    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    # splice in a 12-node chain so the propagation loop runs >3 rounds
    edges += [(100 + i, 101 + i) for i in range(11)]
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(n)) + list(range(100, 112))], ["id"]
    )
    edf = spark.createDataFrame(edges, ["src", "dst"])

    ckpt = str(tmp_path / "reliable_ckpt")
    local = {
        r["node"]: r["component_id"]
        for r in connected_components(nodes, edf).collect()
    }
    reliable = {
        r["node"]: r["component_id"]
        for r in connected_components(nodes, edf, checkpoint_dir=ckpt).collect()
    }
    assert reliable == local
    star_reliable = {
        r["node"]: r["component_id"]
        for r in connected_components_star(
            nodes, edf, checkpoint_dir=ckpt
        ).collect()
    }
    assert star_reliable == local


def test_quadratic_baseline_routes_to_tiled_above_ceiling(spark):
    """VERDICT r4 #5: ``embedding_near_dup_pairs`` is guarded — above the
    row ceiling it returns the distributed tiled plan (mapInPandas block
    pairs, no crossJoin anywhere), value-identical to the small-input
    crossJoin baseline."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    baseline = embedding_near_dup_pairs(emb, cosine_threshold=0.3)
    assert "CartesianProduct" in baseline._jdf.queryExecution().executedPlan().toString() or \
        "BroadcastNestedLoopJoin" in baseline._jdf.queryExecution().executedPlan().toString()

    routed = embedding_near_dup_pairs(
        emb, cosine_threshold=0.3, max_crossjoin_rows=10, known_row_count=1000
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # the tiled plan's only nested-loop is the B×B BLOCK-pair cross (one
    # aggregated row per block — bounded by n_blocks², never by table
    # rows); the row-level cross is gone, replaced by the mapInPandas
    # block kernel
    assert "MapInPandas" in plan
    assert "MapInPandas" not in baseline._jdf.queryExecution().executedPlan().toString()

    base = {(r["id_a"], r["id_b"]): r["cosine"] for r in baseline.collect()}
    tiled = {(r["id_a"], r["id_b"]): r["cosine"] for r in routed.collect()}
    assert tiled == base and len(base) > 0


def test_sq8_ann_recall_and_determinism(spark):
    """Symmetric-int8 ANN: (a) the quantized top-10 recalls ≥8 of the exact
    float top-10 (measured 10/10 at sf0.001 and sf0.01 — pinned at the
    entry's band, not the measurement, so genuine near-ties at other
    corpora don't flake); (b) the scores are integers and repeat-run
    bit-identical (the property that lets the registry entry hash-check
    the APPROXIMATE result, unlike Lloyd-built IVF/PQ); (c) the query
    vector ranks itself first — the quantized dot is maximal at the
    query itself for unit-norm inputs."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        cosine_topk,
        sq8_ann_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    approx = sq8_ann_topk(emb, q, k=10).collect()
    exact = {r.vec_id for r in cosine_topk(emb, q, k=10).collect()}
    assert len({r.vec_id for r in approx} & exact) >= 8
    assert all(isinstance(r.sq8_score, int) for r in approx)
    assert approx[0].vec_id == 0  # self-match ranks first
    rerun = sq8_ann_topk(emb, q, k=10).collect()
    assert [(r.vec_id, r.sq8_score) for r in rerun] == [
        (r.vec_id, r.sq8_score) for r in approx
    ]


def test_triangle_counts_planted_graphs(spark):
    """triangle_counts on graphs with known censuses: K4 (4 triangles,
    12 wedges), a 4-cycle (0 triangles, 4 wedges), and two triangles
    sharing one edge (the bowtie-with-shared-edge: K4 minus one edge —
    2 triangles).  Also pins that a hub star (no closures) yields zero
    triangles while its wedges count fully."""
    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        triangle_counts,
    )

    def census(edges):
        df = spark.createDataFrame(edges, "x long, y long")
        [row] = triangle_counts(df).collect()
        return (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles)

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert census(k4) == (4, 6, 12, 4)

    cycle4 = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert census(cycle4) == (4, 4, 4, 0)

    shared_edge = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]  # K4 minus (3,4)
    assert census(shared_edge) == (4, 5, 8, 2)

    star = [(1, k) for k in range(2, 8)]  # hub of degree 6
    assert census(star) == (7, 6, 15, 0)


# ---- image perceptual-hash dedup (round 7) ---------------------------------


def test_image_hash_roundtrip_and_invariance():
    """PGM encode/decode reproduces the planted raster, and dHash is
    invariant to the global brightness shift within a doc group (the
    property that makes it perceptual)."""
    import numpy as np

    from hunger_games_glue_streaming_etl_spark.operators.image_hash import (
        IMG_H,
        IMG_W,
        _hashes_from_raster,
        decode_pgm_raster,
        planted_pixels,
    )
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import encode_pgm

    for doc_id in (0, 1, 17, 123):
        px = planted_pixels(doc_id)
        back = decode_pgm_raster(encode_pgm(IMG_W, IMG_H, px))
        assert back.shape == (IMG_H, IMG_W)
        assert bytes(back.tobytes()) == px

    def dh(d):
        r = np.frombuffer(planted_pixels(d), dtype=np.uint8).reshape(IMG_H, IMG_W)
        return _hashes_from_raster(r)[:2]

    # doc_ids 40 and 41 share base 10, neither is perturbed (d % 5 != 4)
    assert dh(40) == dh(41)
    # the perturbed member (24 % 5 == 4, base 6) stays within Hamming <= 2
    # of its unperturbed group-mate 25
    h0, h1 = dh(25), dh(24)
    ham = bin(h0[0] ^ h1[0]).count("1") + bin(h0[1] ^ h1[1]).count("1")
    assert 0 <= ham <= 2


def test_image_dhash_bucket_boundedness(spark):
    """The pigeonhole screen's 16-bit chunk buckets stay small (bounded
    candidate volume — the 100 TB claim), and every group pair survives
    verification."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.operators.image_hash import (
        image_hash_fingerprints,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fp = image_hash_fingerprints(docs)
    n = fp.count()
    chunks = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("part"),
                        F.shiftrightunsigned(F.col(c), s)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for p, (c, s) in enumerate(
                        [("dh_hi", 0), ("dh_hi", 16), ("dh_lo", 0), ("dh_lo", 16)]
                    )
                ]
            )
        ).alias("pc"),
    ).select("doc_id", "pc.part", "pc.chunk")
    max_bucket = (
        chunks.groupBy("part", "chunk").count().agg(F.max("count")).head()[0]
    )
    # 500 docs in 125 four-doc groups: a bucket holds a group's docs plus
    # rare mixer near-collisions, never a corpus-scale cluster
    assert max_bucket <= 24, max_bucket
    assert n == docs.count()


def test_incremental_index_assign_no_drift(spark):
    """Frozen-index contract: ingesting a new batch never perturbs the
    assignments of vectors already in the index — the cell of every base
    vector is identical whether computed before or after the new batch
    exists, because seeds and the SQ8 scale derive from the index side
    only."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.functions.text import portable_hash64
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        frozen_index_assign,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    side = F.pmod(
        portable_hash64(F.concat(F.lit("inc:"), F.col("vec_id").cast("string"))),
        F.lit(4),
    )
    base = emb.filter(side < 3)
    new = emb.filter(side >= 3)

    before = {
        r.vec_id: (r.cell_id, r.sq8_self)
        for r in frozen_index_assign(base, base).collect()
    }
    # "after ingest": same frozen index, base re-assigned alongside new rows
    combined = frozen_index_assign(base, base.unionAll(new)).collect()
    after = {r.vec_id: (r.cell_id, r.sq8_self) for r in combined}
    assert len(new.collect()) > 0
    for vid, cell in before.items():
        assert after[vid] == cell, vid
    # and the new batch actually landed in frozen cells
    new_ids = {r.vec_id for r in new.select("vec_id").collect()}
    frozen_cells = {c for c, _ in before.values()}
    assert new_ids <= set(after)
    assert all(after[v][0] in frozen_cells for v in new_ids)


def test_hi_lo_screen_collapses_duplicate_fingerprints(spark):
    """Exact-duplicate-heavy corpora must cost O(k), not k^2/2 (VERDICT r7
    #1): k=500 copies of one fingerprint emit exactly k-1 Hamming-0 edges
    to the min-id representative, and only the DISTINCT fingerprints are
    screened (one near edge between the two distinct-but-close hashes,
    carried by their representatives)."""
    from hunger_games_glue_streaming_etl_spark.operators.image_hash import (
        hi_lo_near_pairs,
    )

    K = 500
    viral = [(1000 + i, 0xDEADBEEF, 0x12345678) for i in range(K)]
    # a second group, Hamming 2 from the viral hash, duplicated 3x
    close = [(5000 + i, 0xDEADBEEC, 0x12345678) for i in range(3)]
    # a far-away singleton: no edges at all
    far = [(9000, 0x0F0F0F0F, 0xF0F0F0F0)]
    fp = spark.createDataFrame(viral + close + far, "doc_id long, hi long, lo long")
    rows = hi_lo_near_pairs(fp, "hi", "lo").collect()
    dup = [(r.id_a, r.id_b) for r in rows if r.hamming == 0]
    near = [(r.id_a, r.id_b, r.hamming) for r in rows if r.hamming > 0]
    # O(k): 499 + 2 representative edges, 1 near edge — never 124750 pairs
    assert len(rows) == (K - 1) + 2 + 1
    assert set(dup) == {(1000, 1000 + i) for i in range(1, K)} | {
        (5000, 5001),
        (5000, 5002),
    }
    assert near == [(1000, 5000, 2)]


def test_audio_fingerprint_roundtrip_and_dc_invariance():
    """WAV encode/decode reproduces the planted samples; the fingerprint is
    invariant to the DC offset within a doc group and within Hamming 2 of
    the one-sample-perturbed member."""
    from hunger_games_glue_streaming_etl_spark.operators.audio_hash import (
        decode_wav_samples,
        fingerprint_from_samples,
        planted_samples,
    )
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import encode_wav

    for doc_id in (0, 7, 24, 123):
        s = planted_samples(doc_id)
        assert decode_wav_samples(encode_wav(8000, s)) == s

    def fp(d):
        return fingerprint_from_samples(planted_samples(d))

    assert fp(40) == fp(41)  # DC offset only
    h0, h1 = fp(25), fp(24)  # 24 % 5 == 4: perturbed group member
    ham = bin(h0[0] ^ h1[0]).count("1") + bin(h0[1] ^ h1[1]).count("1")
    assert 0 <= ham <= 2


def test_hi_lo_screen_equals_bruteforce_on_adversarial_hashes(spark):
    """The pigeonhole screen must return EXACTLY the brute-force Hamming<=3
    pair set — including pairs whose differing bits are spread across 3
    different chunks (caught only via the 4th), and excluding Hamming-4
    pairs whether their flips share one chunk (candidate found, verify
    rejects) or touch all four (no candidate, correctly none needed)."""
    import hashlib

    from hunger_games_glue_streaming_etl_spark.operators.image_hash import (
        hi_lo_near_pairs,
    )

    def base_fp(i):
        v = int(hashlib.md5(f"fp:{i}".encode()).hexdigest()[:16], 16)
        return (v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF

    def flip(hi, lo, bits):
        for b in bits:
            if b < 32:
                hi ^= 1 << b
            else:
                lo ^= 1 << (b - 32)
        return hi, lo

    rows = []
    for i in range(40):
        hi, lo = base_fp(i)
        rows.append((100 * i, hi, lo))
        if i % 4 == 0:  # hamming-3 neighbor spanning chunks 0, 1, 2
            rows.append((100 * i + 1, *flip(hi, lo, [5, 20, 40])))
        if i % 4 == 1:  # hamming-4 all four chunks: must NOT pair
            rows.append((100 * i + 2, *flip(hi, lo, [5, 20, 40, 55])))
        if i % 4 == 2:  # hamming-4 inside one chunk: candidate, verify kills
            rows.append((100 * i + 3, *flip(hi, lo, [1, 2, 3, 4])))
        if i % 4 == 3:  # hamming-1 at a chunk boundary bit
            rows.append((100 * i + 4, *flip(hi, lo, [31])))
    fp = spark.createDataFrame(rows, "doc_id long, hi long, lo long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hi_lo_near_pairs(fp, "hi", "lo").collect()
    }
    exp = {}
    for i, (ida, ha, la) in enumerate(rows):
        for idb, hb, lb in rows[i + 1 :]:
            a, b = (ida, idb) if ida < idb else (idb, ida)
            ham = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
            if ham <= 3:
                exp[(a, b)] = ham
    assert got == exp and len(exp) >= 20


def test_video_fingerprint_roundtrip_and_invariance():
    """Y4M encode/parse reproduces the planted luma planes; the XOR-fold
    fingerprint is brightness-invariant within a clip group and within
    Hamming 2 of the one-pixel-one-frame perturbed member."""
    from hunger_games_glue_streaming_etl_spark.operators.video_hash import (
        FRAME_STRIDE,
        N_FRAMES,
        decode_y4m_luma_frames,
        planted_clip,
        planted_luma,
        video_fingerprint_from_clip,
    )

    clip = planted_clip(17)
    frames = decode_y4m_luma_frames(clip, 1)
    assert len(frames) == N_FRAMES
    for f, raster in enumerate(frames):
        assert raster.tobytes() == planted_luma(17, f)
    assert len(decode_y4m_luma_frames(clip, FRAME_STRIDE)) == 3

    def fp(d):
        return video_fingerprint_from_clip(planted_clip(d))

    assert fp(40) == fp(41)  # brightness shift only
    h0, h1 = fp(25), fp(24)  # 24 % 5 == 4: perturbed member, frame 0
    ham = bin(h0[0] ^ h1[0]).count("1") + bin(h0[1] ^ h1[1]).count("1")
    assert 0 <= ham <= 2


def test_ngram_jaccard_derived_cap_survives_replication(spark):
    """VERDICT r11 next #4: the corpus-derived cap must recover duplicate
    groups the fixed floor loses.  An 80-way near-identical group shares
    only DF=80 shingles, so df_cap=64 (the old constant) drops every
    candidate — the pinned cliff.  ``derived_df_cap`` sizes the cap from
    the DF histogram (GREATEST(64, 4·p99)): the group's own hot shingles
    push p99 to 80, the dial lands at 320 > 80, and the result is
    bit-identical to the uncapped exact form.  On a low-duplication
    corpus the dial evaluates to the 64 floor, so fixed-cap parity at
    fixture scale is by construction."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        derived_df_cap,
        ngram_jaccard_pairs,
    )

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    m = 80  # group multiplicity above the fixed 64 floor
    docs = [(i, f"{common} suffix{i}") for i in range(m)]
    docs += [
        (200 + i, " ".join(f"fill{i}w{j}" for j in range(12))) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    group_pairs = {(a, b) for a in range(m) for b in range(a + 1, m)}

    # the fixed floor loses the whole group (every shared shingle DF=80)
    cliffed = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5, df_cap=64).collect()
    }
    assert cliffed.isdisjoint(group_pairs)

    # the derived dial tracks the duplication profile past the floor...
    dial = derived_df_cap(df)
    cap = dial.head()[0]
    assert cap == 4 * m  # p99 of the DF histogram = the group multiplicity

    # ...and recovers the group bit-identically to the uncapped exact form
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5).collect()
    }
    recovered = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, jaccard_threshold=0.5, df_cap_dial=dial
        ).collect()
    }
    assert group_pairs <= set(recovered)
    assert recovered == exact

    # low-duplication corpus: the dial sits AT the floor (fixed-cap parity)
    low = spark.createDataFrame(
        [(i, " ".join(f"solo{i}w{j}" for j in range(12))) for i in range(30)],
        "doc_id long, text string",
    )
    assert derived_df_cap(low).head()[0] == 64


def test_minhash_lsh_derived_bucket_cap_recovers_group(spark):
    """The derived dial serves the LSH bucket cap too: an 80-way
    identical-text group fills every band bucket to 80, so the fixed 64
    cap drops the group entirely (the hard cliff), while
    ``derived_df_cap``'s duplication-tracking value (320 here) keeps it
    — bit-identical to the uncapped form."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        derived_df_cap,
        minhash_lsh_pairs,
    )

    m = 80
    text = "omicron pi rho sigma tau upsilon phi chi psi omega"
    docs = [(i, text) for i in range(m)]
    docs += [
        (200 + i, " ".join(f"fill{i}w{j}" for j in range(12))) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    group_pairs = {(a, b) for a in range(m) for b in range(a + 1, m)}

    cliffed = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, bucket_cap=64).collect()
    }
    assert cliffed.isdisjoint(group_pairs)

    dial = derived_df_cap(df)
    recovered = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, bucket_cap_dial=dial).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df).collect()
    }
    assert group_pairs <= recovered
    assert recovered == uncapped


def test_derived_dials_degenerate_inputs(spark):
    """Degenerate corpora must produce well-defined dials: an empty corpus
    yields the 64 floor (GREATEST skips the NULL min); an all-zero
    embedding corpus yields scale 0 and the a==0 guard maps every code to
    0 (no divide-by-zero, deterministic)."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import derived_df_cap
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        sq8_ann_topk_clipped,
        sq8_clipped_dials,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert derived_df_cap(empty).head()[0] == 64

    zeros = spark.createDataFrame(
        [(i, [0.0] * 8) for i in range(4)], "vec_id long, embedding array<float>"
    )
    assert sq8_clipped_dials(zeros).head()[0] == 0.0
    rows = sq8_ann_topk_clipped(zeros, [0.0] * 8, k=3).collect()
    assert [r["sq8_score"] for r in rows] == [0, 0, 0]


def test_cluster_split_keeps_families_intact_where_doc_split_leaks(spark):
    """The leak `split_by_near_dup_cluster` exists to prevent,
    demonstrated: hash-splitting by doc_id straddles some near-dup
    family across train/holdout (training on a holdout doc's near-twin),
    while hash-splitting by the family's component label moves whole
    families together — every component is single-split by construction,
    and singletons keep per-doc behavior."""
    from hunger_games_glue_streaming_etl_spark.functions.text import (
        portable_hash64,
    )
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from hunger_games_glue_streaming_etl_spark.operators.graph import (
        connected_components,
    )
    from pyspark.sql import functions as F

    # 40 near-dup families of 4 (shared phrase + tiny suffix) — enough
    # families that a 90/10 doc-hash split almost surely cuts one
    docs = []
    for fam in range(40):
        base = " ".join(f"fam{fam}tok{j}" for j in range(12))
        for m in range(4):
            docs.append((fam * 10 + m, f"{base} suffix{m}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    pairs = minhash_lsh_pairs(df)
    labels = connected_components(
        df.select("doc_id"), pairs.select("id_a", "id_b"),
        id_col="doc_id", src_col="id_a", dst_col="id_b",
    )
    # families actually detected as one component (LSH recall < 1.0 on
    # low-overlap suffixes is fine — the leak claim needs only the
    # detected multi-member components)
    doc_split = F.when(
        F.pmod(portable_hash64(F.col("node").cast("string")), F.lit(100)) < 90,
        "train",
    ).otherwise("holdout")
    cluster_split = F.when(
        F.pmod(
            portable_hash64(F.col("component_id").cast("string")), F.lit(100)
        ) < 90,
        "train",
    ).otherwise("holdout")
    per_component = (
        labels.select("node", "component_id", doc_split.alias("by_doc"),
                      cluster_split.alias("by_cluster"))
        .groupBy("component_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("by_doc").alias("doc_sides"),
            F.countDistinct("by_cluster").alias("cluster_sides"),
        )
        .filter(F.col("n") > 1)
        .collect()
    )
    assert per_component, "fixture must yield multi-member components"
    # cluster split: NO family straddles
    assert all(r["cluster_sides"] == 1 for r in per_component)
    # doc split: at least one family leaks across the boundary
    assert any(r["doc_sides"] > 1 for r in per_component)


def test_family_canonical_pairs_routes_sparse_on_heavy_duplication(
    spark, monkeypatch
):
    """The duplication-routed family entry (VERDICT r14 next #3) must
    flip to the sparse chain generator once the derived-cap screen's
    exact candidate estimate exceeds FAMILY_ROUTE_CAND_PER_DOC per doc,
    and still recover the full family: 60 near-identical replicas share
    ~58 shingles each (cand_est ≈ 58·60·59/2 ≈ 102k > 1024·62), so the
    dial routes sparse; the chain edges must connect every replica into
    ONE family with the min id as anchor."""
    import hunger_games_glue_streaming_etl_spark.plans.graph_ops as go

    base = " ".join(f"w{i:03d}" for i in range(60))
    rows = [(i, f"rep{i} " + base) for i in range(60)]
    rows += [(200, " ".join(f"x{i:03d}" for i in range(60)))]
    rows += [(201, " ".join(f"y{i:03d}" for i in range(60)))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(go, "load_table", lambda s_, d_, n_: docs)

    out = go.dedup_family_canonical_pairs(spark, "unused").collect()
    assert out and all(r["route_sparse"] == 1 for r in out)
    # the whole replica family is recovered under the sparse route
    assert len(out) == 59
    assert {r["anchor_id"] for r in out} == {0}
    assert {r["member_id"] for r in out} == set(range(1, 60))
    assert all(r["family_size"] == 60 for r in out)
    # the exposed dial is the exact candidate estimate above threshold
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        FAMILY_ROUTE_CAND_PER_DOC,
    )

    assert all(
        r["cand_est"] > FAMILY_ROUTE_CAND_PER_DOC * 62 for r in out
    )


def test_family_canonical_pairs_cover_quadratic_screen(spark, monkeypatch):
    """The output-budgeted family entry must preserve the quadratic
    screen's family-recall contract: same doc coverage, same partition
    into families (two docs share an anchor iff the pair graph connects
    them) — with ~k rows per family instead of k²."""
    import hunger_games_glue_streaming_etl_spark.plans.graph_ops as go
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    base_a = " ".join(f"a{i:03d}" for i in range(60))
    base_b = " ".join(f"b{i:03d}" for i in range(60))
    rows = [(i, f"rep{i} " + base_a) for i in range(6)]          # family A, m=6
    rows += [(10 + i, f"rep{i} " + base_b) for i in range(4)]    # family B, m=4
    rows += [(100, " ".join(f"u{i:03d}" for i in range(60)))]    # singleton
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(go, "load_table", lambda s_, d_, n_: docs)

    quad = ngram_jaccard_pairs(docs, df_cap_dial="derived").collect()
    quad_docs = {r["id_a"] for r in quad} | {r["id_b"] for r in quad}
    # quadratic output: m(m-1)/2 per family
    assert len(quad) == 6 * 5 // 2 + 4 * 3 // 2

    out = go.dedup_family_canonical_pairs(spark, "unused").collect()
    # budgeted output: m-1 rows per family
    assert len(out) == 5 + 3
    cov = {r["anchor_id"] for r in out} | {r["member_id"] for r in out}
    assert cov == quad_docs  # every pair-touched doc appears, nothing else
    fam = {}
    for r in out:
        fam[r["member_id"]] = r["anchor_id"]
        fam[r["anchor_id"]] = r["anchor_id"]
    # connectivity preserved: every quadratic pair lands in one family
    assert all(fam[r["id_a"]] == fam[r["id_b"]] for r in quad)
    # anchors are family minima; sizes include the anchor
    assert {r["anchor_id"] for r in out} == {0, 10}
    assert all(
        r["family_size"] == (6 if r["anchor_id"] == 0 else 4) for r in out
    )


def test_ivfpq_residual_full_probe_full_refine_equals_exact(spark):
    """IVF-PQ residual degenerate contract: probing EVERY cell with a
    refine band covering the table re-ranks everything with the exact
    dot — must equal the brute-force top-k.  Also pins the residual
    decomposition: vector == centroid + residual element-wise (the score
    split dot(q,v) = dot(q,c) + dot(q,r) relies on it exactly)."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        _assign_cluster,
        cosine_topk,
        ivfpq_ann_topk,
        ivfpq_build,
        ivfpq_residual_frame,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(emb.vec_id == 0).select("embedding").head()[0])
    n = emb.count()
    cents, cbs = ivfpq_build(emb, n_cells=7)
    exact = [
        (r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()
    ]
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivfpq_ann_topk(
            emb, q, k=10, n_probe=7, refine=n, centroids=cents, codebooks=cbs
        ).collect()
    ]
    assert full == exact
    # partial probe/refine still finds the query vector itself
    part = {
        r["vec_id"]: r["cosine"]
        for r in ivfpq_ann_topk(
            emb, q, k=10, n_probe=2, refine=8, centroids=cents, codebooks=cbs
        ).collect()
    }
    assert 0 in part and part[0] == 1.0
    # residual decomposition: v - c + c == v bit-wise (pure IEEE add/sub)
    resid = ivfpq_residual_frame(
        _assign_cluster(emb, cents, "embedding"), cents, "embedding"
    )
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    # exact reconstruction is NOT guaranteed bit-wise for arbitrary
    # floats ((v-c)+c rounds twice), so assert closeness instead: any
    # residual round-trip must land within 1e-9 of the original
    close = resid.select(
        F.exists(
            F.zip_with(
                F.zip_with(
                    F.col("__resid"),
                    F.element_at(cent_arr, F.col("__cluster") + 1),
                    lambda r, c: r + c,
                ),
                F.col("embedding").cast("array<double>"),
                lambda a, b: F.abs(a - b) > 1e-9,
            ),
            lambda x: x,
        ).alias("bad")
    ).filter("bad")
    assert close.count() == 0


def test_centered_lsh_splits_one_orthant_cluster(spark):
    """Sign-LSH degeneracy and its fix: a corpus confined to a narrow
    all-positive cone lands in ONE origin-anchored bucket (the 50×
    census shape), while bucketing vector − corpus-mean must split it.
    The centered screen's verification contract is unchanged: every
    emitted pair carries the raw-vector dot."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        embedding_center_dial,
        hyperplanes,
        lsh_bucket,
    )

    dim = 64
    # tight positive cone: base ray + per-vector jitter on a few dims
    rows = []
    for i in range(40):
        v = [1.0] * dim
        v[i % dim] += 0.05 + 0.001 * i
        v[(i * 7) % dim] += 0.025
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = hyperplanes(8, dim)

    plain = emb.select(
        lsh_bucket(F.col("embedding"), planes).alias("b")
    ).distinct().count()

    center = embedding_center_dial(emb)
    c_arr = F.array(*[F.lit(float(c)) for c in center])
    centered = emb.select(
        lsh_bucket(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                c_arr,
                lambda x, c: x - c,
            ),
            planes,
        ).alias("b")
    ).distinct().count()

    assert plain == 1  # the degenerate cone: one bucket holds everything
    assert centered >= 8  # mean-anchored planes cut the cluster (numpy: 19)


def test_semantic_cells_survive_thousand_cell_plans(spark):
    """Regression for the round-13 50× sweep catch: the cell-id labeling
    must stay a FLAT expression — the former per-cell when-chain nested
    one plan level per cell and overflowed the JVM stack at the 50×
    corpus's 1562 derived cells.  2,500 one-vector cells here force a
    chain deeper than the one that crashed; the flat element_at pick must
    both plan and execute."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    dim = 8
    rows = [
        (i, [float((i * 37 + d * 11) % 17) / 17.0 for d in range(dim)])
        for i in range(2500)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_pairs(emb, vecs_per_cell=1, max_cells=4096)
    assert out.limit(5).count() >= 0  # planning + execution both survive


def test_sparse_family_pairs_match_full_screen_families(spark):
    """The chain-sparsified family entry must recover the SAME family
    partition as the quadratic derived-cap screen on the fixture corpus
    (true family members co-occur across many buckets, so chain edges
    close every family the d² candidate set does)."""
    from hunger_games_glue_streaming_etl_spark.plans.graph_ops import (
        dedup_family_canonical_pairs,
        dedup_family_canonical_pairs_sparse,
    )

    sf = "/root/testdata/sf0.001"
    full = {
        (r["anchor_id"], r["member_id"], r["family_size"])
        for r in dedup_family_canonical_pairs(spark, sf).collect()
    }
    sparse = {
        (r["anchor_id"], r["member_id"], r["family_size"])
        for r in dedup_family_canonical_pairs_sparse(spark, sf).collect()
    }
    assert sparse == full and len(full) > 0


def test_ivf_balanced_build_no_funnel_and_deterministic(spark):
    """The balanced build's two structural claims, on a planted
    norm-skew corpus (the 50× census shape in miniature): (1) cosine
    assignment must NOT funnel every vector into the high-norm
    centroid's cell the way raw-dot assignment measurably does; (2) the
    dyadic-mean build is bit-deterministic across rebuilds (it is what
    makes the learned index value-hashable)."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        _assign_cluster,
        _unit,
        ivf_balanced_build,
    )
    from pyspark.sql import functions as F

    dim = 8
    rows = []
    # two orthogonal cones of 20 unit-ish vectors each...
    for i in range(20):
        v = [0.0] * dim
        v[0], v[1] = 1.0, 0.01 * i
        rows.append((i, [float(x) for x in v]))
    for i in range(20, 40):
        v = [0.0] * dim
        v[2], v[3] = 1.0, 0.01 * i
        rows.append((i, [float(x) for x in v]))
    # ...plus one 100× all-positive norm outlier: a raw-dot argmax hands
    # every vector to the centroid that absorbs it
    rows.append((40, [100.0] * dim))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = ivf_balanced_build(emb, n_cells=4)
    assert cents == ivf_balanced_build(emb, n_cells=4)  # bit-deterministic
    assert len(cents) == 4

    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    assigned = _assign_cluster(
        emb.select(dv.alias("__v")), [_unit(c) for c in cents], "__v"
    )
    occ = assigned.groupBy("__cluster").count().collect()
    # cosine assignment must keep the two cones apart: no cell may
    # swallow the corpus
    assert max(r["count"] for r in occ) <= 30

    # the funnel itself, pinned at the operator level: with the raw
    # outlier as one UN-normalized centroid, raw-dot argmax funnels the
    # whole corpus into its cell (dot with the 100-norm vector beats any
    # unit dot), while the normalized twin of the SAME centroid list
    # splits the cones
    hand = [
        [100.0] * dim,                     # the outlier, raw
        [1.0, 0.1] + [0.0] * (dim - 2),    # cone A direction
        [0.0, 0.0, 1.0, 0.1] + [0.0] * (dim - 4),  # cone B direction
        [0.5] * dim,
    ]
    raw_occ = (
        _assign_cluster(emb.select(dv.alias("__v")), hand, "__v")
        .groupBy("__cluster")
        .count()
        .collect()
    )
    assert max(r["count"] for r in raw_occ) == 41  # the funnel, demonstrated
    unit_occ = (
        _assign_cluster(emb.select(dv.alias("__v")), [_unit(c) for c in hand], "__v")
        .groupBy("__cluster")
        .count()
        .collect()
    )
    assert max(r["count"] for r in unit_occ) <= 30


def test_ivf_balanced_empty_cell_keeps_seed(spark):
    """A seed that wins no assignments must survive as its own raw
    vector (LEFT JOIN + COALESCE in the oracle; the build must mirror
    it): with 4 cells over 4 identical-direction vectors, at most one
    cell gets members, and the build still returns 4 centroids whose
    empty ones equal their seeds exactly."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        ivf_balanced_build,
    )
    from hunger_games_glue_streaming_etl_spark.functions.text import (
        portable_hash64,
    )
    from pyspark.sql import functions as F

    dim = 4
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_balanced_build(emb, n_cells=4)
    assert len(cents) == 4
    # all four vectors are identical, so every assignment ties to the
    # smallest cell index: cells 1..3 are empty and keep their seeds
    seeds = (
        emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
            portable_hash64(F.col("vec_id").cast("string")).alias("hv"),
        )
        .orderBy("hv", "vec_id")
        .collect()
    )
    for cell in (1, 2, 3):
        assert cents[cell] == list(seeds[cell]["v"])


def test_kmeans_dyadic_rounds_refine_and_prototypes_cap(spark):
    """Multi-round dyadic k-means: (1) the second Lloyd round must
    actually move centroids (the loop iterates, not a copy-paste of
    round 1); (2) rebuilds stay bit-deterministic at every depth (the
    value-hash precondition); (3) the prototype keep-set respects the
    per-cluster cap and covers every cluster that has members."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        _assign_cluster,
        _unit,
        ivf_balanced_build,
    )
    from pyspark.sql import functions as F

    dim = 8
    rows = [
        (i, [float(((i * 37 + d * 11) % 17) - 8) / 8.0 for d in range(dim)])
        for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    c1 = ivf_balanced_build(emb, n_cells=4, iterations=1)
    c2 = ivf_balanced_build(emb, n_cells=4, iterations=2)
    assert c2 == ivf_balanced_build(emb, n_cells=4, iterations=2)
    assert c1 != c2  # round 2 refines

    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    assigned = _assign_cluster(
        emb.select("vec_id", dv.alias("__v")), [_unit(c) for c in c2], "__v"
    )
    occ = {r["__cluster"]: r["count"] for r in assigned.groupBy("__cluster").count().collect()}

    # the registered curation entry's cap semantics, replayed here on the
    # planted frame: keep Q most-central per cluster
    from hunger_games_glue_streaming_etl_spark.operators.similarity import dot
    from pyspark.sql import Window

    cap = 7
    cn_arr = F.array(*[F.array(*[F.lit(float(x)) for x in _unit(c)]) for c in c2])
    w = Window.partitionBy("__cluster").orderBy(F.desc("__cent"), "vec_id")
    kept = (
        assigned.withColumn(
            "__cent",
            dot(F.col("__v"), F.element_at(cn_arr, F.col("__cluster") + 1))
            / F.sqrt(dot(F.col("__v"), F.col("__v"))),
        )
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= cap)
        .groupBy("__cluster")
        .count()
        .collect()
    )
    kept_occ = {r["__cluster"]: r["count"] for r in kept}
    assert set(kept_occ) == set(occ)  # every populated cluster keeps prototypes
    for cell, n_kept in kept_occ.items():
        assert n_kept == min(cap, occ[cell])


def test_ivf_balanced_build_partition_order_invariant(spark):
    """The claim that makes the dyadic build valid on a 1000-executor
    cluster: nothing in it may depend on row order or partitioning.
    Seeds are hash-RANKED (data-determined), grid moments are integer
    sums (commutative exactly), divisions are correctly rounded — so a
    reversed, reshuffled, re-partitioned copy of the same corpus must
    produce bit-identical centroids at every Lloyd depth."""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        ivf_balanced_build,
    )
    from pyspark.sql import functions as F

    dim = 8
    rows = [
        (i, [float(((i * 53 + d * 29) % 23) - 11) / 7.0 for d in range(dim)])
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    scrambled = (
        spark.createDataFrame(list(reversed(rows)), "vec_id long, embedding array<float>")
        .repartition(13, F.col("vec_id"))
    )
    for iters in (1, 2):
        assert ivf_balanced_build(emb, n_cells=5, iterations=iters) == \
            ivf_balanced_build(scrambled, n_cells=5, iterations=iters)


def test_oph_minhash_semantics(spark):
    """Densified one-permutation MinHash: (a) identical docs get identical
    signatures (jaccard 1 → all m bins match); (b) a dense doc (≥1 shingle
    per bin) uses only raw per-bin mins (no borrow tags); (c) a sparse doc's
    empty bins borrow from the nearest non-empty bin to the right with the
    t·2^48 offset tag — the rotation densification — so no sig is ever
    null; (d) disjoint docs share few bins (estimator sanity)."""
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        minhash_oph_signatures,
        shingle_sets,
    )

    long_a = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, long_a),
            (2, long_a),  # exact duplicate of 1
            (3, "alpha beta gamma delta"),  # 2 shingles → sparse, borrows
            (4, " ".join(f"other{i}" for i in range(200))),  # disjoint from 1
        ],
        ["doc_id", "text"],
    )
    sig = {
        (r["doc_id"], r["bin"]): r["sig"]
        for r in minhash_oph_signatures(docs).collect()
    }
    m = 16
    assert all((d, b) in sig for d in (1, 2, 3, 4) for b in range(m))
    assert all(sig[(1, b)] == sig[(2, b)] for b in range(m))  # (a)
    # (b): doc 1 has 198 shingles — every bin occupied, all sigs raw 48-bit
    assert all(sig[(1, b)] < (1 << 48) for b in range(m))
    # (c): replay doc 3's expected signature from its shingle hashes
    sh3 = {
        r["shingle"]
        for r in shingle_sets(docs.filter("doc_id = 3")).collect()
    }
    raw = {}
    for h in sh3:
        raw[h % m] = min(raw.get(h % m, h), h)
    for b in range(m):
        t = next(i for i in range(m) if (b + i) % m in raw)
        expect = raw[(b + t) % m] + t * (1 << 48)
        assert sig[(3, b)] == expect
    # (d): disjoint docs agree on well under half the bins
    matches = sum(sig[(1, b)] == sig[(4, b)] for b in range(m))
    assert matches <= m // 4


def test_kcore_peel_fixpoint_and_core_invariants(spark):
    """k-core contract at sf0.01: the peel cascade reaches its fixpoint
    strictly inside the 8-round unroll (no node carries peel_round 8 —
    round 8 exists to PROVE convergence), the surviving core is non-empty
    (the K dial sits below the graph's degeneracy by construction), and
    every survivor has >= K neighbors among survivors (the defining
    k-core property, recomputed independently here)."""
    from collections import defaultdict

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    rows = E.queries()["graph_kcore_peel"](spark, sf).collect()
    assert rows
    peel = {r.part_id: r.peel_round for r in rows}
    assert max(peel.values()) < 8  # fixpoint strictly inside the unroll
    core = {v for v, p in peel.items() if p == 0}
    assert core  # K below degeneracy -> non-empty core
    # independent replay of edges + the K dial
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    pairs = con.execute("""
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 2 = 1)
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).fetchall()
    adj = defaultdict(set)
    for x, y in pairs:
        adj[x].add(y)
        adj[y].add(x)
    k = (4 * len(pairs)) // (3 * len(adj))
    for v in core:
        assert len(adj[v] & core) >= k, v
    # python replay of the peel itself reaches the same core
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    assert alive == core
