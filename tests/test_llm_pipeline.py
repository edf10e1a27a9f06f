"""Semantic invariants of the training-data pipeline tier
(plans/llm_pipeline.py) that the DuckDB hash gate can't express:
packing contiguity, decontamination scope, mixture-rate tracking,
permutation totality, and cell-dedup ⊆ exact-dedup containment."""

from collections import defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_pack_offsets_are_contiguous_per_source(spark, queries):
    rows = queries["pack_sequences_concat"](spark, SF_DIR).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    assert len(by_source) > 1
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in docs:
            assert r.start_off == expect, (source, r.doc_id)
            assert r.n_tokens >= 1
            assert r.chunk_first <= r.chunk_last
            assert r.chunk_first == r.start_off // 256
            expect += r.n_tokens


def test_pack_stats_consistent_with_manifest(spark, queries):
    manifest = queries["pack_sequences_concat"](spark, SF_DIR).collect()
    stats = {r.source: r for r in queries["pack_sequences_stats"](spark, SF_DIR).collect()}
    by_source = defaultdict(list)
    for r in manifest:
        by_source[r.source].append(r)
    for source, docs in by_source.items():
        s = stats[source]
        total = sum(r.n_tokens for r in docs)
        assert s.n_docs == len(docs)
        assert s.total_tokens == total
        assert s.n_chunks == (total + 255) // 256
        assert s.n_straddlers == sum(
            1 for r in docs if r.chunk_first != r.chunk_last
        )


def test_pack_manifest_two_level_matches_plain_window(spark):
    """Parity pin for the two-level packing cumsum (VERDICT r6 #3): on a
    planted SINGLE-source corpus big enough to open multiple slices
    (rows div 4096 >= 2), the sliced local-window + broadcast-offset sum
    must reproduce the plain one-window running sum bit-for-bit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.plans.llm_pipeline import (
        _PACK_ROWS_PER_SLICE,
        _pack_chunks,
        _pack_offsets_sliced,
    )

    n = 10_000
    assert n // _PACK_ROWS_PER_SLICE >= 2  # multiple slices actually open
    t = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("commoncrawl").alias("source"),
        ((F.col("id") * 37) % 100 + 1).cast("int").alias("n_tokens"),
    )
    got = {
        r.doc_id: (r.start_off, r.chunk_first, r.chunk_last)
        for r in _pack_chunks(_pack_offsets_sliced(t)).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    plain = t.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    exp = {
        r.doc_id: (
            r.start_off,
            r.start_off // 256,
            (r.start_off + r.n_tokens - 1) // 256,
        )
        for r in plain.collect()
    }
    assert got == exp


def test_decontaminate_flags_only_train_docs(spark, queries):
    rows = queries["decontaminate_ngram_overlap"](spark, SF_DIR).collect()
    assert rows  # non-vacuous at sf0.01 (12 flagged docs)
    for r in rows:
        assert r.doc_id % 10 != 0  # eval slice itself is never flagged
        assert r.n_shared_grams >= 2


def test_mix_rates_track_targets(spark, queries):
    from hunger_games_glue_streaming_etl_spark.plans.llm_pipeline import MIX_RATES_BP
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    kept = defaultdict(int)
    for r in queries["mix_weighted_sample"](spark, SF_DIR).collect():
        kept[r.lang] += 1
    total = defaultdict(int)
    for r in load_table(spark, SF_DIR, "documents").select("lang").collect():
        total[r.lang] += 1
    for lang, bp in MIX_RATES_BP.items():
        realized = kept[lang] / total[lang]
        # ~70 docs/lang at sf0.01: binomial sd ≈ 6pp; ±20pp is 3σ+ slack
        assert abs(realized - bp / 10000) < 0.20, (lang, realized, bp)


def test_shuffle_is_total_permutation(spark, queries):
    rows = queries["shuffle_training_order"](spark, SF_DIR).collect()
    assert len({r.doc_id for r in rows}) == len(rows) == 500
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard[r.shard].append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_semantic_cell_pairs_subset_of_exact_pairs(spark, queries):
    """Same cosine threshold ⇒ every within-cell pair must appear in the
    exact O(n²) scan; the cell partition only *removes* (cross-cell)
    pairs — SemDeDup's recall trade, never false positives."""
    exact = {
        (r.id_a, r.id_b)
        for r in queries["dedup_embedding_cosine_pairs"](spark, SF_DIR).collect()
    }
    cells = queries["semantic_dedup_cells"](spark, SF_DIR).collect()
    assert cells  # non-vacuous (89 pairs at sf0.01)
    assert {(r.id_a, r.id_b) for r in cells} <= exact


def test_semantic_cells_pair_exchange_ships_keys_only(spark, queries):
    """VERDICT r03 #3 done-criterion: with broadcast disabled, the
    within-cell self-join shuffles on cell_id carrying ONLY (id, cell_id)
    keys — vectors re-attach by id downstream, so no array column rides
    the pair exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = queries["semantic_dedup_cells"](spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    blocks = plan.split("\n\n")
    exchanges = [
        b for b in blocks
        if "Exchange" in b and "hashpartitioning(cell_id" in b
    ]
    assert exchanges, plan  # the keys-only self-join exchange must exist
    for b in exchanges:
        assert "embedding" not in b and "__v" not in b, b


def test_semantic_dedup_lloyd_path_still_subset_of_exact(spark, queries):
    """The learned-centroid variant (lloyd_iterations > 0) keeps the
    SemDeDup invariant: every within-cell pair re-verifies against the
    exact dot, so pairs ⊆ the exact O(n²) pair set regardless of where
    the centroids land.  (The contract entry keeps iterations=0 so the
    oracle can replay seeding; this covers the learned path.)"""
    from hunger_games_glue_streaming_etl_spark.operators.similarity import (
        semantic_dedup_pairs,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = semantic_dedup_pairs(emb, lloyd_iterations=1).collect()
    assert pairs  # non-vacuous on the fixture corpus
    exact = {
        (r.id_a, r.id_b)
        for r in queries["dedup_embedding_cosine_pairs"](spark, SF_DIR).collect()
    }
    assert {(r.id_a, r.id_b) for r in pairs} <= exact


def test_bm25_operator_takes_arbitrary_terms(spark, oracle_con):
    """VERDICT r03 #8: bm25_topk is a library operator, not just the fixed
    contract triple — an alternate query term set must still match the
    parameterized DuckDB oracle (run at the conftest sf0.001 views)."""
    from conftest import SF_DIR as UNIT_SF_DIR, assert_matches_oracle

    from hunger_games_glue_streaming_etl_spark.operators.text_search import bm25_topk
    from hunger_games_glue_streaming_etl_spark.plans.llm_pipeline import _bm25_sql
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    docs = load_table(spark, UNIT_SF_DIR, "documents")
    out = bm25_topk(docs, ("scan", "merge"))
    assert out.count() > 0
    assert_matches_oracle(out, oracle_con, _bm25_sql(("scan", "merge")))


def test_tfidf_ranks_are_dense_per_doc(spark, queries):
    rows = queries["text_tfidf_top_terms"](spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
        assert r.tf >= 1 and r.df >= 1
    assert len(by_doc) == 500
    for doc_id, terms in by_doc.items():
        assert sorted(t.rank for t in terms) == list(range(1, len(terms) + 1))
        assert len(terms) <= 3


def test_pipeline_composes_its_standalone_stages(spark, queries):
    """`pipeline_pretrain_corpus` must keep exactly the docs that survive
    the composition of the standalone stage queries: curation roster,
    minus the eval slice, minus decontamination-flagged docs, filtered by
    the mixture sample — and its offsets must be contiguous per source."""
    clean = {r.doc_id for r in queries["curation_clean_corpus"](spark, SF_DIR).collect()}
    flagged = {
        r.doc_id
        for r in queries["decontaminate_ngram_overlap"](spark, SF_DIR).collect()
    }
    mixed = {r.doc_id for r in queries["mix_weighted_sample"](spark, SF_DIR).collect()}
    expected = {
        d for d in clean if d % 10 != 0 and d not in flagged and d in mixed
    }
    rows = queries["pipeline_pretrain_corpus"](spark, SF_DIR).collect()
    assert {r.doc_id for r in rows} == expected
    assert rows  # non-vacuous (125 docs at sf0.01)
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in docs:
            assert r.start_off == expect_off, (source, r.doc_id)
            expect_off += r.n_tokens


def test_pii_detection_and_redaction_on_planted_corpus(spark):
    """The driver fixtures contain no PII, so the scrub operators are
    pinned here: per-category counts, full redaction (no pattern matches
    the scrubbed text), idempotence, and prose preservation."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.functions.text import (
        PII_PATTERNS,
        pii_counts,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "contact alice.smith+spam@example.co.uk or bob@test.org today"),
            (2, "call 555-867-5309 or 555.867.5309; ssn 123-45-6789 on file"),
            (3, "server at 192.168.1.100 responded; no pii in 'version 1.2'"),
            (4, "perfectly clean prose about spark windows and joins"),
        ],
        ["doc_id", "text"],
    )
    counts = {
        r.doc_id: r
        for r in docs.select("doc_id", *pii_counts("text").values()).collect()
    }
    assert counts[1].n_email == 2 and counts[1].n_phone == 0
    assert counts[2].n_phone == 2 and counts[2].n_ssn == 1
    assert counts[3].n_ipv4 == 1 and counts[3].n_email == 0
    assert all(
        counts[4][f"n_{k}"] == 0 for k in PII_PATTERNS
    )
    once = docs.select("doc_id", redact_pii("text").alias("text"))
    # nothing detectable remains after one pass
    residual = once.select("doc_id", *pii_counts("text").values()).collect()
    for r in residual:
        assert all(r[f"n_{k}"] == 0 for k in PII_PATTERNS), r
    # idempotent: a second pass changes nothing
    twice = once.select("doc_id", redact_pii("text").alias("text"))
    assert {r.text for r in once.collect()} == {r.text for r in twice.collect()}
    redacted = {r.doc_id: r.text for r in once.collect()}
    assert redacted[1] == "contact [PII] or [PII] today"
    assert "version 1.2" in redacted[3]  # conservative: prose untouched
    assert redacted[4] == "perfectly clean prose about spark windows and joins"


def test_temperature_mixture_rates_derive_from_counts(spark):
    """α=1/2 temperature semantics: the rarest language keeps 100%
    (rate_bp = 10000), every language's rate is ⌊10⁴·√(n_min/n_l)⌋, and
    realized selection tracks the rate within hash noise."""
    import math

    from hunger_games_glue_streaming_etl_spark.plans.llm_pipeline import (
        mix_temperature_sample,
    )
    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    counts = {
        r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    nmin = min(counts.values())
    out = mix_temperature_sample(spark, sf).collect()
    rates = {r["lang"]: r["rate_bp"] for r in out}
    for lang, bp in rates.items():
        assert bp == math.floor(10000 * math.sqrt(nmin / counts[lang]))
    rare = min(counts, key=counts.get)
    kept_rare = sum(1 for r in out if r["lang"] == rare)
    assert rates[rare] == 10000 and kept_rare == counts[rare]


def test_chat_format_audit_plants_and_masking(spark):
    """The chat gate fails EXACTLY the planted corruption classes (role
    swap at doc_id%13==4 with >=2 turns; empty message at doc_id%17==3)
    and trainable_tokens counts only assistant turns."""
    from hunger_games_glue_streaming_etl_spark.plans.chat_ops import (
        chat_format_audit,
    )

    rows = {
        r["doc_id"]: r
        for r in chat_format_audit(spark, "/root/testdata/sf0.001").collect()
    }
    for doc_id, r in rows.items():
        swap = doc_id % 13 == 4 and r["n_turns"] >= 2
        empty = doc_id % 17 == 3 and r["n_turns"] >= 2
        assert r["is_valid"] == (not swap and not empty), doc_id
        assert r["alternation_ok"] == (not swap), doc_id
        assert r["n_empty"] == (1 if empty else 0), doc_id
        assert r["first_role_ok"] is True, doc_id
        # assistant turns are the odd indices; with 16-token turns the
        # trainable share can never exceed the total
        assert 0 <= r["trainable_tokens"] <= r["total_tokens"], doc_id
    assert any(not r["is_valid"] for r in rows.values())
    assert any(r["is_valid"] for r in rows.values())


def test_bpe_encode_canonical_merge_semantics():
    """Planted-vocab BPE: lowest-rank-present pair merges ALL its
    occurrences per pass (canonical GPT-2 bpe() loop), chained merges
    compose to full words, and the double-space replay representation
    handles adjacent occurrences."""
    from hunger_games_glue_streaming_etl_spark.operators.bpe import encode

    # chained merges: t+h -> th, th+e -> the; ta->tab->tabl->table
    assert encode("the table") == ["the", "_", "table"]
    # merge-all in one pass: both 'th' occurrences merge in pass 1
    assert encode("th th") == ["th", "_", "th"]
    # untouched chars stay single tokens
    assert encode("zq") == ["z", "q"]
    # punctuation/digits are stripped before encoding; empty -> no tokens
    assert encode("123 !!") == []
    # determinism + the 48-char cap
    long = "value " * 20
    assert encode(long) == encode(long)
    assert sum(len(t.replace("_", " ")) for t in encode(long)) <= 48


def test_bpe_encode_matches_duckdb_replay_on_planted_edges(spark, oracle_con):
    """Cross-engine parity on the adversarial shapes: empty-after-clean
    text, adjacent same-pair occurrences, >cap text, single char — the
    oracle CTE is GENERATED from the same merge table, so any drift is an
    algorithm bug, not a vocab mismatch."""
    import duckdb

    from hunger_games_glue_streaming_etl_spark.operators import bpe

    rows = [
        (0, "the table value fast"),
        (1, "th th th"),
        (2, "!!! 123"),
        (3, "a"),
        (4, "window join data " * 10),
        (5, "  spaced    out   words  "),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    expect = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            bpe.oracle_sql() + " ORDER BY doc_id"
        ).fetchall()
    }
    sdf = bpe.bpe_encode_frame(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    got = {r.doc_id: (r.n_tokens, r.token_str) for r in sdf}
    assert got == expect


def test_sliding_chunk_frame_boundaries(spark):
    """Chunk-count boundary classes: n < CHUNK (1 chunk, covered fully),
    n == CHUNK (exactly 1), n == CHUNK+1 (2 chunks, second is the
    STRIDE-offset tail), and a multi-chunk doc where the final chunk is
    shorter than CHUNK."""
    from hunger_games_glue_streaming_etl_spark.plans.text_ops import (
        CHUNK_TOKENS,
        CHUNK_STRIDE,
        sliding_chunk_frame,
    )

    def doc(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = spark.createDataFrame(
        [(1, doc(5)), (2, doc(CHUNK_TOKENS)), (3, doc(CHUNK_TOKENS + 1)),
         (4, doc(90))],
        "doc_id long, text string",
    )
    rows = sliding_chunk_frame(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_len == 5
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == CHUNK_TOKENS
    assert len(by_doc[3]) == 2
    tail = sorted(by_doc[3], key=lambda r: r.ci)[1]
    assert tail.chunk_len == CHUNK_TOKENS + 1 - CHUNK_STRIDE
    assert tail.chunk_text.startswith(f"w{CHUNK_STRIDE} ")
    # 90 tokens: 1 + ceil((90-32)/24) = 4 chunks; last starts at 72, len 18
    four = sorted(by_doc[4], key=lambda r: r.ci)
    assert len(four) == 4
    assert four[-1].chunk_len == 90 - 3 * CHUNK_STRIDE
    # every chunk's text has exactly chunk_len tokens
    for r in rows:
        assert len(r.chunk_text.split(" ")) == r.chunk_len


def test_rag_query_mod_dial_caps_query_set_above_activation(spark, monkeypatch):
    """The corpus-derived qmod (GREATEST(100, n_docs // 50)) must stay
    grid-equal to the frozen mod=100 at oracle scales and ACTIVATE above
    5,000 docs, holding the query set at ~50 — the round-13 fix for the
    sweep's only super-linear wall (a fixed mod grows the query side
    with the corpus)."""
    import hunger_games_glue_streaming_etl_spark.plans.llm_pipeline as lp
    from pyspark.sql import functions as F

    def corpus(n):
        return spark.createDataFrame(
            [(i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
             for i in range(n)],
            ["doc_id", "text"],
        )

    for n, want_mod in [(500, 100), (12000, 240)]:
        docs = corpus(n)
        monkeypatch.setattr(lp, "load_table", lambda s_, d_, t_: docs)
        out = lp.pipeline_rag_retrieval(spark, "unused")
        q_docs = {r["query_doc_id"] for r in out.collect()}
        expect = {i for i in range(n) if i % want_mod == 7}
        assert q_docs <= expect
        # every expected query doc with >=1 foreign chunk appears
        assert len(q_docs) == len(expect)
        # the cap holds the query set ~constant across a 24x corpus jump
        assert len(q_docs) <= 51


def test_embedding_decontam_matches_numpy_argmax(spark, queries):
    """The max-cosine/argmax contract vs a numpy replay: every train
    vector's nearest eval id (min-id tiebreak after 6-dp rounding) and
    contamination verdict reproduce exactly; the eval slice itself never
    appears on the train side."""
    import numpy as np
    import pandas as pd

    rows = queries["decontaminate_embedding_cosine"](spark, SF_DIR).collect()
    assert rows  # 495 train rows at sf0.01
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    n = len(emb)
    emod = max(100, n // 50)
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    eval_ids = sorted(i for i in vecs if i % emod == 3)
    assert len(rows) == n - len(eval_ids)
    flagged = 0
    for r in rows:
        assert r.vec_id % emod != 3
        # sequential accumulation matches the engine's fold order
        best = max(
            (round(float(sum(vecs[r.vec_id] * vecs[e])), 6), -e) for e in eval_ids
        )
        assert (round(r.max_cosine, 6), -r.nearest_eval_id) == best
        assert r.contaminated == (best[0] >= 0.35)
        flagged += int(r.contaminated)
    assert flagged == 4  # non-vacuous boolean at sf0.01


def test_dsir_selection_is_top_decile_by_score(spark, queries):
    """`selected` is exactly the top slice at the discrete-rank threshold:
    every selected score >= every unselected score, the selected count
    covers at least the top 10%, and the target slice never appears."""
    rows = queries["curation_dsir_importance_select"](spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    tmod = 10  # 500 docs at sf0.01 -> GREATEST(10, 10)
    sel = [r.dsir_score for r in rows if r.selected]
    unsel = [r.dsir_score for r in rows if not r.selected]
    assert sel and unsel  # non-vacuous both ways
    assert min(sel) > max(unsel)  # the cut is a clean score threshold
    assert len(sel) >= n - ((9 * n + 9) // 10)  # at least the top decile
    for r in rows:
        assert r.doc_id % tmod != 5  # target slice is never scored


def test_k_anonymity_invariant_holds(spark, queries):
    """POPULATION k-anonymity, checked independently against the raw
    table: every published row's non-NULL QI values match >= 5 raw
    individuals (group_n states that count exactly), suppressed rows
    carry all-NULL QIs, and the ladder actually grades (>= 2 levels
    in use at sf0.01)."""
    from collections import Counter

    import duckdb

    rows = queries["curation_k_anonymity_ladder"](spark, SF_DIR).collect()
    assert rows and len(rows) == 1500
    con = duckdb.connect()
    raw = con.execute(f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
        FROM '{SF_DIR}/customer.parquet'
    """).fetchall()
    n0 = Counter(raw)
    n1 = Counter((r[0], r[1]) for r in raw)
    n2 = Counter(r[0] for r in raw)
    for r in rows:
        if r.level == 3:
            assert (
                r.anon_nation is None
                and r.anon_segment is None
                and r.anon_bal_band is None
                and r.group_n is None
            )
            continue
        if r.level == 0:
            match = n0[(r.anon_nation, r.anon_segment, r.anon_bal_band)]
        elif r.level == 1:
            assert r.anon_bal_band is None
            match = n1[(r.anon_nation, r.anon_segment)]
        else:
            assert r.anon_segment is None and r.anon_bal_band is None
            match = n2[r.anon_nation]
        assert match >= 5 and r.group_n == match, (r, match)
    assert {r.level for r in rows} >= {0, 1}  # the ladder actually grades


def test_dp_release_clamps_and_noise_is_seed_replayable(spark, queries):
    """DP-release mechanics at sf0.01: the bounded count never exceeds
    C x n_users, the clamp bites a non-trivial fraction both ways, and
    the noise replays exactly from the recorded seeds (python md5
    replay of the geometric leading-zero draws)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = queries["dp_bounded_contribution_counts"](spark, SF_DIR).collect()
    assert len(rows) == 5
    con = duckdb.connect()
    per = con.execute(f"""
        SELECT user_id, event_type, COUNT(*) FROM '{SF_DIR}/events.parquet'
        GROUP BY 1, 2
    """).fetchall()
    cnts = sorted(c for _, _, c in per)
    c_dial = cnts[(len(cnts) + 1) // 2 - 1]
    by_type = defaultdict(list)
    for _, et, c in per:
        by_type[et].append(c)

    def lz(seed, et):
        h = int(hashlib.md5(f"0:{seed}{et}".encode()).hexdigest()[:12], 16)
        return 48 - len(bin(h)[2:])

    for r in rows:
        assert r.sensitivity_c == c_dial
        contribs = by_type[r.event_type]
        bounded = sum(min(c, c_dial) for c in contribs)
        clamped = sum(1 for c in contribs if c > c_dial)
        assert 0 < clamped < len(contribs)  # the clamp bites both ways
        noise = lz("dpa:", r.event_type) - lz("dpb:", r.event_type)
        assert r.dp_count == bounded + noise
        assert r.clamped_users == clamped


def test_dp_clamped_sum_release_mechanism(spark, queries):
    """Clamped-SUM DP release at sf0.01: the dyadic-grid clamp dial is
    the p90 cell ceiling, the clamp bites a non-trivial fraction both
    ways, and the sensitivity-scaled noise replays exactly from the
    recorded seeds (python md5 replay, noise unit = C div 64)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    rows = queries["dp_clamped_sum_release"](spark, SF_DIR).collect()
    assert len(rows) == 5
    con = duckdb.connect()
    per = con.execute(f"""
        SELECT o_custkey, o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1, 2
    """).fetchall()
    grid = sorted(c // 4096 for _, _, c in per)
    n = len(grid)
    g_sel = grid[(900 * n + 999) // 1000 - 1]  # rank-th smallest grid cell
    c_dial = (g_sel + 1) * 4096 - 1
    by_prio = defaultdict(list)
    for _, pr, c in per:
        by_prio[pr].append(c)

    def lz(seed, pr):
        h = int(hashlib.md5(f"0:{seed}{pr}".encode()).hexdigest()[:12], 16)
        return 48 - len(bin(h)[2:])

    unit = max(1, c_dial // 64)
    for r in rows:
        assert r.sensitivity_c == c_dial
        contribs = by_prio[r.o_orderpriority]
        bounded = sum(min(c, c_dial) for c in contribs)
        clamped = sum(1 for c in contribs if c > c_dial)
        assert 0 < clamped < len(contribs)  # the clamp bites both ways
        noise = lz("dpsa:", r.o_orderpriority) - lz("dpsb:", r.o_orderpriority)
        assert r.dp_sum == bounded + noise * unit
        assert r.clamped_users == clamped
