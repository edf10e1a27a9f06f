"""Every registered query with an oracle is checked against DuckDB at
sf0.001 — the same comparison the driver's correctness gate runs at sf0.01."""

from __future__ import annotations

import pytest

from hunger_games_glue_streaming_etl_spark.plans import ORACLE, QUERIES

from conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, oracle_con):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLE:
        assert_matches_oracle(df, oracle_con, ORACLE[name])
    else:
        assert df.count() >= 0  # rows-only check, mirrors the driver


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


def test_q5_gate_is_not_vacuous(spark):
    """CLAUDE.md round-1 rule: no query may be vacuous.  q5 silently
    returned 0 rows for three rounds because its region literal didn't
    exist in the fixtures (VERDICT r03 #2) — pin a non-empty result."""
    assert QUERIES["q5_local_supplier_volume"](spark, SF_DIR).count() > 0


def test_curation_pipeline_every_stage_bites(spark):
    """The fixture corpus has no exact duplicates, so the registered
    query's hash check cannot catch a broken canonical-keep stage — this
    synthetic corpus makes EVERY stage drop something: a junk doc (quality
    gate), an exact duplicate (keep min id), and a near-dup (drop the
    higher id of the Jaccard pair)."""
    from hunger_games_glue_streaming_etl_spark.plans.curation import clean_corpus

    good = " ".join(f"alpha{i:02d} beta{i:02d}" for i in range(12))
    near = good + " gamma extra tail words appended here"
    docs = spark.createDataFrame(
        [
            (1, "en", len(good), good),          # canonical copy, kept
            (2, "en", len(good), good),          # exact duplicate -> dropped
            (3, "en", len(near), near),          # near-dup of 1 -> dropped
            (4, "en", 3, "!!!"),                  # junk -> quality gate drops
            (5, "en", 60, " ".join(f"delta{i:02d}" for i in range(10) for _ in (0,)) + " " + " ".join(f"eps{i:02d}" for i in range(10))),  # unrelated, kept
        ],
        "doc_id long, lang string, n_chars long, text string",
    )
    kept = sorted(r["doc_id"] for r in clean_corpus(docs).collect())
    assert kept == [1, 5]
