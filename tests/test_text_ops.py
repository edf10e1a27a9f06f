"""BPE merge-table training invariants (the distributed learner in
``operators/bpe.py``) — the oracle gate checks the learned table against
the unrolled SQL replay; these tests pin the algebra that replay relies
on."""

from __future__ import annotations


def _apply_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Sequential reference for one merge round: greedy left-to-right
    merge of disjoint (a, b) occurrences — the semantics the window
    expression implements set-oriented (sound because a != b)."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_bpe_train_token_conservation(spark):
    """Learning invariants: candidate pairs exclude left == right, so
    every counted occurrence is disjoint and round k's merge removes
    exactly pair_count_k tokens — the final corpus length equals
    initial − Σ counts, verified against an independent SEQUENTIAL
    reference application of the learned table (rank order over the
    initial corpus replays the exact training states).  Also pins
    well-formedness: left != right, positive counts."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.operators.bpe import (
        _train_clean,
        bpe_train_merges,
    )

    # 12 docs => derived_sample_mod = 1, every doc sampled (ids stay on the
    # historical stride-4 grid so the planted corpus is unchanged)
    docs = spark.createDataFrame(
        [
            (i * 4, f"the table value fast data scan row part {i}")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(docs, n_merges=6).collect()
    assert len(merges) == 6
    assert all(r["merge_left"] != r["merge_right"] for r in merges)
    assert all(r["pair_count"] > 0 for r in merges)

    cleaned = [
        r["s"]
        for r in docs.select(_train_clean(F.col("text")).alias("s")).collect()
    ]
    initial_len = sum(len(s) for s in cleaned)
    removed = sum(r["pair_count"] for r in merges)

    corpus = [list(s) for s in cleaned]
    for m in sorted(merges, key=lambda r: r["merge_rank"]):
        corpus = [
            _apply_merge(t, m["merge_left"], m["merge_right"]) for t in corpus
        ]
    final_len = sum(len(t) for t in corpus)
    assert final_len == initial_len - removed


def test_bpe_derived_sample_mod_dial(spark):
    """The trainer's sample modulus is corpus-derived (r12 next #6):
    ~125 sampled docs at any corpus size, grid-compatible with the
    historical fixed mod=4 at the 500-doc oracle fixtures, and the
    derived path must equal the explicit-mod path exactly."""
    from hunger_games_glue_streaming_etl_spark.operators.bpe import (
        bpe_train_merges,
        derived_sample_mod,
    )

    assert derived_sample_mod(500) == 4  # oracle fixtures: unchanged table
    assert derived_sample_mod(5000) == 40  # sf0.1: ~125 docs, was 1250
    assert derived_sample_mod(12) == 1  # tiny corpora sample everything
    assert derived_sample_mod(100_000) == 800  # 50x: still ~125 docs

    docs = spark.createDataFrame(
        [(i, f"aa bb cc dd word{i % 7} mix part {i}") for i in range(40)],
        "doc_id long, text string",
    )
    derived = bpe_train_merges(docs, n_merges=4).collect()
    explicit = bpe_train_merges(docs, n_merges=4, sample_mod=1).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, explicit))
