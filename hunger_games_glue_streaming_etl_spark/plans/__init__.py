"""Import all plan modules so their ``@register`` decorators populate the
registry, then re-export it."""

from .registry import ORACLE, QUERIES, register

from . import (  # noqa: E402,F401
    aggregates,
    chat_ops,
    core,
    curation,
    dedup_ops,
    dq_ops,
    event_time,
    graph_ops,
    layout_ops,
    llm_pipeline,
    multimodal_ops,
    profile_ops,
    sampling_ops,
    scalars,
    scd_ops,
    segment_ops,
    setops_sort,
    similarity_ops,
    sketch_native,
    sketch_ops,
    sources_sql,
    sql_surface,
    streaming_queries,
    subqueries,
    temporal_ops,
    tribute_parity,
    udf_ops,
    text_ops,
    windows,
)

# ---------------------------------------------------------------------------
# Registry-order control for the driver's CORRECTNESS sample.
#
# The driver records rows for the FIRST ~50 registry keys (dict iteration
# order).  Rounds 1-3 sampled the same long-green prefix, leaving 40 entries
# with no recorded correctness row ever (VERDICT r03 "What's wrong #5").
# Put those never-sampled entries (plus q5, whose de-vacuation needs a
# recorded row, and this round's new entries) first; the 60+ entries that
# already have green rows in CORRECTNESS_r01-r03 follow in import order.
# ---------------------------------------------------------------------------
_SAMPLE_FIRST = [
    # ---- round-15 rotation (VERDICT r14 "Next round #1"): finish the
    # stale-evidence rotation.  The first ~50 must ALL be oracled — the
    # rows-only-by-design entries (sim_pq_ann_topk, agg_approx_distinct,
    # sim_embedding_pairs_blas, sim_ivf_ann_topk) stay OUT of this window
    # permanently.  Order: (1) entries added this round (never-recorded
    # beats stale-refresh), (2) the full 40-entry r09-stale cohort —
    # every registry entry whose newest green CORRECTNESS row is r09 or
    # older (recomputed from CORRECTNESS_r01-r14 at round start).  After
    # r15 records this window, no entry's evidence is older than r10.
    # The already-recorded r10-r14 cohorts rotate to the back. ----
    # (1) new this round (VERDICT r14 #4/#5/#8)
    "layout_equality_delete_read",
    "dp_clamped_sum_release",
    "streaming_ensemble_ann_topk",
    "dedup_family_canonical_pairs",
    # (2) the r09-stale cohort — 40 entries, registry order
    "q1_pricing_summary",
    "flagship_user_status",
    "filter_project",
    "join_inner",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_broadcast_chain",
    "latest_event_per_user",
    "salted_join_result_parity",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize_batch",
    "split_train_holdout",
    "text_token_stats",
    "text_bpe_token_estimate",
    "text_lang_id",
    "text_quality_score",
    "text_quality_filter",
    "wordcount_top20",
    "text_winnowing_fingerprints",
    "text_repetition_stats",
    "pack_sequences_concat",
    "pack_sequences_stats",
    "text_tfidf_top_terms",
    "layout_zorder_file_stats",
    "layout_zorder_pruning_ratio",
    "layout_compaction_plan",
    "layout_compaction_ratio",
    "funnel_conversion_steps",
    "dq_referential_orphans",
    "dedup_video_fingerprint_pairs",
    "multimodal_image_dedup_pipeline",
    "sample_stratified_by_key",
    "scalar_decimal_exact",
    "streaming_right_outer_join",
    "streaming_full_outer_join",
    "streaming_state_store_read",
    "pandas_api_on_spark",
    "join_hint_shuffle_hash",
    # (3) pad to a full 50-row oracled window with the head of the
    # r10-stale cohort (keeps rows-only agg_approx_distinct out of the
    # sampled prefix; these start the r16 rotation)
    "text_bigram_coherence",
    "text_vocab_oov",
    "join_full_outer",
    "join_null_safe_eq",
    "retention_cohort_weekly",
    "mix_weighted_sample",
    "mix_temperature_sample",
    "shuffle_training_order",
    "semantic_dedup_cells",
    "pii_scrub_planted",
]


def _reorder_for_sampling() -> None:
    front = [n for n in _SAMPLE_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    ordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(ordered)
    oracle_ordered = {n: ORACLE[n] for n in front + rest if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(oracle_ordered)


_reorder_for_sampling()

__all__ = ["ORACLE", "QUERIES", "register"]
