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
    # ---- round-7 rotation (VERDICT r6 "Next round #1"): the first ~50
    # must ALL be oracled — the 4 rows-only-by-design entries
    # (sim_pq_ann_topk, agg_approx_distinct, sim_embedding_pairs_blas,
    # sim_ivf_ann_topk) stay OUT of this window permanently so every
    # driver-recorded row is hash-checkable.  Lead with this round's new
    # entries (first recorded row), then freshness-rotate: the 12 oracled
    # entries whose latest recorded row is r2, then the r3 batch.  The
    # round-6 cohort (45 entries + the 5 r1-latest) recorded green rows
    # in CORRECTNESS_r06 and rotates to the back. ----
    # round-7 new entries
    "dedup_image_dhash_fingerprints",
    "dedup_image_dhash_pairs",
    "dedup_audio_fingerprints",
    "dedup_audio_fingerprint_pairs",
    "dedup_video_fingerprints",
    "dedup_video_fingerprint_pairs",
    "sql_pipe_syntax",
    "text_html_extract",
    "curation_domain_caps",
    "multimodal_image_dedup_pipeline",
    "mix_upsample_epochs",
    "sample_tablesample_percent",
    "sample_stratified_by_key",
    "sample_freqitems_contract",
    "sample_crosstab_exact",
    "sim_incremental_index_assign",
    "streaming_available_now_drain",
    # latest recorded row is r2
    "merge_upsert_customer",
    "multimodal_binary_features",
    "scalar_array_funcs",
    "scalar_conditional_null",
    "scalar_date_funcs",
    "scalar_json_extract",
    "scalar_math_funcs",
    "scalar_regexp_funcs",
    "scalar_string_funcs",
    "scd2_customer_balance",
    "set_union_all",
    "sort_limit_topk",
    # latest recorded row is r3
    "agg_approx_distinct_error",
    "agg_approx_percentile_error",
    "agg_cube",
    "agg_having",
    "agg_minmax_distinct",
    "agg_percentiles_exact",
    "agg_pivot",
    "agg_rollup",
    "agg_statistics",
    "case_derived_status",
    "curation_clean_corpus",
    "decontaminate_ngram_overlap",
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_lsh_pairs",
    "dedup_exact_groups",
    "dedup_first_event",
    "dedup_fuzzy_levenshtein_pairs",
    "dedup_minhash_bands",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_fingerprints",
    "dedup_simhash_pairs",
    "filter_project",
    "flagship_user_status",
    "join_anti",
    "join_broadcast_chain",
    "join_inner",
    "join_left_outer",
    "join_semi",
    "latest_event_per_user",
    "pack_sequences_concat",
    "pack_sequences_stats",
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
