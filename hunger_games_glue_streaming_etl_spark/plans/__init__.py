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
    # ---- round-5 rotation: the 12 entries with no recorded row in any of
    # CORRECTNESS_r01-r04 go FIRST (VERDICT r04 "Next round #1") ----
    "range_join_value_bands",
    "sim_lsh_ann_topk_fullprobe",
    "sim_ivf_ann_topk_fullprobe",
    "sim_pq_ann_topk",
    "sim_ivf_recall_check",
    "sim_pq_recall_check",
    "sim_lsh_bucket_stats",
    "scan_csv_explicit_schema",
    "scan_json_explicit_schema",
    "scan_orc_roundtrip",
    "agg_grouping_sets",
    "sql_api_shipping_priority",
    # ---- round-5 new entries (need their first recorded row) ----
    "pipeline_near_dedup",
    "profile_table_columns_approx",
    "window_time_range_frame",
    "timeseries_gap_fill_hourly",
    "quality_classifier_linear",
    "scalar_variant_shred",
    "join_lateral_topk",
    "scan_python_datasource",
    "scan_python_datasource_pushdown",
    "scan_schema_evolution",
    "agg_boolean_filter_funcs",
    "relational_unpivot",
    "streaming_transform_with_state",
    "streaming_python_datasource",
    "graph_pagerank_trade",
    "dq_expectations_summary",
    "chat_format_audit",
    "chat_sft_corpus_totals",
    "sim_sq8_ann_topk",
    "sim_sq8_recall_check",
    "dedup_incremental_new_vs_base",
    "agg_listagg_ordered",
    "join_full_outer",
    "join_null_safe_eq",
    "profile_histogram_numeric",
    "sketch_cms_heavy_hitters",
    "sketch_bloom_membership",
    "timeseries_interpolate_linear",
    "affinity_copurchase_pairs",
    "sketch_hll_registers",
    "sketch_hll_estimate",
    "dq_table_diff_summary",
    "set_ops_bag_semantics",
    "agg_mode_median",
    # ---- backfill: re-record the heavyweight / most-load-bearing tiers so
    # every round's artifact keeps fresh evidence for them ----
    "q5_local_supplier_volume",
    "tribute_status_reference_corpus",
    "pipeline_pretrain_corpus",
    "dedup_cluster_components",
    "dedup_cluster_components_star",
    "dedup_cluster_canonical_keep",
    "semantic_dedup_cells",
    "corpus_token_budget_select",
    "shuffle_training_order",
    "streaming_funnel_state",
    "streaming_tumbling_agg",
    "streaming_keyed_dedup",
    "streaming_stream_stream_join",
    "streaming_running_state",
    "streaming_session_window",
    "streaming_left_outer_join",
    "streaming_corpus_ingest",
    "multimodal_real_codec_features",
    "scd2_asof_snapshot",
    "dq_referential_orphans",
    "anomaly_hourly_event_rate",
    "profile_table_columns",
    "profile_join_key_skew",
    "layout_zorder_pruning_ratio",
    "layout_compaction_plan",
    "mix_temperature_sample",
    "pii_scrub_planted",
    "text_duplicate_segments",
    "funnel_conversion_steps",
    "retention_cohort_weekly",
    "asof_latest_purchase_before_click",
    "window_topk_per_group",
    "udf_grouped_map_normalize",
    "udaf_grouped_agg_median",
    "subquery_correlated_avg",
    "text_bm25_search",
    "mix_weighted_sample",
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
