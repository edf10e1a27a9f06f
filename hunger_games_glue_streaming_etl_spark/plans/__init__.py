"""Import all plan modules so their ``@register`` decorators populate the
registry, then re-export it."""

from .registry import ORACLE, QUERIES, register

from . import (  # noqa: E402,F401
    aggregates,
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
    sources_sql,
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
    # streaming tier (7) — round-3's headline oracles, never recorded
    "streaming_tumbling_agg",
    "streaming_keyed_dedup",
    "streaming_stream_stream_join",
    "streaming_running_state",
    "streaming_session_window",
    "streaming_left_outer_join",
    "streaming_corpus_ingest",
    # de-vacuated gate (VERDICT r03 #2) — needs a recorded spark_rows > 0
    "q5_local_supplier_volume",
    # SQL front-end subqueries (3)
    "subquery_correlated_avg",
    "subquery_not_exists_agg",
    "subquery_in_having",
    # window functions (5)
    "window_rank_dense",
    "window_lag_lead",
    "window_running_frame",
    "window_topk_per_group",
    "window_distribution_funcs",
    # UDF/UDAF/UDTF surface (4)
    "udf_pandas_zscore",
    "udtf_token_positions",
    "udf_grouped_map_normalize",
    "udaf_grouped_agg_median",
    # LLM-pipeline entries without a recorded row (6)
    "pipeline_pretrain_corpus",
    "text_bm25_search",
    "mix_weighted_sample",
    "shuffle_training_order",
    "semantic_dedup_cells",
    "corpus_token_budget_select",
    # round-4 additions (need their first recorded row)
    "pii_scrub_planted",
    "dedup_cluster_components",
    "dedup_cluster_canonical_keep",
    "text_duplicate_segments",
    "text_segment_dedup_stats",
    "layout_zorder_file_stats",
    "layout_zorder_pruning_ratio",
    # round-4 second-session additions (first recorded rows needed;
    # placed before the similarity tier so they stay inside the driver's
    # ~50-row sampling window — the list is slightly over 50, and the
    # tail stragglers below have sim-green history to fall back on)
    "layout_compaction_plan",
    "layout_compaction_ratio",
    "profile_table_columns",
    "text_bigram_coherence",
    "mix_temperature_sample",
    "text_vocab_oov",
    "funnel_conversion_steps",
    "retention_cohort_weekly",
    "streaming_funnel_state",
    "anomaly_hourly_event_rate",
    "profile_join_key_skew",
    "scd2_asof_snapshot",
    "dedup_cluster_components_star",
    "dq_referential_orphans",
    # carries the new JPEG oracle row — needs its r04 record more than the
    # similarity tier's tail does
    "multimodal_real_codec_features",
    # reference-corpus parity + temporal joins + SCD-adjacent
    "tribute_status_reference_corpus",
    "asof_latest_purchase_before_click",
    "range_join_value_bands",
    # similarity tier without a recorded row (7)
    "sim_lsh_ann_topk_fullprobe",
    "sim_ivf_ann_topk_fullprobe",
    "sim_pq_ann_topk",
    "sim_ivf_recall_check",
    "sim_pq_recall_check",
    "sim_lsh_bucket_stats",
    # sources + straggler relational entries
    "scan_csv_explicit_schema",
    "scan_json_explicit_schema",
    "scan_orc_roundtrip",
    "agg_grouping_sets",
    "sql_api_shipping_priority",
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
