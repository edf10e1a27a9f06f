"""Import all plan modules so their ``@register`` decorators populate the
registry, then re-export it."""

from .registry import ORACLE, QUERIES, register

from . import (  # noqa: E402,F401
    aggregates,
    core,
    curation,
    dedup_ops,
    event_time,
    llm_pipeline,
    multimodal_ops,
    scalars,
    scd_ops,
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

__all__ = ["ORACLE", "QUERIES", "register"]
