"""Registry-wide anti-pattern sweep (tools/plan_audit.py as a test): no
auditable entry's physical plan may contain a CartesianProduct or a
row-at-a-time Python UDF.  Skipped entries (construction executes real
work) are pinned by count so additions to the skip list are deliberate."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import SKIP_EXECUTING, audit  # noqa: E402

from conftest import SF_DIR  # noqa: E402


def test_registry_plans_free_of_cartesian_and_row_udfs(spark):
    clean, violations, skipped = audit(spark, SF_DIR)
    assert violations == []
    # most of the registry must actually be audited — if this drops, the
    # skip list grew without thought
    assert len(clean) >= 100, (len(clean), len(skipped))
    assert all(
        s.startswith("streaming_") or s in SKIP_EXECUTING for s in skipped
    )


def test_executed_plan_sweep_on_skip_listed_sample(spark):
    """The post-hoc executed-plan sweep (audit_executed) must cover the
    plans the static audit can't — construction-executes entries.  CI runs
    a representative sample (one checkpointed loop, one ANN seed-job entry,
    one streaming query); the full skip list is swept by
    `python tools/plan_audit.py` each round."""
    from plan_audit import audit_executed

    sample = [
        "dedup_cluster_components",   # checkpointed DataFrame loop
        "sim_ivf_ann_topk",           # driver-side seed jobs + probes
        "streaming_tumbling_agg",     # micro-batch executions
    ]
    clean, violations = audit_executed(spark, SF_DIR, names=sample)
    assert violations == []
    assert sorted(clean) == sorted(sample)
