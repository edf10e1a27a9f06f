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
