"""Fixed, self-cleaning scratch directories for registry entries.

Entries that round-trip through the filesystem (partitioned writes,
planted binary assets, streaming sinks + checkpoints) used to mint a
fresh ``uuid``-named directory under the system tempdir per invocation
and never remove it, so bench repeats and driver contract runs
accumulated orphaned ``hg_part_*``/``hg_assets_*``/``hg_pysink_*`` trees
(ADVICE r6).  ``entry_tmp_dir`` gives every entry ONE fixed path keyed by
entry name and removes any previous incarnation before returning it —
re-runs overwrite instead of accumulating, and determinism improves: a
stale checkpoint or sink from a prior run can never leak into the next
result.

The leaf directory is NOT created (Spark writers and ``os.makedirs``
call sites expect to create it themselves); only the parent root exists.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_ROOT = os.path.join(tempfile.gettempdir(), "hg_spark_scratch")


def entry_tmp_dir(name: str) -> str:
    """Return the fixed scratch path for ``name``, clearing any previous
    run's tree (including sibling suffix dirs like ``<name>_ckpt``, which
    live inside the returned path by convention)."""
    os.makedirs(_ROOT, exist_ok=True)
    path = os.path.join(_ROOT, name)
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    return path
