"""Per-user, per-process scratch directories for registry entries.

Entries that round-trip through the filesystem (partitioned writes,
planted binary assets, streaming sinks + checkpoints) used to mint a
fresh ``uuid``-named directory under the system tempdir per invocation
and never remove it, so bench repeats and driver contract runs
accumulated orphaned trees (ADVICE r6).  The round-7 fix (one fixed path
per entry name) overcorrected into a shared mutable singleton (ADVICE
r7): two concurrent runs (bench + driver_sim, or two users on one box)
rmtree'd each other's in-use staged inputs, a leftover dir owned by
another user made ``rmtree(ignore_errors=True)`` silently fail so the
caller's bare ``os.makedirs`` raised ``FileExistsError``, and a
predictable world-shared /tmp path is a symlink/pre-creation surface.

``entry_tmp_dir`` now namespaces the root per USER (mode 0o700, with an
ownership check) and per PROCESS (pid leaf), so concurrent runs never
share scratch, while re-runs of one entry within a process still
overwrite instead of accumulating.  Stale pid roots from previous
processes of the same user are swept opportunistically.  If the
per-user root exists but is not ours (symlink or foreign owner), fall
back to a fresh ``mkdtemp`` root for safety.

The leaf directory is NOT created (Spark writers and ``os.makedirs``
call sites expect to create it themselves); only the parent root exists.
"""

from __future__ import annotations

import getpass
import os
import shutil
import tempfile

_FALLBACK_ROOT: str | None = None


def _user_root() -> str:
    """The per-user scratch root, created 0o700 and ownership-checked;
    a foreign or symlinked path falls back to a private mkdtemp root
    (cached for the life of the process so entry paths stay stable)."""
    global _FALLBACK_ROOT
    if _FALLBACK_ROOT is not None:
        return _FALLBACK_ROOT
    try:
        user = getpass.getuser()
    except Exception:
        user = f"uid{os.getuid()}"
    root = os.path.join(tempfile.gettempdir(), f"hg_spark_scratch_{user}")
    try:
        os.makedirs(root, mode=0o700, exist_ok=True)
        st = os.lstat(root)
        if os.path.islink(root) or st.st_uid != os.getuid():
            raise OSError("scratch root not owned by this user")
    except OSError:
        _FALLBACK_ROOT = tempfile.mkdtemp(prefix="hg_spark_scratch_")
        return _FALLBACK_ROOT
    return root


def _proc_root() -> str:
    """Per-process leaf under the user root; sweeps sibling pid dirs whose
    processes are gone (same-user orphans from crashed/finished runs)."""
    uroot = _user_root()
    proot = os.path.join(uroot, f"pid{os.getpid()}")
    for name in os.listdir(uroot):
        if not name.startswith("pid") or name == f"pid{os.getpid()}":
            continue
        try:
            pid = int(name[3:])
        except ValueError:
            continue
        try:
            os.kill(pid, 0)  # raises if no such process (or not ours)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(uroot, name), ignore_errors=True)
        except OSError:
            pass
    os.makedirs(proot, exist_ok=True)
    return proot


def entry_tmp_dir(name: str) -> str:
    """Return this process's scratch path for ``name``, clearing any
    previous same-process run's tree (including sibling suffix dirs like
    ``<name>_ckpt``, which live inside the returned path by convention)."""
    path = os.path.join(_proc_root(), name)
    if os.path.lexists(path):
        shutil.rmtree(path, ignore_errors=True)
    return path
