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

``entry_tmp_dir`` namespaces the root per USER (mode 0o700, with an
ownership check) and per PROCESS (pid leaf), so concurrent runs never
share scratch, while re-runs of one entry within a process still
overwrite instead of accumulating.  If the per-user root exists but is
not ours (symlink or foreign owner), fall back to a fresh ``mkdtemp``
root for safety.

Lifecycle (ADVICE r8 lows): the verified user root and created proc
root are cached in module globals, so the makedirs/lstat probe and the
sibling-pid sweep run ONCE per process, not per entry invocation.  An
``atexit`` handler removes this process's proc root (and any fallback
mkdtemp root, whose random name no future pid sweep could reclaim) at
interpreter shutdown; stale pid roots from CRASHED same-user processes
are still reclaimed by the opportunistic sweep on the next run, and the
pre-r8 shared root ``/tmp/hg_spark_scratch`` is removed during that
sweep when we own it.

The leaf directory is NOT created (Spark writers and ``os.makedirs``
call sites expect to create it themselves); only the parent root exists.
"""

from __future__ import annotations

import atexit
import getpass
import os
import shutil
import tempfile

_FALLBACK_ROOT: str | None = None
_USER_ROOT: str | None = None
_PROC_ROOT: str | None = None


def _user_root() -> str:
    """The per-user scratch root, created 0o700 and ownership-checked;
    a foreign or symlinked path falls back to a private mkdtemp root.
    Both outcomes are cached for the life of the process so entry paths
    stay stable and the probe syscalls run once."""
    global _FALLBACK_ROOT, _USER_ROOT
    if _FALLBACK_ROOT is not None:
        return _FALLBACK_ROOT
    if _USER_ROOT is not None:
        return _USER_ROOT
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
    _USER_ROOT = root
    return root


def _sweep_orphans(uroot: str) -> None:
    """Reclaim same-user pid dirs whose processes are gone, plus the
    legacy pre-r8 shared root (only when we own it and it is not a
    symlink — never follow a planted link)."""
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
    legacy = os.path.join(tempfile.gettempdir(), "hg_spark_scratch")
    try:
        if not os.path.islink(legacy) and os.lstat(legacy).st_uid == os.getuid():
            # A pre-r8 process of the same user may still be USING the
            # shared root: only reclaim it when no pid-named child maps
            # to a live process (same liveness probe as the per-pid
            # sweep above — never delete live scratch out from under a
            # running sibling).
            def _live(name: str) -> bool:
                if not name.startswith("pid"):
                    return False
                try:
                    os.kill(int(name[3:]), 0)
                    return True
                except (ValueError, ProcessLookupError):
                    return False
                except OSError:
                    return True  # exists but not ours to signal
            if not any(_live(n) for n in os.listdir(legacy)):
                shutil.rmtree(legacy, ignore_errors=True)
    except OSError:
        pass


def _cleanup_at_exit() -> None:
    for path in (_PROC_ROOT, _FALLBACK_ROOT):
        if path is not None:
            shutil.rmtree(path, ignore_errors=True)


def _proc_root() -> str:
    """Per-process leaf under the user root; created (and the orphan
    sweep run) once per process, removed at interpreter exit."""
    global _PROC_ROOT
    if _PROC_ROOT is not None:
        return _PROC_ROOT
    uroot = _user_root()
    if _FALLBACK_ROOT is None:
        _sweep_orphans(uroot)
    proot = os.path.join(uroot, f"pid{os.getpid()}")
    os.makedirs(proot, exist_ok=True)
    _PROC_ROOT = proot
    atexit.register(_cleanup_at_exit)
    return proot


def entry_tmp_dir(name: str) -> str:
    """Return this process's scratch path for ``name``, clearing any
    previous same-process run's tree (including sibling suffix dirs like
    ``<name>_ckpt``, which live inside the returned path by convention)."""
    path = os.path.join(_proc_root(), name)
    if os.path.lexists(path):
        shutil.rmtree(path, ignore_errors=True)
    return path
