"""Session-scoped tracking of persisted intermediates.

Operators pin intermediates (``.persist()``) to avoid recomputing
expensive stages that feed multiple consumers (self-joins, hot-shingle
corrections, winnowing barriers).  A pinned frame can't be unpersisted
inside the operator — the caller hasn't materialized the result yet — so
an untracked ``persist`` leaks: across a 90+-query contract run on the
driver's default-1g heap, cached blocks accumulate until LRU eviction
(ADVICE r2).

``pin`` persists AND records the frame; ``release_pins`` drops every
recorded pin.  The query registry calls ``release_pins`` at the start of
each registered query, so each query's intermediates live exactly until
the next query begins (the driver materializes results between calls).
Unpersisting is always correctness-safe — a released frame recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and track it for the next ``release_pins``."""
    _PINNED.append(df.persist())
    return df


def release_pins() -> None:
    """Unpersist every tracked intermediate (non-blocking).

    A pin may belong to a SparkSession that has since been stopped (tests
    and multi-session tools stop/recreate sessions); unpersisting through
    the dead JVM handle raises, and a raise mid-drain used to leave the
    remaining stale pins queued so every later registered query kept
    failing.  Stale pins need no release — their blocks died with the
    session — so they are SKIPPED (detected via the context's stopped
    flag) rather than caught: a live-session unpersist failure is a real
    cache-leak bug and must surface, not be swallowed (ADVICE r03)."""
    while _PINNED:
        df = _PINNED.pop()
        if _session_stopped(df):
            continue  # blocks died with the session; nothing to release
        df.unpersist()


def _session_stopped(df: DataFrame) -> bool:
    """True if the frame's SparkContext is gone or already stopped."""
    try:
        sc = df.sparkSession.sparkContext
        return sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        return True  # can't even reach the session -> treat as stopped
