"""Streaming-native operators (M3): event-time windows + watermarks, keyed
deduplication, session windows, and an arbitrary-stateful operator.

The reference's streaming surface is stateless micro-batch + update-mode
upsert (SURVEY.md §2C: "no watermark, no event-time window, no
dropDuplicates, no stateful op"); these are the idiomatic Spark expressions
of its domain ("most up-to-date status", late sensor data) that any credible
streaming engine must ship.

Scale notes: all state here lives in the HDFS/RocksDB-backed state store,
partitioned by the grouping key — state size is bounded by (keys ×
watermark horizon), so every operator takes an explicit watermark; an
unbounded-state streaming op is a production incident at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time window agg
    with a watermark bounding both late data and state retention."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def chained_windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    inner_window: str = "1 hour",
    outer_window: str = "1 day",
    watermark: str = "10 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """TWO chained stateful window aggregations in ONE streaming query
    (Spark 3.4+ multiple-stateful-operator support): event-time tumbling
    ``inner_window`` aggs roll up into ``outer_window`` aggs via
    ``window_time()`` as the downstream event-time column.  Both operators
    share the query's single watermark; the outer window finalizes (append
    mode) once the watermark passes its end, by which point every inner
    window inside it has finalized and flowed downstream — no-data batches
    cascade the finalization.

    Determinism: the inner value sum is rounded to 2dp at emission, so the
    outer operator sums an identical multiset of 2-decimal doubles on both
    engines; the outer round absorbs sub-ulp ordering differences (same
    convention as the single-window entries).  Counts stay exact BIGINTs.

    At scale this is the canonical rollup cascade (minute→hour→day) that
    otherwise needs one job per tier plus an external re-read: chaining
    keeps it one pipeline, and state is bounded per tier by the watermark."""
    inner = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, inner_window).alias("window"), *keys)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("inner_value"),
        )
    )
    return (
        inner.groupBy(
            F.window(F.window_time("window"), outer_window).alias("outer_w"), *keys
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("inner_value"), 2).alias("total_value"),
        )
        .select(
            F.col("outer_w.start").alias("day_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicates`` keyed state, expired by event time — the bounded
    form of at-least-once source dedup)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col])


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Key-only dedup with watermark-bounded state
    (``dropDuplicatesWithinWatermark``): a redelivered record is dropped
    even when its event time differs from the first delivery (retries
    restamp timestamps — the case plain ``dropDuplicates`` on (key, ts)
    misses), and the key is re-admitted once the watermark passes.  The
    exact shape of at-least-once source retry dedup."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def sessionize_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Session windows (gap-close semantics) — the streaming twin of
    ``plans.event_time.sessionize_batch``."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "n_events",
            "session_value",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time window: right rows
    match left rows at-or-before them within ``within``.

    Both sides carry watermarks and the join condition carries the time
    bound — that pair is what lets Spark expire buffered state (an unbounded
    stream-stream join is an unbounded state store).  The reference has only
    stream-static joins (SURVEY.md §2C); this is the genuinely-streaming
    join the engine adds.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    l_ts, r_ts = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (r_ts <= l_ts)
        & (r_ts >= l_ts - F.expr(f"INTERVAL {within}"))
    )
    return lw.alias("__l").join(rw.alias("__r"), cond, how)


# ---- arbitrary stateful processing (applyInPandasWithState) ----------------

RUNNING_STATE_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def _update_running_state(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum, max) maintained across micro-batches —
    the minimal custom stateful operator (update-mode emission per batch)."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
        }
    )


def running_user_state(stream: DataFrame) -> DataFrame:
    """Arbitrary stateful op: per-user running aggregate via
    ``applyInPandasWithState`` (Arrow-batched, state-store-backed)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running_state,
        outputStructType=RUNNING_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- streaming conversion funnel (applyInPandasWithState) ------------------

FUNNEL_STATE_SCHEMA = "user_id long, reached_step long, anchor_us long"
_FUNNEL_STATE = "step long, anchor long"
_FUNNEL_ORDER = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


def _update_funnel_state(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Greedy per-user funnel state machine: events of each trigger are
    processed in (ts, event_id) order; step k+1 fires on the FIRST step-k+1
    event strictly after the step-k anchor and within the 24 h window.
    State is two longs — (step, anchor µs) — bounded forever, no lists.

    Within a time-sorted batch 'first qualifying' ≡ 'min-time qualifying',
    so the cross-batch semantics are exactly the seeded min-time chain the
    replay oracle reproduces in SQL."""
    step, anchor = state.get if state.exists else (0, 0)
    pdf = pd.concat(list(pdf_iter))
    pdf = pdf.sort_values(["ts", "event_id"])
    for ts, etype in zip(pdf["ts"], pdf["event_type"]):
        if step >= 4:
            break
        ts_us = int(pd.Timestamp(ts).value) // 1000
        if step == 0:
            if etype == _FUNNEL_ORDER[0]:
                step, anchor = 1, ts_us
        elif (
            etype == _FUNNEL_ORDER[step]
            and ts_us > anchor
            and ts_us <= anchor + FUNNEL_WINDOW_US
        ):
            step, anchor = step + 1, ts_us
    state.update((step, anchor))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "reached_step": [step],
            "anchor_us": [anchor],
        }
    )


def funnel_user_state(stream: DataFrame) -> DataFrame:
    """Streaming conversion funnel via ``applyInPandasWithState`` — the
    streaming face of ``plans.event_time.funnel_conversion_steps`` (update
    mode: one row per (user, trigger-with-data) carrying the funnel depth
    and last-step anchor after that trigger)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel_state,
        outputStructType=FUNNEL_STATE_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- idle-session finalization (EventTimeTimeout) --------------------------

SESSION_FINAL_SCHEMA = "user_id long, n_events long, first_us long, last_us long"
_SESSION_FINAL_STATE = "n long, first long, last long"
SESSION_IDLE_GAP_US = 30 * 60 * 1_000_000


def _finalize_idle_session(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Append-mode session close: nothing is emitted while a user is
    active; when the event-time timeout fires (watermark passed
    last-event + gap), the FINAL session summary is emitted exactly once
    and the state removed.  State is three longs — bounded forever."""
    if state.hasTimedOut:
        n, first, last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_us": [first],
                "last_us": [last],
            }
        )
        return
    n, first, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        for ts in pdf["ts"]:
            us = int(pd.Timestamp(ts).value) // 1000
            n += 1
            first = us if (first == 0 or us < first) else first
            last = us if us > last else last
    state.update((n, first, last))
    # event-time timeout takes MILLISECONDS since epoch; it must be set
    # anew every invocation (processing data clears the previous timer)
    state.setTimeoutTimestamp(last // 1000 + SESSION_IDLE_GAP_US // 1000)


def idle_session_finalize(
    stream: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user idle-session finalizer via ``applyInPandasWithState`` with
    ``GroupStateTimeout.EventTimeTimeout`` — the timeout face of arbitrary
    state the other stateful ops (NoTimeout) don't exercise: emission
    happens on state EXPIRY, not on data, which is how real sessionization
    / abandoned-cart / TTL-cleanup operators are built.  Timeouts fire as
    soon as the watermark passes the idle deadline: MicroBatchExecution
    schedules a no-data micro-batch after a watermark advance purely to
    process state expiry, so finalization does NOT wait for further data
    (unlike join-state eviction's one-batch lag — both pinned in
    ``tests/test_streaming_depth.py``)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _finalize_idle_session,
            outputStructType=SESSION_FINAL_SCHEMA,
            stateStructType=_SESSION_FINAL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---- arbitrary state v2: transformWithStateInPandas ------------------------

TWS_OUTPUT_SCHEMA = "user_id long, n_events long, value_sum_fp long"


def running_user_state_v2(stream: DataFrame) -> DataFrame:
    """Per-user running (count, fixed-point value sum) through
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state v2 API
    (``StatefulProcessor`` + typed state handles), the successor surface
    to ``applyInPandasWithState``: named state variables, timers, and TTL
    instead of one opaque tuple.  Semantics here mirror
    ``running_user_state`` so the same replay-oracle shape pins it.

    The value sum is fixed-point ``FLOOR(v·1000 + 0.5)`` BIGINT (IEEE
    multiply/add then exact floor — bit-identical in pandas, Spark and
    DuckDB), never a raw double accumulation.

    Requires the RocksDB state-store provider (the v2 API does not
    support the default HDFS-backed store) — the plan entry sets it for
    the query's duration."""
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, vfp long")

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            if self._totals.exists():
                n, vfp = self._totals.get()
            else:
                n, vfp = 0, 0
            for pdf in rows:
                n += len(pdf)
                vfp += int(
                    np.floor(pdf["value"].to_numpy(dtype="float64") * 1000 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._totals.update((n, vfp))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_sum_fp": [vfp]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---- streaming unaligned-passage anchors ------------------------------------
#
# The batch anchor pipeline (plans/segment_ops._anchors) needs pin()
# barriers between its array stages — persist is illegal on streaming
# frames, and without the barrier the window-slice HOFs re-evaluate the
# gram-hash array per element (the O(n²) trap).  The streaming twin is a
# STATELESS Arrow kernel instead: one pass per document in Python,
# emitting the same (pos, gh) winnowing anchors bit-for-bit (md5-prefix
# portable hash, leftmost-min winnowing — parity with the batch form is
# unit-pinned in tests/test_streaming_depth.py).

ROLL_TOKENS = 16
WINNOW_W = 8


def py_winnowing_anchors(text: str | None) -> list[tuple[int, int]]:
    """Pure-Python twin of tokens → winnowing_gram_hashes(16) →
    winnowing_anchor_positions(8): distinct (1-based gram pos, 48-bit
    hash) anchors.  Mirrors the Spark expressions exactly: trim strips
    SPACES only (Spark ``trim``), ``\\s+`` collapses ASCII whitespace,
    short documents contribute their full text as the single gram, and
    window minima take the LEFTMOST position on hash ties."""
    import hashlib
    import re

    if text is None:
        return []
    toks = re.sub(r"\s+", " ", text.strip(" ").lower(), flags=re.ASCII).split(" ")
    n_grams = max(len(toks) - ROLL_TOKENS + 1, 1)
    hs = []
    for i in range(n_grams):
        gram = " ".join(toks[i : i + ROLL_TOKENS])
        hs.append(
            int(hashlib.md5(("0:" + gram).encode("utf-8")).hexdigest()[:12], 16)
        )
    n_windows = max(len(hs) - WINNOW_W + 1, 1)
    out: list[tuple[int, int]] = []
    seen: set[int] = set()
    for j in range(n_windows):
        sl = hs[j : j + WINNOW_W]
        m = min(sl)
        pos = j + sl.index(m) + 1
        if pos not in seen:
            seen.add(pos)
            out.append((pos, hs[pos - 1]))
    return out


def passage_anchor_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """(doc_id, ingest_ts, pos, gh) winnowing anchors of a document
    stream — stateless ``mapInPandas``, streaming-legal (no persist, no
    state), one Arrow batch pass per trigger."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("pos", T.LongType()),
            T.StructField("gh", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, ts, txt in zip(pdf[id_col], pdf[ts_col], pdf[text_col]):
                for pos, gh in py_winnowing_anchors(txt):
                    rows.append((did, ts, pos, gh))
            yield pd.DataFrame(rows, columns=[id_col, ts_col, "pos", "gh"])

    return stream.select(id_col, ts_col, text_col).mapInPandas(kernel, schema)
