"""Event-time analytics (SURVEY.md §2C 'Streaming-only' + M3): the reference
has no event-time column at all (its only temporal notion is file replay
order); the engine ships tumbling/sliding/session windows over ``events.ts``.

These are the *batch* forms with DuckDB oracles — the driver's correctness
gate can check them.  The same logic under ``readStream`` + watermarks is
exercised in ``tests/test_streaming_depth.py`` (streaming semantics are not
SQL-oracle-expressible).

Scale notes: a tumbling window agg is an ordinary hash aggregate on
(bucket, keys) — partial aggregation applies, one shuffle.  The sliding form
expands each row into window_count = length/slide copies *before* the
shuffle (Spark does the same internally); keep length/slide small at 100 TB
or pre-aggregate into tumbling buckets first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time window (F.window ≡ date_trunc for
    slide == length)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS window_start, value
        FROM events
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY 1
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly 2
    windows (the oracle expands via two shifted tumbling buckets — valid
    because length/slide = 2)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS session_value,
           date_trunc('second', MIN(ts)) AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → gap flag →
    running sum → per-session aggregate.  Streaming twin: session_window
    (tests/test_streaming_depth.py).  Two window passes + one agg, all
    partitioned by user_id — one shuffle total."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer µs arithmetic — second-truncating casts would disagree
    # with the oracle on gaps within 1s of the threshold
    gap = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) > 1_800_000_000
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("new_session", F.when(gap, 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(running).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.date_trunc("second", F.min("ts")).alias("session_start"),
        )
    )


@register(
    "dedup_first_event",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'first event per (user, type)' — the batch form of
    streaming dropDuplicates (which keeps an *arbitrary* first; we pin order
    so the result is checkable)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# Behavioral analytics over the event stream — the funnel / retention
# queries every product-analytics warehouse runs on exactly this
# (user_id, event_type, ts) shape.  Engine extension: the reference's
# events carry no time column at all; these close the event-time tier
# beyond windows/sessionization.
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@register(
    "funnel_conversion_steps",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        WHERE event_type = 'view' AND ts > t1
          AND ts <= t1 + INTERVAL 24 HOUR GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        WHERE event_type = 'click' AND ts > t2
          AND ts <= t2 + INTERVAL 24 HOUR GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, MIN(ts) AS t4 FROM events e JOIN s3 USING (user_id)
        WHERE event_type = 'purchase' AND ts > t3
          AND ts <= t3 + INTERVAL 24 HOUR GROUP BY e.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN t4 IS NOT NULL THEN 4
                     WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS reached_step
    FROM u
    LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
    """,
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → click → purchase with a
    24-hour conversion window per step: step k counts only if it happens
    STRICTLY AFTER the user's step k−1 time and within the window
    (min-time semantics — deterministic, the standard warehouse funnel;
    interval adds are integer-µs arithmetic).  Output is per-user depth
    reached, 0..4; the window is tuned so every depth 1-4 is populated at
    sf0.001 AND sf0.01 (7/6/1/1 and 111/23/11/5 users — the non-vacuity
    rule applied to VALUE variety, not just row count).

    At scale: one pinned pass over (user_id, type, ts); each step is a
    filtered partial-agg groupBy on user_id plus a user-keyed join — all
    shuffles carry (long, timestamp) pairs, and every stage shares the
    user_id partitioning, which AQE reuses."""
    from ..caching import pin

    ev = pin(
        load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    )
    users = ev.select("user_id").distinct()
    step = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    frames = [step]
    for i, ev_type in enumerate(FUNNEL_STEPS[1:], start=2):
        prev_t = f"t{i - 1}"
        step = (
            ev.filter(F.col("event_type") == ev_type)
            .join(frames[-1], "user_id")
            .filter(
                (F.col("ts") > F.col(prev_t))
                & (F.col("ts") <= F.col(prev_t) + F.expr("INTERVAL 24 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        frames.append(step)
    out = users
    for i, fr in enumerate(frames, start=1):
        out = out.join(fr.select("user_id", f"t{i}"), "user_id", "left")
    reached = (
        F.when(F.col("t4").isNotNull(), 4)
        .when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select("user_id", reached.cast("long").alias("reached_step"))


@register(
    "retention_cohort_weekly",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST((epoch(a.active_week) - epoch(f.cohort_week)) // 604800
                AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM f JOIN a USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly retention triangle: users cohorted by the ISO week of
    their first event; each later active week increments that cohort's
    (week_offset, n_active_users) cell.  Week offsets are integer-second
    epoch arithmetic (CLAUDE.md event-time rule — no interval/float
    division anywhere).

    At scale: first-event cohorting is one partial-agg shuffle on
    user_id; the distinct activity grid is one (user, week) distinct;
    the join is user-keyed; the final rollup ships (timestamp, long)
    pairs.  The cohort table is |users| rows — metadata-scale next to
    the event stream."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        cohort.join(active, "user_id")
        .select(
            "cohort_week",
            (
                (
                    F.unix_timestamp("active_week")
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
    )


@register(
    "anomaly_hourly_event_rate",
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS s1,
               CAST(SUM(n * n) AS BIGINT) AS s2
        FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hr, h.n,
           ROUND((h.n - CAST(s1 AS DOUBLE) / k) /
                 SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                      / (k - 1)), 6) AS zscore,
           CAST(CASE WHEN ABS((h.n - CAST(s1 AS DOUBLE) / k) /
                 SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                      / (k - 1))) > 2 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM h JOIN m USING (event_type)
    """,
)
def anomaly_hourly_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection on the event stream: per event type, hourly
    counts z-scored against that type's own distribution; |z| > 2 flags
    the anomalous hours (the monitoring query behind every ops dashboard;
    138 flagged hours at sf0.01 — non-trivial both ways).

    Float-dial hash-exactness, same reasoning as the temperature mixture:
    the variance comes from EXACT integer moments (Σn, Σn² as BIGINTs —
    never an engine-internal var_samp, whose Welford accumulation order
    is not reproducible), and the z expression composes only
    correctly-rounded IEEE ops (divide, multiply, subtract, sqrt) in the
    same tree shape on both engines, so the doubles are bit-identical
    before the final ROUND.

    At scale: two partial-agg shuffles (hour rollup, then per-type
    moments — #types rows, broadcast back); z is map-side."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"))
    m = h.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    joined = h.join(F.broadcast(m), "event_type")
    mean = F.col("s1").cast("double") / F.col("k")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("k")
    ) / (F.col("k") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return joined.select(
        "event_type",
        "hr",
        F.col("n").cast("long"),
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > 2).cast("long").alias("is_anomaly"),
    )


@register(
    "timeseries_gap_fill_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS v
        FROM events
        WHERE user_id % 20 = 3
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, UNNEST(range(mn, mx + 1)) AS h FROM bounds
    )
    SELECT g.user_id,
           g.h AS hour_idx,
           COALESCE(hh.n, 0) AS n_events,
           LAST_VALUE(hh.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_fp,
           (hh.n IS NULL) AS is_gap
    FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
    """,
)
def timeseries_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + forward fill — the resample shape every
    metrics/sensor pipeline needs and plain GROUP BY can't produce: per
    user, an hourly grid spanning that user's first..last event hour, with
    silent hours materialized (``is_gap``, ``n_events = 0``) and the
    fixed-point hourly value carried forward from the last observed hour
    (``last(..., ignorenulls)`` over the per-user ordered grid).

    Deterministic end to end: hour index is integer-µs floor-division,
    the filled metric is the FLOOR-fixed-point BIGINT sum (order-free),
    and the fill is a per-user ROWS window.  The user subset (1 in 20 by
    key) keeps the densified grid a bounded multiple of the input at any
    sf — the dial a real deployment would drop.

    At scale: grid bounds are per-user (activity-bounded, not global
    min..max — a one-day user doesn't explode into the corpus's full
    span); sequence+explode fans out map-side; one shuffle joins
    observations back on (user, hour); the fill window repartitions by
    user only."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 3)
    hourly = (
        ev.groupBy(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
            ).cast("long").alias("v"),
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_idx"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("value_fp"),
        F.col("n").isNull().alias("is_gap"),
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS v
        FROM events
        WHERE user_id % 20 = 7
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, UNNEST(range(mn, mx + 1)) AS h FROM bounds
    ),
    ctx AS (
        SELECT g.user_id, g.h, hh.v,
               LAST_VALUE(hh.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN hh.v IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.h
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               FIRST_VALUE(hh.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN hh.v IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.h
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
    )
    SELECT user_id, h AS hour_idx, v AS v_obs, (v IS NULL) AS is_gap,
           CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
                WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
                ELSE CAST(pv AS DOUBLE)
                     + CAST(nv - pv AS DOUBLE)
                       * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
           END AS v_interp
    FROM ctx
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across time-series gaps — the resample(
    ``interpolate='linear'``) shape, completing the densification tier
    next to ``timeseries_gap_fill_hourly``'s forward fill: silent hours
    get ``pv + (nv−pv)·(h−ph)/(nh−ph)`` between the bracketing observed
    hours (both directions of ``last/first ignorenulls`` over the per-user
    ordered grid).

    The float column value-hashes bit-identically cross-engine because
    every input is a BIGINT (fixed-point hourly sums, integer hour
    indices) and the float tree uses only correctly-rounded IEEE ops
    (subtract/divide/multiply/add) in the SAME association on both sides
    — the `ln`-free discipline; no engine aggregate ever touches the
    doubles.  Edge hours are observed by construction (the grid spans
    each user's min..max active hour) but the NULL-bracket guards stay —
    they're the semantics a library user gets on an open-ended grid.

    At scale: per-user activity-bounded grids (no global span blowup),
    map-side sequence+explode fan-out, ONE shuffle on (user, hour), and
    both fill directions ride the same per-user sort — Spark plans the
    two opposite-frame windows over a single Exchange+Sort pair."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 7)
    hourly = ev.groupBy(
        "user_id", F.expr("unix_micros(ts) div 3600000000").alias("h")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id", F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("h")
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = joined.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(fwd).alias("nh"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv").cast("double")
            + (F.col("nv") - F.col("pv")).cast("double")
            * (
                (F.col("h") - F.col("ph")).cast("double")
                / (F.col("nh") - F.col("ph")).cast("double")
            )
        )
    )
    return ctx.select(
        "user_id",
        F.col("h").alias("hour_idx"),
        F.col("v").alias("v_obs"),
        F.col("v").isNull().alias("is_gap"),
        interp.alias("v_interp"),
    )


@register(
    "event_session_window_fn",
    oracle="""
    WITH gaps AS (
        SELECT user_id, epoch_us(ts) AS us, value, event_id,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, us, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid
        FROM gaps
    )
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + 1800000000 AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def event_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window()`` in BATCH — the declarative twin of the
    manual lag-gap sessionization (`sessionize_batch`): one groupBy, no
    window-function passes, and Spark's own merge logic builds the
    session extents.  Semantics boundary the oracle must mirror exactly:
    ``session_window`` merges an event while it lands STRICTLY INSIDE
    the previous event's ``[ts, ts+gap)`` window, so the session break
    condition is ``diff >= gap`` — one µs different from
    ``sessionize_batch``'s ``diff > gap`` break, a tie class that exists
    in integer-µs data (this is why both entries exist).  The emitted
    ``session_window.end`` is ``last_ts + gap``, replayed as
    ``MAX(us) + gap``.  Scale: a single (user_id)-keyed shuffle into a
    merging session aggregation — no per-row window state."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


@register(
    "timeseries_ohlc_hourly",
    oracle="""
    WITH t AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS hour_idx,
               value, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                                               epoch_us(ts) // 3600000000
                                  ORDER BY ts, event_id) AS rn_open,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                                               epoch_us(ts) // 3600000000
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT event_type, CAST(hour_idx AS BIGINT) AS hour_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close
    FROM t
    GROUP BY 1, 2
    """,
)
def timeseries_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the time-series bar aggregation (metrics
    roll-ups, market bars, sensor decimation): per (event_type, hour),
    the first/last values by the unique (ts, event_id) order plus
    min/max.  Open/close are ORDER-STATISTIC SELECTIONS of existing
    doubles (no arithmetic — hash-exact without rounding), ranked by the
    registry's unique-tiebreak rule; high/low are order-free MIN/MAX.
    Scale: one shuffle on the (type, hour) grain; the rank windows run
    inside each grain's partition — at 100 TB the grain count grows with
    the data while per-grain cardinality stays bounded by the bar
    width."""
    events = load_table(spark, sf_dir, "events")
    hour_idx = F.expr("unix_micros(ts) div 3600000000")
    base = events.select(
        "event_type", hour_idx.alias("hour_idx"), "value", "ts", "event_id"
    )
    w_open = Window.partitionBy("event_type", "hour_idx").orderBy(
        "ts", "event_id"
    )
    w_close = Window.partitionBy("event_type", "hour_idx").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = base.select(
        "event_type",
        "hour_idx",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ranked.groupBy("event_type", "hour_idx").agg(
        F.count("*").alias("n_events"),
        F.min(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
    )


# ---- LTTB downsampling ------------------------------------------------------
# Largest-Triangle-Three-Buckets (Steinarsson 2013), the standard
# visual-fidelity downsampler for hypertable rollups — with one change
# for distributed execution: the classic algorithm anchors each bucket's
# triangle on the PREVIOUSLY SELECTED point (a sequential chain through
# the whole series), this variant anchors on the neighbor buckets'
# AVERAGE points (the same anchors classic LTTB uses for its right-hand
# vertex), which makes every bucket independently computable map-side.
#
# Determinism: the triangle comparison is EXACT INTEGER arithmetic — the
# average anchors (sx/c, sy/c) are cross-multiplied away, giving the
# area scaled by cp²·cn as a BIGINT (y in exact cents, x in SECONDS for
# the area term AND the bucket assignment — (xs-xsmin)·nb keeps the
# bucketing multiply ~10⁶× farther from 2^63 than the µs form, whose
# ANSI-overflow bound was only ~3.5M buckets: the first float prototype
# hash-diverged because
# ROUND(huge_double, 6) takes different numeric paths in the two
# engines, and second-granularity keeps |area·cp²·cn| ≤ ~2e15 at every
# fixture — 4600× headroom vs 2^63, where millisecond granularity
# measured only 4.7×).  Since p and n are fixed within a bucket, the
# scale factor is constant per bucket and the integer argmax equals the
# real-area argmax; event_id breaks ties.
_LTTB_MIN_BUCKETS = 16
_LTTB_EVENTS_PER_BUCKET = 320  # ≈64 rows/bucket/series at 5 event types


@register(
    "timeseries_downsample_lttb",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, event_type, epoch_us(ts) AS x,
               epoch_us(ts) // 1000000 AS xs,
               CAST(ROUND(value * 100) AS BIGINT) AS yc
        FROM events
    ),
    nb AS (
        SELECT GREATEST({_LTTB_MIN_BUCKETS},
                        COUNT(*) // {_LTTB_EVENTS_PER_BUCKET}) AS nb
        FROM ev
    ),
    ser AS (
        SELECT event_type, MIN(xs) AS xsmin, MAX(xs) AS xsmax
        FROM ev GROUP BY event_type
    ),
    bkt AS (
        SELECT e.event_id, e.event_type, e.x, e.xs, e.yc, nb.nb,
               ((e.xs - s.xsmin) * nb.nb) // (s.xsmax - s.xsmin + 1) AS b
        FROM ev e JOIN ser s USING (event_type) CROSS JOIN nb
    ),
    sums AS (
        SELECT event_type, b, CAST(SUM(xs) AS BIGINT) AS sx,
               CAST(SUM(yc) AS BIGINT) AS sy, CAST(COUNT(*) AS BIGINT) AS c
        FROM bkt GROUP BY event_type, b
    ),
    mid AS (
        SELECT t.event_type, t.b, t.event_id, t.x, t.yc,
               abs( (t.xs * p.c - p.sx) * (n.sy * p.c - p.sy * n.c)
                  - (n.sx * p.c - p.sx * n.c) * (t.yc * p.c - p.sy) )
                   AS area2s
        FROM bkt t
        JOIN sums p ON p.event_type = t.event_type AND p.b = t.b - 1
        JOIN sums n ON n.event_type = t.event_type AND n.b = t.b + 1
        WHERE t.b > 0 AND t.b < t.nb - 1
    ),
    midsel AS (
        SELECT event_type, b, event_id, x, yc, area2s,
               ROW_NUMBER() OVER (PARTITION BY event_type, b
                                  ORDER BY area2s DESC, event_id ASC) AS rn
        FROM mid
    ),
    ends AS (
        SELECT event_type, b, event_id, x, yc, CAST(NULL AS BIGINT) AS area2s,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, b
                   ORDER BY CASE WHEN b = 0 THEN x ELSE -x END ASC,
                            event_id ASC) AS rn
        FROM bkt
        WHERE b = 0 OR b = nb - 1
    )
    SELECT event_type, CAST(b AS BIGINT) AS bucket, event_id,
           CAST(x AS BIGINT) AS x_us, yc AS value_cents, area2s
    FROM (SELECT * FROM midsel WHERE rn = 1
          UNION ALL SELECT * FROM ends WHERE rn = 1)
    """,
)
def timeseries_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling of each event_type series to a corpus-derived
    bucket count (GREATEST(16, n // 320) — ~64 points per bucket per
    series at any corpus size): middle buckets keep the point of maximum
    triangle area against the neighbor buckets' average points (exact
    integer cross-product, see the module comment), the end buckets keep
    the series' true first/last points (the classic LTTB endpoint
    contract).

    Scale shape: time-span bucketing is map-side (per-series min/max is a
    5-row broadcast dim, the bucket-count dial a 1-row broadcast); the
    neighbor-sums frame is (series × buckets) rows → broadcast to both
    anchor joins; argmax windows partition by (series, bucket), bounded
    at ~64 rows by the dial itself.  No global sort, no sequential chain
    — the one semantic change vs. classic LTTB (previous-SELECTED-point
    anchor, an inherently serial dependency) is documented above and is
    the standard parallelization of it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.expr("unix_micros(ts) div 1000000").alias("xs"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    nb = ev.agg(
        F.greatest(
            F.lit(_LTTB_MIN_BUCKETS).cast("long"),
            F.floor(F.count("*") / _LTTB_EVENTS_PER_BUCKET).cast("long"),
        ).alias("nb")
    )
    # Bucket on SECONDS, not µs: (xs - xsmin) * nb overflows BIGINT only
    # at nb ~ 2^63/span_s (~3e11 buckets ≈ 1e14 events at fixture span),
    # where the µs form's bound was ~3.5M buckets (~1e9 events) — inside
    # the stated 100 TB posture (the round-6 bound-at-target-scale rule).
    ser = ev.groupBy("event_type").agg(
        F.min("xs").alias("xsmin"), F.max("xs").alias("xsmax")
    )
    bkt = (
        ev.join(F.broadcast(ser), "event_type")
        .crossJoin(F.broadcast(nb))
        .select(
            "event_id",
            "event_type",
            "x",
            "xs",
            "yc",
            "nb",
            F.expr("((xs - xsmin) * nb) div (xsmax - xsmin + 1)").alias("b"),
        )
    )
    sums = bkt.groupBy("event_type", "b").agg(
        F.sum("xs").alias("sx"),
        F.sum("yc").alias("sy"),
        F.count("*").alias("c"),
    )
    p = F.broadcast(sums).alias("p")
    n = F.broadcast(sums).alias("n")
    t = bkt.alias("t")
    mid = (
        t.filter((F.col("b") > 0) & (F.col("b") < F.col("nb") - 1))
        .join(
            p,
            (F.col("p.event_type") == F.col("t.event_type"))
            & (F.col("p.b") == F.col("t.b") - 1),
        )
        .join(
            n,
            (F.col("n.event_type") == F.col("t.event_type"))
            & (F.col("n.b") == F.col("t.b") + 1),
        )
        .select(
            F.col("t.event_type").alias("event_type"),
            F.col("t.b").alias("b"),
            F.col("t.event_id").alias("event_id"),
            F.col("t.x").alias("x"),
            F.col("t.yc").alias("yc"),
            F.abs(
                (F.col("t.xs") * F.col("p.c") - F.col("p.sx"))
                * (F.col("n.sy") * F.col("p.c") - F.col("p.sy") * F.col("n.c"))
                - (F.col("n.sx") * F.col("p.c") - F.col("p.sx") * F.col("n.c"))
                * (F.col("t.yc") * F.col("p.c") - F.col("p.sy"))
            ).alias("area2s"),
        )
    )
    w_mid = Window.partitionBy("event_type", "b").orderBy(
        F.desc("area2s"), F.asc("event_id")
    )
    midsel = (
        mid.withColumn("rn", F.row_number().over(w_mid))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_ends = Window.partitionBy("event_type", "b").orderBy(
        F.when(F.col("b") == 0, F.col("x")).otherwise(-F.col("x")).asc(),
        F.asc("event_id"),
    )
    ends = (
        bkt.filter((F.col("b") == 0) | (F.col("b") == F.col("nb") - 1))
        .withColumn("rn", F.row_number().over(w_ends))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", "b", "event_id", "x", "yc",
            F.lit(None).cast("long").alias("area2s"),
        )
    )
    return midsel.unionByName(ends).select(
        "event_type",
        F.col("b").cast("long").alias("bucket"),
        "event_id",
        F.col("x").alias("x_us"),
        F.col("yc").alias("value_cents"),
        "area2s",
    )
