"""Unit tests for as-of and range joins (operators/temporal.py), plus
BLAS-vs-exact pair equality for the embedding scale path."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.operators.dedup import embedding_near_dup_pairs
from hunger_games_glue_streaming_etl_spark.operators.similarity import embedding_pairs_blas
from hunger_games_glue_streaming_etl_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
)
from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

from conftest import SF_DIR


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),
        ],
        ["lid", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 100),
            ("u1", _ts("2024-01-01T11:00:00"), 200),
            ("u1", _ts("2024-01-01T12:00:00"), 300),  # exactly at left ts 2 -> visible
            ("u2", _ts("2024-01-01T10:00:00"), 999),  # after u2's event -> invisible
        ],
        ["user", "ts", "price"],
    )
    out = {
        r["lid"]: r["price_asof"]
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="ts",
            value_cols=["price"], tiebreak="price",
        ).collect()
    }
    assert out == {1: 100, 2: 300, 3: None}


def test_asof_join_null_in_winning_row_not_backfilled(spark):
    """A null value in the winning right row must surface as null — not be
    silently replaced by a stale value from an earlier right row (the
    per-column-carry bug: all value columns must come from ONE right row)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T12:00:00"))], ["lid", "user", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00"), 100, "first"),
            ("u1", _ts("2024-01-01T11:00:00"), None, "second"),  # winner, price null
        ],
        "user string, ts timestamp, price int, tag string",
    )
    row = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        value_cols=["price", "tag"], tiebreak="tag",
    ).collect()[0]
    assert row["tag_asof"] == "second"
    assert row["price_asof"] is None  # NOT 100


def test_range_join_golden(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 25.0), (3, 99.9)], ["pid", "v"])
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 20.0, 30.0), (30, 90.0, 100.0)], ["iid", "lo", "hi"]
    )
    out = {
        r["pid"]: r["iid"]
        for r in range_join_buckets(points, intervals, "v", "lo", "hi", 10.0).collect()
    }
    assert out == {1: 10, 2: 20, 3: 30}


def test_blas_pairs_equal_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb).collect()
    }
    blas = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_pairs_blas(emb).collect()
    }
    assert set(exact) == set(blas)
    mismatched = [k for k in exact if abs(exact[k] - blas[k]) > 1e-6]
    assert not mismatched


def test_gap_fill_semantics_planted(spark):
    """timeseries_gap_fill_hourly contract on a hand-built series: silent
    hours materialize with n_events=0/is_gap=true and carry the LAST
    observed fixed-point value forward; observed hours carry their own."""
    from hunger_games_glue_streaming_etl_spark.plans.event_time import (
        timeseries_gap_fill_hourly,
    )

    # build a miniature events table matching the entry's schema; user 3
    # passes the entry's 1-in-20 subset filter (3 % 20 == 3)
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, datetime(2024, 1, 1, 0, 10), 3, "view", 1.0),
        (2, datetime(2024, 1, 1, 0, 40), 3, "view", 2.0),
        # hours 1-2 silent
        (3, datetime(2024, 1, 1, 3, 5), 3, "click", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("props", F.lit("{}"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["hour_idx"] - 473352: (r["n_events"], r["value_fp"], r["is_gap"])
            for r in timeseries_gap_fill_hourly(spark, d).collect()
        }
    # hour 0: two events, 1000+2000 fp; hours 1-2 gap carrying 3000;
    # hour 3 observed 10000
    assert out == {
        0: (2, 3000, False),
        1: (0, 3000, True),
        2: (0, 3000, True),
        3: (1, 10000, False),
    }


def test_time_range_frame_includes_peers_and_trailing_hour(spark):
    """window_time_range_frame: RANGE frame spans the trailing hour of
    event time (not a row count) and includes ORDER-BY peers on both
    sides of a tie."""
    from hunger_games_glue_streaming_etl_spark.plans.windows import (
        window_time_range_frame,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 5, "a", 1.0),
        (2, datetime(2024, 1, 1, 0, 30), 5, "a", 2.0),
        (3, datetime(2024, 1, 1, 0, 30), 5, "a", 4.0),   # tie with #2
        (4, datetime(2024, 1, 1, 2, 0), 5, "a", 8.0),    # out of range
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("props", F.lit("{}"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["event_id"]: (r["rolling_1h_value_fp"], r["rolling_1h_events"])
            for r in window_time_range_frame(spark, d).collect()
        }
    # events 2 AND 3 are peers: each sees 1+2+4; event 4 sees only itself
    assert out == {
        1: (1000, 1),
        2: (7000, 3),
        3: (7000, 3),
        4: (8000, 1),
    }


def test_lttb_downsample_python_replay(spark):
    """Independent python replay of the parallel-LTTB contract at sf0.01:
    one selected point per non-empty bucket per series, end buckets carry
    the series' true first/last points, and every middle selection
    maximizes the exact integer cross-product area against the neighbor
    buckets' average anchors (event_id tiebreak)."""
    from collections import defaultdict

    import duckdb

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    rows = E.queries()["timeseries_downsample_lttb"](spark, sf).collect()
    got = {(r.event_type, r.bucket): (r.event_id, r.area2s) for r in rows}
    assert len(got) == len(rows)  # one row per (series, bucket)

    con = duckdb.connect()
    pts = con.execute(f"""
        SELECT event_id, event_type, epoch_us(ts), epoch_us(ts) // 1000000,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM '{sf}/events.parquet'
    """).fetchall()
    n_total = len(pts)
    nb = max(16, n_total // 320)
    series = defaultdict(list)
    for eid, et, x, xs, yc in pts:
        series[et].append((eid, x, xs, yc))
    for et, p in series.items():
        xmin = min(r[1] for r in p)
        xmax = max(r[1] for r in p)
        buckets = defaultdict(list)
        for eid, x, xs, yc in p:
            buckets[((x - xmin) * nb) // (xmax - xmin + 1)].append((eid, x, xs, yc))
        sums = {
            b: (sum(r[2] for r in v), sum(r[3] for r in v), len(v))
            for b, v in buckets.items()
        }
        for b, v in buckets.items():
            if b == 0:
                exp = min(v, key=lambda r: (r[1], r[0]))[0]
            elif b == nb - 1:
                exp = min(v, key=lambda r: (-r[1], r[0]))[0]
            elif (b - 1) in sums and (b + 1) in sums:
                sxp, syp, cp = sums[b - 1]
                sxn, syn, cn = sums[b + 1]
                exp = max(
                    v,
                    key=lambda r: (
                        abs(
                            (r[2] * cp - sxp) * (syn * cp - syp * cn)
                            - (sxn * cp - sxp * cn) * (r[3] * cp - syp)
                        ),
                        -r[0],
                    ),
                )[0]
            else:
                continue  # middle bucket missing a neighbor emits nothing
            assert got[(et, b)][0] == exp, (et, b)
    assert len(rows) >= 5 * 16  # every series emits >= nb buckets' worth - gaps


def test_mad_outlier_flags_python_replay(spark):
    """The Hampel-filter contract at sf0.01: flagged set == python replay
    with exact lower medians (sorted[ceil(n/2)-1]) per event_type."""
    from collections import defaultdict

    import duckdb

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.01"
    rows = E.queries()["dq_outlier_mad_flags"](spark, sf).collect()
    got = {(r.event_id) for r in rows}
    assert rows
    con = duckdb.connect()
    pts = con.execute(f"""
        SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT)
        FROM '{sf}/events.parquet'
    """).fetchall()
    series = defaultdict(list)
    for eid, et, v in pts:
        series[et].append((eid, v))
    exp = set()
    for et, p in series.items():
        vs = sorted(v for _, v in p)
        m = vs[(len(vs) + 1) // 2 - 1]
        ds = sorted(abs(v - m) for _, v in p)
        mad = ds[(len(ds) + 1) // 2 - 1]
        exp |= {eid for eid, v in p if abs(v - m) > 3 * mad}
    assert got == exp
