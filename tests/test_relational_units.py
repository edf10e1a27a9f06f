"""Unit tests for operator helpers and approximate aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.operators.relational import (
    latest_per_key,
    top_k_per_group,
)
from hunger_games_glue_streaming_etl_spark.plans.aggregates import agg_approx_distinct
from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

from conftest import SF_DIR


def test_latest_per_key_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 5), ("b", 1, 1)],
        ["k", "ts", "uid"],
    )
    out = {r["k"]: (r["ts"], r["uid"]) for r in latest_per_key(df, "k", ["ts", "uid"]).collect()}
    assert out == {"a": (2, 5), "b": (1, 1)}  # max ts wins; uid breaks ts ties


def test_top_k_per_group_exact_k(spark):
    df = spark.createDataFrame(
        [("g", i, float(i % 3)) for i in range(10)], ["grp", "id", "v"]
    )
    rows = top_k_per_group(df, "grp", ["v", "id"], k=4).collect()
    assert len(rows) == 4
    assert {r["id"] for r in rows} == {8, 5, 2, 7}  # v desc then id desc


def test_approx_count_distinct_error_bound(spark):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in agg_approx_distinct(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, approx[k], n)


def test_dq_audit_finds_exactly_planted_orphans(spark):
    """The audit reports exactly the planted violation counts per FK edge
    (5/4/3) — clean fixture rows contribute zero orphans."""
    from hunger_games_glue_streaming_etl_spark.plans.dq_ops import (
        dq_referential_orphans,
    )

    rows = {
        r["relationship"]: r["n_orphans"]
        for r in dq_referential_orphans(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows == {
        "lineitem.l_orderkey -> orders": 5,
        "orders.o_custkey -> customer": 4,
        "customer.c_nationkey -> nation": 3,
    }


def test_observe_metrics_piggyback_on_action(spark):
    """The Observation API collects named aggregates as a side effect of
    an existing action — the zero-extra-pass way to get row counts and
    quality metrics out of a production write (vs a separate count()
    that re-executes the plan)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.sources.batch import load_table
    from conftest import SF_DIR

    obs = Observation("ingest_metrics")
    li = load_table(spark, SF_DIR, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_quantity") > 49).alias("n_hot"),
        F.max("l_orderkey").alias("max_key"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()  # the real action
    got = obs.get
    assert got["n_rows"] == li.count() and n > 0
    assert got["max_key"] == li.agg(F.max("l_orderkey")).first()[0]
    assert 0 < got["n_hot"] < got["n_rows"]


def test_sketch_cms_and_bloom_invariants(spark):
    """Portable-sketch structural properties the hash gate can't state:
    (a) CMS never underestimates (one-sided error) and estimates the true
    heavy hitters closely at this width; (b) the Bloom filter has ZERO
    false negatives (every actual member probes maybe_present) while
    absent keys exist and at least mostly probe negative — i.e. the probe
    side is non-vacuous in both classes."""
    from hunger_games_glue_streaming_etl_spark.plans.sketch_ops import (
        sketch_bloom_membership,
        sketch_cms_heavy_hitters,
    )

    cms = sketch_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(cms) == 20
    assert all(r.overcount >= 0 for r in cms)
    assert all(r.n_cms >= r.n_exact for r in cms)

    rows = sketch_bloom_membership(spark, SF_DIR).collect()
    members = [r for r in rows if r.actually_present]
    absent = [r for r in rows if not r.actually_present]
    assert members and absent
    assert all(r.maybe_present for r in members)  # no false negatives
    # the filter must actually reject things (not degenerate all-true)
    assert sum(not r.maybe_present for r in absent) > len(absent) // 2


def test_cms_counter_grid_merges_associatively(spark):
    """The property that makes the CMS usable at 100 TB: the counter grid
    built over the whole corpus equals the CELL-WISE SUM of grids built
    over any disjoint split (here: docs split by doc_id parity) — i.e.
    the sketch state is an associative merge, so map-side partials /
    per-day sketches / per-stream sketches compose without re-reading
    raw data.  Exercised on the real token distribution, not toys."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.functions.text import tokens
    from hunger_games_glue_streaming_etl_spark.plans.sketch_ops import cms_counters

    docs = load_table(spark, SF_DIR, "documents")

    def grid(df):
        ex = (
            df.select(F.explode(tokens("text")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("n_exact"))
        )
        return {
            (r.depth, r.cell): r.c for r in cms_counters(ex).collect()
        }

    whole = grid(docs)
    even = grid(docs.filter(F.col("doc_id") % 2 == 0))
    odd = grid(docs.filter(F.col("doc_id") % 2 == 1))
    merged = dict(even)
    for k, v in odd.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole and len(whole) > 100


def test_hll_registers_merge_by_elementwise_max(spark):
    """HLL's merge law, the property that makes it THE distributed NDV
    sketch: registers over the whole corpus equal the element-wise MAX of
    registers over any disjoint split.  Also pins the estimate's quality
    at sf0.01 (±15% band, the registered entry's gate) and that the
    register vector is dense (all 256 buckets materialized, empties as
    0)."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.plans.sketch_ops import (
        hll_registers,
        sketch_hll_estimate,
    )

    li = load_table(spark, SF_DIR, "lineitem")

    def regs(df):
        return {
            r.bucket: r.register for r in hll_registers(df, "l_orderkey").collect()
        }

    whole = regs(li)
    lo = regs(li.filter(F.col("l_orderkey") % 2 == 0))
    hi = regs(li.filter(F.col("l_orderkey") % 2 == 1))
    assert len(whole) == 256
    assert whole == {b: max(lo[b], hi[b]) for b in whole}

    row = sketch_hll_estimate(spark, SF_DIR).head()
    assert row.rel_ok and abs(row.hll_est / row.n_exact - 1) <= 0.15


def test_bloom_packed_words_equal_position_set(spark):
    """The packed-bitmap Bloom build (bit_or over 64-bit words — what a
    100 TB deployment ships) encodes EXACTLY the position set the
    registry's SQL-portable form uses: unpacking every set bit of every
    word reproduces the DISTINCT position set bit-for-bit, and the word
    count stays ≤ M/64 regardless of build-side size."""
    from pyspark.sql import functions as F

    from hunger_games_glue_streaming_etl_spark.plans.sketch_ops import (
        _BLOOM_BITS,
        _BLOOM_K,
        bloom_packed_words,
        portable_hash64,
    )

    members = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
        .distinct()
    )
    pos_set = {
        r.pos
        for r in members.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            portable_hash64(F.col("k"), seed=i),
                            F.lit(_BLOOM_BITS),
                        )
                        for i in range(_BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    }
    words = {r.word_idx: r.word for r in bloom_packed_words(members).collect()}
    assert len(words) <= _BLOOM_BITS // 64
    unpacked = {
        w * 64 + b for w, word in words.items() for b in range(64) if word >> b & 1
    }
    assert unpacked == pos_set and len(pos_set) > 100


def test_table_fingerprint_merges_over_disjoint_shards(spark):
    """dq_table_fingerprint's 100 TB claim: the (n_rows, fp_sum, fp_xor)
    triple of a whole table equals the component-wise merge (+, +, ^) of
    the triples of any disjoint shard split — and the residue-summed lane
    stays within BIGINT for arbitrarily many rows (max residue < 2^20)."""
    from hunger_games_glue_streaming_etl_spark.functions.text import portable_hash64
    from hunger_games_glue_streaming_etl_spark.plans.dq_ops import _FP_PRIME

    df = spark.range(5000).selectExpr("CAST(id AS STRING) AS fp_src")
    h = portable_hash64(F.col("fp_src"))
    def triple(frame):
        r = frame.select(h.alias("h")).agg(
            F.count("*").alias("n"),
            F.sum(F.col("h") % _FP_PRIME).alias("s"),
            F.expr("bit_xor(h)").alias("x"),
        ).collect()[0]
        return r.n, r.s, r.x

    whole = triple(df)
    a = triple(df.filter("CAST(fp_src AS BIGINT) % 3 = 0"))
    b = triple(df.filter("CAST(fp_src AS BIGINT) % 3 != 0"))
    assert whole == (a[0] + b[0], a[1] + b[1], a[2] ^ b[2])
    # residue lane bound: every term < _FP_PRIME < 2^20
    assert whole[1] < _FP_PRIME * whole[0]
