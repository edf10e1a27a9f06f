"""Mergeability pins for the native DataSketches surface
(`plans/sketch_native.py`) — the 100 TB claim is that per-shard partial
sketches merged across executors/days give the same answer as one pass,
mirrored from `sketch_ops`' portable-sketch mergeability tests."""

from pyspark.sql import functions as F

from hunger_games_glue_streaming_etl_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _halves(df, key):
    even = df.filter(F.pmod(F.col(key), F.lit(2)) == 0)
    odd = df.filter(F.pmod(F.col(key), F.lit(2)) == 1)
    return even, odd


def test_theta_union_of_disjoint_halves_equals_full_in_exact_mode(spark):
    """Theta sketches stay in exact mode below 2^lgK (=4096) retained
    keys, where union over DISJOINT shards is exactly the full-pass
    sketch — the associative-merge contract, assertable as equality (not
    a band) at fixture scale."""
    ev = load_table(spark, SF_DIR, "events")
    assert ev.select("user_id").distinct().count() < 4096  # exact mode
    even, odd = _halves(ev, "event_id")
    full = ev.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    a = even.agg(F.theta_sketch_agg("user_id").alias("s"))
    b = odd.agg(F.theta_sketch_agg("user_id").alias("s2"))
    merged = (
        a.crossJoin(F.broadcast(b))
        .select(F.theta_sketch_estimate(F.theta_union("s", "s2")).alias("e"))
        .collect()[0]["e"]
    )
    exact = ev.select("user_id").distinct().count()
    assert merged == full == exact


def test_kll_merged_n_is_exactly_additive(spark):
    """KLL's retained QUANTILES are merge-order-sensitive, but its n (the
    stream length) is an exact counter: merging disjoint-half sketches
    must report exactly the full row count."""
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "__cents", F.round(F.col("l_extendedprice") * 100).cast("bigint")
    )
    even, odd = _halves(li, "l_orderkey")
    a = even.agg(F.expr("kll_sketch_agg_bigint(__cents)").alias("s"))
    b = odd.agg(F.expr("kll_sketch_agg_bigint(__cents)").alias("s2"))
    merged_n = (
        a.crossJoin(F.broadcast(b))
        .select(F.expr("kll_sketch_get_n_bigint(kll_sketch_merge_bigint(s, s2))").alias("n"))
        .collect()[0]["n"]
    )
    assert merged_n == li.count()


def test_hll_union_of_halves_stays_in_band(spark):
    """HLL union over disjoint halves is not bit-identical to the
    one-pass sketch (register merge vs insertion order), but its estimate
    must stay within the same ±5% band of the exact NDV that the
    registered entry asserts."""
    li = load_table(spark, SF_DIR, "lineitem")
    even, odd = _halves(li, "l_orderkey")
    a = even.agg(F.hll_sketch_agg("l_partkey").alias("s"))
    b = odd.agg(F.hll_sketch_agg("l_partkey").alias("s2"))
    merged = (
        a.crossJoin(F.broadcast(b))
        .select(F.hll_sketch_estimate(F.hll_union("s", "s2")).alias("e"))
        .collect()[0]["e"]
    )
    exact = li.select("l_partkey").distinct().count()
    assert abs(merged - exact) <= exact * 0.05
