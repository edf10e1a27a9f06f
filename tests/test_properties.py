"""Property-based tests (hypothesis): the custom operators against
independent reference implementations (pandas) on randomized inputs.

Settings note: each example spins Spark jobs, so example counts are small —
the value is input diversity (ties, empty groups, all-one-key, unordered
input), not volume.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hunger_games_glue_streaming_etl_spark.operators.relational import latest_per_key
from hunger_games_glue_streaming_etl_spark.operators.temporal import asof_join

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key (few keys -> collisions)
        st.integers(min_value=0, max_value=20),   # ts (small range -> ties)
        st.integers(min_value=0, max_value=10_000),  # uid (tiebreak, may repeat)
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS)
def test_latest_per_key_matches_pandas(spark_prop, rows):
    if not rows:
        return
    df = spark_prop.createDataFrame(rows, "k int, ts int, uid int")
    got = {
        r["k"]: (r["ts"], r["uid"])
        for r in latest_per_key(df, "k", ["ts", "uid"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "uid"])
    expected = {
        k: (int(g.ts.iloc[0]), int(g.uid.iloc[0]))
        for k, g in pdf.sort_values(
            ["ts", "uid"], ascending=False
        ).groupby("k", sort=False)
    }
    assert got == expected


LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=15
)
RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 100)),
    min_size=0,
    max_size=15,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=LEFT, right=RIGHT)
def test_asof_join_matches_merge_asof(spark_prop, left, right):
    left = [(k, t, i) for i, (k, t) in enumerate(left)]
    ldf = spark_prop.createDataFrame(left, "k int, t int, lid int")
    rdf = (
        spark_prop.createDataFrame(right, "k int, t int, price int")
        if right
        else spark_prop.createDataFrame([], "k int, t int, price int")
    )
    got = {
        r["lid"]: r["price_asof"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t",
            value_cols=["price"], tiebreak="price",
        ).collect()
    }
    # reference: pandas merge_asof (backward = at-or-before), with max-price
    # tiebreak inside equal (k, t) groups to match the operator's contract
    lp = pd.DataFrame(left, columns=["k", "t", "lid"]).sort_values(["t", "lid"])
    rp = pd.DataFrame(right, columns=["k", "t", "price"])
    if len(rp):
        rp = rp.sort_values(["t", "price"]).groupby(["k", "t"], as_index=False).last()
        rp = rp.sort_values("t")
        merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    else:
        merged = lp.assign(price=None)
    expected = {
        int(r.lid): (None if pd.isna(r.price) else int(r.price))
        for r in merged.itertuples()
    }
    assert got == expected


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark


SCD_UPDATES = st.lists(
    st.tuples(
        st.integers(0, 2),       # key (few keys -> multi-update chains)
        st.integers(1, 8),       # effective day (ties possible)
        st.sampled_from("ABC"),  # tracked value (small alphabet -> no-ops)
    ),
    min_size=0,
    max_size=10,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(updates=SCD_UPDATES)
def test_scd2_chain_invariants(spark_prop, updates):
    """SCD2 under arbitrary multi-update batches must keep the dimension
    consistent: exactly one open version per key, validity intervals tile
    without overlap (a zero-width closed version is legitimate when an
    update supersedes at the open version's own instant), consecutive
    versions never repeat a value, and the open version equals the key's
    LAST effective update (or the prior open value if every update was a
    no-op)."""
    from datetime import datetime

    from hunger_games_glue_streaming_etl_spark.operators.scd import scd2_apply

    def ts(day):
        return datetime(2024, 1, day)

    current = spark_prop.createDataFrame(
        [(k, "A", ts(1), None, True) for k in range(3)],
        "k int, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    upd_rows = [(k, v, ts(d)) for k, d, v in updates]
    # keep effective times unique per key (the operator documents ties as
    # value-ordered; the pandas reference below would need the same rule)
    seen = set()
    upd_rows = [
        r for r in upd_rows if (r[0], r[2]) not in seen and not seen.add((r[0], r[2]))
    ]
    updates_df = (
        spark_prop.createDataFrame(upd_rows, "k int, addr string, effective_ts timestamp")
        if upd_rows
        else spark_prop.createDataFrame([], "k int, addr string, effective_ts timestamp")
    )
    out = scd2_apply(current, updates_df, "k", ["addr"]).collect()

    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k in range(3):
        # deterministic order even when an update lands exactly on the
        # open version's valid_from (zero-width closed row ties on
        # valid_from with the new open row — closed sorts first)
        versions = sorted(
            by_key[k],
            key=lambda r: (r["valid_from"], r["valid_to"] is None, r["valid_to"] or ts(1)),
        )
        opens = [r for r in versions if r["is_current"]]
        assert len(opens) == 1  # exactly one open version
        assert opens[0]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]  # tiling, no overlap
            assert a["addr"] != b["addr"]  # no-op versions collapsed
        # the open version reflects the key's last effective state
        chain = sorted((r for r in upd_rows if r[0] == k), key=lambda r: r[2])
        expected_final = chain[-1][1] if chain else "A"
        assert opens[0]["addr"] == expected_final


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_roundtrip_properties(w, h, seed):
    """Pure-Python property (no Spark): any image round-trips through the
    baseline JPEG codec with correct dimensions, deterministic bytes, and
    bounded reconstruction error — including non-block-aligned sizes and
    adversarial noise (worst case for DCT quantization)."""
    import random

    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(seed)
    pixels = bytes(rng.randrange(256) for _ in range(w * h))
    enc = encode_jpeg(w, h, pixels)
    assert enc == encode_jpeg(w, h, pixels)
    d = decode_jpeg(enc)
    assert (d["width"], d["height"], d["n_channels"]) == (w, h, 1)
    assert 0 <= d["pixel_sum"] <= 255 * w * h
    # noise quantizes hard per-pixel, but errors are zero-mean — the SUM
    # stays within a generous per-pixel budget
    assert abs(d["pixel_sum"] - sum(pixels)) <= 48 * w * h


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=32),
    v=st.integers(min_value=0, max_value=127),
)
def test_jpeg_flat_even_exact_property(w, h, v):
    """Every even flat value round-trips EXACTLY at every image size —
    the invariant the contract entry's arithmetic oracle is built on."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    val = v * 2
    d = decode_jpeg(encode_jpeg(w, h, bytes([val]) * (w * h)))
    assert d["pixel_sum"] == val * w * h


# --- cap-guard subset invariants (round 11): a candidate cap may only
# LOSE pairs, never gain one, and every surviving pair's value is
# bit-identical to the uncapped form (df_cap recomputes over ALL
# shingles; bucket_cap never touches verification). ---

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_CORPUS = st.lists(
    st.lists(st.integers(0, len(_VOCAB) - 1), min_size=3, max_size=8),
    min_size=2,
    max_size=10,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_CORPUS, cap=st.integers(min_value=1, max_value=6))
def test_ngram_df_cap_only_loses_pairs_never_changes_values(
    spark_prop, corpus, cap
):
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = [(i, " ".join(_VOCAB[w] for w in words)) for i, words in enumerate(corpus)]
    df = spark_prop.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.5, df_cap=cap).collect()
    }
    assert set(capped) <= set(exact)
    assert all(capped[k] == exact[k] for k in capped)  # bitwise, no tolerance


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_CORPUS, cap=st.integers(min_value=1, max_value=6))
def test_lsh_bucket_cap_only_loses_pairs_never_changes_values(
    spark_prop, corpus, cap
):
    from hunger_games_glue_streaming_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = [(i, " ".join(_VOCAB[w] for w in words)) for i, words in enumerate(corpus)]
    df = spark_prop.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=0.5, bucket_cap=cap
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    assert all(capped[k] == uncapped[k] for k in capped)
