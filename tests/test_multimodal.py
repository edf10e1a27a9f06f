"""Multimodal plumbing tests: binary schema round-trip, mapInPandas feature
extraction (deterministic fake codec), frame-sampling plan, and the real
codec's explicit unavailability."""

from __future__ import annotations

import hashlib

import pytest

from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
    CodecUnavailable,
    decode_image,
    extract_media_features,
    fake_decode_features,
    frame_sample_plan,
)
from hunger_games_glue_streaming_etl_spark.schemas import MEDIA_SCHEMA


def _media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake image bytes \x00\x01\x02", "image/png", 64, 64, None),
        (2, "audio", b"RIFF fake wav payload", "audio/wav", None, None, 2_000),
        (3, "video", b"\x00\x00\x01\xba fake mpeg", "video/mpeg", 320, 240, 3_500),
        (4, "image", None, "image/png", 0, 0, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_deterministic(spark):
    media = _media_df(spark)
    out = {r["media_id"]: r.asDict() for r in extract_media_features(media).collect()}
    assert set(out) == {1, 2, 3, 4}
    payload = b"\x89PNG fake image bytes \x00\x01\x02"
    assert out[1]["n_bytes"] == len(payload)
    assert out[1]["payload_sha256"] == hashlib.sha256(payload).hexdigest()
    ent, f0, f1 = fake_decode_features(payload)
    assert out[1]["entropy_estimate"] == ent
    assert (out[1]["feature_v0"], out[1]["feature_v1"]) == (f0, f1)
    # null payload handled
    assert out[4]["n_bytes"] == 0
    # payload column projected away
    assert "payload" not in out[1]


def test_frame_sample_plan(spark):
    media = _media_df(spark)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert set(by_media) == {3}  # only the video row
    assert sorted(by_media[3]) == [0, 1000, 2000]  # 3.5s at 1fps


def test_real_codec_explicitly_unavailable():
    with pytest.raises(CodecUnavailable):
        decode_image(b"anything")
