"""Multimodal plumbing tests: binary schema round-trip, mapInPandas feature
extraction (deterministic fake codec), frame-sampling plan, and the real
codec's explicit unavailability."""

from __future__ import annotations

import hashlib

import pytest

from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
    CodecUnavailable,
    decode_audio,
    decode_image,
    encode_pgm,
    encode_wav,
    extract_media_features,
    extract_real_media_features,
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


def test_unsupported_formats_explicitly_unavailable():
    """Unsupported/corrupt payloads raise CodecUnavailable — the real
    stdlib codecs cover exactly PGM/PPM, 8-bit PNG, and PCM WAV (a PNG
    signature with no chunks is corrupt, not decodable)."""
    with pytest.raises(CodecUnavailable):
        decode_image(b"\x89PNG\r\n\x1a\n...")
    with pytest.raises(CodecUnavailable):
        decode_image(b"\xff\xd8\xff\xe0JFIF jpeg bytes")
    with pytest.raises(CodecUnavailable):
        decode_audio(b"ID3\x04 mp3 frame data")
    with pytest.raises(CodecUnavailable):
        decode_image(b"P5\n4 4\n255\nshort")  # truncated raster
    with pytest.raises(CodecUnavailable):
        decode_audio(b"RIFF\x00\x00\x00\x00WAVEjunk")  # malformed chunks


def test_png_codec_roundtrip_all_channel_counts():
    """encode_png → decode_image for grey/grey+alpha/RGB/RGBA: the encoder
    cycles scanline filters (row % 5), so heights > 5 exercise every
    unfilter path (None/Sub/Up/Average/Paeth); sums are exact ints."""
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import encode_png

    for ch in (1, 2, 3, 4):
        pixels = bytes((i * 37 + ch * 11) % 256 for i in range(6 * 7 * ch))
        d = decode_image(encode_png(6, 7, pixels, n_channels=ch))
        assert d == {
            "width": 6, "height": 7, "maxval": 255,
            "n_channels": ch, "pixel_sum": sum(pixels),
        }


def test_pgm_codec_roundtrip_golden():
    """encode_pgm → decode_image round-trip plus a hand-built golden header
    with comments and odd whitespace."""
    pixels = bytes(range(16))
    d = decode_image(encode_pgm(4, 4, pixels))
    assert d == {
        "width": 4, "height": 4, "maxval": 255,
        "n_channels": 1, "pixel_sum": sum(range(16)),
    }
    # hand-built P6 with a comment line: 2x1 RGB
    golden = b"P6\n# planted comment\n 2 1\t255\n" + bytes([10, 20, 30, 40, 50, 60])
    d6 = decode_image(golden)
    assert (d6["width"], d6["height"], d6["n_channels"]) == (2, 1, 3)
    assert d6["pixel_sum"] == 10 + 20 + 30 + 40 + 50 + 60


def test_wav_codec_roundtrip_golden():
    samples = [0, 100, -100, 32767, -32768, 5]
    d = decode_audio(encode_wav(16000, samples))
    assert d == {
        "sample_rate": 16000, "n_channels": 1,
        "n_frames": len(samples), "sample_sum": sum(samples),
    }


def test_real_feature_extraction_dispatch(spark):
    """extract_real_media_features routes image rows through the PGM parser
    and audio rows through the WAV parser in one mapInPandas pass."""
    rows = [
        (1, "image", encode_pgm(3, 2, bytes([1, 2, 3, 4, 5, 6]))),
        (2, "audio", encode_wav(8000, [7, -3, 2])),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r.asDict() for r in extract_real_media_features(media).collect()}
    assert out[1]["width"] == 3 and out[1]["height"] == 2
    assert out[1]["value_sum"] == 21 and out[1]["sample_rate"] is None
    assert out[2]["sample_rate"] == 8000 and out[2]["n_frames"] == 3
    assert out[2]["value_sum"] == 6 and out[2]["width"] is None


def test_jpeg_flat_even_values_roundtrip_exactly():
    """Flat blocks are DC-only; even pixel values survive the 16-step DC
    quantization exactly (verified over all 256 values during design) —
    the property the contract entry's arithmetic oracle relies on."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for v in (0, 2, 64, 128, 200, 254):
        d = decode_jpeg(encode_jpeg(16, 8, bytes([v]) * 128))
        assert (d["width"], d["height"], d["n_channels"]) == (16, 8, 1)
        assert d["pixel_sum"] == v * 128
    # odd values quantize to the adjacent even level — lossy but bounded
    d = decode_jpeg(encode_jpeg(8, 8, bytes([101]) * 64))
    assert abs(d["pixel_sum"] - 101 * 64) <= 64


def test_jpeg_textured_image_close_and_deterministic():
    """Non-flat content: the round trip is lossy but tight (standard
    tables ≈ quality 50), byte-identical across encodes, and dimensions
    that are not block-aligned crop the padding out of pixel_sum."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 21, 13  # deliberately not multiples of 8
    pixels = bytes((40 + 3 * x + 5 * y) % 200 for y in range(h) for x in range(w))
    enc = encode_jpeg(w, h, pixels)
    assert enc == encode_jpeg(w, h, pixels)
    d = decode_jpeg(enc)
    assert (d["width"], d["height"]) == (w, h)
    orig = sum(pixels)
    assert abs(d["pixel_sum"] - orig) <= 4 * w * h  # ≤4 avg error/pixel


def test_jpeg_via_decode_image_dispatch():
    """decode_image routes on the SOI marker; non-baseline streams raise
    CodecUnavailable honestly."""
    import pytest as _pytest

    from hunger_games_glue_streaming_etl_spark.operators.jpeg import encode_jpeg
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        CodecUnavailable,
        decode_image,
    )

    enc = encode_jpeg(8, 8, bytes([100]) * 64)
    assert decode_image(enc)["pixel_sum"] == 100 * 64
    # progressive marker (SOF2) instead of SOF0 → honest refusal
    broken = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(CodecUnavailable):
        decode_image(broken)


def test_adpcm_constant_roundtrips_exactly_and_tracks_slow_signals():
    """IMA ADPCM: constant amplitude is value-exact (header sample + zero
    deltas); a slow ramp tracks within the adaptive step's lag; encoding
    is deterministic and ~4:1 smaller than 16-bit PCM."""
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        decode_adpcm_wav,
        encode_adpcm_wav,
        encode_wav,
    )

    for v in (-100, 0, 77, 32000):
        d = decode_adpcm_wav(encode_adpcm_wav(8000, [v] * 64))
        assert d["sample_sum"] == v * 64 and d["n_frames"] == 64

    ramp = [i * 3 for i in range(400)]
    enc = encode_adpcm_wav(8000, ramp)
    assert enc == encode_adpcm_wav(8000, ramp)
    d = decode_adpcm_wav(enc)
    assert abs(d["sample_sum"] - sum(ramp)) <= 8 * len(ramp)
    assert len(enc) < len(encode_wav(8000, ramp)) // 2


def test_adpcm_via_decode_audio_dispatch():
    """decode_audio routes on the WAV fmt tag: 0x01 PCM -> stdlib wave,
    0x11 -> the ADPCM decoder; anything else refuses honestly."""
    import pytest as _pytest

    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        CodecUnavailable,
        decode_audio,
        encode_adpcm_wav,
        encode_wav,
    )

    assert decode_audio(encode_adpcm_wav(8000, [50] * 10))["sample_sum"] == 500
    assert decode_audio(encode_wav(8000, [50] * 10))["sample_sum"] == 500
    with _pytest.raises(CodecUnavailable):
        decode_audio(b"ID3\x03mp3-ish-not-a-wav" * 3)


def test_jpeg_color_flat_gray_roundtrips_exactly():
    """Color 4:4:4 JPEG: a flat R=G=B=even image converts to exactly
    (Y=v, Cb=Cr=128) in the 2^16 fixed-point converter (luma row sums to
    65536, chroma rows to 0), is DC-only in every block, and round-trips
    value-exactly in all three channels — the arithmetic the oracle row
    in multimodal_real_codec_features relies on."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    for v in (0, 2, 104, 128, 200, 254):
        d = decode_jpeg(encode_jpeg_color(16, 8, bytes([v, v, v]) * 128))
        assert d["n_channels"] == 3
        assert d["pixel_sum"] == 3 * v * 128, v
    # non-multiple-of-8 dims (edge replication path)
    d = decode_jpeg(encode_jpeg_color(11, 5, bytes([104, 104, 104]) * 55))
    assert (d["width"], d["height"]) == (11, 5)
    assert d["pixel_sum"] == 3 * 104 * 55


def test_jpeg_color_textured_close_and_deterministic():
    """Textured color image: encode is byte-deterministic, decode stays
    within ~1.5% of the raw RGB sum (chroma quantization is the coarse
    Annex K.2 table)."""
    import random

    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rnd = random.Random(7)
    w, h = 24, 17
    pixels = bytes(rnd.randrange(256) for _ in range(3 * w * h))
    enc = encode_jpeg_color(w, h, pixels)
    assert enc == encode_jpeg_color(w, h, pixels)
    d = decode_jpeg(enc)
    assert (d["width"], d["height"], d["n_channels"]) == (w, h, 3)
    raw = sum(pixels)
    assert abs(d["pixel_sum"] - raw) <= raw * 0.015
    # dispatches through decode_image too
    assert decode_image(enc)["pixel_sum"] == d["pixel_sum"]


def test_jpeg_malformed_segments_raise_codec_unavailable():
    """The module error contract (ADVICE r4): truncated/short segment
    bodies surface as CodecUnavailable, never bare struct.error or
    IndexError."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(8, 8, bytes([100]) * 64)
    # truncate at every prefix of the header region: all must soft-fail
    for cut in range(2, 180, 7):
        with pytest.raises(CodecUnavailable):
            decode_jpeg(good[:cut] + b"\xff\xd9")
    # short DQT body (claims a table but supplies 3 bytes)
    bad_dqt = b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02\xff\xd9"
    with pytest.raises(CodecUnavailable):
        decode_jpeg(bad_dqt)
    # short SOF0 body
    bad_sof = b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9"
    with pytest.raises(CodecUnavailable):
        decode_jpeg(bad_sof)
    # short DHT body
    bad_dht = b"\xff\xd8\xff\xc4\x00\x06\x00\x01\x02\x03\xff\xd9"
    with pytest.raises(CodecUnavailable):
        decode_jpeg(bad_dht)


def test_jpeg_fill_bytes_and_standalone_markers_tolerated():
    """T.81 B.1.1.2: 0xFF fill bytes before a marker and standalone
    markers (TEM 0x01) between segments must not derail the scan; a
    multi-table DQT body must load both tables."""
    from hunger_games_glue_streaming_etl_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_color,
    )

    good = encode_jpeg(8, 8, bytes([100]) * 64)
    # inject a fill byte + TEM after SOI
    padded = good[:2] + b"\xff\x01" + good[2:]
    assert decode_jpeg(padded)["pixel_sum"] == 6400
    fill = good[:2] + b"\xff" + good[2:]  # extra 0xFF before APP0 marker
    assert decode_jpeg(fill)["pixel_sum"] == 6400
    # the color encoder emits a two-table DQT segment — decoding it at
    # all proves multi-table DQT parsing works
    d = decode_jpeg(encode_jpeg_color(8, 8, bytes([104, 104, 104]) * 64))
    assert d["pixel_sum"] == 3 * 104 * 64


def test_adpcm_no_fact_chunk_uses_samples_per_block():
    """ADVICE r4: with the fact chunk stripped, the decoder must bound
    sample count by fmt's samples-per-block so an odd-sample stream's pad
    nibble never decodes as a real sample; a data chunk shorter than the
    block header refuses honestly."""
    import struct

    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        decode_adpcm_wav,
        encode_adpcm_wav,
    )

    samples = [40] * 11  # odd count -> one pad nibble in the block
    enc = encode_adpcm_wav(8000, samples)
    ref = decode_adpcm_wav(enc)
    assert ref["n_frames"] == 11 and ref["sample_sum"] == 440

    # strip the fact chunk (12-byte RIFF header, then chunks)
    pos, out = 12, enc[:12]
    while pos + 8 <= len(enc):
        cid = enc[pos : pos + 4]
        (ln,) = struct.unpack("<I", enc[pos + 4 : pos + 8])
        chunk = enc[pos : pos + 8 + ln + (ln & 1)]
        pos += len(chunk)
        if cid != b"fact":
            out += chunk
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    d = decode_adpcm_wav(out)
    assert d["n_frames"] == 11 and d["sample_sum"] == 440

    # truncated data chunk -> CodecUnavailable, not struct.error
    hdr = enc[: enc.find(b"data") + 8]
    short = hdr[:-4] + struct.pack("<I", 2) + b"\x28\x00"
    with pytest.raises(CodecUnavailable):
        decode_adpcm_wav(short[: short.find(b"data") + 8 + 2])


def test_adpcm_multi_block_decodes_every_block():
    """ADVICE r5: the decoder must split the data chunk on nBlockAlign and
    decode EVERY block with its own (predictor, index) header — and with no
    fact chunk, the samples-per-block bound must scale by block count
    instead of capping the whole stream at one block's worth."""
    import struct

    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        decode_adpcm_wav,
        encode_adpcm_wav,
    )

    # two equal-length single-block encodings -> hand-built 2-block stream
    b1 = encode_adpcm_wav(8000, [40] * 11)
    b2 = encode_adpcm_wav(8000, [-25] * 11)

    def data_chunk(wav):
        i = wav.find(b"data")
        (ln,) = struct.unpack("<I", wav[i + 4 : i + 8])
        return wav[i + 8 : i + 8 + ln]

    d1, d2 = data_chunk(b1), data_chunk(b2)
    assert len(d1) == len(d2)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, 8000, 8000 * len(d1) // 11, len(d1), 4, 2, 11
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(d1) + len(d2)) + d1 + d2
    )  # NO fact chunk: bound must come from spb * n_blocks
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    d = decode_adpcm_wav(wav)
    assert d["n_frames"] == 22
    assert d["sample_sum"] == 11 * 40 + 11 * (-25)


def test_y4m_round_trip_full_and_strided():
    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    frames = []
    for f in range(5):
        y = bytes((f * 3 + i) % 256 for i in range(12))
        u = bytes((f + i * 2) % 256 for i in range(12))
        v = bytes((f * 7 + i * 5) % 256 for i in range(12))
        frames.append((y, u, v))
    wav = encode_y4m(4, 3, frames, fps_num=30, fps_den=1)

    full = decode_y4m(wav)
    assert (full["width"], full["height"]) == (4, 3)
    assert (full["fps_num"], full["fps_den"]) == (30, 1)
    assert full["n_frames"] == 5 and full["n_sampled"] == 5
    assert full["luma_sum"] == sum(sum(y) for y, _, _ in frames)
    assert full["chroma_sum"] == sum(sum(u) + sum(v) for _, u, v in frames)

    s2 = decode_y4m(wav, sample_stride=2)  # frames 0, 2, 4
    assert s2["n_frames"] == 5 and s2["n_sampled"] == 3
    assert s2["luma_sum"] == sum(sum(frames[f][0]) for f in (0, 2, 4))
    s5 = decode_y4m(wav, sample_stride=5)  # frame 0 only
    assert s5["n_sampled"] == 1 and s5["luma_sum"] == sum(frames[0][0])


def test_y4m_rejects_unsupported_layouts():
    import pytest

    from hunger_games_glue_streaming_etl_spark.operators.multimodal import (
        CodecUnavailable,
        decode_y4m,
        encode_y4m,
    )

    wav = encode_y4m(2, 2, [(bytes(4), bytes(4), bytes(4))])
    with pytest.raises(CodecUnavailable):
        decode_y4m(wav.replace(b"C444", b"C420jpeg"))
    # no C tag -> Y4M defaults to 4:2:0, which this codec honestly refuses
    with pytest.raises(CodecUnavailable):
        decode_y4m(wav.replace(b" C444", b""))
    with pytest.raises(CodecUnavailable):
        decode_y4m(wav[:-3])  # truncated frame payload
    with pytest.raises(CodecUnavailable):
        decode_y4m(b"RIFF" + wav)
