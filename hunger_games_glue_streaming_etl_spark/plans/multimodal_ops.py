"""Multimodal plumbing in the driver contract: binary payload columns
processed through the Arrow-batched ``mapInPandas`` feature extractor.

The fixture tables carry no binary column, so the query derives one (UTF-8
bytes of ``documents.text``) — the *plumbing* under test is exactly the
production shape: binary column in, partition-parallel pandas batches,
fixed-width features out, payload projected away.  The byte length and
SHA-256 are value-checked against DuckDB (which hashes the same UTF-8
bytes); the codec-dependent features (entropy, hash-derived pseudo-embedding
components) come from the deterministic fake codec and are covered by unit
tests (real decoders are stubbed — no image/audio libs in this image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_features
from ..sources.batch import load_table
from .registry import register


@register(
    "multimodal_real_codec_features",
    oracle="""
    WITH px AS (
        SELECT n_nationkey,
               SUM((n_nationkey * 31 + i * 7) % 256) AS s
        FROM nation, range(0, 64) t(i)
        GROUP BY n_nationkey
    ), au AS (
        SELECT n_nationkey,
               SUM(((n_nationkey * 13 + i * 5) % 401) - 200) AS s
        FROM nation, range(0, 100) t(i)
        GROUP BY n_nationkey
    ), pg AS (
        SELECT n_nationkey,
               SUM((n_nationkey * 17 + i * 11) % 256) AS s
        FROM nation, range(0, 192) t(i)
        GROUP BY n_nationkey
    ), jp AS (
        -- flat grayscale JPEG: even pixel values round-trip EXACTLY
        -- through the integer-DCT baseline codec (DC-only block,
        -- verified over all 256 values), so the lossy codec still
        -- yields an arithmetic oracle
        SELECT n_nationkey,
               64 * (((n_nationkey * 37) % 128) * 2) AS s
        FROM nation
    ), jc AS (
        -- flat gray COLOR JPEG (R=G=B=even v): the 2^16 fixed-point
        -- converter maps it to Y=v, Cb=Cr=128 exactly (luma row sums to
        -- 65536, chroma rows to 0), every block is DC-only, and the
        -- inverse adds back nothing — so the color round trip is
        -- value-exact: 64 pixels x 3 channels x v
        SELECT n_nationkey,
               192 * (((n_nationkey * 53) % 128) * 2) AS s
        FROM nation
    ), ad AS (
        -- constant-amplitude IMA-ADPCM: the block header stores sample 0
        -- verbatim and zero deltas leave the predictor untouched, so the
        -- compressed round trip is value-exact
        SELECT n_nationkey,
               80 * (((n_nationkey * 7) % 200) - 100) AS s
        FROM nation
    )
    SELECT CAST(n_nationkey AS BIGINT) AS media_id, 'image' AS kind,
           8 AS width, 8 AS height,
           CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS BIGINT) AS n_frames,
           CAST(s AS BIGINT) AS value_sum
    FROM px
    UNION ALL
    SELECT CAST(n_nationkey + 100 AS BIGINT), 'audio',
           NULL, NULL, 8000, 100, CAST(s AS BIGINT)
    FROM au
    UNION ALL
    SELECT CAST(n_nationkey + 200 AS BIGINT), 'image',
           8, 8, NULL, NULL, CAST(s AS BIGINT)
    FROM pg
    UNION ALL
    SELECT CAST(n_nationkey + 300 AS BIGINT), 'image',
           8, 8, NULL, NULL, CAST(s AS BIGINT)
    FROM jp
    UNION ALL
    SELECT CAST(n_nationkey + 400 AS BIGINT), 'audio',
           NULL, NULL, 8000, 80, CAST(s AS BIGINT)
    FROM ad
    UNION ALL
    SELECT CAST(n_nationkey + 500 AS BIGINT), 'image',
           8, 8, NULL, NULL, CAST(s AS BIGINT)
    FROM jc
    """,
)
def multimodal_real_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path, end to end: per nation, serialize an 8×8 binary PGM
    (pixel i = ``(key*31 + i*7) % 256``), a 100-sample PCM WAV (sample i
    = ``((key*13 + i*5) % 401) - 200``), and an 8×8 RGB PNG (sample i =
    ``(key*17 + i*11) % 256``; the encoder cycles all five scanline
    filters, so zlib inflate + every unfilter path runs), and a flat
    grayscale baseline JPEG (even value ⇒ DC-only block round-trips
    value-exactly through the integer DCT) plus a flat-gray COLOR JPEG
    (YCbCr 4:4:4 — Y=v, Cb=Cr=128 exact through the 2¹⁶ fixed-point
    converter, so all three RGB channels round-trip exactly) with the
    stdlib encoders, then decode them back through ``decode_image``/
    ``decode_audio`` (no fake codec anywhere in this plan).  The decoded
    dimensions and exact integer pixel/sample sums are reproduced
    arithmetically by the oracle, so the whole encode→binary→decode loop
    is value-hash-checked."""
    from ..operators.jpeg import encode_jpeg, encode_jpeg_color
    from ..operators.multimodal import (
        encode_adpcm_wav,
        encode_pgm,
        encode_png,
        encode_wav,
        extract_real_media_features,
    )

    def plant(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for key in pdf["n_nationkey"]:
                k = int(key)
                out["media_id"].append(k)
                out["kind"].append("image")
                out["payload"].append(
                    encode_pgm(8, 8, bytes((k * 31 + i * 7) % 256 for i in range(64)))
                )
                out["media_id"].append(k + 100)
                out["kind"].append("audio")
                out["payload"].append(
                    encode_wav(8000, [((k * 13 + i * 5) % 401) - 200 for i in range(100)])
                )
                out["media_id"].append(k + 200)
                out["kind"].append("image")
                out["payload"].append(
                    encode_png(
                        8, 8,
                        bytes((k * 17 + i * 11) % 256 for i in range(192)),
                        n_channels=3,
                    )
                )
                out["media_id"].append(k + 300)
                out["kind"].append("image")
                out["payload"].append(
                    encode_jpeg(8, 8, bytes([((k * 37) % 128) * 2]) * 64)
                )
                out["media_id"].append(k + 400)
                out["kind"].append("audio")
                out["payload"].append(
                    encode_adpcm_wav(8000, [((k * 7) % 200) - 100] * 80)
                )
                out["media_id"].append(k + 500)
                out["kind"].append("image")
                vc = ((k * 53) % 128) * 2
                out["payload"].append(
                    encode_jpeg_color(8, 8, bytes([vc, vc, vc]) * 64)
                )
            yield pd.DataFrame(out)

    nation = load_table(spark, sf_dir, "nation")
    media = nation.select("n_nationkey").mapInPandas(
        plant, schema="media_id long, kind string, payload binary"
    )
    return extract_real_media_features(media)


@register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_media_features(media).select("media_id", "n_bytes", "payload_sha256")
