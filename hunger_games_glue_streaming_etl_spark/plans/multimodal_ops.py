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
from .registry import ORACLE, register


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


@register(
    "multimodal_video_y4m_frames",
    oracle="""
    WITH sampled AS (
        SELECT n_nationkey AS k, fi, ii,
               (n_nationkey * 19 + fi * 3 + ii * 5) % 256 AS yv,
               (n_nationkey * 7 + fi * 11 + ii * 13) % 256 AS uv,
               (n_nationkey * 23 + fi * 5 + ii * 3) % 256 AS vv
        FROM nation,
             unnest(generate_series(0, 5 + (n_nationkey % 5))) AS f(fi),
             unnest(generate_series(0, 63)) AS i(ii)
        WHERE fi % 2 = 0
    )
    SELECT CAST(k AS BIGINT) AS media_id,
           8 AS width, 8 AS height, 25 AS fps_num,
           CAST(6 + (k % 5) AS BIGINT) AS n_frames,
           CAST((6 + (k % 5) + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(SUM(yv) AS BIGINT) AS luma_sum,
           CAST(SUM(uv + vv) AS BIGINT) AS chroma_sum
    FROM sampled GROUP BY k
    """,
)
def multimodal_video_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec path: per nation, serialize a Y4M (YUV4MPEG2,
    C444 planar) stream of ``6 + key%5`` 8×8 frames — frame f's planes
    are ``(k·19+f·3+i·5)%256`` (Y), ``(k·7+f·11+i·13)%256`` (Cb),
    ``(k·23+f·5+i·3)%256`` (Cr) — then decode it back with STRIDE-2
    frame sampling (``decode_y4m``: every other frame's pixels are
    touched, the timeline is still fully counted).  Exact integer luma /
    chroma sums over the sampled frames are reproduced arithmetically by
    the oracle, so the whole encode→binary→sampled-decode loop is
    value-hash-checked.  Scale: stride sampling bounds per-asset decode
    cost; one Arrow pass, payload never crosses a shuffle, and variable
    frame counts per asset make the per-row work data-dependent like a
    real corpus."""
    from ..operators.multimodal import decode_y4m, encode_y4m

    def plant_and_decode(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "fps_num": [],
                "n_frames": [], "n_sampled": [], "luma_sum": [], "chroma_sum": [],
            }
            for key in pdf["n_nationkey"]:
                k = int(key)
                frames = []
                for f in range(6 + (k % 5)):
                    y = bytes((k * 19 + f * 3 + i * 5) % 256 for i in range(64))
                    u = bytes((k * 7 + f * 11 + i * 13) % 256 for i in range(64))
                    v = bytes((k * 23 + f * 5 + i * 3) % 256 for i in range(64))
                    frames.append((y, u, v))
                d = decode_y4m(encode_y4m(8, 8, frames), sample_stride=2)
                out["media_id"].append(k)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["fps_num"].append(d["fps_num"])
                out["n_frames"].append(d["n_frames"])
                out["n_sampled"].append(d["n_sampled"])
                out["luma_sum"].append(d["luma_sum"])
                out["chroma_sum"].append(d["chroma_sum"])
            yield pd.DataFrame(out)

    nation = load_table(spark, sf_dir, "nation")
    return nation.select("n_nationkey").mapInPandas(
        plant_and_decode,
        schema=(
            "media_id long, width int, height int, fps_num int, "
            "n_frames long, n_sampled long, luma_sum long, chroma_sum long"
        ),
    )


@register(
    "scan_binary_file_assets",
    oracle="""
    WITH px AS (
        SELECT n_nationkey AS asset_key,
               (n_nationkey * 31 + i) % 256 AS p
        FROM nation, unnest(generate_series(0, 63)) AS t(i)
    )
    SELECT asset_key,
           CAST(75 AS BIGINT) AS file_len,
           CAST(SUM(p) AS BIGINT) AS pixel_sum,
           CAST(COUNT(*) AS BIGINT) AS n_pixels
    FROM px GROUP BY 1
    """,
)
def scan_binary_file_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — Spark's raw-asset ingest format (one
    row per file: path, length, content) and the front door of every
    multimodal lake pipeline: image/audio assets live as FILES, not
    parquet cells, until a job like this one lifts them.  Plants one
    real 8×8 PGM per nation (pixels a pure function of the nation key —
    the planted-determinism codec pattern), scans the directory with
    ``pathGlobFilter`` (non-matching junk is never listed, asserted by a
    planted .txt), decodes via the stdlib codec inside ``mapInPandas``,
    and keys each asset by a regexp over its PATH — provenance from file
    metadata, like the `_metadata` entry.  The closed-form oracle rebuilds
    pixel sums arithmetically; file length is structural (11-byte P5
    header + 64 pixels).  At scale: binaryFile splits per file across the
    cluster, payloads are projected away right after feature extraction,
    and `maxBytesPerFile`-class knobs bound task memory."""
    import os

    import pandas as pd

    from ..operators.multimodal import decode_image, encode_pgm
    from ..tmpdirs import entry_tmp_dir

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    keys = sorted(r.n_nationkey for r in nation.collect())  # 25 rows, bounded
    adir = entry_tmp_dir("hg_assets_binaryfile")
    os.makedirs(adir)
    for k in keys:
        pixels = bytes((k * 31 + i) % 256 for i in range(64))
        with open(os.path.join(adir, f"asset-{k}.pgm"), "wb") as fh:
            fh.write(encode_pgm(8, 8, pixels))
    with open(os.path.join(adir, "junk.txt"), "w") as fh:
        fh.write("not an asset; pathGlobFilter must skip me")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(adir)
        .select("path", "length", "content")
    )

    def feats(batches):
        for pdf in batches:
            rows = []
            for path, length, content in zip(
                pdf["path"], pdf["length"], pdf["content"]
            ):
                img = decode_image(bytes(content))
                rows.append(
                    (
                        int(path.rsplit("asset-", 1)[1].removesuffix(".pgm")),
                        int(length),
                        int(img["pixel_sum"]),
                        int(img["width"] * img["height"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_key", "file_len", "pixel_sum", "n_pixels"]
            )

    return files.mapInPandas(
        feats,
        "asset_key long, file_len long, pixel_sum long, n_pixels long",
    )


@register(
    "multimodal_image_dedup_pipeline",
    oracle=None,  # assigned below (shared dHash algebra from dedup_ops)
)
def multimodal_image_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal dedup tier END TO END on real files: plant 3
    near-duplicate PGM variants per nation key (75 binary files on disk
    — brightness-shifted / one perturbed, the planted_pixels corpus),
    ingest them through the ``binaryFile`` SOURCE, recover the asset id
    from the file PATH, decode the actual bytes, dHash, and bucket-join
    Hamming<=3 pairs through the shared pigeonhole screen.  This is the
    composition a real image-lake dedup runs — source, provenance,
    codec, hash, screen in one plan — and every pair still hash-checks
    against the closed-form pixel-formula oracle
    (``dedup_ops.img_dhash_pairs_sql`` over the nation-derived id
    domain).  At scale: binaryFile splits per file; payloads die inside
    the kernel; only (id, 2 longs) shuffles into the screen."""
    import os

    import pandas as pd

    from ..operators.image_hash import (
        IMG_H,
        IMG_W,
        _hashes_from_raster,
        decode_pgm_raster,
        hi_lo_near_pairs,
        planted_pixels,
    )
    from ..operators.multimodal import encode_pgm
    from ..tmpdirs import entry_tmp_dir

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    keys = sorted(r.n_nationkey for r in nation.collect())  # 25 rows, bounded
    adir = entry_tmp_dir("hg_img_dedup")
    os.makedirs(adir)
    for k in keys:
        for v in range(3):
            aid = k * 4 + v
            with open(os.path.join(adir, f"asset-{aid}.pgm"), "wb") as fh:
                fh.write(encode_pgm(IMG_W, IMG_H, planted_pixels(aid)))

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(adir)
        .select("path", "content")
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                aid = int(path.rsplit("asset-", 1)[1].removesuffix(".pgm"))
                raster = decode_pgm_raster(bytes(content))
                dh_hi, dh_lo, _, _ = _hashes_from_raster(raster)
                rows.append((aid, dh_hi, dh_lo))
            yield pd.DataFrame(rows, columns=["doc_id", "dh_hi", "dh_lo"])

    fp = files.mapInPandas(kernel, schema="doc_id long, dh_hi long, dh_lo long")
    return hi_lo_near_pairs(fp, "dh_hi", "dh_lo")


from .dedup_ops import img_dhash_pairs_sql as _img_pairs_sql  # noqa: E402

ORACLE["multimodal_image_dedup_pipeline"] = _img_pairs_sql(
    "SELECT n_nationkey * 4 + v.v AS doc_id FROM nation, (VALUES (0), (1), (2)) v(v)"
)
