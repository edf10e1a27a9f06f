"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The Spark-side architecture is fully real — schema (``schemas.MEDIA_SCHEMA``),
partition-parallel batch iteration, bounded batch sizes via
``spark.sql.execution.arrow.maxRecordsPerBatch``, feature columns appended
without shuffles.  The *codec* layer is stubbed: this container has no
image/audio libraries, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless given the deterministic fake codec, which
derives reproducible pseudo-features from the payload bytes.  Swapping the
fake for Pillow/libsndfile changes one function, not the plan.

Scale notes: media payloads dominate row width, so the operators (a) never
shuffle rows with the payload attached, (b) project the payload away as soon
as features are extracted, (c) run the Python stage as one ``mapInPandas``
pass (Arrow transfer amortized over the batch, not per row — the same
reasoning that replaced the reference's per-row ``foreach`` sink,
``script/TributeStreamingJob.py:78-82``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_sha256 string, "
    "entropy_estimate double, feature_v0 double, feature_v1 double"
)


class CodecUnavailable(NotImplementedError):
    """Raised by real codecs that need libraries absent from this image."""


def decode_image(payload: bytes) -> "object":
    raise CodecUnavailable(
        "real image decode requires Pillow/opencv (not in this container); "
        "use fake_decode_features for deterministic pipeline tests"
    )


def decode_audio(payload: bytes) -> "object":
    raise CodecUnavailable(
        "real audio decode requires soundfile/librosa (not in this container)"
    )


def fake_decode_features(payload: bytes) -> tuple[float, float, float]:
    """Deterministic stand-in for decode + feature extraction: byte-entropy
    estimate and two hash-derived pseudo-embedding components."""
    if not payload:
        return 0.0, 0.0, 0.0
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    n = len(payload)
    import math

    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    digest = hashlib.sha256(payload).digest()
    f0 = int.from_bytes(digest[:4], "big") / 2**32
    f1 = int.from_bytes(digest[4:8], "big") / 2**32
    return round(entropy, 6), round(f0, 6), round(f1, 6)


def extract_media_features(media: DataFrame) -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads.

    Output drops the payload column (rule (b) above): downstream analytics
    see only fixed-width features + metadata.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda p: fake_decode_features(bytes(p) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "payload_sha256": pdf["payload"].map(
                        lambda p: hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                    ),
                    "entropy_estimate": feats.map(lambda t: t[0]),
                    "feature_v0": feats.map(lambda t: t[1]),
                    "feature_v1": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode of each frame is the stubbed codec).  Shows the
    explode-before-decode shape: sampling decisions are made JVM-side from
    metadata alone, so undecodable/unneeded frames never reach Python."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).cast("long").alias("frame_ts_ms"),
        )
    )
