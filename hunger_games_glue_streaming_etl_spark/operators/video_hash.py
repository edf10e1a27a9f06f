"""Perceptual video fingerprinting and hash-based video dedup — the video
face of the perceptual tier, completing the modality triple next to
``image_hash`` (dHash) and ``audio_hash`` (energy gradients).

A TMK-style temporal reduction of per-frame spatial hashes: decode every
stride-2-sampled frame of a real YUV4MPEG2 (C444) stream, dHash each
sampled luma plane with the SAME integer 2x2-downsample gradient algebra
the image tier uses, and XOR-fold the per-frame hashes into one two-half
64-bit video fingerprint.  XOR preserves the perceptual properties that
matter here: a global brightness shift moves no frame's bits (so no
fingerprint bits), and a single-pixel perturbation in one frame flips
<= 2 bits of that frame's hash and therefore <= 2 bits of the fold.
Near-pairs ride the shared pigeonhole screen
(``image_hash.hi_lo_near_pairs``).

Everything is integer arithmetic over a planted corpus both engines
construct identically, so the DuckDB oracle rebuilds the per-frame hashes
from the pixel formula and XOR-aggregates them — hash-exact end to end.

Reference scope: the reference job has no video code; this extends the
engine's multimodal curation tier (codec itself: ``multimodal.encode_y4m``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .image_hash import IMG_H, IMG_W, _hashes_from_raster
from .multimodal import encode_y4m

N_FRAMES = 6
FRAME_STRIDE = 2  # decode frames 0, 2, 4
VIDEO_GROUP = 4
VIDEO_PERTURB_MOD = 5
VIDEO_MAX_HAMMING = 3

_PLANE = IMG_W * IMG_H

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("vf_hi", T.LongType()),
        T.StructField("vf_lo", T.LongType()),
    ]
)


def planted_luma(doc_id: int, frame: int) -> bytes:
    """Deterministic 18x16 luma plane for (document, frame).

    base = doc_id div 4 picks the clip, doc_id mod 3 is a global
    brightness shift (fingerprint-invariant), and every 5th doc gets ONE
    pixel +50 in frame 0 (always sampled; flips <= 2 fold bits).  The
    multiplicative mixer spans (frame, pixel) jointly so frames differ
    within a clip and clips differ from each other."""
    base = doc_id // VIDEO_GROUP
    hot = base % _PLANE
    shift = doc_id % 3
    perturb = doc_id % VIDEO_PERTURB_MOD == VIDEO_PERTURB_MOD - 1
    return bytes(
        ((base * 2654435761 + (frame * _PLANE + i) * 40503) % 65536) % 200
        + shift
        + (50 if perturb and frame == 0 and i == hot else 0)
        for i in range(_PLANE)
    )


def planted_clip(doc_id: int) -> bytes:
    """Real Y4M bytes for a document's 6-frame C444 clip (gray chroma)."""
    gray = bytes([128]) * _PLANE
    frames = [
        (planted_luma(doc_id, f), gray, gray) for f in range(N_FRAMES)
    ]
    return encode_y4m(IMG_W, IMG_H, frames)


def decode_y4m_luma_frames(payload: bytes, stride: int = 1) -> list[np.ndarray]:
    """Raster-returning Y4M parse: every ``stride``-th frame's luma plane
    as an (H, W) uint8 array.  Counterpart of ``multimodal.decode_y4m``
    (which returns summary sums only); same header grammar, C444 only."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    width = height = None
    for tag in payload[9:nl].split():
        t, val = chr(tag[0]), tag[1:]
        if t == "W":
            width = int(val)
        elif t == "H":
            height = int(val)
        elif t == "C" and val != b"444":
            raise ValueError("C444 only")
    plane = width * height
    pos, idx, out = nl + 1, 0, []
    while pos < len(payload):
        pos = payload.index(b"\n", pos) + 1  # skip FRAME marker line
        if idx % stride == 0:
            out.append(
                np.frombuffer(payload, dtype=np.uint8, count=plane, offset=pos)
                .reshape(height, width)
                .copy()
            )
        pos += 3 * plane
        idx += 1
    return out


def video_fingerprint_from_clip(payload: bytes) -> tuple[int, int]:
    """(vf_hi, vf_lo): XOR fold of the stride-sampled frames' dHashes."""
    hi = lo = 0
    for raster in decode_y4m_luma_frames(payload, FRAME_STRIDE):
        dh_hi, dh_lo, _, _ = _hashes_from_raster(raster)
        hi ^= dh_hi
        lo ^= dh_lo
    return hi, lo


def video_fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document video fingerprints via the real binary pipeline:
    plant the clip, encode real Y4M bytes, parse them back, stride-sample
    frames, dHash each, XOR-fold — one Arrow kernel, payloads never leave
    it.  At 100 TB the stride bounds per-asset decode cost (the
    ``decode_y4m`` argument) and only (id, 2 longs) shuffles."""
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                hi, lo = video_fingerprint_from_clip(planted_clip(d))
                rows.append((d, hi, lo))
            yield pd.DataFrame(rows, columns=["doc_id", "vf_hi", "vf_lo"])

    return ids.mapInPandas(kernel, schema=_FP_SCHEMA)


def video_near_pairs(
    docs: DataFrame, id_col: str = "doc_id", max_hamming: int = VIDEO_MAX_HAMMING
) -> DataFrame:
    """Video near-duplicate pairs via the shared pigeonhole screen."""
    from .image_hash import hi_lo_near_pairs

    return hi_lo_near_pairs(
        video_fingerprints(docs, id_col), "vf_hi", "vf_lo", max_hamming
    )
