"""Perceptual audio fingerprinting and hash-based audio dedup — the audio
face of the image-dHash tier (``operators/image_hash.py``), completing the
perceptual-dedup family across modalities.

The fingerprint is a chromaprint-style **energy-gradient hash**: the
waveform is framed, each frame reduces to an integer energy proxy, and bit
j says whether frame j's energy is below frame j+1's — 63 bits packed as
two nonneg halves (32 + 31, no ``1<<63`` under ANSI).  A constant DC
offset shifts every frame sum equally, so the comparisons — like dHash's
brightness invariance — don't move: that's what makes it perceptual.

The Spark side runs the REAL binary pipeline (plant deterministic PCM,
encode a real RIFF/WAV via the stdlib codec, decode the bytes back, frame,
hash) inside one Arrow kernel; the DuckDB oracle rebuilds the same 63 bits
from the planted sample formula arithmetically — integer-only end to end,
so the gate is hash-exact.  Near-pairs reuse the exact pigeonhole chunk
screen (``image_hash.hi_lo_near_pairs``).

Reference scope: the reference job has no audio code; this extends the
engine's multimodal curation tier.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import encode_wav

N_SAMPLES = 256  # 64 frames x 4 samples
FRAME = 4
AUDIO_GROUP = 4  # doc_id div 4 shares a base waveform
AUDIO_PERTURB_MOD = 5
AUDIO_MAX_HAMMING = 3

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("af_hi", T.LongType()),
        T.StructField("af_lo", T.LongType()),
    ]
)


def planted_samples(doc_id: int) -> list[int]:
    """Deterministic 256-sample mono PCM waveform for a document id.

    base = doc_id div 4 picks the waveform (Knuth-multiplier double-mod
    mixer — decorrelates bases, the image-hash lesson), doc_id mod 3 adds
    a DC offset (fingerprint-invariant), and every 5th doc gets ONE
    sample +8000 (moves one frame sum -> flips <= 2 gradient bits, still
    a near-dup).  All values in [0, 32032] — valid int16."""
    base = doc_id // AUDIO_GROUP
    hot = base % N_SAMPLES
    dc = (doc_id % 3) * 16
    perturb = doc_id % AUDIO_PERTURB_MOD == AUDIO_PERTURB_MOD - 1
    return [
        ((base * 2654435761 + i * 48271) % 65536) % 24000
        + dc
        + (8000 if perturb and i == hot else 0)
        for i in range(N_SAMPLES)
    ]


def decode_wav_samples(payload: bytes) -> list[int]:
    """Real WAV decode to raw samples via the stdlib RIFF parser —
    raster-returning counterpart of ``multimodal.decode_audio`` (which
    returns summary features only)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected mono 16-bit PCM")
        raw = w.readframes(w.getnframes())
    return list(struct.unpack("<%dh" % (len(raw) // 2), raw))


def fingerprint_from_samples(samples: list[int]) -> tuple[int, int]:
    """(af_hi, af_lo) energy-gradient fingerprint: frame sums over
    4-sample frames, bit j = S[j] < S[j+1] (63 bits), rows 0-31 -> hi,
    32-62 -> lo.  Pure integer arithmetic — DuckDB replays it exactly."""
    sums = [
        sum(samples[j * FRAME : (j + 1) * FRAME])
        for j in range(len(samples) // FRAME)
    ]
    hi = lo = 0
    for j in range(len(sums) - 1):
        bit = 1 if sums[j] < sums[j + 1] else 0
        if j < 32:
            hi |= bit << j
        else:
            lo |= bit << (j - 32)
    return hi, lo


def audio_fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document audio fingerprints via the real binary pipeline:
    plant PCM -> encode RIFF/WAV -> decode bytes -> frame -> hash, all
    inside one Arrow kernel (payloads never leave it; only id + 2
    BIGINTs shuffle — the 100 TB shape for a binary-asset corpus)."""
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = encode_wav(8000, planted_samples(d))
                back = decode_wav_samples(payload)
                hi, lo = fingerprint_from_samples(back)
                rows.append((d, hi, lo))
            yield pd.DataFrame(rows, columns=["doc_id", "af_hi", "af_lo"])

    return ids.mapInPandas(kernel, schema=_FP_SCHEMA)


def audio_near_pairs(
    docs: DataFrame, id_col: str = "doc_id", max_hamming: int = AUDIO_MAX_HAMMING
) -> DataFrame:
    """Audio near-duplicate pairs (Hamming <= 3 over the 63-bit
    fingerprint) via the shared pigeonhole screen."""
    from .image_hash import hi_lo_near_pairs

    return hi_lo_near_pairs(
        audio_fingerprints(docs, id_col), "af_hi", "af_lo", max_hamming
    )
